package graft.lake

import graft.util.Sessions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** [[LakeTable.fullHistoryChanges]] must emit, from ONE scan, exactly
  * the events that the per-commit replay (`changes(prev, c)` for every
  * commit c) emits — including the cases that make the derivation
  * subtle: re-insert after delete, maintenance rewrites (cluster/pack)
  * that move rows between files without changing them, MOR tombstones +
  * compaction, and a late MOR delta losing resolution on precombine.
  * One deliberate divergence: delete events carry their commit in
  * `_change_commit` (the net feed cannot know it and emits null).
  */
class HistoryFeedSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Sessions.local("history-feed-test", "4")
  import spark.implicits._

  override def afterAll(): Unit = spark.stop()

  private def mkTable(name: String, tableType: String): LakeTable = {
    val work = Files.createTempDirectory("graft_hist").toString
    LakeTable.create(spark, s"$work/t",
      TableMeta(name, Seq("id"), "ts", Seq.empty, tableType,
        keyEncoding = "padded"))
  }

  /** Ground truth: one pruned change feed per commit, delete commits
    * filled with the commit they ran in (the per-commit replay KNOWS
    * it, exactly like Scd2.ordinalEvents tags ordinals).
    */
  private def perCommitTruth(t: LakeTable): Set[Seq[Any]] = {
    val insts = t.timeline.instants()
    insts.zipWithIndex.flatMap { case (c, i) =>
      val begin = if (i == 0) Timeline.Earliest else insts(i - 1)
      t.changes(begin, c)
        .filter(col(LakeTable.ChangeTypeCol) =!= "update_preimage")
        .withColumn(LakeTable.ChangeCommitCol, lit(c))
        .collect().map(_.toSeq)
    }.toSet
  }

  private def feed(t: LakeTable): Set[Seq[Any]] =
    t.fullHistoryChanges().collect().map(_.toSeq).toSet

  test("COW: insert/update/delete/re-insert/maintenance rewrites replay exactly") {
    val t = mkTable("hf_cow", "cow")
    def df(rows: (Long, String, Long, Long)*) =
      rows.toDF("id", "g", "v", "ts")
    t.upsert(df((1L, "a", 10L, 1L), (2L, "a", 20L, 1L), (3L, "b", 30L, 1L)),
      combine = false)
    t.upsert(df((2L, "a", 21L, 2L), (4L, "b", 40L, 2L)), combine = false)
    t.delete(Seq(1L, 3L).toDF("id"))
    // maintenance rewrite between events: moves rows, changes nothing
    t.cluster(Seq("g"))
    t.upsert(df((1L, "a", 11L, 3L), (2L, "a", 22L, 3L)), combine = false)
    t.delete(Seq(2L).toDF("id"))
    assert(feed(t) == perCommitTruth(t))
  }

  test("MOR: tombstones, compaction, and a precombine-losing late delta replay exactly") {
    val t = mkTable("hf_mor", "mor")
    def df(rows: (Long, String, Long, Long)*) =
      rows.toDF("id", "g", "v", "ts")
    t.upsert(df((1L, "a", 10L, 5L), (2L, "a", 20L, 5L)), combine = false)
    t.upsert(df((1L, "a", 11L, 6L)), combine = false) // delta update
    // late arrival with LOWER precombine: never becomes current, so it
    // must not appear as an event (the net feed never shows it)
    t.upsert(df((2L, "a", 19L, 3L)), combine = false)
    t.delete(Seq(1L).toDF("id")) // tombstone
    t.delete(Seq(1L, 99L).toDF("id")) // double-delete + absent key: no-ops
    t.upsert(df((1L, "a", 12L, 1L)), combine = false) // revive, low ts wins post-delete
    t.compact()
    t.upsert(df((3L, "b", 30L, 7L)), combine = false)
    assert(feed(t) == perCommitTruth(t))
  }

  test("randomized replay equivalence over mixed COW operation sequences") {
    val rnd = new scala.util.Random(13)
    val t = mkTable("hf_rand", "cow")
    var ts = 0L
    for (step <- 1 to 12) {
      ts += 1
      rnd.nextInt(4) match {
        case 0 | 1 => // upsert a random slice
          val rows = (0 until 1 + rnd.nextInt(5)).map { _ =>
            (rnd.nextInt(8).toLong, s"g${rnd.nextInt(3)}",
              rnd.nextInt(100).toLong, ts)
          }
          t.upsert(rows.toDF("id", "g", "v", "ts"), combine = true)
        case 2 =>
          val keys = (0 until 1 + rnd.nextInt(3)).map(_ => rnd.nextInt(8).toLong)
          t.delete(keys.distinct.toDF("id"))
        case 3 => if (step % 2 == 0) { t.packSmallFiles(1L << 20); () }
          else t.upsert(Seq((rnd.nextInt(8).toLong, "g0",
            rnd.nextInt(100).toLong, ts)).toDF("id", "g", "v", "ts"),
            combine = false)
      }
    }
    assert(feed(t) == perCommitTruth(t))
  }

  test("keyHistory equals the key-filtered full feed and prunes its scan") {
    val t = mkTable("hf_key", "cow")
    def df(rows: (Long, String, Long, Long)*) =
      rows.toDF("id", "g", "v", "ts")
    // spread keys across file groups so range/bloom pruning has teeth
    t.upsert((0L until 200L).map(i => (i, s"g${i % 4}", i * 10, 1L))
      .toDF("id", "g", "v", "ts").repartition(8), combine = false)
    t.upsert(df((7L, "g3", 777L, 2L)), combine = false)
    t.delete(Seq(7L).toDF("id"))
    t.upsert(df((7L, "g3", 778L, 3L)), combine = false)
    val probe = Seq(7L).toDF("id")
    val got = t.keyHistory(probe).collect().map(_.toSeq).toSet
    val full = t.fullHistoryChanges().filter(col("id") === 7L)
      .collect().map(_.toSeq).toSet
    assert(got == full)
    assert(got.size == 4) // insert, postimage, delete, re-insert
    // pruning: the key-scoped scan reads strictly fewer files than the
    // full history scan
    import org.apache.spark.sql.execution.FileSourceScanExec
    val helper = new org.apache.spark.sql.execution.adaptive
      .AdaptiveSparkPlanHelper {}
    def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      helper.collectWithSubqueries(df.queryExecution.executedPlan) {
        case f: FileSourceScanExec =>
          f.relation.location.inputFiles.length.toLong
      }.sum
    }
    val kf = scannedFiles(t.keyHistory(probe))
    val ff = scannedFiles(t.fullHistoryChanges())
    assert(kf < ff, s"keyHistory scanned $kf files, full feed $ff")
  }

  test("schema rename mid-history resolves across file generations") {
    val t = mkTable("hf_ren", "cow")
    t.upsert(Seq((1L, "a", 10L, 1L), (2L, "a", 20L, 1L))
      .toDF("id", "g", "v", "ts"), combine = false)
    t.renameColumn("v", "val")
    t.upsert(Seq((1L, "a", 11L, 2L)).toDF("id", "g", "val", "ts"),
      combine = false)
    t.delete(Seq(2L).toDF("id"))
    // pre-rename files store the OLD physical name; both the feed and
    // the per-commit truth must coalesce it into the current schema
    assert(feed(t) == perCommitTruth(t))
    val got = t.fullHistoryChanges()
    assert(got.columns.contains("val") && !got.columns.contains("v"))
    assert(got.filter(col("id") === 1L && col("val") === 10L).count() == 1)
  }

  test("a cleaned-away historical file fails with the retention contract") {
    val t = mkTable("hf_clean", "cow")
    t.upsert(Seq((1L, "a", 10L, 1L), (2L, "a", 20L, 1L))
      .toDF("id", "g", "v", "ts"), combine = false)
    t.upsert(Seq((1L, "a", 11L, 2L)).toDF("id", "g", "v", "ts"),
      combine = false)
    t.upsert(Seq((1L, "a", 12L, 3L)).toDF("id", "g", "v", "ts"),
      combine = false)
    t.clean(retainCommits = 1) // physically deletes superseded files
    val e = intercept[IllegalStateException](t.fullHistoryChanges().collect())
    assert(e.getMessage.contains("clean"))
    // keyHistory hits the same contract BEFORE reading footer blooms
    val ek = intercept[IllegalStateException](
      t.keyHistory(Seq(1L).toDF("id")))
    assert(ek.getMessage.contains("clean"))
  }

  test("refuses on an archived timeline and on a branch; empty table refuses like changes()") {
    val t = mkTable("hf_guard", "cow")
    // never-written table: same no-schema contract as changes()
    assertThrows[IllegalStateException](t.fullHistoryChanges())
    t.upsert(Seq((1L, "a", 1L, 1L)).toDF("id", "g", "v", "ts"),
      combine = false)
    t.upsert(Seq((2L, "a", 2L, 1L)).toDF("id", "g", "v", "ts"),
      combine = false)
    t.upsert(Seq((3L, "a", 3L, 1L)).toDF("id", "g", "v", "ts"),
      combine = false)
    val bdir = Files.createTempDirectory("graft_hist_br").toString
    val br = t.shallowCloneTo(s"$bdir/b", "hf_branch")
    assert(intercept[IllegalArgumentException](br.fullHistoryChanges())
      .getMessage.contains("branch"))
    t.releaseSavepoint(t.savepoints().head)
    t.archiveTimeline(keepCommits = 1)
    assert(intercept[IllegalArgumentException](t.fullHistoryChanges())
      .getMessage.contains("archived"))
  }
}
