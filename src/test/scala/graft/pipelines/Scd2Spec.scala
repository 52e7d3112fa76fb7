package graft.pipelines

import graft.lake.{LakeTable, TableMeta}
import graft.util.Sessions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The SCD2 maintenance algebra: the persisted incremental advance must
  * equal the from-genesis history after EVERY advance — including
  * version supersession, delete-terminated chains, and a
  * delete-then-reinsert that reopens a key.
  */
class Scd2Spec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Sessions.local("scd2-test", "4")
  import spark.implicits._

  override def afterAll(): Unit = spark.stop()

  private def mkTable(): LakeTable = {
    val work = Files.createTempDirectory("graft_scd2").toString
    LakeTable.create(spark, s"$work/t",
      TableMeta("scd2_t", Seq("id"), "ts", Seq.empty, "cow",
        keyEncoding = "padded"))
  }

  private def rowsOf(df: DataFrame): Set[(Long, String, Long, Option[Long], Boolean)] =
    df.collect().map { r =>
      (r.getAs[Long]("id"), r.getAs[String]("v"),
        r.getAs[Long]("valid_from"),
        if (r.isNullAt(r.fieldIndex("valid_to"))) None
        else Some(r.getAs[Long]("valid_to")),
        r.getAs[Boolean]("is_current"))
    }.toSet

  test("incremental advance equals from-genesis history at every step") {
    val t = mkTable()
    val stateDir = Files.createTempDirectory("graft_scd2_st").toString + "/st"
    // c1: two keys
    t.upsert(Seq((1L, "a1", 1L), (2L, "b1", 1L)).toDF("id", "v", "ts"),
      combine = false)
    val w1 = Scd2.advance(spark, t, stateDir, Seq("id"))
    assert(w1.exists(_._2 == 1L))
    assert(rowsOf(Scd2.current(spark, stateDir).get._1) ==
      rowsOf(Scd2.history(t, Seq("id"))))
    // replay with no new commits: watermark unchanged
    assert(Scd2.advance(spark, t, stateDir, Seq("id")) == w1)
    // c2: key 1 superseded, key 3 inserted; c3: key 2 deleted — folded
    // in ONE advance spanning two commits
    t.upsert(Seq((1L, "a2", 2L), (3L, "c1", 2L)).toDF("id", "v", "ts"),
      combine = false)
    t.delete(Seq(2L).toDF("id"))
    val w2 = Scd2.advance(spark, t, stateDir, Seq("id"))
    assert(w2.exists(_._2 == 3L))
    val st2 = rowsOf(Scd2.current(spark, stateDir).get._1)
    assert(st2 == rowsOf(Scd2.history(t, Seq("id"))))
    assert(st2.contains((1L, "a1", 1L, Some(2L), false)))
    assert(st2.contains((1L, "a2", 2L, None, true)))
    assert(st2.contains((2L, "b1", 1L, Some(3L), false)))
    assert(st2.contains((3L, "c1", 2L, None, true)))
    // c4: key 2 REINSERTED — the terminated chain reopens with a new
    // version, the old closed version untouched
    t.upsert(Seq((2L, "b2", 3L)).toDF("id", "v", "ts"), combine = false)
    Scd2.advance(spark, t, stateDir, Seq("id"))
    val st3 = rowsOf(Scd2.current(spark, stateDir).get._1)
    assert(st3 == rowsOf(Scd2.history(t, Seq("id"))))
    assert(st3.contains((2L, "b1", 1L, Some(3L), false)))
    assert(st3.contains((2L, "b2", 4L, None, true)))
  }

  test("bootstrap history plans two scans, only one at full width") {
    // the VERDICT-r12 plan-growth fix established that a from-genesis
    // bootstrap derives all events from the corpus file set in one pass
    // (constant in timeline length), not one changes() plan per commit
    // (4 scans+joins each). The r16 optimization split that pass in two:
    // the event classification (three key-window hops) runs over a
    // SKINNY resolution aggregate — parquet column pruning keeps that
    // scan to (key, commit, precombine, tombstone) — and the full-width
    // user columns are scanned once more only to join the version image
    // onto the classified events. So the contract is now: exactly TWO
    // scans, and only ONE of them reads user payload columns — the
    // skinny scan must stay pruned or the rework regresses to shuffling
    // the payload through every window.
    import org.apache.spark.sql.execution.FileSourceScanExec
    val t = mkTable()
    def df(rows: (Long, String, Long)*) =
      rows.map { case (i, v, ts) => (i, v, ts) }.toDF("id", "v", "ts")
    for (c <- 1 to 6)
      t.upsert(df((c.toLong % 3, s"v$c", c.toLong), (10L + c, s"w$c", c.toLong)),
        combine = false)
    t.delete(Seq(1L).toDF("id"))
    val h = Scd2.history(t, Seq("id"))
    h.collect() // finalize the adaptive plan before inspecting it
    val helper = new org.apache.spark.sql.execution.adaptive
      .AdaptiveSparkPlanHelper {}
    val scans = helper.collectWithSubqueries(
      h.queryExecution.executedPlan) {
      case f: FileSourceScanExec => f
    }
    assert(scans.size == 2,
      s"bootstrap must read the corpus exactly twice (skinny resolution " +
        s"+ image attach), found ${scans.size} scans")
    val wide = scans.filter(_.requiredSchema.fieldNames.contains("v"))
    assert(wide.size == 1,
      "only the image-attach scan may read user payload columns; " +
        scans.map(_.requiredSchema.fieldNames.mkString("[", ",", "]"))
          .mkString(" vs "))
    // and the single-scan history is internally consistent: per key,
    // version intervals tile [first, open/close) with no overlap
    val byKey = h.collect().groupBy(_.getAs[Long]("id"))
    byKey.values.foreach { vs =>
      val sorted = vs.sortBy(_.getAs[Long]("valid_from"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("valid_to") == b.getAs[Long]("valid_from"))
        case _ =>
      }
      assert(sorted.init.forall(!_.getAs[Boolean]("is_current")))
    }
  }

  test("streaming CDC source keeps the dimension current across commits") {
    val t = mkTable()
    val base = Files.createTempDirectory("graft_scd2_strm").toString
    val stateDir = s"$base/state"
    def df(rows: (Long, String, Long)*) = rows.toDF("id", "v", "ts")
    t.upsert(df((1L, "a", 1L), (2L, "b", 1L)), combine = false)
    val q = Scd2.runStream(spark, t.path, stateDir, Seq("id"), s"$base/ckpt")
    try {
      q.processAllAvailable()
      assert(rowsOf(Scd2.current(spark, stateDir).get._1) ==
        rowsOf(Scd2.history(t, Seq("id"))))
      // two more commits in one trigger window: per-commit ordering must
      // survive the batched trigger (advance re-derives from the
      // timeline, the batch is only the wake-up)
      t.upsert(df((1L, "a2", 2L)), combine = false)
      t.delete(Seq(2L).toDF("id"))
      q.processAllAvailable()
      assert(rowsOf(Scd2.current(spark, stateDir).get._1) ==
        rowsOf(Scd2.history(t, Seq("id"))))
      val dim = Scd2.current(spark, stateDir).get._1
      assert(dim.filter(col("id") === 1L).count() == 2) // v1 closed + v2 open
      assert(dim.filter(col("id") === 2L && col("is_current")).isEmpty)
    } finally q.stop()
  }

  test("randomized op sequences: advance tracks history across rounds") {
    val rnd = new scala.util.Random(11)
    val t = mkTable()
    val stateDir = Files.createTempDirectory("graft_scd2_r").toString + "/st"
    var ts = 0L
    def nextTs(): Long = { ts += 1; ts }
    t.upsert(Seq((0L, "seed", nextTs())).toDF("id", "v", "ts"),
      combine = false)
    for (round <- 1 to 4) {
      val ups = (0 until 1 + rnd.nextInt(4)).map { _ =>
        (rnd.nextInt(6).toLong, s"v${rnd.nextInt(100)}", nextTs())
      }
      t.upsert(ups.toDF("id", "v", "ts"), combine = true)
      if (rnd.nextBoolean()) {
        val live = t.snapshot().select("id").collect().map(_.getLong(0))
        if (live.nonEmpty)
          t.delete(Seq(live(rnd.nextInt(live.length))).toDF("id"))
      }
      Scd2.advance(spark, t, stateDir, Seq("id"))
      assert(rowsOf(Scd2.current(spark, stateDir).get._1) ==
        rowsOf(Scd2.history(t, Seq("id"))), s"round $round")
    }
  }
}
