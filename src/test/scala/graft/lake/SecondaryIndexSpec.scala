package graft.lake

import graft.util.Sessions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The posting-list secondary index: lookups through the index must (1)
  * actually prune the read set, (2) return EXACTLY the full-scan
  * answer across post-index commits that rewrite probed values, and
  * (3) fall back (never lie) when the index is missing or invalidated
  * by a restore below its as-of instant.
  */
class SecondaryIndexSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Sessions.local("secidx-test", "4")
  import spark.implicits._

  override def afterAll(): Unit = spark.stop()

  private def mkTable(): LakeTable = {
    val work = Files.createTempDirectory("graft_secidx").toString
    LakeTable.create(spark, s"$work/t",
      TableMeta("secidx_t", Seq("id"), "ts", Seq("p"), "cow",
        keyEncoding = "padded"))
  }

  // many small commits → many files, values spread so posting lists
  // are selective
  private def seed(t: LakeTable): Unit =
    (0 until 8).foreach { batch =>
      val rows = (0 until 50).map { i =>
        val id = (batch * 50 + i).toLong
        (id, s"p${id % 4}", (id % 25).toLong, 1L)
      }
      t.upsert(rows.toDF("id", "p", "sv", "ts"), combine = false)
    }

  private def rowsOf(df: DataFrame): Set[(Long, String, Long)] =
    df.select("id", "p", "sv").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  test("indexed lookup prunes files and matches the full scan, including post-index rewrites") {
    val t = mkTable()
    seed(t)
    assert(t.buildSecondaryIndex("sv").isDefined)
    val total = t.timeline.liveFiles().size
    val pruned = t.secondaryPrunedFiles("sv", Seq(7L)).get
    assert(pruned.size < total,
      s"no prune: ${pruned.size} of $total files")
    assert(rowsOf(t.snapshotWhere("sv", Seq(7L))) ==
      rowsOf(t.snapshot().filter(col("sv") === 7L)))
    // post-index commit MOVES a probed value: id 7 leaves sv=7 (its
    // rewritten file is post-index), id 300 newly arrives at sv=7
    t.upsert(Seq((7L, "p3", 99L, 2L), (300L, "p0", 7L, 2L))
      .toDF("id", "p", "sv", "ts"), combine = false)
    val got = rowsOf(t.snapshotWhere("sv", Seq(7L)))
    assert(got == rowsOf(t.snapshot().filter(col("sv") === 7L)))
    assert(got.exists(_._1 == 300L) && !got.exists(_._1 == 7L))
    // and the stale pre-rewrite version of id 7 never resurfaces
    assert(rowsOf(t.snapshotWhere("sv", Seq(99L))).exists(_._1 == 7L))
  }

  test("multi-value probe unions posting lists") {
    val t = mkTable()
    seed(t)
    t.buildSecondaryIndex("sv")
    assert(rowsOf(t.snapshotWhere("sv", Seq(3L, 11L))) ==
      rowsOf(t.snapshot().filter(col("sv").isin(3L, 11L))))
  }

  test("incremental refresh: new files indexed, rewritten files' postings dropped") {
    val t = mkTable()
    seed(t)
    assert(t.buildSecondaryIndex("sv").isDefined)
    val asOf1 = t.secondaryIndexAsOf("sv").get
    // no new commits: refresh is a watermark no-op
    assert(t.refreshSecondaryIndex("sv").contains(asOf1))
    // new commits: id 7 moves 7→88 (rewrites its file group), id 500 new
    t.upsert(Seq((7L, "p3", 88L, 2L), (500L, "p0", 7L, 2L))
      .toDF("id", "p", "sv", "ts"), combine = false)
    val asOf2 = t.refreshSecondaryIndex("sv").get
    assert(asOf2 > asOf1 && t.secondaryIndexAsOf("sv").contains(asOf2))
    // refreshed lookups equal the full scan, both for the moved-away
    // value (stale posting must not resurrect id 7) and the new one
    assert(rowsOf(t.snapshotWhere("sv", Seq(7L))) ==
      rowsOf(t.snapshot().filter(col("sv") === 7L)))
    assert(rowsOf(t.snapshotWhere("sv", Seq(7L))).exists(_._1 == 500L))
    assert(rowsOf(t.snapshotWhere("sv", Seq(88L))) ==
      rowsOf(t.snapshot().filter(col("sv") === 88L)))
    // and the refreshed generation equals a from-scratch rebuild's
    // answer set for a spread of probes
    (0L until 25L).foreach { v =>
      assert(rowsOf(t.snapshotWhere("sv", Seq(v))) ==
        rowsOf(t.snapshot().filter(col("sv") === v)), s"probe $v")
    }
    // the refresh actually PRUNES (posting precision survived the merge)
    val total = t.timeline.liveFiles().size
    assert(t.secondaryPrunedFiles("sv", Seq(11L)).get.size < total)
  }

  test("no index -> full-scan fallback; restore below as-of invalidates the index") {
    val t = mkTable()
    seed(t)
    // no index yet: fallback equality
    assert(t.secondaryIndexAsOf("sv").isEmpty)
    assert(rowsOf(t.snapshotWhere("sv", Seq(5L))) ==
      rowsOf(t.snapshot().filter(col("sv") === 5L)))
    // pin, commit more, index at the top, then restore below the as-of
    val pin = t.latestCommit.get
    t.savepoint(pin)
    t.upsert(Seq((400L, "p0", 5L, 3L)).toDF("id", "p", "sv", "ts"),
      combine = false)
    assert(t.buildSecondaryIndex("sv").isDefined)
    assert(t.secondaryIndexAsOf("sv").isDefined)
    t.restore(pin)
    // the index claims knowledge of a timeline that no longer exists —
    // it must report invalid and lookups must stay correct via fallback
    assert(t.secondaryIndexAsOf("sv").isEmpty)
    assert(rowsOf(t.snapshotWhere("sv", Seq(5L))) ==
      rowsOf(t.snapshot().filter(col("sv") === 5L)))
    // the revival trap: a NEW post-restore commit takes a higher
    // wall-clock instant than the orphaned build — the orphaned
    // generation must STAY invalid (its as-of is not on the timeline)
    t.upsert(Seq((401L, "p1", 5L, 4L)).toDF("id", "p", "sv", "ts"),
      combine = false)
    assert(t.secondaryIndexAsOf("sv").isEmpty)
    assert(rowsOf(t.snapshotWhere("sv", Seq(5L))) ==
      rowsOf(t.snapshot().filter(col("sv") === 5L)))
    // rebuild re-enables pruning
    assert(t.buildSecondaryIndex("sv").isDefined)
    assert(t.secondaryIndexAsOf("sv").isDefined)
    assert(rowsOf(t.snapshotWhere("sv", Seq(5L))) ==
      rowsOf(t.snapshot().filter(col("sv") === 5L)))
  }
}
