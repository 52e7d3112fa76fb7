package graft.lake

import graft.util.Sessions
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Zero-copy branching: a shallow clone must read the fork snapshot
  * without copying data, evolve independently in both directions, never
  * physically touch source files from its own table services, and merge
  * its net changes back with conflict detection.
  */
class BranchSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Sessions.local("branch-test", "4")
  import spark.implicits._

  override def afterAll(): Unit = spark.stop()

  private def mkTable(dirTag: String): LakeTable = {
    val work = Files.createTempDirectory(s"graft_br_$dirTag").toString
    LakeTable.create(spark, s"$work/t",
      TableMeta("br_t", Seq("id"), "ts", Seq("p"), "cow",
        keyEncoding = "padded"))
  }

  private def rowsOf(df: DataFrame): Set[(Long, String, Long)] =
    df.select("id", "p", "v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  private def seed(t: LakeTable): Unit = {
    t.upsert((0L until 40L).map(i => (i, s"p${i % 3}", i * 10, 1L))
      .toDF("id", "p", "v", "ts"), combine = false)
    t.upsert(Seq((1L, "p1", 111L, 2L), (40L, "p0", 400L, 2L))
      .toDF("id", "p", "v", "ts"), combine = false)
  }

  test("clone reads the fork snapshot zero-copy and evolves independently") {
    val src = mkTable("a")
    seed(src)
    val fork = src.latestCommit.get
    val dest = Files.createTempDirectory("graft_br_dest").toString + "/b"
    val br = src.shallowCloneTo(dest, "br_t_branch")
    // no data files copied into the branch dir
    val brFs = new Path(dest).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val localParquet = {
      val it = brFs.listFiles(new Path(dest), true)
      var n = 0
      while (it.hasNext) {
        val p = it.next().getPath.toString
        if (p.endsWith(".parquet") && !p.contains("_lake")) n += 1
      }
      n
    }
    assert(localParquet == 0, "shallow clone must not copy data")
    assert(rowsOf(br.snapshot()) == rowsOf(src.snapshot()))
    // fork savepointed on the source (clean-pin for referenced files)
    assert(src.savepoints().contains(fork))
    // branch write: invisible to source; source write: invisible to branch
    br.upsert(Seq((2L, "p2", 999L, 3L)).toDF("id", "p", "v", "ts"),
      combine = false)
    src.upsert(Seq((3L, "p0", 888L, 3L)).toDF("id", "p", "v", "ts"),
      combine = false)
    assert(rowsOf(br.snapshot()).contains((2L, "p2", 999L)))
    assert(!rowsOf(br.snapshot()).contains((3L, "p0", 888L)))
    assert(rowsOf(src.snapshot()).contains((3L, "p0", 888L)))
    assert(!rowsOf(src.snapshot()).contains((2L, "p2", 999L)))
  }

  test("branch table services never physically delete source files") {
    val src = mkTable("b")
    seed(src)
    val srcFiles = src.timeline.liveFiles().map(f =>
      new Path(src.path, f.path))
    val dest = Files.createTempDirectory("graft_br_dest2").toString + "/b"
    val br = src.shallowCloneTo(dest, "br_t_branch2")
    // branch rewrites touch every partition's cloned file groups, making
    // the external genesis files logically removed on the branch...
    br.upsert((0L until 41L).map(i => (i, s"p${i % 3}", i + 5000, 9L))
      .toDF("id", "p", "v", "ts"), combine = false)
    br.upsert(Seq((0L, "p0", 7777L, 10L)).toDF("id", "p", "v", "ts"),
      combine = false)
    // ...and an aggressive clean physically reclaims ONLY branch-local
    // files: every source file must survive, source snapshot unchanged
    val before = rowsOf(src.snapshot())
    br.clean(retainCommits = 1)
    val fs = new Path(src.path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    srcFiles.foreach(p => assert(fs.exists(p), s"source file deleted: $p"))
    assert(rowsOf(src.snapshot()) == before)
    // the branch still answers correctly after its clean
    assert(rowsOf(br.snapshot()).contains((0L, "p0", 7777L)))
  }

  test("merge-back replays branch changes; conflicts detected; no-change merge is None") {
    val src = mkTable("c")
    seed(src)
    val fork = src.latestCommit.get
    val dest = Files.createTempDirectory("graft_br_dest3").toString + "/b"
    val br = src.shallowCloneTo(dest, "br_t_branch3")
    // nothing to merge yet
    assert(src.mergeFrom(br, fork).isEmpty)
    // branch: update key 5, insert key 50, delete key 6
    br.upsert(Seq((5L, "p2", 555L, 5L), (50L, "p1", 500L, 5L))
      .toDF("id", "p", "v", "ts"), combine = false)
    br.delete(Seq(6L).toDF("id"))
    assert(src.mergeFrom(br, fork).isDefined)
    val merged = rowsOf(src.snapshot())
    assert(merged.contains((5L, "p2", 555L)))
    assert(merged.contains((50L, "p1", 500L)))
    assert(!merged.exists(_._1 == 6L))
    // the merged main equals the branch state for every branch-touched
    // key, and kept its own untouched rows
    assert(merged == rowsOf(br.snapshot()))
  }

  test("branch of a branch: inherited absolute paths stay verbatim and resolve") {
    val src = mkTable("gc_src")
    seed(src)
    val b1dir = Files.createTempDirectory("graft_br_b1").toString
    val b1 = src.shallowCloneTo(s"$b1dir/b1", "br_b1")
    // branch 1 writes something of its own, so its live set mixes
    // inherited-absolute (source) and relative (own) files
    b1.upsert(Seq((50L, "p0", 500L, 3L)).toDF("id", "p", "v", "ts"),
      combine = false)
    val b2dir = Files.createTempDirectory("graft_br_b2").toString
    val b2 = b1.shallowCloneTo(s"$b2dir/b2", "br_b2")
    // every row must resolve through the doubly-indirect references:
    // source files via b1's genesis (kept verbatim, not re-prefixed
    // with b1's root), b1's own file via the usual absolute rewrite
    assert(rowsOf(b2.snapshot()) == rowsOf(b1.snapshot()))
    assert(b2.snapshot().filter(col("id") === 50L).count() == 1)
    // and the doubled-slash corruption shape never appears
    val paths = b2.timeline.liveFiles().map(_.path)
    assert(paths.forall(!_.contains("//")), s"corrupt path in $paths")
  }

  test("restore below a branch fork refuses without force") {
    val src = mkTable("rf_src")
    seed(src)
    val pre = src.timeline.instants().head
    val bdir = Files.createTempDirectory("graft_br_rf").toString
    src.shallowCloneTo(s"$bdir/b", "br_rf") // savepoints the fork
    val e = intercept[IllegalArgumentException](src.restore(pre))
    assert(e.getMessage.contains("savepoint"))
  }

  test("merge conflict: key changed on both sides aborts; opt-out merges by payload order") {
    val src = mkTable("d")
    seed(src)
    val fork = src.latestCommit.get
    val dest = Files.createTempDirectory("graft_br_dest4").toString + "/b"
    val br = src.shallowCloneTo(dest, "br_t_branch4")
    br.upsert(Seq((7L, "p1", 700L, 5L)).toDF("id", "p", "v", "ts"),
      combine = false)
    src.upsert(Seq((7L, "p1", 701L, 6L)).toDF("id", "p", "v", "ts"),
      combine = false)
    val e = intercept[IllegalArgumentException] {
      src.mergeFrom(br, fork)
    }
    assert(e.getMessage.contains("merge conflict"))
    // opt-out: payload ordering decides — main's ts=6 beats branch's ts=5
    assert(src.mergeFrom(br, fork, failOnConflict = false).isDefined)
    assert(rowsOf(src.snapshot()).contains((7L, "p1", 701L)))
  }
}
