package graft.lake

import graft.util.Sessions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class SnapshotGroupSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Sessions.local("snapshot-group-test", "4")

  override def afterAll(): Unit = spark.stop()

  def tmp(): String = Files.createTempDirectory("sgroup").toString + "/t"

  private def mk(name: String): LakeTable =
    LakeTable.create(spark, tmp(), TableMeta(name, Seq("id"), "ts", Seq.empty))

  test("the cut is the minimum stable frontier and hides later commits") {
    val s2 = spark
    import s2.implicits._
    val a = mk("ga"); val b = mk("gb")
    a.insert(Seq((1L, 1L, 10.0)).toDF("id", "ts", "v"))
    b.insert(Seq((1L, 1L, 20.0)).toDF("id", "ts", "v"))
    val bFrontier = b.latestCommit.get
    // A moves on after B's commit
    a.upsert(Seq((1L, 2L, 11.0)).toDF("id", "ts", "v"))
    val cut = SnapshotGroup.cut(Seq(a, b)).get
    assert(cut == bFrontier)
    val dfs = SnapshotGroup.read(Seq(a, b)).get
    assert(dfs("ga").select("v").head().getDouble(0) == 10.0) // pre-mutation
    assert(dfs("gb").select("v").head().getDouble(0) == 20.0)
  }

  test("a live in-flight reservation caps the cut; repeatable across more commits") {
    val s2 = spark
    import s2.implicits._
    val a = mk("ra"); val b = mk("rb")
    a.insert(Seq((1L, 1L, 1.0)).toDF("id", "ts", "v"))
    b.insert(Seq((1L, 1L, 2.0)).toDF("id", "ts", "v"))
    val cut0 = SnapshotGroup.cut(Seq(a, b)).get
    // a concurrent writer holds a reservation on A: the cut must not
    // advance past it even after unrelated commits land on B
    val pending = a.timeline.reserveInstant()
    try {
      b.insert(Seq((2L, 1L, 3.0)).toDF("id", "ts", "v"))
      val cut1 = SnapshotGroup.cut(Seq(a, b)).get
      assert(cut1 < pending)
      assert(cut1 == cut0)
      // the group read at the capped cut repeats identically
      val r1 = SnapshotGroup.read(Seq(a, b)).get.apply("rb")
        .orderBy("id").collect().toSeq
      val r2 = SnapshotGroup.read(Seq(a, b)).get.apply("rb")
        .orderBy("id").collect().toSeq
      assert(r1 == r2)
    } finally a.timeline.releaseReservation(pending)
    // reservation released: a new commit on A moves the frontier again
    a.upsert(Seq((1L, 2L, 1.5)).toDF("id", "ts", "v"))
    assert(SnapshotGroup.cut(Seq(a, b)).get > cut0)
  }

  test("no stable commit on any member means no cut") {
    val s2 = spark
    import s2.implicits._
    val a = mk("ea"); val b = mk("eb")
    a.insert(Seq((1L, 1L, 1.0)).toDF("id", "ts", "v"))
    assert(SnapshotGroup.cut(Seq(a, b)).isEmpty)
    assert(SnapshotGroup.read(Seq(a, b)).isEmpty)
  }
}
