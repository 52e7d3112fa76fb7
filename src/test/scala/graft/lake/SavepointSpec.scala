package graft.lake

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Savepoints (Hudi savepoint/restore pair): pinned instants survive
  * clean retention and timeline archival, and restore drops dangling
  * pins above its target.
  */
class SavepointSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val base =
    java.nio.file.Files.createTempDirectory("savepoint").toString

  lazy val spark: SparkSession = graft.util.Sessions
    .builder("savepoint-test")
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def newTable(name: String): LakeTable =
    LakeTable.create(spark, s"$base/$name",
      TableMeta(name, Seq("id"), "ts"))

  private def df(rows: (Int, Long, Double)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("id", "ts", "v")
  }

  test("a savepointed snapshot survives clean; release returns it to retention") {
    val t = newTable("sp1")
    val c1 = t.upsert(df((1, 10L, 1.0), (2, 10L, 2.0)))
    t.upsert(df((2, 20L, 22.0))) // rewrites the file c1 wrote
    t.upsert(df((3, 30L, 3.0)))
    t.savepoint(c1)
    assert(t.savepoints() == Seq(c1))
    t.clean(retainCommits = 1)
    // time travel to the pinned instant still reads the ORIGINAL data
    val at = t.snapshotAsOf(c1).select("id", "v").collect()
      .map(r => (r.getInt(0), r.getDouble(1))).sortBy(_._1).toSeq
    assert(at == Seq((1, 1.0), (2, 2.0)))
    // released, the next clean removes what the pin was protecting
    t.releaseSavepoint(c1)
    assert(t.clean(retainCommits = 1) > 0)
    intercept[Exception] { t.snapshotAsOf(c1).collect() }
  }

  test("archival never collapses a savepointed instant") {
    val t = newTable("sp2")
    val c1 = t.upsert(df((1, 10L, 1.0)))
    val c2 = t.upsert(df((2, 20L, 2.0)))
    t.upsert(df((3, 30L, 3.0)))
    t.upsert(df((4, 40L, 4.0)))
    t.savepoint(c2)
    t.archiveTimeline(keepCommits = 1) // clamped by the savepoint
    // without the clamp, keep=1 would put the archival boundary ABOVE c2
    // and collapse it into the checkpoint; the savepoint pins the
    // boundary below it — c2 survives as a real commit, c1 becomes the
    // boundary checkpoint
    assert(t.timeline.read(c2).operation == "upsert",
      "savepointed instant stays a real commit on the active timeline")
    assert(t.timeline.read(c1).operation == "archive-checkpoint",
      "older history rolled into the boundary checkpoint")
    assert(t.snapshotAsOf(c2).count() == 2)
  }

  test("restore refuses below an active savepoint; force destroys it") {
    val t = newTable("sp3")
    val c1 = t.upsert(df((1, 10L, 1.0)))
    val c2 = t.upsert(df((2, 20L, 2.0)))
    t.savepoint(c2)
    // a savepoint PROMISES its snapshot stays reconstructible (a branch
    // genesis may reference the pinned files absolutely) — restoring
    // below it must be an explicit, forced decision
    val e = intercept[IllegalArgumentException](t.restore(c1))
    assert(e.getMessage.contains("savepoint"))
    assert(t.snapshotUser().count() == 2, "refused restore must not mutate")
    t.restore(c1, force = true)
    assert(t.savepoints().isEmpty)
    assert(t.snapshotUser().count() == 1)
  }
}
