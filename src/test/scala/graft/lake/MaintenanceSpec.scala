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

  test("maintain refreshes existing secondary indexes (the prune stays tight)") {
    val s2 = spark
    import s2.implicits._
    // padded keys: each batch's key range is disjoint, so upserts append
    // one file per batch instead of consolidating (many files → a real
    // posting prune to measure)
    val t = LakeTable.create(spark, tmp(),
      TableMeta("m_idx", Seq("id"), "ts", Seq.empty, keyEncoding = "padded"))
    // sv = id/40: one sv value per batch file, so posting lists are
    // selective (probing one value should reach exactly one file)
    (0 until 6).foreach { b =>
      t.upsert((0 until 40).map { i =>
        val id = (b * 40 + i).toLong
        (id, 1L, id / 40)
      }.toDF("id", "ts", "sv"), combine = false)
    }
    assert(t.buildSecondaryIndex("sv").isDefined)
    assert(t.indexedColumns() == Seq("sv"))
    val asOfBuilt = t.secondaryIndexAsOf("sv").get
    // post-build debt: new files the postings don't cover yet
    (0 until 3).foreach { b =>
      t.upsert((0 until 40).map { i =>
        val id = (300 + b * 40 + i).toLong
        (id, 1L, id / 40)
      }.toDF("id", "ts", "sv"), combine = false)
    }
    // pre-refresh, a probe must scan its posting file + ALL 3 since-files
    val stalePruned = t.secondaryPrunedFiles("sv", Seq(2L)).get.size
    assert(stalePruned == 4, s"stale probe: $stalePruned")
    // targetBytes=1: no packing, so the prune effect is measured on the
    // unchanged 9-file layout (pack consolidating to 1 file would make
    // any prune trivially "tight")
    val did = t.maintain(targetBytes = 1L, retainCommits = 50)
    assert(did.exists(_._1 == "secidx-sv"), s"did=$did")
    assert(t.secondaryIndexAsOf("sv").get > asOfBuilt)
    // refreshed postings cover the post-build files: the probe scans
    // exactly the one file holding the value
    val freshPruned = t.secondaryPrunedFiles("sv", Seq(2L)).get.size
    assert(freshPruned < stalePruned,
      s"refresh should tighten the prune: $freshPruned vs $stalePruned")
    assert(freshPruned == 1 && t.timeline.liveFiles().size == 9)
    // lookups correct, including on the post-build files' values
    for (v <- Seq(2L, 8L)) {
      val got = t.snapshotWhere("sv", Seq(v)).select("id").collect()
        .map(_.getLong(0)).toSet
      val want = t.snapshot().filter(col("sv") === v).select("id").collect()
        .map(_.getLong(0)).toSet
      assert(got == want && want.nonEmpty, s"sv=$v")
    }
    // healthy table: a second maintain does not re-refresh
    assert(!t.maintain(targetBytes = 1L, retainCommits = 50)
      .exists(_._1.startsWith("secidx")))
  }

  test("maintain on a bucketed table compacts; curve-clusters only when seeded") {
    val s2 = spark
    import s2.implicits._
    val t = LakeTable.create(spark, tmp(),
      TableMeta("m2", Seq("id"), "ts", Seq.empty, tableType = "mor",
        bucketCount = 4))
    t.insert((0 until 100).map(i => (i.toLong, 1L, i * 1.0, (i % 10) * 1.0))
      .toDF("id", "ts", "v", "w"))
    t.upsert(Seq((5L, 2L, 55.0, 5.0)).toDF("id", "ts", "v", "w"))
    val did = t.maintain()
    assert(did.map(_._1).contains("compact"))
    assert(!did.exists(_._1.startsWith("cluster")), "no curve seed yet")
    assert(t.timeline.liveFiles().forall(f => !f.isDelta && f.bucket.isDefined))
    assert(t.snapshot().count() == 100)
    // seed a per-bucket curve, add data, maintain: the incremental
    // cluster runs AND the files stay bucket-routed (SPJ keeps working)
    assert(t.clusterZOrder(Seq("v", "w"), bitsPerCol = 4).isDefined)
    t.insert((100 until 140).map(i => (i.toLong, 1L, i * 1.0, (i % 10) * 1.0))
      .toDF("id", "ts", "v", "w"))
    val did2 = t.maintain()
    assert(did2.exists(_._1 == "cluster-zorder"), s"did2=$did2")
    assert(t.timeline.liveFiles().forall(f => !f.isDelta && f.bucket.isDefined))
    assert(t.snapshot().count() == 140)
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
