package graft.lake

import graft.util.Sessions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Incremental (liquid-style) curve clustering: maintenance cycles lay
  * out only NEW files along the curve, reusing the seed run's stored
  * equi-depth bounds — O(new data) per cycle, previously-clustered
  * files byte-untouched.
  */
class LiquidClusterSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Sessions.local("liquid-cluster-test", "4")

  override def afterAll(): Unit = spark.stop()

  def tmp(): String = Files.createTempDirectory("liquid").toString + "/t"

  private def grid(s2: SparkSession, from: Int, until: Int) = {
    import s2.implicits._
    (from until until)
      .map(i => (i.toLong, 1L, (i % 64).toDouble, (i / 64).toDouble))
      .toDF("id", "ts", "v1", "v2")
  }

  test("incremental clustering rewrites only post-seed files, reusing seed bounds") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val t = LakeTable.create(spark, tmp(),
        TableMeta("lq", Seq("id"), "ts", Seq.empty))
      t.insert(grid(spark, 0, 2048))
      assert(t.clusterHilbert(Seq("v1", "v2"), bitsPerCol = 5).isDefined)
      val seeded = t.timeline.liveFiles().map(f => f.path -> f.sizeBytes).toMap
      val seedBounds = t.timeline.between(Timeline.Earliest, LakeTable.MaxInstant)
        .flatMap(_.extra.get("cluster.bounds")).lastOption
      assert(seedBounds.isDefined)

      t.insert(grid(spark, 2048, 3072))
      val preIncr = t.timeline.liveFiles().map(_.path).toSet
      assert(t.clusterHilbert(Seq("v1", "v2"), bitsPerCol = 5,
        incremental = true).isDefined)
      val after = t.timeline.liveFiles()
      // every seed-clustered file survives byte-identical (same path,
      // same recorded size); only the new insert's files were replaced
      for ((p, sz) <- seeded)
        assert(after.exists(f => f.path == p && f.sizeBytes == sz),
          s"seed file $p was rewritten by the incremental run")
      assert(after.map(_.path).toSet != preIncr)
      // the incremental commit re-stored the SEED bounds verbatim
      val lastBounds = t.timeline
        .between(Timeline.Earliest, LakeTable.MaxInstant)
        .flatMap(_.extra.get("cluster.bounds")).lastOption
      assert(lastBounds == seedBounds)
      // content unchanged; zone maps prune on both generations
      assert(t.snapshot().count() == 3072)
      def filesScanned(d: org.apache.spark.sql.DataFrame): Long = {
        d.collect()
        d.queryExecution.executedPlan.collectLeaves()
          .flatMap(_.metrics.get("numFiles").map(_.value)).sum
      }
      val all = after.size.toLong
      assert(all > 6, s"need several files: $all")
      val box = t.snapshot().filter(col("v1") < 8.0 && col("v2") < 8.0)
      assert(filesScanned(box) < all,
        s"box read should skip files: ${filesScanned(box)}/$all")
      assert(box.count() ==
        grid(spark, 0, 3072).filter(col("v1") < 8.0 && col("v2") < 8.0).count())
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("incremental with no prior seed falls back to a full clustering") {
    val t = LakeTable.create(spark, tmp(),
      TableMeta("lq2", Seq("id"), "ts", Seq.empty))
    t.insert(grid(spark, 0, 512))
    val before = t.timeline.liveFiles().map(_.path).toSet
    assert(t.clusterHilbert(Seq("v1", "v2"), bitsPerCol = 4,
      incremental = true).isDefined)
    // full rewrite: nothing from the pre-cluster file set survives
    assert(t.timeline.liveFiles().map(_.path).toSet.intersect(before).isEmpty)
    assert(t.snapshot().count() == 512)
  }

  test("a second no-new-data incremental run is a no-op") {
    val t = LakeTable.create(spark, tmp(),
      TableMeta("lq3", Seq("id"), "ts", Seq.empty))
    t.insert(grid(spark, 0, 256))
    assert(t.clusterHilbert(Seq("v1", "v2"), bitsPerCol = 4).isDefined)
    assert(t.clusterHilbert(Seq("v1", "v2"), bitsPerCol = 4,
      incremental = true).isEmpty)
  }

  test("randomized insert/cluster interleavings keep content exact and prune sound") {
    val s2 = spark
    import s2.implicits._
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val rnd = new scala.util.Random(13)
      val t = LakeTable.create(spark, tmp(),
        TableMeta("lqr", Seq("id"), "ts", Seq.empty))
      var next = 0
      def insertSome(n: Int): Unit = { t.insert(grid(spark, next, next + n)); next += n }
      insertSome(512)
      assert(t.clusterHilbert(Seq("v1", "v2"), bitsPerCol = 4).isDefined)
      for (_ <- 1 to 4) {
        insertSome(64 + rnd.nextInt(192))
        if (rnd.nextBoolean())
          t.clusterHilbert(Seq("v1", "v2"), bitsPerCol = 4, incremental = true)
      }
      // trailing incremental run so everything is curve-laid
      t.clusterHilbert(Seq("v1", "v2"), bitsPerCol = 4, incremental = true)
      val expect = grid(spark, 0, next)
      assert(t.snapshot().count() == next)
      // box answers exact against the raw input under every interleaving
      val box = col("v1").between(4.0, 11.0) && col("v2").between(1.0, 6.0)
      assert(t.snapshot().filter(box).count() == expect.filter(box).count())
      // zone pruning still sound AND useful: pruned scan < all files
      def filesScanned(d: org.apache.spark.sql.DataFrame): Long = {
        d.collect()
        d.queryExecution.executedPlan.collectLeaves()
          .flatMap(_.metrics.get("numFiles").map(_.value)).sum
      }
      val all = t.timeline.liveFiles().size.toLong
      assert(filesScanned(t.snapshot().filter(box)) < all)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("MOR: tombstone deltas stay live and keep masking through incremental runs") {
    val s2 = spark
    import s2.implicits._
    val t = LakeTable.create(spark, tmp(),
      TableMeta("lq4", Seq("id"), "ts", Seq.empty, tableType = "mor"))
    t.insert(grid(spark, 0, 256))
    assert(t.clusterHilbert(Seq("v1", "v2"), bitsPerCol = 4).isDefined)
    t.delete(Seq((7L, 2L, 0.0, 0.0)).toDF("id", "ts", "v1", "v2"))
    t.insert(grid(spark, 256, 320))
    assert(t.clusterHilbert(Seq("v1", "v2"), bitsPerCol = 4,
      incremental = true).isDefined)
    // the tombstone file was excluded from the rewrite and still masks
    assert(t.timeline.liveFiles().exists(_.tombstones > 0))
    assert(t.snapshot().count() == 319)
    assert(t.snapshot().filter(col("id") === 7L).count() == 0)
    // z-order and hilbert bounds do not cross-contaminate: an
    // incremental z-order finds no zorder seed and does a full rewrite
    assert(t.clusterZOrder(Seq("v1", "v2"), bitsPerCol = 4,
      incremental = true).isDefined)
    assert(t.snapshot().count() == 319)
  }

  test("MOR: update deltas are left to compaction, never clustered into bases") {
    val s2 = spark
    import s2.implicits._
    val t = LakeTable.create(spark, tmp(),
      TableMeta("lq5", Seq("id"), "ts", Seq.empty, tableType = "mor"))
    t.insert(grid(spark, 0, 256))
    assert(t.clusterHilbert(Seq("v1", "v2"), bitsPerCol = 4).isDefined)
    // an UPDATE delta for key 7 (newer ts) plus fresh base inserts
    t.upsert(Seq((7L, 9L, 63.0, 63.0)).toDF("id", "ts", "v1", "v2"))
    t.insert(grid(spark, 256, 320))
    val deltaPaths = t.timeline.liveFiles().filter(_.isDelta).map(_.path).toSet
    assert(deltaPaths.nonEmpty, "upsert on MOR should have written a delta")
    assert(t.clusterHilbert(Seq("v1", "v2"), bitsPerCol = 4,
      incremental = true).isDefined)
    // the update delta was NOT rewritten into a base: all-base snapshots
    // skip key resolution, so clustering a delta while key 7's older
    // version survives in an untargeted base would duplicate the key
    assert(t.timeline.liveFiles().filter(_.isDelta).map(_.path).toSet
      == deltaPaths, "incremental clustering must not touch delta files")
    assert(t.snapshot().count() == 320)
    val row7 = t.snapshot().filter(col("id") === 7L).collect()
    assert(row7.length == 1 && row7(0).getAs[Double]("v1") == 63.0)
    // compaction (not clustering) is the delta's exit path
    assert(t.compact().isDefined)
    assert(!t.timeline.liveFiles().exists(_.isDelta))
    assert(t.snapshot().count() == 320)
    assert(t.snapshot().filter(col("id") === 7L).count() == 1)
  }
}
