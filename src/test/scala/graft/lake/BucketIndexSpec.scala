package graft.lake

import graft.util.Sessions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class BucketIndexSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Sessions.local("bucket-index-test", "4")

  override def afterAll(): Unit = spark.stop()

  def tmp(): String = Files.createTempDirectory("bucketidx").toString + "/t"

  private val N = 8

  private def bucketedTable(rows: Int, name: String): LakeTable = {
    val s2 = spark
    import s2.implicits._
    val t = LakeTable.create(spark, tmp(),
      TableMeta(name, Seq("id"), "ts", Seq.empty, bucketCount = N))
    t.insert((0 until rows).map(i => (i.toLong, 1L, i * 2.0))
      .toDF("id", "ts", "v"))
    t
  }

  private def shuffles(df: DataFrame): Int = {
    df.collect()
    df.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }.size
  }

  private def scannedFiles(df: DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.metrics.get("numFiles").map(_.value)).sum
  }

  test("every row of every file hashes to the file's recorded bucket") {
    val t = bucketedTable(2000, "b_route")
    val live = t.timeline.liveFiles()
    assert(live.nonEmpty && live.forall(f => !f.isDelta && f.bucket.isDefined))
    assert(live.map(_.bucket.get).toSet.subsetOf((0 until N).toSet))
    for (f <- live) {
      val bad = spark.read.parquet(s"${t.path}/${f.path}")
        .filter(pmod(hash(col("id")), lit(N)) =!= f.bucket.get)
        .count()
      assert(bad == 0, s"${f.path}: $bad rows outside bucket ${f.bucket.get}")
    }
    // the tag survives the commit-metadata JSON round trip (Option[Int])
    val reloaded = LakeTable.load(spark, t.path).timeline.liveFiles()
    assert(reloaded.map(f => f.path -> f.bucket).toMap ==
      live.map(f => f.path -> f.bucket).toMap)
  }

  test("co-bucketed tables join on the key with zero shuffles") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = bucketedTable(1000, "b_a")
      val b = bucketedTable(700, "b_b")
      val joined = a.snapshot().select(col("id"), col("v").as("va"))
        .join(b.snapshot().select(col("id"), col("v").as("vb")), "id")
      assert(shuffles(joined) == 0,
        s"expected a storage-partitioned join:\n${joined.queryExecution.executedPlan}")
      assert(joined.count() == 700)
      // the same join against a NON-bucketed table shuffles
      val s2 = spark
      import s2.implicits._
      val plain = LakeTable.create(spark, tmp(),
        TableMeta("b_plain", Seq("id"), "ts", Seq.empty))
      plain.insert((0 until 700).map(i => (i.toLong, 1L, i * 3.0))
        .toDF("id", "ts", "v"))
      val mixed = a.snapshot().select(col("id"), col("v").as("va"))
        .join(plain.snapshot().select(col("id"), col("v").as("vp")), "id")
      assert(shuffles(mixed) > 0)
      assert(mixed.count() == 700)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("key-equality filters prune to one bucket's files at plan time") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // several commits so each bucket holds several files
    val t = bucketedTable(600, "b_prune")
    val s2 = spark
    import s2.implicits._
    t.insert((600 until 1200).map(i => (i.toLong, 1L, i * 2.0))
      .toDF("id", "ts", "v"))
    try {
      val all = t.timeline.liveFiles().size.toLong
      assert(all > N, s"need several files per bucket: $all")
      val one = t.snapshot().filter(col("id") === 123L)
      assert(scannedFiles(one) <= all / 2,
        s"bucket prune should skip other buckets: ${scannedFiles(one)}/$all")
      assert(one.count() == 1)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("upserts and deletes keep files routed; snapshot stays correct") {
    val s2 = spark
    import s2.implicits._
    val t = bucketedTable(500, "b_upd")
    t.upsert(Seq((7L, 2L, 777.0), (500L, 2L, 555.0)).toDF("id", "ts", "v"))
    t.delete(Seq((3L, 3L, 0.0)).toDF("id", "ts", "v"))
    val live = t.timeline.liveFiles()
    assert(live.forall(f => !f.isDelta && f.bucket.isDefined))
    val snap = t.snapshot()
    assert(snap.count() == 500) // 500 - 1 deleted + 1 new
    assert(snap.filter(col("id") === 7L).select("v")
      .head().getDouble(0) == 777.0)
    assert(snap.filter(col("id") === 3L).count() == 0)
    // rows still hash to their file's bucket after the targeted rewrite
    for (f <- live) {
      val bad = spark.read.parquet(s"${t.path}/${f.path}")
        .filter(pmod(hash(col("id")), lit(N)) =!= f.bucket.get).count()
      assert(bad == 0)
    }
  }

  test("MOR deltas fall back to an unbucketed (but correct) scan") {
    val s2 = spark
    import s2.implicits._
    val t = LakeTable.create(spark, tmp(),
      TableMeta("b_mor", Seq("id"), "ts", Seq.empty, tableType = "mor",
        bucketCount = N))
    t.insert((0 until 100).map(i => (i.toLong, 1L, i * 1.0))
      .toDF("id", "ts", "v"))
    t.upsert(Seq((5L, 2L, 50.0)).toDF("id", "ts", "v"))
    assert(t.timeline.liveFiles().exists(_.isDelta))
    val snap = t.snapshot()
    assert(snap.count() == 100)
    assert(snap.filter(col("id") === 5L).select("v").head().getDouble(0) == 50.0)
    // compaction routes the merged result back into tagged buckets
    assert(t.compact().isDefined)
    assert(t.timeline.liveFiles().forall(f => !f.isDelta && f.bucket.isDefined))
    assert(t.snapshot().count() == 100)
  }

  test("cluster(col) layout rewrites are refused on bucketed tables") {
    // arbitrary-column layout would replace the hash routing; curve
    // clustering composes instead (next test)
    val t = bucketedTable(50, "b_refuse")
    intercept[IllegalArgumentException](t.cluster(Seq("v")))
  }

  test("per-bucket curve order: zero-shuffle join AND box-filter file prune compose") {
    val s2 = spark
    import s2.implicits._
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(LakeTable.CurveBucketFileRowsConf, "200")
    try {
      val t = LakeTable.create(spark, tmp(),
        TableMeta("b_curve", Seq("id"), "ts", Seq.empty, bucketCount = N))
      t.insert((0 until 3200)
        .map(i => (i.toLong, 1L, (i % 64).toDouble, (i / 64).toDouble))
        .toDF("id", "ts", "v", "w"))
      assert(t.clusterZOrder(Seq("v", "w"), bitsPerCol = 4).isDefined)
      val live = t.timeline.liveFiles()
      // curve rewrite preserved the routing AND split each bucket into
      // curve-range files (3200 rows / 8 buckets / 200-row cap ≥ 2 each)
      assert(live.forall(f => !f.isDelta && f.bucket.isDefined))
      assert(live.size > N, s"expected >1 file per bucket: ${live.size}")
      for (f <- live) {
        val bad = spark.read.parquet(s"${t.path}/${f.path}")
          .filter(pmod(hash(col("id")), lit(N)) =!= f.bucket.get).count()
        assert(bad == 0, s"${f.path} lost its routing")
      }
      // SPJ: the curve-ordered table still joins shuffle-free on the key
      val peer = bucketedTable(1000, "b_curve_peer")
      val j = t.snapshot().select(col("id"), col("v").as("vc"))
        .join(peer.snapshot().select(col("id"), col("v").as("vp")), "id")
      assert(shuffles(j) == 0, s"\n${j.queryExecution.executedPlan}")
      assert(j.count() == 1000)
      // a 2-col box filter prunes files INSIDE the buckets: no key
      // equality here, so every skipped file is intra-bucket zone-map
      // pruning on the curve layout
      val box = t.snapshot().filter(col("v") < 8.0 && col("w") < 8.0)
      val scanned = scannedFiles(box)
      assert(scanned < live.size,
        s"box filter should skip curve-range files: $scanned/${live.size}")
      assert(box.count() ==
        (0 until 3200).count(i => i % 64 < 8 && i / 64 < 8))
      // incremental maintenance keeps working on the bucketed seed
      t.insert((3200 until 3400)
        .map(i => (i.toLong, 1L, (i % 64).toDouble, (i / 64).toDouble))
        .toDF("id", "ts", "v", "w"))
      assert(t.clusterZOrder(Seq("v", "w"), bitsPerCol = 4,
        incremental = true).isDefined)
      assert(t.timeline.liveFiles().forall(_.bucket.isDefined))
      assert(t.snapshot().count() == 3400)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset(LakeTable.CurveBucketFileRowsConf)
    }
  }

  test("curve file split auto-sizes from target bytes and observed row width") {
    val s2 = spark
    import s2.implicits._
    // no manual bucketFileRows: rows-per-file must derive from
    // targetFileBytes / (live bytes / live rows) out of the footer stats
    spark.conf.set(LakeTable.CurveTargetFileBytesConf, (16 * 1024).toString)
    try {
      val t = LakeTable.create(spark, tmp(),
        TableMeta("b_auto", Seq("id"), "ts", Seq.empty, bucketCount = N))
      t.insert((0 until 6400)
        .map(i => (i.toLong, 1L, (i % 64).toDouble, (i / 64).toDouble))
        .toDF("id", "ts", "v", "w"))
      // the derivation's inputs: observed row width from the seed files'
      // footer stats (at unit scale parquet's fixed per-file overhead
      // dwarfs row payload, so assert the ROW math, not physical bytes —
      // bytes only converge to target at realistic file sizes)
      val seed = t.timeline.liveFiles()
      val width = seed.map(_.sizeBytes).sum / seed.map(_.numRecords).sum
      val expectRows = math.max(1L, 16 * 1024 / width)
      assert(t.clusterZOrder(Seq("v", "w"), bitsPerCol = 4).isDefined)
      val live = t.timeline.liveFiles()
      assert(live.size > N,
        s"auto-sizing should split buckets into curve-range files: ${live.size}")
      assert(live.forall(f => !f.isDelta && f.bucket.isDefined))
      // every file respects the derived cap; non-tail files fill to it
      assert(live.forall(_.numRecords <= expectRows),
        s"cap $expectRows violated: ${live.map(_.numRecords).sorted}")
      assert(live.count(_.numRecords == expectRows) >= live.size - N,
        s"non-tail files should fill the $expectRows-row cap: " +
          s"${live.map(_.numRecords).sorted}")
      // intra-bucket pruning intact on the auto-sized layout
      val box = t.snapshot().filter(col("v") < 8.0 && col("w") < 8.0)
      assert(scannedFiles(box) < live.size)
      assert(box.count() ==
        (0 until 6400).count(i => i % 64 < 8 && i / 64 < 8))
      // disabling the target (0) stops auto-splitting
      spark.conf.set(LakeTable.CurveTargetFileBytesConf, "0")
      assert(t.clusterZOrder(Seq("v", "w"), bitsPerCol = 4).isDefined)
      assert(t.timeline.liveFiles().size == N,
        "target 0 must disable the auto split")
    } finally spark.conf.unset(LakeTable.CurveTargetFileBytesConf)
  }

  test("a partitioned AND bucketed table routes, prunes, and reads correctly") {
    val s2 = spark
    import s2.implicits._
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val t = LakeTable.create(spark, tmp(),
        TableMeta("b_part", Seq("id"), "ts", Seq("part"), bucketCount = N))
      t.insert((0 until 600).map(i => (i.toLong, 1L, s"p${i % 3}", i * 1.0))
        .toDF("id", "ts", "part", "v"))
      val live = t.timeline.liveFiles()
      assert(live.forall(f => f.bucket.isDefined && f.partition.nonEmpty))
      // routing holds inside every hive partition dir
      for (f <- live) {
        val bad = spark.read.parquet(s"${t.path}/${f.path}")
          .filter(pmod(hash(col("id")), lit(N)) =!= f.bucket.get).count()
        assert(bad == 0)
      }
      // partition prune and bucket prune compose
      val one = t.snapshot().filter(col("part") === "p1" && col("id") === 10L)
      assert(scannedFiles(one) < live.size / 2)
      assert(one.count() == 1)
      // the bucketed scan still joins shuffle-free on the key
      val other = bucketedTable(300, "b_part_peer")
      val j = t.snapshot().select(col("id"), col("v").as("vp"))
        .join(other.snapshot().select(col("id"), col("v").as("vb")), "id")
      assert(shuffles(j) == 0, s"\n${j.queryExecution.executedPlan}")
      assert(j.count() == 300)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("groupBy on the bucket key aggregates without an exchange") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val t = bucketedTable(400, "b_agg")
      val agg = t.snapshot().groupBy("id").agg(sum("v").as("sv"))
      assert(shuffles(agg) == 0, s"\n${agg.queryExecution.executedPlan}")
      assert(agg.count() == 400)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("point writes prune candidates to the batch's buckets before the scan") {
    val s2 = spark
    import s2.implicits._
    val t = bucketedTable(800, "b_tag")
    val live = t.timeline.liveFiles()
    // one incoming key → only its bucket's files survive the prune;
    // untagged files must be conservatively kept
    val batch = Seq((42L, 9L, 0.0)).toDF("id", "ts", "v")
    val wantBucket = batch.select(pmod(hash(col("id")), lit(N)))
      .head().getInt(0)
    val pruned = t.bucketPrune(live, batch)
    assert(pruned.nonEmpty)
    assert(pruned.forall(_.bucket.contains(wantBucket)))
    val withUntagged = live :+ live.head.copy(path = "ghost", bucket = None)
    assert(t.bucketPrune(withUntagged, batch).exists(_.bucket.isEmpty))
    // a keys-only frame (no user key columns) cannot hash — no prune
    val keysOnly = batch.select(lit("k").as(LakeTable.RecordKeyCol))
    assert(t.bucketPrune(live, keysOnly) == live)
    // end-to-end: the single-key upsert still lands correctly
    t.upsert(batch.withColumn("v", lit(4242.0)))
    assert(t.snapshot().filter(col("id") === 42L).select("v")
      .head().getDouble(0) == 4242.0)
    assert(t.snapshot().count() == 800)
  }

  test("the lake_bucket_join gate query joins without a hash exchange") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = graft.queries.LakeQueries
        .lakeBucketJoin(spark, "/root/testdata/sf0.001")
      df.collect()
      val hashShuffles = df.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec if e.outputPartitioning
          .isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.HashPartitioning] => e
      }
      // the final orderBy range-partitions; the JOIN itself must not
      assert(hashShuffles.isEmpty,
        s"join should ride the bucket layout:\n${df.queryExecution.executedPlan}")
      assert(df.count() > 0)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("file names parse to the recorded bucket through Spark's own BucketingUtils") {
    // the read side trusts commit metadata, but Spark's bucketed scan
    // trusts the FILE NAME — pin that the two can never drift
    val t = bucketedTable(300, "b_names")
    val s2 = spark
    import s2.implicits._
    t.upsert(Seq((7L, 2L, 1.0)).toDF("id", "ts", "v"))
    for (f <- t.timeline.liveFiles()) {
      val name = f.path.substring(f.path.lastIndexOf('/') + 1)
      val parsed = org.apache.spark.sql.execution.datasources
        .BucketingUtils.getBucketId(name)
      assert(parsed == f.bucket,
        s"$name: Spark parses $parsed, metadata says ${f.bucket}")
    }
  }

  test("bucketing requires a key and key-disjoint partition columns") {
    intercept[IllegalArgumentException](LakeTable.create(spark, tmp(),
      TableMeta("b_bad", Seq("id"), "ts", Seq("id"), bucketCount = N)))
  }
}
