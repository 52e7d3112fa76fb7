package graft.lake

import graft.util.Sessions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Hidden (transform) partitioning: Iceberg-style `days(ts)` etc. as
  * DERIVED partition columns — never part of the user schema, values
  * computed at write in UTC, never supplied by the writer; reads prune
  * on the source column through the zone maps, plain reads stay
  * derived-free, and `snapshotWithDerived` appends the values on
  * demand. Plus the dir-granular retention lever (`expirePartitions`).
  */
class HiddenPartitionSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Sessions.local("hidden-part-test", "4")

  override def afterAll(): Unit = spark.stop()

  private def tmp(): String = Files.createTempDirectory("hidpart").toString

  private def scannedFiles(df: DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.metrics.get("numFiles").map(_.value)).sum
  }

  private val day0 = 1714521600000L // 2024-05-01T00:00:00Z

  private def rows(ids: Seq[Int], dayOffset: Int): DataFrame = {
    val s = spark
    import s.implicits._
    ids.map(i => (i, day0 + dayOffset * 86400000L + i * 1000L, i * 1.0))
      .toDF("id", "created_ts", "v")
  }

  test("days(epoch-millis) derives at write, lands in day dirs, prunes both ways") {
    val t = LakeTable.create(spark, tmp(), TableMeta(
      "hp_days", Seq("id"), "created_ts", Seq("ts_days"),
      partitionDerivations = Map("ts_days" -> "days(created_ts)")))
    // writer never supplies ts_days; one upsert per day
    t.upsert(rows(0 until 50, 0))
    t.upsert(rows(50 until 100, 1))
    t.upsert(rows(100 until 150, 2))
    val dirs = t.timeline.liveFiles().map(_.partition).distinct.sorted
    assert(dirs == Seq("ts_days=2024-05-01", "ts_days=2024-05-02",
      "ts_days=2024-05-03"), s"got $dirs")
    assert(t.snapshot().count() == 150)
    // a range filter on the SOURCE column prunes files without ever
    // mentioning the derived column (zone maps are day-tight)
    val total = t.timeline.liveFiles().size
    val oneDay = t.snapshot()
      .filter(col("created_ts") >= day0 + 86400000L &&
        col("created_ts") < day0 + 2 * 86400000L)
    assert(oneDay.count() == 50)
    assert(scannedFiles(oneDay) < total,
      "source-column range filter must prune files")
    // the derived column is HIDDEN: plain reads never carry it (an
    // INSERT's arity never includes it either); snapshotWithDerived
    // appends the recomputed value, == the stored dir value
    assert(!t.snapshot().columns.contains("ts_days"))
    val byDir = t.snapshotWithDerived()
      .filter(col("ts_days") === "2024-05-03")
    assert(byDir.count() == 50)
    // keyed rewrite replays the stored value; delete is key-only
    t.upsert(rows(Seq(10), 0).withColumn("v", lit(99.0)))
    assert(t.snapshot().filter(col("id") === 10)
      .head().getAs[Double]("v") == 99.0)
    assert(t.snapshot().count() == 150)
    t.delete(rows(Seq(10), 0).select("id"))
    assert(t.snapshot().count() == 149)
  }

  test("partition values are UTC — independent of the writer's session timezone") {
    val t = LakeTable.create(spark, tmp(), TableMeta(
      "hp_utc", Seq("id"), "created_ts", Seq("ts_days"),
      partitionDerivations = Map("ts_days" -> "days(created_ts)")))
    val tzBefore = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "Pacific/Kiritimati")
      t.upsert(rows(Seq(1), 0)) // +14:00 would call this 2024-05-01T14:00
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      t.upsert(rows(Seq(2), 0)) // -04:00 would call it 2024-04-30
    } finally spark.conf.set("spark.sql.session.timeZone", tzBefore)
    val dirs = t.timeline.liveFiles().map(_.partition).distinct
    assert(dirs == Seq("ts_days=2024-05-01"),
      s"one event, one UTC directory, any writer zone: $dirs")
  }

  test("months/years/hours transforms over timestamp and date sources") {
    val s = spark
    import s.implicits._
    val t = LakeTable.create(spark, tmp(), TableMeta(
      "hp_multi", Seq("id"), "ts", Seq("ts_months", "d_years", "ts_hours"),
      partitionDerivations = Map(
        "ts_months" -> "months(ets)",
        "d_years" -> "years(d)",
        "ts_hours" -> "hours(ts)")))
    val df = Seq(
      (1, day0 + 13 * 3600000L, new java.sql.Date(day0), 1.0),
      (2, day0 + 37 * 3600000L, new java.sql.Date(day0 - 86400000L * 200), 2.0))
      .toDF("id", "ts", "d", "v")
      .withColumn("ets", timestamp_millis(col("ts")))
    t.upsert(df)
    val dirs = t.timeline.liveFiles().map(_.partition).distinct.sorted
    assert(dirs == Seq(
      "ts_months=2024-05/d_years=2023/ts_hours=2024-05-02-13",
      "ts_months=2024-05/d_years=2024/ts_hours=2024-05-01-13"), s"got $dirs")
    assert(t.snapshot().count() == 2)
  }

  test("SQL DDL: PARTITIONED BY (days(ts)) and bucket(n, key) via the catalog") {
    val warehouse = tmp()
    // getOrCreate reuses the suite session; catalog confs are runtime
    // SQL confs, so they attach to it — do NOT stop it afterwards
    val s2 = Sessions.builder("hidpart-cat")
      .master("local[4]")
      .config("spark.sql.catalog.hlake",
        classOf[graft.sources.LakeCatalog].getName)
      .config("spark.sql.catalog.hlake.warehouse", warehouse)
      .getOrCreate()
    try {
      s2.sql("CREATE NAMESPACE IF NOT EXISTS hlake.db")
      s2.sql(
        """CREATE TABLE hlake.db.ev (id INT, ts BIGINT, v DOUBLE)
          |PARTITIONED BY (days(ts))
          |OPTIONS ('recordkey.field' 'id', 'precombine.field' 'ts')"""
          .stripMargin)
      val t = LakeTable.load(s2, s"$warehouse/db/ev")
      assert(t.meta.partitionFields == Seq("ts_days"))
      assert(t.meta.partitionDerivations == Map("ts_days" -> "days(ts)"))
      s2.sql(s"INSERT INTO hlake.db.ev VALUES (1, ${day0 + 1000L}, 1.0)")
      s2.sql(s"INSERT INTO hlake.db.ev VALUES (2, ${day0 + 86400000L}, 2.0)")
      assert(t.timeline.liveFiles().map(_.partition).distinct.sorted ==
        Seq("ts_days=2024-05-01", "ts_days=2024-05-02"))
      // the retention service is callable as a SQL procedure
      val exp = s2.sql("CALL hlake.system.expire_partitions(" +
        "table => 'db.ev', column => 'ts_days', cutoff => '2024-05-02')")
        .collect().map(_.getString(0)).toSeq
      assert(exp == Seq("2024-05-01"))
      s2.sql("REFRESH TABLE hlake.db.ev")
      assert(s2.sql("SELECT id FROM hlake.db.ev").collect()
        .map(_.getInt(0)).toSeq == Seq(2))
      // bucket(n, key) maps to the lake bucket layout
      s2.sql(
        """CREATE TABLE hlake.db.bk (id INT, ts BIGINT, v DOUBLE)
          |PARTITIONED BY (bucket(4, id))
          |OPTIONS ('recordkey.field' 'id', 'precombine.field' 'ts')"""
          .stripMargin)
      assert(LakeTable.load(s2, s"$warehouse/db/bk").meta.bucketCount == 4)
      // bucket over a non-key column keeps failing loudly
      val e = intercept[UnsupportedOperationException] {
        s2.sql(
          """CREATE TABLE hlake.db.bad (id INT, ts BIGINT, v DOUBLE)
            |PARTITIONED BY (bucket(4, v))
            |OPTIONS ('recordkey.field' 'id', 'precombine.field' 'ts')"""
            .stripMargin)
      }
      assert(e.getMessage.contains("record key"))
    } finally {
      s2.conf.unset("spark.sql.catalog.hlake")
      s2.conf.unset("spark.sql.catalog.hlake.warehouse")
    }
  }

  test("a derivation's source column cannot be renamed or dropped") {
    val t = LakeTable.create(spark, tmp(), TableMeta(
      "hp_guard", Seq("id"), "created_ts", Seq("ts_days"),
      partitionDerivations = Map("ts_days" -> "days(ets)")))
    t.upsert(rows(Seq(1), 0).withColumn("ets", col("created_ts")))
    intercept[IllegalArgumentException] { t.renameColumn("ets", "ets2") }
    intercept[IllegalArgumentException] { t.dropColumn("ets") }
    // unrelated columns stay evolvable
    t.renameColumn("v", "v2")
    assert(t.snapshotUser().columns.contains("v2"))
  }

  test("expirePartitions: metadata-only drop of dirs below the cutoff") {
    val t = LakeTable.create(spark, tmp(), TableMeta(
      "hp_exp", Seq("id"), "created_ts", Seq("ts_days"),
      partitionDerivations = Map("ts_days" -> "days(created_ts)")))
    t.upsert(rows(0 until 40, 0))   // 2024-05-01
    t.upsert(rows(40 until 80, 1))  // 2024-05-02
    t.upsert(rows(80 until 120, 2)) // 2024-05-03
    val preExpiry = t.latestCommit.get
    val dropped = t.expirePartitions("ts_days", "2024-05-03")
    assert(dropped == Seq("2024-05-01", "2024-05-02"))
    // snapshot excludes the expired dirs; nothing was read or rewritten
    assert(t.snapshot().count() == 40)
    assert(t.snapshotWithDerived()
      .filter(col("ts_days") < "2024-05-03").count() == 0)
    // time travel below the expiry still sees the rows
    assert(t.snapshotAsOf(preExpiry).count() == 120)
    // idempotent: nothing left below the cutoff
    assert(t.expirePartitions("ts_days", "2024-05-03").isEmpty)
    // the files go physical only via clean() after retention
    val expiredFiles = t.timeline.instants().map(t.timeline.read)
      .filter(_.extra.get("expire.column").contains("ts_days"))
      .flatMap(_.removed)
    assert(expiredFiles.nonEmpty && expiredFiles.forall(p =>
      t.fs.exists(new org.apache.hadoop.fs.Path(t.path, p))))
    t.upsert(rows(200 until 210, 2)); t.upsert(rows(210 until 220, 2))
    t.clean(retainCommits = 1)
    assert(expiredFiles.forall(p =>
      !t.fs.exists(new org.apache.hadoop.fs.Path(t.path, p))),
      "clean should physically delete expired files past retention")
    assert(t.snapshot().count() == 60)
  }

  test("expirePartitions refuses MOR delta debt and non-partition columns") {
    val s2 = spark
    import s2.implicits._
    val t = LakeTable.create(spark, tmp(), TableMeta(
      "hp_expmor", Seq("id"), "created_ts", Seq("ts_days"), "mor",
      partitionDerivations = Map("ts_days" -> "days(created_ts)")))
    t.upsert(rows(0 until 20, 0))
    t.upsert(rows(0 until 5, 1)) // MOR update delta
    intercept[IllegalArgumentException] {
      t.expirePartitions("ts_days", "2099-01-01")
    }
    t.compact()
    assert(t.expirePartitions("ts_days", "2024-05-02") == Seq("2024-05-01"))
    assert(t.snapshot().count() == 5) // the 5 updated keys moved to day 2
    intercept[IllegalArgumentException] {
      t.expirePartitions("created_ts", "0")
    }
  }

  test("derivations require global index scope and a known transform") {
    intercept[IllegalArgumentException] {
      LakeTable.create(spark, tmp(), TableMeta(
        "hp_bad1", Seq("id"), "ts", Seq("ts_days"),
        indexScope = "partition",
        partitionDerivations = Map("ts_days" -> "days(ts)")))
    }
    intercept[IllegalArgumentException] {
      LakeTable.create(spark, tmp(), TableMeta(
        "hp_bad2", Seq("id"), "ts", Seq("ts_trunc"),
        partitionDerivations = Map("ts_trunc" -> "truncate(4, ts)")))
    }
  }

  test("a declared schema that names the derived column (or lacks the source) is rejected at create") {
    import org.apache.spark.sql.types._
    def js(fields: (String, DataType)*): String =
      StructType(fields.map { case (n, t) => StructField(n, t) }).json
    // derived column in the declared schema: alignUser would drop the
    // user's column and every write would fail "missing column" — the
    // DEFINITION must be rejected instead
    val e1 = intercept[IllegalArgumentException] {
      LakeTable.create(spark, tmp(), TableMeta(
        "hp_bad3", Seq("id"), "ts", Seq("ts_days"),
        schemaJson = js("id" -> IntegerType, "ts" -> LongType,
          "ts_days" -> StringType),
        partitionDerivations = Map("ts_days" -> "days(ts)")))
    }
    assert(e1.getMessage.contains("HIDDEN"))
    // the derivation's source column must exist in the declared schema
    val e2 = intercept[IllegalArgumentException] {
      LakeTable.create(spark, tmp(), TableMeta(
        "hp_bad4", Seq("id"), "ts", Seq("ts_days"),
        schemaJson = js("id" -> IntegerType, "v" -> DoubleType),
        partitionDerivations = Map("ts_days" -> "days(ts)")))
    }
    assert(e2.getMessage.contains("source column"))
    // a clean declared schema passes
    LakeTable.create(spark, tmp(), TableMeta(
      "hp_ok", Seq("id"), "ts", Seq("ts_days"),
      schemaJson = js("id" -> IntegerType, "ts" -> LongType),
      partitionDerivations = Map("ts_days" -> "days(ts)")))
  }
}
