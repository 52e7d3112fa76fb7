package graft.lake

import graft.util.Sessions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Hidden (transform) partitioning: Iceberg-style `days(ts)` etc. as
  * DERIVED partition columns — values computed at write in UTC, never
  * supplied by the writer; reads prune on the source column through the
  * zone maps and on the derived column through ordinary partition
  * pruning.
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
    // equality on the derived column prunes as a plain partition filter
    val byDir = t.snapshot().filter(col("ts_days") === "2024-05-03")
    assert(byDir.count() == 50)
    assert(scannedFiles(byDir) < total)
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
      assert(t.timeline.liveFiles().map(_.partition).distinct ==
        Seq("ts_days=2024-05-01"))
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
}
