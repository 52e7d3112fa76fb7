package graft.sources

import graft.lake.LakeTable
import graft.util.Sessions
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Metadata-only aggregate pushdown on the v2 connector: a global
  * COUNT(*)/MIN/MAX over a pure-base snapshot answers from commit
  * metadata (plan shows the meta-agg scan, no parquet scan); every case
  * outside the provable window — filters, grouping, deltas, tombstones,
  * time travel, non-exact column types — falls back to the real
  * scan+aggregate with identical results.
  */
class MetaAggPushdownSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Sessions.local("metaagg-test", "4")

  override def afterAll(): Unit = spark.stop()

  def tmp(): String = Files.createTempDirectory("metaagg").toString + "/t"

  def df(rows: (Int, Long, String, Double)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("id", "ts", "part", "v")
  }

  private def writeCow(p: String, d: DataFrame): Unit =
    d.write.format("graft-lake-v2")
      .option("recordkey.field", "id")
      .option("precombine.field", "ts")
      .mode(SaveMode.Append).save(p)

  private def plan(d: DataFrame): String =
    d.queryExecution.executedPlan.toString

  private def metaAnswered(d: DataFrame): Boolean =
    plan(d).contains("LakeV2MetaAggScan")

  test("COUNT(*)/MIN/MAX on a COW snapshot answer from metadata") {
    val p = tmp()
    writeCow(p, df((1, 10L, "a", 1.0), (2, 11L, "b", 2.0), (3, 9L, "c", 3.0)))
    val t = spark.read.format("graft-lake-v2").load(p)
    val q = t.selectExpr("count(*)", "min(ts)", "max(ts)", "min(id)", "max(id)")
    assert(metaAnswered(q), plan(q))
    assert(!plan(q).contains("Scan parquet"), plan(q))
    val r = q.collect().head
    assert(r.getLong(0) == 3 && r.getLong(1) == 9L && r.getLong(2) == 11L)
    assert(r.getInt(3) == 1 && r.getInt(4) == 3)
  }

  test("metadata answer tracks upserts and deletes across commits") {
    val p = tmp()
    writeCow(p, df((1, 10L, "a", 1.0), (2, 10L, "b", 2.0)))
    writeCow(p, df((2, 20L, "b", 22.0), (5, 20L, "e", 5.0)))
    val t = LakeTable.load(spark, p)
    t.delete(df((1, 30L, "a", 0.0)))
    val q = spark.read.format("graft-lake-v2").load(p)
      .selectExpr("count(*)", "min(id)", "max(id)")
    assert(metaAnswered(q), plan(q))
    val r = q.collect().head
    assert(r.getLong(0) == 2 && r.getInt(1) == 2 && r.getInt(2) == 5)
  }

  test("filters, grouping, string/double min, and time travel decline") {
    val p = tmp()
    writeCow(p, df((1, 10L, "a", 1.0), (2, 11L, "b", 2.0)))
    val t = spark.read.format("graft-lake-v2").load(p)

    val filtered = t.filter("id > 1").selectExpr("count(*)")
    assert(!metaAnswered(filtered), plan(filtered))
    assert(filtered.collect().head.getLong(0) == 1)

    val grouped = t.groupBy("part").count()
    assert(!metaAnswered(grouped))
    assert(grouped.count() == 2)

    val strMin = t.selectExpr("min(part)")
    assert(!metaAnswered(strMin), plan(strMin))
    assert(strMin.collect().head.getString(0) == "a")

    val dblMax = t.selectExpr("max(v)")
    assert(!metaAnswered(dblMax))
    assert(dblMax.collect().head.getDouble(0) == 2.0)

    val c1 = LakeTable.load(spark, p).timeline.instants().head
    val asOf = spark.read.format("graft-lake-v2")
      .option("as.of", c1).load(p).selectExpr("count(*)")
    assert(!metaAnswered(asOf), plan(asOf))
  }

  test("the lake_meta_agg oracle query runs on the meta-agg scan") {
    val q = graft.queries.LakeQueries.lakeMetaAgg(spark, "/root/testdata/sf0.001")
    assert(metaAnswered(q), plan(q))
    assert(!plan(q).contains("Scan parquet"), plan(q))
    assert(q.collect().length == 1)
  }

  test("scan statistics report rows, bytes, and zone-map column bounds") {
    val p = tmp()
    writeCow(p, df((1, 10L, "a", 1.0), (7, 42L, "b", 2.0)))
    val t = spark.read.format("graft-lake-v2").load(p)
    // Spark 4.1 wraps V1Scans in a V1ScanWrapper that drops
    // SupportsReportStatistics (see the scaladoc on estimateStatistics),
    // so interrogate the wrapped scan directly for the contract
    val scan = t.queryExecution.optimizedPlan.collectFirst {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        r.scan match {
          case w: org.apache.spark.sql.execution.datasources.v2.V1ScanWrapper =>
            w.v1Scan
          case s => s
        }
    }.get
    val es = scan.asInstanceOf[
      org.apache.spark.sql.connector.read.SupportsReportStatistics]
      .estimateStatistics()
    assert(es.numRows().getAsLong == 2)
    assert(es.sizeInBytes().getAsLong > 0)
    val cols = es.columnStats()
    import scala.jdk.CollectionConverters._
    val byName = cols.asScala.map { case (k, v) => k.fieldNames.head -> v }
    assert(byName("id").min.get == Integer.valueOf(1) &&
      byName("id").max.get == Integer.valueOf(7))
    assert(byName("ts").min.get == java.lang.Long.valueOf(10L) &&
      byName("ts").max.get == java.lang.Long.valueOf(42L))
    // non-exact types carry no bounds
    assert(!byName.contains("v"))
  }

  // ---- partition-pruned metadata answers (filters on partition columns
  // are claimed as fully pushed; the aggregate is answered over exactly
  // the matching partitions' file stats, still with no data-file opens)

  private def writePart(p: String, d: DataFrame): Unit =
    d.write.format("graft-lake-v2")
      .option("recordkey.field", "id")
      .option("precombine.field", "ts")
      .option("partition.fields", "part")
      .mode(SaveMode.Append).save(p)

  test("COUNT/MIN/MAX under a partition equality filter answer from metadata") {
    val p = tmp()
    writePart(p, df((1, 10L, "a", 1.0), (2, 11L, "a", 2.0),
      (3, 9L, "b", 3.0), (4, 30L, "b", 4.0), (5, 20L, "c", 5.0)))
    val t = spark.read.format("graft-lake-v2").load(p)

    val q = t.filter("part = 'b'").selectExpr("count(*)", "min(ts)", "max(ts)")
    assert(metaAnswered(q), plan(q))
    assert(!plan(q).contains("Scan parquet"), plan(q))
    val r = q.collect().head
    assert(r.getLong(0) == 2 && r.getLong(1) == 9L && r.getLong(2) == 30L)

    // IN + negation over the same metadata
    val q2 = t.filter("part IN ('a','c')").selectExpr("count(*)", "max(id)")
    assert(metaAnswered(q2), plan(q2))
    val r2 = q2.collect().head
    assert(r2.getLong(0) == 3 && r2.getInt(1) == 5)

    val q3 = t.filter("NOT (part = 'a')").selectExpr("count(*)")
    assert(metaAnswered(q3), plan(q3))
    assert(q3.collect().head.getLong(0) == 3)

    // empty-matching partition: zero count, NULL min/max
    val q4 = t.filter("part = 'zzz'").selectExpr("count(*)", "min(ts)")
    assert(metaAnswered(q4), plan(q4))
    val r4 = q4.collect().head
    assert(r4.getLong(0) == 0 && r4.isNullAt(1))
  }

  test("null partitions obey three-valued logic in the metadata replay") {
    val p = tmp()
    val s = spark
    import s.implicits._
    val d = Seq((1, 10L, Option("a"), 1.0), (2, 11L, Option("a"), 2.0),
      (3, 9L, None: Option[String], 3.0)).toDF("id", "ts", "part", "v")
    writePart(p, d)
    val t = spark.read.format("graft-lake-v2").load(p)

    // NOT(part='a') must NOT resurrect the null partition
    val q = t.filter("NOT (part = 'a')").selectExpr("count(*)")
    assert(metaAnswered(q), plan(q))
    assert(q.collect().head.getLong(0) == 0)

    val qn = t.filter("part IS NULL").selectExpr("count(*)", "min(ts)")
    assert(metaAnswered(qn), plan(qn))
    val rn = qn.collect().head
    assert(rn.getLong(0) == 1 && rn.getLong(1) == 9L)

    val qnn = t.filter("part IS NOT NULL").selectExpr("count(*)")
    assert(metaAnswered(qnn), plan(qnn))
    assert(qnn.collect().head.getLong(0) == 2)

    // null-safe equality against the null partition
    val qns = t.filter("part <=> NULL").selectExpr("count(*)")
    assert(metaAnswered(qns), plan(qns))
    assert(qns.collect().head.getLong(0) == 1)
  }

  test("mixed partition + data predicates still decline to the real scan") {
    val p = tmp()
    writePart(p, df((1, 10L, "a", 1.0), (2, 11L, "a", 2.0), (3, 9L, "b", 3.0)))
    val t = spark.read.format("graft-lake-v2").load(p)

    val q = t.filter("part = 'a' AND id > 1").selectExpr("count(*)")
    assert(!metaAnswered(q), plan(q))
    assert(q.collect().head.getLong(0) == 1)

    // a string RANGE on the partition column IS claimable — comparison
    // runs in the UTF8String (byte-wise) domain, Catalyst's own order
    val q2 = t.filter("part > 'a'").selectExpr("count(*)")
    assert(metaAnswered(q2), plan(q2))
    assert(q2.collect().head.getLong(0) == 1)
  }

  test("int partition column prunes by range; claimed scans return exact rows") {
    val p = tmp()
    val s = spark
    import s.implicits._
    val d = Seq((1, 10L, 2024, 1.0), (2, 11L, 2025, 2.0), (3, 9L, 2026, 3.0),
      (4, 12L, 2026, 4.0)).toDF("id", "ts", "year", "v")
    d.write.format("graft-lake-v2")
      .option("recordkey.field", "id")
      .option("precombine.field", "ts")
      .option("partition.fields", "year")
      .mode(SaveMode.Append).save(p)
    val t = spark.read.format("graft-lake-v2").load(p)

    val q = t.filter("year >= 2025").selectExpr("count(*)", "min(id)", "max(id)")
    assert(metaAnswered(q), plan(q))
    val r = q.collect().head
    assert(r.getLong(0) == 3 && r.getInt(1) == 2 && r.getInt(2) == 4)

    // non-aggregate read through the claimed (fully pushed) filter: the
    // plan carries NO Catalyst re-filter, so rows must still be exact
    val rows = t.filter("year >= 2025").select("id").collect().map(_.getInt(0)).sorted
    assert(rows.toSeq == Seq(2, 3, 4))
    val rows2 = t.filter("year = 2026").select("id").collect().map(_.getInt(0)).sorted
    assert(rows2.toSeq == Seq(3, 4))
  }

  test("date partition column: claimed ranges and metadata answers agree") {
    val p = tmp()
    val s = spark
    import s.implicits._
    val d = Seq(
      (1, 10L, java.sql.Date.valueOf("2026-01-01"), 1.0),
      (2, 11L, java.sql.Date.valueOf("2026-01-15"), 2.0),
      (3, 9L, java.sql.Date.valueOf("2026-02-01"), 3.0),
      (4, 12L, java.sql.Date.valueOf("2026-02-01"), 4.0))
      .toDF("id", "ts", "day", "v")
    d.write.format("graft-lake-v2")
      .option("recordkey.field", "id")
      .option("precombine.field", "ts")
      .option("partition.fields", "day")
      .mode(SaveMode.Append).save(p)
    val t = spark.read.format("graft-lake-v2").load(p)

    val q = t.filter("day >= DATE'2026-01-15'")
      .selectExpr("count(*)", "min(id)", "max(id)")
    assert(metaAnswered(q), plan(q))
    val r = q.collect().head
    assert(r.getLong(0) == 3 && r.getInt(1) == 2 && r.getInt(2) == 4)

    // row parity through the claimed date filter
    val ids = t.filter("day = DATE'2026-02-01'").select("id")
      .collect().map(_.getInt(0)).sorted
    assert(ids.toSeq == Seq(3, 4))

    // grouped by the date partition: one metadata row per day
    val g = t.groupBy("day").agg(expr("count(*)").as("n")).orderBy("day")
    assert(metaAnswered(g), plan(g))
    assert(g.collect().map(r2 => (r2.getDate(0).toString, r2.getLong(1))).toSeq
      == Seq(("2026-01-01", 1L), ("2026-01-15", 1L), ("2026-02-01", 2L)))
  }

  test("GROUP BY partition column answers one metadata row per partition") {
    val p = tmp()
    val s = spark
    import s.implicits._
    val d = Seq((1, 10L, Option("a"), 1.0), (2, 11L, Option("a"), 2.0),
      (3, 9L, Option("b"), 3.0), (4, 30L, None: Option[String], 4.0))
      .toDF("id", "ts", "part", "v")
    writePart(p, d)
    val t = spark.read.format("graft-lake-v2").load(p)

    val q = t.groupBy("part")
      .agg(expr("count(*)").as("n"), expr("min(ts)").as("lo"),
        expr("max(ts)").as("hi"))
      .orderBy("part")
    assert(metaAnswered(q), plan(q))
    assert(!plan(q).contains("Scan parquet"), plan(q))
    val rows = q.collect().map(r =>
      (if (r.isNullAt(0)) null else r.getString(0),
        r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == Seq((null, 1L, 30L, 30L), ("a", 2L, 10L, 11L),
      ("b", 1L, 9L, 9L)))

    // grouped + partition filter: groups restricted to matching files
    val qf = t.filter("part IS NOT NULL").groupBy("part")
      .agg(expr("count(*)").as("n")).orderBy("part")
    assert(metaAnswered(qf), plan(qf))
    assert(qf.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 2L), ("b", 1L)))

    // grouping on a DATA column is not metadata-answerable
    val qd = t.groupBy("ts").agg(expr("count(*)"))
    assert(!metaAnswered(qd), plan(qd))
    assert(qd.count() == 4)

    // group col not in the select list still answers (scan returns it)
    val qc = t.groupBy("part").agg(expr("count(*)").as("n"))
      .select("n").orderBy("n")
    assert(metaAnswered(qc), plan(qc))
    assert(qc.collect().map(_.getLong(0)).toSeq == Seq(1L, 1L, 2L))
  }

  test("the lake_meta_agg_grouped oracle query runs on the meta-agg scan") {
    val q = graft.queries.LakeQueries
      .lakeMetaAggGrouped(spark, "/root/testdata/sf0.001")
    assert(metaAnswered(q), plan(q))
    assert(!plan(q).contains("Scan parquet"), plan(q))
    val rows = q.collect()
    assert(rows.length > 1) // one row per l_returnflag partition
  }

  test("the claim kill switch reverts to all-residual filters") {
    val p = tmp()
    writePart(p, df((1, 10L, "a", 1.0), (2, 11L, "b", 2.0)))
    spark.conf.set("spark.graft.lake.claimPartitionFilters", "false")
    try {
      val t = spark.read.format("graft-lake-v2").load(p)
      val q = t.filter("part = 'a'").selectExpr("count(*)")
      // no claiming → residual Filter above the scan → no metadata path
      assert(!metaAnswered(q), plan(q))
      assert(q.collect().head.getLong(0) == 1)
      // filterless metadata answers still work with the switch off
      val g = t.selectExpr("count(*)")
      assert(metaAnswered(g), plan(g))
      assert(g.collect().head.getLong(0) == 2)
      // lenient parse: an operator spelling like "off" disables
      // claiming instead of crashing planning
      spark.conf.set("spark.graft.lake.claimPartitionFilters", "off")
      val q2 = t.filter("part = 'a'").selectExpr("count(*)")
      assert(!metaAnswered(q2), plan(q2))
      assert(q2.collect().head.getLong(0) == 1)
    } finally spark.conf.unset("spark.graft.lake.claimPartitionFilters")
  }

  test("MOR table with outstanding deltas declines; compaction re-enables") {
    val p = tmp()
    val d0 = df((1, 10L, "a", 1.0), (2, 10L, "b", 2.0))
    d0.write.format("graft-lake-v2")
      .option("recordkey.field", "id")
      .option("precombine.field", "ts")
      .option("table.type", "mor")
      .mode(SaveMode.Append).save(p)
    val t = LakeTable.load(spark, p)
    t.upsert(df((2, 20L, "b", 22.0))) // delta outstanding
    val q1 = spark.read.format("graft-lake-v2").load(p).selectExpr("count(*)")
    assert(!metaAnswered(q1), plan(q1))
    assert(q1.collect().head.getLong(0) == 2)
    t.compact()
    val q2 = spark.read.format("graft-lake-v2").load(p).selectExpr("count(*)")
    assert(metaAnswered(q2), plan(q2))
    assert(q2.collect().head.getLong(0) == 2)
  }
}
