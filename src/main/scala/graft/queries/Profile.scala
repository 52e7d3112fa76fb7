package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Column-level data profiling — the "what is actually in this table"
  * pass every ingest/curation pipeline runs before trusting a new drop
  * (null rates, cardinalities, value ranges; the reference's pipelines
  * assume clean input, which is exactly why a profiler belongs in the
  * engine that replaces them).
  *
  * Shape: ONE scan of the table computes every per-column metric in a
  * single aggregation (nulls/min/max fold map-side; the exact distinct
  * counts ride Spark's Expand — one extra shuffle row per profiled
  * column per input row, all map-side partially aggregated). The single
  * result row is then unpivoted driver-free via `inline`, so the output
  * is one row per profiled column.
  *
  * 100 TB note: exact `count(distinct)` per column is the one piece that
  * grows with data (the Expand multiplies shuffle input by the column
  * count). At corpus scale swap it for the portable HLL in
  * [[Sketches.hllBuckets]] (same one-pass shape, KB-sized state) — kept
  * exact here so the profile sits under the DuckDB hash gate.
  */
object Profile {

  /** One profiled column: `numeric` is how to project it onto a double
    * axis for min/max (None for non-numeric columns where only null rate
    * and cardinality are meaningful).
    */
  private case class ColSpec(name: String, numeric: Option[Column])

  private def profile(df: DataFrame, specs: Seq[ColSpec]): DataFrame = {
    val nullD = lit(null).cast("double")
    val aggs = count(lit(1)).as("n_rows") +: specs.flatMap { sp =>
      val c = col(sp.name)
      Seq(
        sum(when(c.isNull, 1).otherwise(0)).cast("long").as(s"_null_${sp.name}"),
        count_distinct(c).as(s"_dist_${sp.name}"),
        sp.numeric.map(n => min(n).cast("double")).getOrElse(nullD)
          .as(s"_min_${sp.name}"),
        sp.numeric.map(n => max(n).cast("double")).getOrElse(nullD)
          .as(s"_max_${sp.name}"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = array(specs.map { sp =>
      struct(
        lit(sp.name).as("col_name"),
        col("n_rows"),
        col(s"_null_${sp.name}").as("n_null"),
        col(s"_dist_${sp.name}").as("n_distinct"),
        col(s"_min_${sp.name}").as("min_num"),
        col(s"_max_${sp.name}").as("max_num"))
    }: _*)
    one.select(inline(rows)).orderBy("col_name")
  }

  /** `stats_profile` oracle entry: profile of lineitem's mixed-type
    * columns. Timestamps profile on the epoch-micros axis (UTC-pinned
    * session ⇒ identical to DuckDB's `epoch_us` on the naive value);
    * non-numeric columns profile null rate + cardinality only.
    */
  def statsProfile(s: SparkSession, dir: String): DataFrame =
    profile(Relational.t(s, dir, "lineitem"), Seq(
      ColSpec("l_orderkey", Some(col("l_orderkey").cast("double"))),
      ColSpec("l_quantity", Some(col("l_quantity").cast("double"))),
      ColSpec("l_extendedprice", Some(col("l_extendedprice").cast("double"))),
      ColSpec("l_discount", Some(col("l_discount").cast("double"))),
      ColSpec("l_shipdate",
        Some(unix_micros(col("l_shipdate").cast("timestamp")).cast("double"))),
      ColSpec("l_returnflag", None),
      ColSpec("l_linestatus", None)))
}
