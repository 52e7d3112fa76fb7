package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The relational query pack — every DataFrame operation the reference's
  * pipelines perform (SURVEY §2.2-2.5), expressed Spark-first and paired
  * with a DuckDB oracle in [[graft.SparkEntry.oracleSql]].
  *
  * Determinism rules (the driver hash-compares against DuckDB):
  *  - monetary sums go through DECIMAL so they are exact and
  *    order-independent, then cast to double for a stable output type;
  *  - every result is fully ordered;
  *  - every computed column is aliased identically in Spark and SQL.
  */
object Relational {

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** [[t]] fanned out for CPU-heavy per-row work with the size-adaptive
    * width of [[graft.util.Fanout]] (replaces the flat
    * `repartition(defaultParallelism)` — see Fanout's scaling rationale).
    */
  def tFan(s: SparkSession, dir: String, name: String): DataFrame =
    graft.util.Fanout.scanPath(s, t(s, dir, name), s"$dir/$name.parquet")

  private val dec = DecimalType(18, 2)
  private val dec6 = DecimalType(22, 6)

  /** `events` with `ts` normalized to a session-TZ timestamp, whatever the
    * parquet encoding. Fixture generations have used both TIMESTAMP(NANOS)
    * (surfaces as epoch-nanos long under legacy.parquet.nanosAsLong — see
    * [[graft.util.Sessions]]) and plain TIMESTAMP(MICROS) (surfaces as
    * TIMESTAMP_NTZ), so branch on the read dtype instead of assuming one:
    *  - long: integer-divide nanos→micros (double division would lose
    *    precision at 1e18) and stamp as timestamp;
    *  - NTZ: cast to TIMESTAMP — an identity on the underlying micros
    *    under the UTC-pinned session, matching DuckDB's `epoch_us(ts)`
    *    on the naive value;
    *  - already TIMESTAMP: pass through.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val df = t(s, dir, "events")
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }

  /** A1 pricing summary (DWD2DM.scala:32-34 shape, TPC-H Q1 flavored). */
  def q1PricingSummary(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp_ntz"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast(dec)).cast("double").as("sum_base_price"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(dec6))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** J1 fact→dim left-outer enrichment + nvl (ODS2DWD.scala:58-62). */
  def q2DimJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part")),
        col("l_partkey") === col("p_partkey"), "left")
      .groupBy(coalesce(col("p_brand"), lit("NA")).as("brand"))
      .agg(
        sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"),
        count(lit(1)).as("cnt"))
      .orderBy("brand")

  /** J2 additive merge: delta agg ⟕ current agg, summed with nvl
    * (DWD2DM.scala:75-79 — manual incremental view maintenance).
    */
  def q3AdditiveMerge(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val cutoff = lit("1997-01-01").cast("timestamp_ntz")
    val cur = li.filter(col("l_shipdate") < cutoff)
      .groupBy("l_returnflag")
      .agg(sum(col("l_quantity").cast(dec)).as("cur_sum"))
    val inc = li.filter(col("l_shipdate") >= cutoff)
      .groupBy("l_returnflag")
      .agg(sum(col("l_quantity").cast(dec)).as("inc_sum"))
    inc.join(cur, Seq("l_returnflag"), "left")
      .select(col("l_returnflag"),
        (col("inc_sum") + coalesce(col("cur_sum"), lit(0).cast(dec)))
          .cast("double").as("total_qty"))
      .orderBy("l_returnflag")
  }

  /** P5/P6 row-level projection with filter pushdown: revenue per row. */
  def q4FilterProject(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-06-01").cast("timestamp_ntz") &&
        col("l_shipdate") < lit("1997-09-01").cast("timestamp_ntz") &&
        col("l_discount") > lit(0.05))
      .select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy("l_orderkey", "l_linenumber", "revenue")

  /** A4 distinct (package.scala:148). */
  def q5Distinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select("o_orderpriority").distinct()
      .orderBy("o_orderpriority")

  /** Top-k by total order (sort + limit; beyond reference's bare limit
    * Hive2Hudi.scala:25 — deterministic via full tiebreak).
    */
  def q6TopK(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
      .select(col("o_orderkey"), col("o_totalprice"))

  /** Multi-way star join: revenue by nation (dims broadcast). */
  def q7StarJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(dec6))
          .cast("double").as("revenue"),
        count(lit(1)).as("cnt"))
      .orderBy("r_name", "n_name")

  /** The precombine keep-latest device (SURVEY §2.4 note): latest row per
    * record key via row_number over a fully-deterministic ordering.
    */
  def q8WindowDedup(s: SparkSession, dir: String): DataFrame = {
    // r16 optimization (guide §2.3/§2.4): the declared result — the
    // per-(orderkey, linenumber) row winning the 5-column descending
    // order — only exposes columns from the group key and the ordering
    // tuple, so the row_number window (full exchange + SORT of every
    // row) collapses to max(struct(...)): a hash aggregate with
    // MAP-SIDE partials and no sort. Ties are output-identical by
    // construction (rows equal on the whole ordering tuple are equal in
    // every emitted column), and TPC-H lineitem carries no nulls in the
    // tuple, so max == row_number()=1 exactly; the DuckDB oracle still
    // runs the window form, pinning the equivalence under the hash gate.
    val top = max(struct(col("l_shipdate"), col("l_partkey"),
      col("l_suppkey"), col("l_quantity"), col("l_extendedprice"))).as("m")
    t(s, dir, "lineitem")
      .groupBy("l_orderkey", "l_linenumber")
      .agg(top)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("m.l_partkey"), col("m.l_suppkey"), col("m.l_quantity"),
        col("m.l_extendedprice"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** P2/P3 from_json parse + nested access (Log2Hudi.scala:69). */
  def q9FromJson(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .withColumn("j",
        from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT")))
      .groupBy("event_type")
      .agg(sum(col("j.k").cast("long")).as("sum_k"), count(lit(1)).as("cnt"))
      .orderBy("event_type")

  /** P5 ingest-time partition buckets: day + 10-minute floor
    * (Log2Hudi.scala:70-75, README.md:148) applied to event time.
    */
  def q10DateBuckets(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .select(
        date_format(col("ts"), "yyyyMMdd").as("logday"),
        concat(lpad(hour(col("ts")).cast("string"), 2, "0"),
          lpad((floor(minute(col("ts")) / 10) * 10).cast("string"), 2, "0"))
          .as("hm"),
        col("event_id"))
      .groupBy("logday", "hm")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("logday", "hm")

  /** P8 generated PK-not-null predicate (package.scala:185-188). */
  def q11PkFilter(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_orderkey").isNotNull && col("l_linenumber").isNotNull)
      .agg(count(lit(1)).as("cnt"))

  /** P6 casts + agg on a different table. */
  def q12CastAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(
        sum(col("o_totalprice").cast(dec)).cast("double").as("sum_price"),
        count(lit(1)).as("cnt"))
      .orderBy("o_orderstatus", "o_orderpriority")

  /** Rollup: hierarchical subtotals (beyond reference surface — completes
    * the aggregation algebra for analytics users). Null grouping keys
    * from the rollup are labeled explicitly so ordering is deterministic.
    */
  def q15Rollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"),
        count(lit(1)).as("cnt"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("sum_qty"), col("cnt"))
      .orderBy("rf", "ls")

  /** Full CUBE (`q33_cube`) — every subset of the grouping keys in one
    * pass. Completes the multidimensional-aggregation algebra next to
    * rollup (prefix lattice) and grouping sets (explicit lattice): a
    * reporting user gets all 2^k marginal totals from ONE scan + ONE
    * expanded shuffle instead of 2^k separate group-bys.
    *
    * Scale shape: Spark's Expand emits 4 rows per input row here (k=2);
    * partial aggregation collapses them map-side before the shuffle, so
    * the exchange carries only group cardinality × 4 — constant in the
    * fact-table size.
    */
  def q33Cube(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .cube("o_orderstatus", "o_orderpriority")
      .agg(sum(col("o_totalprice").cast(dec)).cast("double").as("sum_price"),
        count(lit(1)).as("cnt"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("st"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("pri"),
        col("sum_price"), col("cnt"))
      .orderBy("st", "pri")

  /** Interval-overlap sweep (`q34_interval_overlap`) — peak concurrency
    * per event type: each event spans [ts, ts + value seconds); the
    * classic sweep-line turns interval overlap into a running sum over
    * +1/-1 boundary deltas. Start boundaries sort before end boundaries
    * at the same instant (delta DESC), so touching intervals count as
    * overlapping — and within a tie group of equal (t, delta) the
    * prefix-sum MULTISET is order-invariant, so max(running) is
    * deterministic under any shuffle order.
    *
    * Scale shape: one union (2 rows/event), one window partitioned by
    * event_type — bounded-cardinality partitions, each sorted locally
    * after a single shuffle; no self-join (the naive pairwise overlap
    * join is O(n²) and was never on the table).
    */
  def q34IntervalOverlap(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = events(s, dir).select(
      col("event_type"),
      unix_micros(col("ts")).as("s_us"),
      // floor-then-cast: Spark casts double→long by truncation, DuckDB
      // by rounding; floor() is bit-identical in both
      (unix_micros(col("ts")) +
        floor(col("value") * lit(1000000.0)).cast("long")).as("e_us"))
    val bounds =
      e.select(col("event_type"), col("s_us").as("t"), lit(1).as("delta"))
        .unionAll(e.select(col("event_type"), col("e_us").as("t"),
          lit(-1).as("delta")))
    val w = Window.partitionBy("event_type")
      .orderBy(col("t"), col("delta").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bounds.withColumn("running", sum(col("delta")).over(w))
      .groupBy("event_type")
      .agg(max(col("running")).as("max_concurrent"),
        (count(lit(1)) / 2).cast("long").as("n_intervals"))
      .orderBy("event_type")
  }

  /** Grouping sets beyond rollup's prefix lattice: two sibling groupings
    * {(returnflag), (linestatus)} in ONE pass over the fact table (Spark
    * expands then aggregates — one scan, one shuffle, vs two scans for a
    * UNION ALL of group-bys).
    */
  def q23GroupingSets(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
        col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"),
        count(lit(1)).as("cnt"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("sum_qty"), col("cnt"))
      .orderBy("rf", "ls")

  /** Exact percentiles per group (continuous interpolation — Spark
    * `percentile` and DuckDB `quantile_cont` share the definition).
    */
  def q16Percentiles(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_orderstatus")
      .agg(
        expr("percentile(o_totalprice, 0.5)").as("p50"),
        expr("percentile(o_totalprice, 0.9)").as("p90"))
      .orderBy("o_orderstatus")

  /** Semi/anti joins (beyond reference surface; completes join algebra):
    * customers with orders but no high-price order.
    */
  def q13SemiAnti(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
    c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .join(o.filter(col("o_totalprice") > 400000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")
  }

  /** Analytic window functions over per-customer order history (beyond
    * reference surface; the window machinery itself backs q8/precombine):
    * order rank, previous order's price (lag), and a running total —
    * rank/lag/cumulative-sum share exact semantics with DuckDB. Monetary
    * values stay DECIMAL through the running sum for exactness.
    */
  def q17WindowFuncs(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    t(s, dir, "orders")
      .filter(col("o_custkey") < 200)
      .select(col("o_custkey"), col("o_orderkey"),
        row_number().over(w).as("rn"),
        lag(col("o_totalprice").cast(dec), 1).over(w).cast("double")
          .as("prev_price"),
        sum(col("o_totalprice").cast(dec))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("running_total"))
      .orderBy("o_custkey", "rn")
  }

  /** Correlated scalar subquery, decorrelated the scale-friendly way
    * (beyond reference surface): orders priced above their customer's
    * average. The comparison is kept in EXACT integer/decimal algebra
    * (`price · n > sum` instead of `price > sum/n`), so the row set is
    * bit-deterministic across engines — no division rounding at the
    * decision boundary.
    */
  def q18AboveAvg(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val c = o.groupBy("o_custkey")
      .agg(count(lit(1)).as("cnt"),
        sum(col("o_totalprice").cast(dec)).as("s"))
    o.join(c, "o_custkey")
      .filter(col("o_totalprice").cast(dec) * col("cnt") > col("s"))
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Gap-based sessionization over the event stream (the canonical
    * events-at-scale operator, beyond reference surface): a session
    * breaks after 30 idle minutes. Composed from lag + running sum —
    * wholly within window machinery both engines define identically;
    * gaps are compared in exact epoch MICROSECONDS (no timestamp-cast
    * truncation at the boundary).
    */
  def q19Sessionize(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val GapUs = 30L * 60 * 1000000
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val e = events(s, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
    e.withColumn("brk",
      when(col("us") - lag(col("us"), 1).over(w) > GapUs, 1)
        .when(lag(col("us"), 1).over(w).isNull, 1).otherwise(0))
      .withColumn("sid",
        sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)).cast("int"))
      .groupBy("user_id", "sid")
      .agg(count(lit(1)).as("n_events"),
        min(col("us")).as("start_us"), max(col("us")).as("end_us"))
      .orderBy("user_id", "sid")
  }

  /** Pivot (beyond reference surface): order counts per priority,
    * reshaped to one column per order status. An explicit value list
    * keeps the output schema static (a values-discovering pivot would
    * need an extra distinct pass anyway — always pin the list at scale).
    */
  def q20Pivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L, Seq("F", "O", "P"))
      .orderBy("o_orderpriority")

  /** As-of join (beyond reference surface): each purchase event attributed
    * to the same user's latest at-or-before click. Runs through
    * [[graft.operators.AsOfJoin]] — union + running-max window, one shuffle
    * on user_id — the scale shape; the DuckDB oracle uses its native
    * ASOF LEFT JOIN, an independent formulation of the same semantics.
    */
  def q21AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("purchase_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
    graft.operators.AsOfJoin
      .asOfPrior(purchases, clicks, Seq("user_id"),
        leftTs = "purchase_us", rightTs = "us", prefix = "click_")
      .withColumn("gap_us", col("purchase_us") - col("click_us"))
      .orderBy("event_id")
  }

  /** Range join (beyond reference surface): events counted into each error
    * event's 5-minute blast window — a pure point-in-interval join with no
    * equality key. Runs through [[graft.operators.RangeJoin]]'s
    * bin-replication equi-join; the oracle states the naive inequality
    * join. Inner join suffices: every error's own event lands in its own
    * window, so no group is lost.
    */
  def q22RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val WinUs = 5L * 60 * 1000000
    val ev = events(s, dir)
    val pts = ev.select(unix_micros(col("ts")).as("us"))
    val errs = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"),
        unix_micros(col("ts")).as("lo"),
        (unix_micros(col("ts")) + WinUs).as("hi"))
    graft.operators.RangeJoin
      .pointInInterval(pts, "us", errs, "lo", "hi", binWidth = WinUs)
      .groupBy(col("err_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("err_id").as("event_id"), col("n_events"))
      .orderBy("event_id")
  }

  /** Generate/explode (beyond reference surface): token frequency over
    * `documents` — explode the split array, count, top-25. The Generate
    * operator runs inside whole-stage codegen and the count is map-side
    * combined, so the shuffle carries (token, partial count), not the
    * exploded corpus: the safe shape at 100 TB (an explode THEN shuffle
    * of raw tokens would multiply the corpus by tokens-per-doc).
    * Deterministic top-k: ties broken by the token itself.
    */
  def q24Explode(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("token")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(25)

  /** Unpivot/melt (beyond reference surface): wide per-flag measure
    * columns reshaped to long (measure, val) rows — the inverse of
    * q20_pivot, via the native Expand-based `unpivot` (no UDFs, no
    * per-measure scans; one pass emits all three measures).
    */
  def q25Unpivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        sum(col("l_quantity").cast(dec)).cast("double").as("qty"),
        sum(col("l_extendedprice").cast(dec)).cast("double").as("price"),
        sum(col("l_discount").cast(dec)).cast("double").as("disc"))
      .unpivot(Array(col("l_returnflag")),
        Array(col("qty"), col("price"), col("disc")), "measure", "val")
      .orderBy("l_returnflag", "measure")

  /** Full-outer join (beyond reference surface): high-balance customers
    * vs low-balance suppliers per nation — either side may be absent, the
    * coalesced counts keep the row. Small agg-then-join: both sides
    * reduce to ≤ nation-count rows before the join, so the shuffle is
    * trivial no matter the input scale.
    */
  def q26FullOuter(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").filter(col("c_acctbal") > 7500)
      .groupBy(col("c_nationkey").as("nk")).agg(count(lit(1)).as("n_cust"))
    val sup = t(s, dir, "supplier").filter(col("s_acctbal") < 500)
      .groupBy(col("s_nationkey").as("snk")).agg(count(lit(1)).as("n_supp"))
    c.join(sup, col("nk") === col("snk"), "full_outer")
      .select(coalesce(col("nk"), col("snk")).as("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy("nationkey")
  }

  /** Per-group top-k (top-3 orders by value per priority class) via
    * rank-limit: row_number over the group window filtered to ≤ k.
    * Spark rewrites this shape into a WindowGroupLimit — each map task
    * keeps only its local top-k PER GROUP before the shuffle, so the
    * exchange carries ≤ k·groups·tasks rows instead of the whole table
    * (plan-asserted in the spec). The scale answer to "top N per key"
    * that a groupBy+collect_list can never be.
    */
  def q27GroupTopK(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .select("o_orderpriority", "o_orderkey", "o_totalprice")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .orderBy("o_orderpriority", "rk")
  }

  /** Set ops: union/except on projections (SURVEY §2.5 notes the rebuild
    * introduces union for COW rewrite; exposed as a query op too).
    */
  def q14SetOps(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val hi = o.filter(col("o_totalprice") > 200000).select("o_custkey")
    val recent = o.filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp_ntz"))
      .select("o_custkey")
    hi.union(recent).distinct()
      .except(o.filter(col("o_orderstatus") === "F").select("o_custkey").distinct())
      .orderBy("o_custkey")
  }

  /** Two-phase salted aggregation over a HOT-KEY grouping: `events` has
    * only 5 event types, so a plain groupBy lands ~N/5 rows on each of 5
    * final tasks no matter how many executors exist — at 100 TB each task
    * is 20 TB. [[graft.functions.Skew.saltedAggregate]] splits phase one
    * across (type, salt) sub-keys (every task bounded by N/(5·salts)),
    * then combines the ≤ 5·salts partials. Result is identical to the
    * unsalted aggregate (spec + this oracle); the DECIMAL sum makes it
    * order-exact.
    */
  def q28SkewAgg(s: SparkSession, dir: String): DataFrame =
    graft.functions.Skew.saltedAggregate(
        events(s, dir), keys = Seq("event_type"), saltBuckets = 16,
        saltBy = Seq("event_id"))(
      partial = Seq(
        sum(col("value").cast(dec6)).as("_sum_value"),
        count(lit(1)).as("_n")),
      fin = Seq(
        sum(col("_sum_value")).cast("double").as("sum_value"),
        sum(col("_n")).as("n_events")))
    .orderBy("event_type")

  /** Tumbling event-time windows as a BATCH query (the batch analog of
    * [[graft.streaming.EventStreams.windowedCounts]], so the same window
    * semantics sit under the hash gate): 1-hour epoch-aligned buckets per
    * event type. `window()` is a codegen'd projection — the aggregation
    * is an ordinary hash agg on (window, type), map-side combined.
    */
  def q30TumblingWindow(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(dec6)).cast("double").as("sum_value"))
      .select(unix_micros(col("w.start").cast("timestamp")).as("ws_us"),
        col("event_type"), col("n_events"), col("sum_value"))
      .orderBy("ws_us", "event_type")

  /** Salted equi-join on the same hot keys: the big side is salted, the
    * dim replicated saltBuckets×, so one event type's rows fan across 8
    * tasks instead of one. Used when the dim is too large to broadcast
    * but the key histogram is spiky (else broadcast/AQE already wins —
    * documented trade-off in [[graft.functions.Skew]]). Semantically
    * transparent: equals the plain join, which is exactly what the
    * oracle replays.
    */
  def q29SkewJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val dim = ev.select("event_type").distinct()
      .withColumn("type_len", length(col("event_type")))
    graft.functions.Skew.saltedJoin(ev, dim, Seq("event_type"),
        saltBuckets = 8, joinType = "inner", saltBy = Seq("event_id"))
      .groupBy("event_type", "type_len")
      .agg(count(lit(1)).as("n_events"), sum(col("user_id")).as("sum_users"))
      .orderBy("event_type")
  }

  /** Funnel analysis (`q31_funnel`) — the classic product-analytics
    * sequence query: users progressing view → click → purchase in
    * strict timestamp order (earliest-completion semantics: the first
    * view, then the first click AFTER it, then the first purchase
    * after THAT). Conversion per stage in basis points vs stage 1 —
    * integer division, so the whole report hash-matches.
    *
    * Scale shape: three user-keyed aggregations, each joining the
    * (shrinking) previous stage's per-user frame — all hash joins on
    * user_id, co-partitioned after the first shuffle; no windows, no
    * per-user sort. The stage counts are single-row aggregates.
    */
  def q31Funnel(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val v = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("us")).as("v_us"))
    val c = e.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("us") > col("v_us"))
      .groupBy("user_id").agg(min(col("us")).as("c_us"))
    val p = e.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("us") > col("c_us"))
      .groupBy("user_id").agg(min(col("us")).as("p_us"))
    def stage(n: Int, step: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("users"))
        .select(lit(n).as("stage"), lit(step).as("step"), col("users"))
    stage(1, "view", v)
      .unionAll(stage(2, "view>click", c))
      .unionAll(stage(3, "view>click>purchase", p))
      .crossJoin(broadcast(v.agg(count(lit(1)).as("n1"))))
      .select(col("stage"), col("step"), col("users"),
        expr("(users * 10000) DIV nullif(n1, 0)").as("conv_bp"))
      .orderBy("stage")
  }

  /** Cohort retention (`q32_retention`) — the other canonical
    * behavioral-analytics shape: users grouped by first-seen day, then
    * distinct active users per (cohort, day-offset) cell. Integer
    * day arithmetic over the proven UTC date bucketing, so the whole
    * matrix hash-matches.
    *
    * Scale shape: one user-keyed aggregation for the cohort map, one
    * join back (user-co-partitioned), one (cohort, offset) count-
    * distinct whose partial-aggregation dedups (user, cohort, offset)
    * map-side. Cohort keys are dates — bounded cardinality, no skew.
    */
  def q32Retention(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"))
    val first = e.groupBy("user_id").agg(min(col("d")).as("cohort"))
    e.join(first, "user_id")
      .select(date_format(col("cohort"), "yyyyMMdd").as("cohort_day"),
        datediff(col("d"), col("cohort")).as("day_offset"),
        col("user_id"))
      .groupBy("cohort_day", "day_offset")
      .agg(countDistinct(col("user_id")).as("users"))
      .orderBy("cohort_day", "day_offset")
  }

  /** Event transition matrix (`q40_transitions`) — the Markov-chain view
    * of user behavior: for every (event_type → next event_type) pair,
    * how many times a user's event was immediately followed by the
    * other type (per-user timestamp order, event_id tie-break), plus
    * the row-conditional share in integer basis points. This is the
    * path-analysis primitive behind sankey/flow dashboards and behavior
    * anomaly screens (a purchase→purchase spike is a retry storm).
    *
    * Scale shape: ONE shuffle on user_id for the lead() window (the
    * same partitioning sessionize uses — at 100 TB the events table
    * would be bucketed on user_id and even that shuffle disappears),
    * then a groupBy on the (from, to) pair whose cardinality is the
    * square of the event-type vocabulary — tiny, map-side combined.
    * The share denominator is a window over that tiny matrix, not the
    * raw events.
    */
  def q40Transitions(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wu = Window.partitionBy("user_id")
      .orderBy(col("us").asc, col("event_id").asc)
    val wf = Window.partitionBy("from_type")
    events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("next_type", lead(col("event_type"), 1).over(wu))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"),
        col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("share_bp",
        expr("(n * 10000) DIV sum(n) OVER (PARTITION BY from_type)"))
      .orderBy("from_type", "to_type")
  }

  /** Trailing-window distinct users (`q41_sliding_distinct`) — 7-day
    * rolling active users per day, the DAU/WAU dashboard primitive.
    * COUNT(DISTINCT) can't run over a window frame, and the naive
    * self-join is range-quadratic — the scalable form is the FAN-OUT
    * trick: each distinct (user, day) activity row claims the next 7
    * calendar days, then one plain distinct-count per claimed day.
    * Volume is exactly 7× the distinct activity rows — linear, map-side
    * expanded, no range join, no window. Days past the data's end are
    * trimmed; the first 6 days carry partial windows (standard).
    */
  def q41SlidingDistinct(s: SparkSession, dir: String): DataFrame = {
    val dd = events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    val mx = dd.agg(max(col("d")).as("mx"))
    val u7 = dd.withColumn("o", explode(expr("sequence(0, 6)")))
      .select(col("user_id"), date_add(col("d"), col("o")).as("day"))
      .crossJoin(broadcast(mx)).filter(col("day") <= col("mx"))
      .groupBy("day").agg(countDistinct(col("user_id")).as("u7"))
    val u1 = dd.groupBy(col("d").as("day"))
      .agg(count(lit(1)).as("u1"))
    u7.join(u1, Seq("day"), "left")
      .select(date_format(col("day"), "yyyyMMdd").as("day"),
        coalesce(col("u1"), lit(0L)).as("u1"), col("u7"))
      .orderBy("day")
  }

  /** Correlated scalar subquery, decorrelated (`q35_above_own_avg`):
    * orders strictly above their OWN customer's average order value —
    * the canonical "compare each row to its group's aggregate" shape.
    * Expressed as a window (sum/count over the customer partition)
    * instead of a self-join: ONE shuffle on o_custkey total, vs two for
    * the aggregate-then-join decorrelation. The avg compare is done by
    * cross-multiplication in DECIMAL (price × n > sum), so no division
    * ever happens and the predicate is bit-exact in both engines.
    */
  def q35AboveOwnAvg(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey")
    t(s, dir, "orders")
      .withColumn("p", col("o_totalprice").cast(dec))
      .withColumn("sum_p", sum(col("p")).over(w))
      .withColumn("n_orders", count(lit(1)).over(w))
      .filter(col("p") * col("n_orders") > col("sum_p"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("n_orders"))
      .orderBy("o_orderkey")
  }

  /** Equi-width histogram (`q36_histogram`): order values bucketed into
    * 25k-wide bins (top bin open-ended), with count and exact DECIMAL
    * mass per bin. Bin boundaries are computed in integer cents —
    * `floor(price·100)` is bit-identical in Spark and DuckDB, unlike a
    * double divide — then integer-divided, so bucketing never straddles
    * an FP rounding edge. Scale shape: map + groupBy on ≤20 keys with
    * map-side combine; the shuffle carries one row per (partition, bin).
    */
  def q36Histogram(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .withColumn("cents", floor(col("o_totalprice") * lit(100)).cast("long"))
      .withColumn("bucket",
        least(expr("cents DIV 2500000"), lit(19L)).cast("int"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("cnt"),
        sum(col("o_totalprice").cast(dec)).cast("double").as("sum_price"))
      .withColumn("lo", col("bucket").cast("long") * 25000L)
      .select(col("bucket"), col("lo"), col("cnt"), col("sum_price"))
      .orderBy("bucket")

  /** Gaps-and-islands (`q37_streaks`): longest run of CONSECUTIVE active
    * days per user. The classic trick — within a user, epoch-day minus
    * row_number is constant exactly along a consecutive run — turns
    * streak detection into a groupBy, no self-join, no iterative logic.
    * Day arithmetic stays in integers (days since 1970-01-01) on both
    * sides of the gate. Scale shape: distinct on (user, day), then two
    * aggregations and one window all partitioned by user_id — a single
    * hash partitioning reused end-to-end.
    */
  /** Relational division (`q39_division`): customers with orders in
    * EVERY year 1995–2000 — the "for all" quantifier SQL lacks natively,
    * expressed as the standard count-distinct-equals-divisor rewrite
    * (one aggregation) instead of 6 chained semi-joins or a double
    * NOT EXISTS. Scale shape: one groupBy on o_custkey with map-side
    * partial distinct; the divisor (6) is a literal, no second scan.
    */
  def q39Division(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .filter(year(col("o_orderdate")).between(1995, 2000))
      .groupBy("o_custkey")
      .agg(countDistinct(year(col("o_orderdate"))).as("n_years"),
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(dec)).cast("double").as("sum_price"))
      .filter(col("n_years") === 6)
      .select("o_custkey", "n_orders", "sum_price")
      .orderBy("o_custkey")

  /** RANGE-frame window (`q38_range_frame`): per event, the count and
    * exact cents-sum of the SAME USER's events in the trailing 24 hours
    * — a VALUE-based frame (peers at equal timestamps are always all
    * in), which ROWS frames cannot express. Monetary mass accumulates in
    * integer cents (`floor(value·100)` — bit-identical both engines).
    * Scale shape: one shuffle on user_id, per-user local sort; the
    * range frame is evaluated with a sliding pointer, not a rescan.
    */
  def q38RangeFrame(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("us"))
      .rangeBetween(-86400000000L, Window.currentRow)
    events(s, dir)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"),
        floor(col("value") * lit(100)).cast("long").as("cents"))
      .withColumn("trail_cnt", count(lit(1)).over(w))
      .withColumn("trail_cents", sum(col("cents")).over(w))
      .select("event_id", "user_id", "us", "trail_cnt", "trail_cents")
      .orderBy("event_id")
  }

  def q37Streaks(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val days = events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      .withColumn("ed", datediff(col("d"), lit("1970-01-01").cast("date")))
    val w = Window.partitionBy("user_id").orderBy("ed")
    days.withColumn("grp", col("ed") - row_number().over(w))
      .groupBy("user_id", "grp").agg(count(lit(1)).as("len"))
      .groupBy("user_id")
      .agg(max(col("len")).as("longest_streak"),
        sum(col("len")).as("n_active_days"),
        count(lit(1)).as("n_streaks"))
      .orderBy("user_id")
  }
}
