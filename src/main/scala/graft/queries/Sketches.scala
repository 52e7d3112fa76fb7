package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Distributed sketches with PORTABLE arithmetic — every hash is plain
  * ANSI integer math (multiplicative scrambles mod a sub-2^30 prime,
  * xor-shift mixing between rounds), so any engine reproduces the sketch
  * bit-for-bit and the queries sit under the DuckDB hash gate like exact
  * queries do.
  *
  * Why sketches are first-class at 100 TB: exact `count(distinct)` and
  * exact per-item counts shuffle every distinct value; these compute a
  * few KB of state per partition (buckets / counters), combine with
  * map-side partial aggregation, and answer in one pass — the standard
  * cardinality / frequency tools of a corpus-scale pipeline.
  */
object Sketches {

  /** Sub-2^30 prime modulus (fits every intermediate product in a signed
    * 64-bit long under ANSI arithmetic: operands < 2^30 × 2^32).
    */
  private val P = 1073741789L

  /** Knuth/xxhash multiplicative constants (public domain folklore). */
  private val A1 = 2654435761L
  private val A2 = 2246822519L

  private def mix(v: Column, mult: Long, shift: Int): Column = {
    val m = (v * lit(mult)) % lit(P)
    m.bitwiseXOR(shiftright(m, shift))
  }

  /** 30-bit portable hash of an integral column: two multiplicative
    * rounds with xor-shift mixing in between. The nonlinearity matters —
    * two purely multiplicative lanes are a bijection of each other, and
    * HLL's bucket/rank split then loses the independence its estimator
    * assumes (measured: −21% bias on sequential keys, vs ~1% with the
    * mix).
    */
  private def hash30(v: Column): Column =
    (mix(v % lit(P), A1, 13) * lit(A2)) % lit(P)

  private val Buckets = 256 // p=8: std err 1.04/√256 ≈ 6.5%
  /** alpha_256 · m² · 2^31 — the raw-HLL numerator for 30-bit ranks,
    * written as an explicit product (both engines fold the same IEEE
    * multiply chain, so the estimate is bit-identical).
    */
  private def hllNumerator: Column =
    lit(0.7182725932) * lit(65536) * lit(2147483648L)

  /** (bucket, rho) columns of the portable HLL for `value` — the shared
    * hash pipeline for sketch consumers outside this file (the
    * [[Profile]] sketch profiler groups them under its own keys). Null
    * values propagate to a null bucket/rho, which callers treat as the
    * "null" group (count_distinct semantics exclude them).
    */
  private[queries] def bucketAndRho(value: Column): (Column, Column) = {
    val g = hash30(value)
    val g2 = (g.bitwiseXOR(shiftright(g, 11)) * lit(A1)) % lit(P)
    // rank via an integer comparison chain — value-identical to the
    // `31 - length(bin(g2))` form the standalone HLL queries (and the
    // oracles) use, but without allocating a binary STRING per input
    // row, which dominates when the profiler fans each row out to
    // `cols` hash lanes
    val rho = (29 to 0 by -1).foldLeft(when(g2 === 0, 31)) {
      (acc, b) => acc.when(g2 >= (1L << b), 30 - b)
    }
    ((g % lit(Buckets)).as("bucket"), rho.as("rho"))
  }

  private[queries] def numBuckets: Int = Buckets
  private[queries] def rawNumerator: Column = hllNumerator
  private[queries] val Pow31 = 2147483648L

  /** The HLL sketch of `value` over `in`: per-bucket max rank,
    * `(bucket, m)` with at most [[Buckets]] rows. This IS the mergeable
    * state — union sketches and re-max per bucket to sketch the union
    * of their inputs (what per-partition partial aggregation does
    * inside one query, and what a streaming/pre-aggregated pipeline
    * does across batches; spec-asserted in ExtensionSpec).
    */
  def hllBuckets(in: DataFrame, value: Column): DataFrame = {
    val g = hash30(value)
    val g2 = (g.bitwiseXOR(shiftright(g, 11)) * lit(A1)) % lit(P)
    in.select((g % lit(Buckets)).as("bucket"),
      when(g2 === 0, 31).otherwise(lit(31) - length(bin(g2))).as("rho"))
      .groupBy("bucket").agg(max(col("rho")).as("m"))
  }

  /** Merge sketches (max per bucket) and evaluate the raw-HLL estimate. */
  def hllEstimate(s: SparkSession, sketches: DataFrame*): DataFrame = {
    val mx = sketches.reduce(_ unionAll _)
      .groupBy("bucket").agg(max(col("m")).as("m"))
    val full = s.range(Buckets).select(col("id").as("bucket"))
      .join(mx, Seq("bucket"), "left")
      .select(coalesce(col("m"), lit(0)).as("m"))
    full.agg(
      sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(31 - m AS INT))")).as("sum_pow"),
      sum(when(col("m") === 0, 1L).otherwise(0L)).as("zero_buckets"))
      .select(lit(Buckets.toLong).as("n_buckets"), col("sum_pow"),
        col("zero_buckets"),
        (hllNumerator / col("sum_pow").cast("double")).as("est_distinct"))
  }

  /** HyperLogLog distinct-orderkey estimate over `lineitem` — raw HLL
    * (Flajolet et al. 2007) with m=256 buckets and 30-bit rank lanes.
    * One pass + a 256-row aggregate; the oracle replays the identical
    * arithmetic in SQL. The per-bucket max combines map-side, so the
    * shuffle carries at most m rows per partition regardless of input
    * size. No low-range correction on purpose: it needs `ln`, which is
    * not bit-portable across engines; the raw estimator is valid here
    * (n ≫ 2.5m at both gate SFs, spec-asserted ≤ a few % off).
    */
  def hllDistinct(s: SparkSession, dir: String): DataFrame =
    hllEstimate(s,
      hllBuckets(Relational.t(s, dir, "lineitem"), col("l_orderkey")))

  /** Grouped HLL: distinct customers per order year — the reporting
    * shape (one sketch per group key, all groups in one pass). Group
    * state is ≤ m rows per group; the full-bucket completion is a
    * groups × m frame, trivial next to the scan. Raw estimator regime
    * holds per GROUP here (each year ≫ 2.5 m distinct customers at the
    * gate SFs).
    */
  def hllGroups(s: SparkSession, dir: String): DataFrame = {
    val orders = Relational.t(s, dir, "orders")
    val g = hash30(col("o_custkey"))
    val g2 = (g.bitwiseXOR(shiftright(g, 11)) * lit(A1)) % lit(P)
    val mx = orders.select(year(col("o_orderdate")).cast("long").as("order_year"),
        (g % lit(Buckets)).as("bucket"),
        when(g2 === 0, 31).otherwise(lit(31) - length(bin(g2))).as("rho"))
      .groupBy("order_year", "bucket").agg(max(col("rho")).as("m"))
    val years = mx.select("order_year").distinct()
    val full = years
      .crossJoin(s.range(Buckets).select(col("id").as("bucket")))
      .join(mx, Seq("order_year", "bucket"), "left")
      .select(col("order_year"), coalesce(col("m"), lit(0)).as("m"))
    full.groupBy("order_year").agg(
      sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(31 - m AS INT))")).as("sum_pow"),
      sum(when(col("m") === 0, 1L).otherwise(0L)).as("zero_buckets"))
      .select(col("order_year"), col("sum_pow"), col("zero_buckets"),
        (hllNumerator / col("sum_pow").cast("double")).as("est_distinct"))
      .orderBy("order_year")
  }

  /** HLL set algebra: estimated overlap of two customer sets (orders
    * before/since 1998) by inclusion–exclusion — |A∩B| ≈ est(A) +
    * est(B) − est(A∪B), where est(A∪B) is the merged sketch (max per
    * bucket), NOT a rescan of A∪B. This is how sketch stores answer
    * audience-overlap / cross-snapshot-churn questions at 100 TB: three
    * m-row states, no join of the underlying sets. Intersection error
    * compounds (sum of three estimators' errors — fine for large
    * overlaps, noisy for tiny ones); the spec pins the quality, the
    * oracle the arithmetic.
    */
  def hllOverlap(s: SparkSession, dir: String): DataFrame = {
    val orders = Relational.t(s, dir, "orders")
    val a = hllBuckets(orders.filter(year(col("o_orderdate")) < 1998),
      col("o_custkey"))
    val b = hllBuckets(orders.filter(year(col("o_orderdate")) >= 1998),
      col("o_custkey"))
    val estA = hllEstimate(s, a).select(col("est_distinct").as("est_a"))
    val estB = hllEstimate(s, b).select(col("est_distinct").as("est_b"))
    val estU = hllEstimate(s, a, b).select(col("est_distinct").as("est_union"))
    estA.crossJoin(estB).crossJoin(estU)
      .select(col("est_a"), col("est_b"), col("est_union"),
        (col("est_a") + col("est_b") - col("est_union")).as("est_intersect"))
  }

  /** HDR-histogram quantile sketch over `orders.o_totalprice` (in integer
    * cents): log-scaled buckets with 16 linear sub-buckets per power of
    * two — bucket id and lower bound are PURE INTEGER arithmetic
    * (bit-length + shifts), so the sketch replays bit-for-bit in the SQL
    * oracle, unlike log-based DDSketch buckets whose `ln` is not
    * bit-portable. Relative error ≤ 1/16 per estimate (sub-bucket width /
    * lower bound; spec-asserted against exact quantiles).
    *
    * Why this is the 100 TB quantile path: exact percentiles sort (or at
    * best single-aggregate) EVERY value through one reducer;  this is a
    * groupBy over ≤ ~16·64 buckets — per-partition partial histograms
    * combine map-side, the merged sketch is a few hundred rows, and the
    * cumulative-sum quantile extraction is driver-trivial. The histogram
    * is also the mergeable state: union per-split sketches and re-sum per
    * bucket (same contract as [[hllBuckets]]; spec-asserted).
    *
    * Domain: NON-NEGATIVE integers (prices/latencies/counts in their
    * smallest unit). Negative inputs would read `bin()`'s 64-bit two's
    * complement, which is not portable across engines.
    */
  def hdrHistogram(in: DataFrame, cents: Column): DataFrame =
    in.select(cents.as("v"))
      .withColumn("bl", length(bin(col("v"))))
      .select(
        when(col("bl") <= 5, col("v"))
          .otherwise((col("bl") - lit(6)).cast("long") * 16 +
            (expr("shiftright(v, bl - 5)") - 16) + 32).as("idx"),
        when(col("bl") <= 5, col("v"))
          .otherwise(expr("shiftleft(shiftright(v, bl - 5), bl - 5)"))
          .as("lo"))
      .groupBy("idx", "lo").agg(count(lit(1)).as("cnt"))

  /** Evaluate p50/p90/p99 from a (possibly merged) HDR histogram: each
    * estimate is the lower bound of the first bucket whose cumulative
    * count reaches ceil(q·n) — all-integer rank arithmetic, no FP. The
    * rank window runs over the few-hundred-row sketch, not the data.
    */
  def hdrQuantiles(histograms: DataFrame*): DataFrame = {
    val hist = histograms.reduce(_ unionAll _)
      .groupBy("idx", "lo").agg(sum(col("cnt")).as("cnt"))
    val cum = hist.withColumn("cum",
      sum("cnt").over(Window.orderBy("idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = hist.agg(sum(col("cnt")).as("n"),
      count(lit(1)).as("n_buckets"))
    cum.crossJoin(tot).agg(
      max(col("n")).as("n_rows"),
      max(col("n_buckets")).as("n_buckets"),
      min(when(col("cum") >= expr("(n + 1) DIV 2"), col("lo")))
        .as("p50_cents"),
      min(when(col("cum") >= expr("(9 * n + 9) DIV 10"), col("lo")))
        .as("p90_cents"),
      min(when(col("cum") >= expr("(99 * n + 99) DIV 100"), col("lo")))
        .as("p99_cents"))
  }

  /** Order-value quantiles via the HDR sketch (one pass, one row out). */
  def hdrOrderQuantiles(s: SparkSession, dir: String): DataFrame =
    hdrQuantiles(hdrHistogram(Relational.t(s, dir, "orders"),
      round(col("o_totalprice") * 100).cast("long")))

  /** Grouped HDR quantiles: order-value p50/p90/p99 per priority class —
    * the reporting shape (one histogram per group, all groups in one
    * pass). Group state is ≤ the bucket count per group; the rank
    * windows partition BY GROUP, so extraction scales with groups, not
    * data.
    */
  def hdrGroupQuantiles(s: SparkSession, dir: String): DataFrame = {
    val hist = Relational.t(s, dir, "orders")
      .select(col("o_orderpriority"),
        round(col("o_totalprice") * 100).cast("long").as("v"))
      .withColumn("bl", length(bin(col("v"))))
      .select(col("o_orderpriority"),
        when(col("bl") <= 5, col("v"))
          .otherwise((col("bl") - lit(6)).cast("long") * 16 +
            (expr("shiftright(v, bl - 5)") - 16) + 32).as("idx"),
        when(col("bl") <= 5, col("v"))
          .otherwise(expr("shiftleft(shiftright(v, bl - 5), bl - 5)"))
          .as("lo"))
      .groupBy("o_orderpriority", "idx", "lo").agg(count(lit(1)).as("cnt"))
    val byGrp = Window.partitionBy("o_orderpriority")
    val cum = hist
      .withColumn("cum", sum("cnt").over(byGrp.orderBy("idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum("cnt").over(byGrp))
    cum.groupBy("o_orderpriority").agg(
      max(col("n")).as("n_rows"),
      min(when(col("cum") >= expr("(n + 1) DIV 2"), col("lo")))
        .as("p50_cents"),
      min(when(col("cum") >= expr("(9 * n + 9) DIV 10"), col("lo")))
        .as("p90_cents"),
      min(when(col("cum") >= expr("(99 * n + 99) DIV 100"), col("lo")))
        .as("p99_cents"))
      .orderBy("o_orderpriority")
  }

  private val CmDepth = 4
  private val CmWidth = 512
  /** Per-row multipliers of the count-min hash family (xxhash/Murmur
    * public constants; any four odd constants work).
    */
  private val CmMults = Seq(2246822519L, 3266489917L, 668265263L, 374761393L)

  /** Count-min heavy hitters over `events.user_id`: a depth-4 × width-512
    * counter sketch built in ONE distributed pass (explode 4 rows per
    * event, partial-combined groupBy — the sketch state is 2048 counters
    * no matter the input size), then the exact top-10 items read their
    * estimate as min over their 4 cells. Output carries exact and
    * estimated counts side by side; CM never underestimates, and with
    * n_items ≪ width the overestimate is usually zero (both properties
    * spec-asserted). At 100 TB the exact top-k side would itself be
    * sketched (space-saving); here it doubles as the oracle of the
    * estimate's quality.
    */
  def cmHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    val events = Relational.t(s, dir, "events")
    val base = hash30(col("user_id"))
    val cells = array(CmMults.zipWithIndex.map { case (a, _) =>
      (base * lit(a)) % lit(P) % lit(CmWidth)
    }: _*)
    val sketch = events
      .select(posexplode(cells).as(Seq("j", "bucket")))
      .groupBy("j", "bucket").agg(count(lit(1)).as("cnt"))
    val top = events.groupBy("user_id").agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("user_id")).limit(10)
    val probes = top.select(col("user_id"), col("exact_cnt"),
      posexplode(array(CmMults.map(a =>
        (hash30(col("user_id")) * lit(a)) % lit(P) % lit(CmWidth)): _*))
        .as(Seq("j", "bucket")))
    probes.join(sketch, Seq("j", "bucket"))
      .groupBy("user_id", "exact_cnt")
      .agg(min(col("cnt")).as("cm_est"))
      .orderBy(col("exact_cnt").desc, col("user_id"))
  }

  /** K-minimum-values sketch set algebra (`stats_kmv_setops`) — the
    * set-difference estimator HLL cannot give. An HLL union is exact
    * sketch algebra but its intersection/difference is
    * inclusion–exclusion over THREE estimates whose errors add
    * ([[hllOverlap]]); a KMV sketch (Bar-Yossef et al. 2002 / the theta
    * sketch's core) instead keeps the k SMALLEST hash values — a
    * uniform sample of the distinct elements — so the bottom-k of a
    * sketch union is a sample of A∪B in which membership of each
    * sampled value in A and in B is EXACT (any hash ≤ θ, the union's
    * k-th minimum, that lives in a set must appear among that set's k
    * smallest). Estimates: |A∪B| ≈ (n−1)·H/θ for hash space H, and
    * each region (both / A-only / B-only) scales the union estimate by
    * its exact sample fraction.
    *
    * Shape at 100 TB: each sketch is ONE scan → distinct hash →
    * `orderBy.limit(k)`, which plans as TakeOrderedAndProject
    * (per-partition partial bottom-k, merged on the driver — k values
    * per partition cross the wire, never data). The set algebra then
    * runs entirely on ≤k-row frames, checkpointed so the scans never
    * re-run. Same A/B split as [[hllOverlap]] (customers ordering
    * before vs since 1998), so the two sketches' answers are directly
    * comparable. All hash arithmetic is the portable 30-bit family; the
    * estimates are single IEEE divisions of exact integers, so the
    * oracle replays everything bit-for-bit.
    */
  def kmvSetOps(s: SparkSession, dir: String): DataFrame = {
    val K = 256
    val orders = Relational.t(s, dir, "orders")
    def sketch(in: DataFrame): DataFrame =
      in.select(hash30(col("o_custkey")).as("h"))
        .distinct().orderBy("h").limit(K)
        .localCheckpoint() // ≤k rows; referenced twice below
    val a = sketch(orders.filter(year(col("o_orderdate")) < 1998))
    val b = sketch(orders.filter(year(col("o_orderdate")) >= 1998))
    val u = a.unionAll(b).distinct().orderBy("h").limit(K)
    val mem = u
      .join(broadcast(a.withColumn("in_a", lit(1L))), Seq("h"), "left")
      .join(broadcast(b.withColumn("in_b", lit(1L))), Seq("h"), "left")
    val cnts = mem.agg(
      max(col("h")).as("theta"),
      count(lit(1)).as("n_union"),
      sum(when(col("in_a").isNotNull && col("in_b").isNotNull, 1L)
        .otherwise(0L)).as("n_both"),
      sum(when(col("in_a").isNotNull && col("in_b").isNull, 1L)
        .otherwise(0L)).as("n_a_only"),
      sum(when(col("in_a").isNull && col("in_b").isNotNull, 1L)
        .otherwise(0L)).as("n_b_only"))
    // unfull sketch ⇒ the sample IS the whole set: return exact counts
    // (the standard KMV rule); estimate only once k values overflowed
    val estU = when(col("n_union") < K, col("n_union").cast("double"))
      .otherwise((col("n_union") - 1).cast("double") * lit(P.toDouble) /
        col("theta").cast("double"))
    cnts.select(col("theta"), col("n_union"), col("n_both"),
        col("n_a_only"), col("n_b_only"), estU.as("est_union"))
      .select(col("*"),
        (col("n_both").cast("double") * col("est_union") /
          col("n_union").cast("double")).as("est_intersect"),
        (col("n_a_only").cast("double") * col("est_union") /
          col("n_union").cast("double")).as("est_a_only"),
        (col("n_b_only").cast("double") * col("est_union") /
          col("n_union").cast("double")).as("est_b_only"))
  }
}
