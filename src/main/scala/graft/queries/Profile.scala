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
    *
    * COST NOTE: the 7 exact `count_distinct`s plan as ONE Expand-heavy
    * scan — shuffle input multiplies by the profiled column count, the
    * price of exactness (the bench's 2nd-slowest query). This is the
    * gate-exact twin; at corpus scale use
    * [[statsProfileSketch]] (`stats_profile_sketch`), whose HLL
    * partials bound the shuffle at cols × 257 rows per partition
    * regardless of input size.
    */
  def statsProfile(s: SparkSession, dir: String): DataFrame =
    profile(Relational.tFan(s, dir, "lineitem"), Seq(
      ColSpec("l_orderkey", Some(col("l_orderkey").cast("double"))),
      ColSpec("l_quantity", Some(col("l_quantity").cast("double"))),
      ColSpec("l_extendedprice", Some(col("l_extendedprice").cast("double"))),
      ColSpec("l_discount", Some(col("l_discount").cast("double"))),
      ColSpec("l_shipdate",
        Some(unix_micros(col("l_shipdate").cast("timestamp")).cast("double"))),
      ColSpec("l_returnflag", None),
      ColSpec("l_linestatus", None)))

  /** `stats_profile_sketch`: the CORPUS-SCALE profile — the production
    * twin of [[statsProfile]] (`stats_profile`): cardinalities
    * come from the portable raw HLL ([[Sketches]], m=256) instead of
    * exact `count_distinct`'s Expand, which multiplies shuffle input by
    * the profiled column count. Shape: ONE scan unpivots each row to
    * (col_name, iv, num) — iv the column's portable integer projection
    * (integral columns as-is; doubles round-half-up at 2 decimals;
    * timestamps as epoch micros; strings via the fingerprint token
    * arithmetic) — then a two-level aggregation: (col_name, bucket)
    * partials combine map-side, so the shuffle carries at most
    * cols × (m + 1) rows per partition REGARDLESS of input size; the
    * per-column finish folds bucket maxima into the raw-HLL estimate
    * (missing buckets contribute 2^31 to the power sum algebraically —
    * no bucket-completion join) alongside exact nulls/min/max, which
    * ride the same partials. est_distinct estimates the NON-NULL values
    * (count_distinct semantics). Every step is portable integer/IEEE
    * arithmetic, so the whole profile sits under the DuckDB hash gate.
    */
  def statsProfileSketch(s: SparkSession, dir: String): DataFrame = {
    val df = Relational.tFan(s, dir, "lineitem")
    def strTok(c: Column): Column =
      length(c) * lit(31L) + ascii(c) * lit(7L) + ascii(reverse(c)) * lit(13L)
    def d2(c: Column): Column = floor(c * lit(100.0) + lit(0.5)).cast("long")
    val nullD = lit(null).cast("double")
    val us = unix_micros(col("l_shipdate").cast("timestamp"))
    val specs: Seq[(String, Column, Column)] = Seq(
      ("l_orderkey", col("l_orderkey"), col("l_orderkey").cast("double")),
      ("l_quantity", d2(col("l_quantity")), col("l_quantity")),
      ("l_extendedprice", d2(col("l_extendedprice")), col("l_extendedprice")),
      ("l_discount", d2(col("l_discount")), col("l_discount")),
      ("l_shipdate", us, us.cast("double")),
      ("l_returnflag", strTok(col("l_returnflag")), nullD),
      ("l_linestatus", strTok(col("l_linestatus")), nullD))
    val rows = array(specs.map { case (n, iv, num) =>
      struct(lit(n).as("col_name"), iv.cast("long").as("iv"), num.as("num"))
    }: _*)
    val (bucket, rho) = Sketches.bucketAndRho(col("iv"))
    val up = df.select(inline(rows))
      .select(col("col_name"), col("num"), bucket, rho)
    val partial = up.groupBy("col_name", "bucket").agg(
      count(lit(1)).as("cnt"),
      min(col("num")).as("mn"), max(col("num")).as("mx"),
      max(col("rho")).as("m"))
    partial.groupBy("col_name").agg(
      sum(col("cnt")).as("n_rows"),
      sum(when(col("bucket").isNull, col("cnt")).otherwise(0L)).as("n_null"),
      (sum(when(col("bucket").isNotNull,
          expr("shiftleft(CAST(1 AS BIGINT), CAST(31 - m AS INT))"))
        .otherwise(0L)) +
        (lit(Sketches.numBuckets.toLong) -
          count(when(col("bucket").isNotNull, 1))) * lit(Sketches.Pow31))
        .as("sum_pow"),
      min(col("mn")).as("min_num"), max(col("mx")).as("max_num"))
      .select(col("col_name"), col("n_rows"), col("n_null"),
        (Sketches.rawNumerator / col("sum_pow").cast("double"))
          .as("est_distinct"),
        col("min_num"), col("max_num"))
      .orderBy("col_name")
  }

  /** Two-sample Kolmogorov–Smirnov drift test (`stats_ks_drift`) — the
    * distribution-level "did this numeric column move between two
    * snapshots" check (the scalar twin of the per-cell embedding
    * drift): snapshots are the doc-id halves (two crawls / two dated
    * partitions in production), the statistic is
    * `max_x |n2·F1(x) − n1·F2(x)|` over observed values — the KS sup
    * with both empirical CDFs CROSS-MULTIPLIED so the comparison is
    * pure integer (the corpus-drift trick: no divisions, no floats) —
    * and the output is the top-[[KsTopK]] divergence points with their
    * cumulative counts, so the report hash-matches and downstream can
    * compute D = d_num/(n1·n2) at any precision it likes.
    *
    * Scale shape: one groupBy on the value (distinct-value-bounded
    * frame, map-side combined), one running-sum window over that SMALL
    * frame (the HDR-quantile-extraction precedent — never a window
    * over the raw rows), top-k by rank.
    */
  val KsTopK = 10

  def ksDrift(s: SparkSession, dir: String, topk: Int = KsTopK): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = Relational.t(s, dir, "documents")
      .select(col("doc_id"), col("n_chars"))
    val maxId = d.agg(max(col("doc_id"))).head().getLong(0)
    val split = (maxId + 1L) / 2L
    val counts = d
      .select(col("n_chars").as("x"),
        (col("doc_id") >= split).cast("int").as("half"))
      .groupBy("x")
      .agg(sum(when(col("half") === 0, 1L).otherwise(0L)).as("c1"),
        sum(when(col("half") === 1, 1L).otherwise(0L)).as("c2"))
    val wc = Window.orderBy(col("x").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = counts.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
    val scored = counts
      .withColumn("f1", sum(col("c1")).over(wc))
      .withColumn("f2", sum(col("c2")).over(wc))
      .crossJoin(broadcast(tot))
      .select(col("x"), col("f1"), col("f2"), col("n1"), col("n2"),
        abs(col("n2") * col("f1") - col("n1") * col("f2")).as("d_num"))
    scored
      .withColumn("rk", row_number().over(
        Window.orderBy(col("d_num").desc, col("x").asc)))
      .filter(col("rk") <= topk)
      .select("x", "f1", "f2", "d_num", "rk", "n1", "n2")
      .orderBy("rk")
  }

  /** Source-concentration Gini (`stats_gini`) — "is this language's
    * corpus dominated by a handful of sources?" is a standard curation
    * health check (a lang whose mass is one crawl source is a
    * deduplication and bias risk). Per language: character mass per
    * source, ranked ascending, and the Gini coefficient from the exact
    * rank-weighted form G = (2·Σi·xᵢ − (n+1)·Σx) / (n·Σx) — computed
    * entirely in BIGINT basis points (numerator is ≥ 0 under ascending
    * rank, so truncating DIV matches DuckDB's floor //), never a float.
    *
    * Scale shape: one groupBy on (lang, source) with map-side combine,
    * then a rank window PARTITIONED by lang over the tiny per-source
    * frame — never over raw rows.
    */
  def statsGini(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val mass = Relational.t(s, dir, "documents")
      .groupBy("lang", "source")
      .agg(sum(col("n_chars")).as("x"))
    val w = Window.partitionBy("lang").orderBy(col("x").asc, col("source").asc)
    mass.withColumn("i", row_number().over(w).cast("long"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_sources"),
        sum(col("x")).as("total_mass"),
        sum(col("i") * col("x")).as("iws"))
      .select(col("lang"), col("n_sources"), col("total_mass"),
        expr("(10000 * (2 * iws - (n_sources + 1) * total_mass)) DIV " +
          "(n_sources * total_mass)").as("gini_bp"))
      .orderBy("lang")
  }

  /** Vocabulary-growth curve (`stats_heaps`) — Heaps'-law measurement:
    * distinct token types and total token instances at every
    * 100-document checkpoint, in one pass. The sub-linear growth of
    * types vs tokens is what sizes vocabulary-dependent state (BPE
    * vocab, count tables, dedup shingle frames) before a full-corpus
    * run. No per-checkpoint rescan: a token contributes one "new type"
    * at the bucket of its FIRST document, so the curve is two bucket
    * aggregations plus running sums over the tiny bucket frame.
    *
    * Scale shape: explode → groupBy token (min doc) and groupBy bucket,
    * both map-side combined; the windows run over ≤ #buckets rows.
    */
  def statsHeaps(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = Relational.t(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
    val newTypes = toks.groupBy("tok").agg(min(col("doc_id")).as("fd"))
      .select((expr("fd DIV 100") + 1).as("b"))
      .groupBy("b").agg(count(lit(1)).as("new_types"))
    val inst = toks.select((expr("doc_id DIV 100") + 1).as("b"))
      .groupBy("b").agg(count(lit(1)).as("toks"))
    val wb = Window.orderBy(col("b").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    inst.join(newTypes, Seq("b"), "left")
      .withColumn("vocab",
        sum(coalesce(col("new_types"), lit(0L))).over(wb))
      .withColumn("total_tokens", sum(col("toks")).over(wb))
      .select((col("b") * 100L).as("checkpoint_docs"),
        col("vocab"), col("total_tokens"))
      .orderBy("checkpoint_docs")
  }

  /** Content checksum per source (`stats_checksum`) — the migration /
    * replication validation primitive: "does the copy hold exactly the
    * rows the original does, without comparing row-by-row?". Per-doc
    * content hash (md5 prefix as a 60-bit int), folded per source with
    * ORDER-INDEPENDENT aggregates (count, XOR, min, max), so two
    * engines — or two clusters — can each compute their side with any
    * partitioning and compare five numbers per source. XOR instead of
    * SUM keeps the fold overflow-free at any corpus size (ANSI mode
    * faults a long SUM overflow). Map-side combined groupBy; one
    * shuffle of #sources rows.
    */
  def statsChecksum(s: SparkSession, dir: String): DataFrame =
    Relational.t(s, dir, "documents")
      .select(col("source"),
        conv(substring(md5(col("text")), 1, 15), 16, 10)
          .cast("long").as("h"))
      .groupBy("source")
      .agg(count(lit(1)).as("cnt"),
        expr("bit_xor(h)").as("xor_h"),
        min(col("h")).as("min_h"),
        max(col("h")).as("max_h"))
      .orderBy("source")

  /** Key-skew diagnostic — the report you run BEFORE a groupBy/join on a
    * key to size the salt factor ([[graft.functions.Skew]]'s knob): the
    * 10 hottest keys by row count, each with its integer share of the
    * table and a `hot` flag at 2× the mean key load (cross-multiplied —
    * no division). The per-key count is one map-side-combined aggregate;
    * the top-10 cut is TakeOrdered (per-partition partial top-k, no full
    * sort), and the rank window runs over 10 rows. Everything after the
    * first aggregate is constant-size regardless of table size.
    */
  def keySkew(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = Relational.events(s, dir)
      .groupBy("user_id").agg(count(lit(1)).as("cnt"))
    val tot = counts.agg(sum("cnt").as("total"),
      count(lit(1)).as("n_keys"))
    val top = counts.crossJoin(broadcast(tot))
      .orderBy(col("cnt").desc, col("user_id").asc).limit(10)
    top.withColumn("rk",
        row_number().over(Window.orderBy(col("cnt").desc, col("user_id").asc)))
      .select(col("rk"), col("user_id"), col("cnt"),
        expr("(cnt * 10000) DIV total").as("share_bp"),
        (col("cnt") * col("n_keys") > col("total") * 2L).cast("int").as("hot"))
      .orderBy("rk")
  }

  /** First-significant-digit audit (`stats_benford`) — the classic
    * fabricated/corrupted-numeric screen: organically-grown magnitudes
    * follow Benford's law (P(d) = log10(1 + 1/d)); a generator bug, a
    * unit mix-up, or synthetic padding shows up as a digit histogram
    * far from the curve. Values go through the proven cents projection
    * (floor(x·100 + 0.5) — bit-identical double arithmetic in both
    * engines), the leading digit is the first character of the BIGINT's
    * decimal rendering, and both the observed share and the Benford
    * expectation are integer basis points, so the whole report
    * hash-matches. Expected bp are floor(log10(1+1/d)·10⁴) literals —
    * no floating log in either engine.
    *
    * Scale shape: one scan, a 9-group map-side-combined aggregate, and
    * a window over ≤ 9 rows. Nothing grows with the table.
    */
  def statsBenford(s: SparkSession, dir: String): DataFrame = {
    val benford = Seq(3010, 1760, 1249, 969, 791, 669, 579, 511, 457)
    Relational.t(s, dir, "lineitem")
      .select(expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)")
        .as("price_c"))
      // Strictly-positive guard BEFORE digit extraction: a negative or
      // zero money value would render a '-'/'0' first character, which
      // Spark's lenient int cast nulls-and-drops while DuckDB's strict
      // CAST raises — an engine-asymmetric divergence. Benford's law is
      // only defined over positive magnitudes anyway.
      .filter(col("price_c") > 0)
      .select(substring(col("price_c").cast("string"), 1, 1)
        .cast("int").as("digit"))
      .filter(col("digit").between(1, 9))
      .groupBy("digit").agg(count(lit(1)).as("n"))
      .withColumn("share_bp",
        expr("(n * 10000) DIV sum(n) OVER ()"))
      .withColumn("benford_bp",
        element_at(array(benford.map(lit(_)): _*), col("digit")).cast("long"))
      .withColumn("dev_bp", abs(col("share_bp") - col("benford_bp")))
      .orderBy("digit")
  }

  /** Lower median of a long column via value-grouped cumulative counts —
    * the scale-correct exact median: the window runs over DISTINCT
    * values (bounded by the value domain, not the row count), never a
    * global row sort. Returns a 1-row frame named `out`.
    */
  private def lowerMedianOf(df: DataFrame, c: String, out: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col(c).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.groupBy(c).agg(count(lit(1)).as("_n"))
      .withColumn("_cum", sum(col("_n")).over(w))
      .crossJoin(broadcast(df.agg(count(lit(1)).as("_t"))))
      .filter(col("_cum") >= expr("(_t + 1) DIV 2"))
      .agg(min(col(c)).as(out))
  }

  /** Robust outlier screen (`stats_mad_outliers`) — median absolute
    * deviation, the data-quality screen that survives the very outliers
    * it hunts (mean/stddev get dragged; medians don't): med = lower
    * median of the cents projection, MAD = lower median of |x − med|,
    * flag at dev > 3·MAD, report the top-20 by deviation. All integer
    * (cents, lower medians, integer comparisons), so the whole report
    * hash-matches.
    *
    * Scale shape: both medians run over value-GROUPED counts (windows
    * bounded by distinct values, map-side-combined groupBys — never a
    * global row sort); the top-20 cut is orderBy+limit = TakeOrdered
    * (per-partition partial top-k); the rank window runs over 20 rows.
    */
  def statsMadOutliers(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = Relational.t(s, dir, "orders").select(col("o_orderkey"),
      expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"))
    val med = lowerMedianOf(v, "cents", "med")
    val dev = v.crossJoin(broadcast(med))
      .withColumn("dev", abs(col("cents") - col("med")))
    val mad = lowerMedianOf(dev.select("dev"), "dev", "mad")
    val top = dev.crossJoin(broadcast(mad))
      .orderBy(col("dev").desc, col("o_orderkey").asc).limit(20)
    top.withColumn("rk", row_number().over(
        Window.orderBy(col("dev").desc, col("o_orderkey").asc)))
      .select(col("rk"), col("o_orderkey"), col("cents"), col("dev"),
        col("med"), col("mad"),
        (col("dev") > col("mad") * 3L).cast("int").as("is_outlier"))
      .orderBy("rk")
  }

  /** Event-rate burst detection (`stats_rate_spike`) — the time-series
    * anomaly screen over an ingest stream: hourly event counts per type,
    * each hour compared to its own type's TRAILING 24-hour baseline
    * (rows between 24 preceding and 1 preceding — never peeking at
    * itself), flagged when count · baseline_hours > 3 · baseline_sum
    * (cross-multiplied "rate > 3× trailing mean" — no division). Hours
    * with < 6 baseline hours are unflagged (cold start). All integer,
    * so the whole report hash-matches.
    *
    * Scale shape: the raw scan collapses to (type, hour) counts in ONE
    * map-side-combined aggregate; the window runs over the tiny
    * per-type hourly frame (8760 rows per type-year), not the events.
    */
  def rateSpike(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourly = Relational.events(s, dir)
      .select(col("event_type"),
        expr("unix_micros(ts) DIV 3600000000").as("hr"))
      .groupBy("event_type", "hr").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("event_type").orderBy(col("hr").asc)
      .rowsBetween(-24, -1)
    hourly
      .withColumn("base_hours", count(lit(1)).over(w))
      .withColumn("base_sum", coalesce(sum(col("cnt")).over(w), lit(0L)))
      .withColumn("is_spike",
        (col("base_hours") >= 6 &&
          col("cnt") * col("base_hours") > col("base_sum") * 3L).cast("int"))
      .select(col("event_type"), col("hr"), col("cnt"),
        col("base_hours"), col("base_sum"), col("is_spike"))
      .orderBy("event_type", "hr")
  }

  /** Exact join-size analysis (`stats_join_size`) — what a join WOULD
    * produce, computed without executing it: |A ⋈_k B| = Σ_k cnt_A(k) ·
    * cnt_B(k) over the two key-count tables — the cardinality/skew
    * pre-flight before a large join (the top contributing keys are the
    * ones to salt; the total sizes the shuffle). Reports the top-10
    * keys by contribution with each key's share of the total in basis
    * points. All integer, so the whole report hash-matches.
    *
    * Scale shape: two map-side-combined key-count aggregates (each
    * bounded by key cardinality, not table size), one count×count join
    * on the key, a single-row total, and a TakeOrdered top-10 — the
    * join's OUTPUT is never materialized.
    */
  def statsJoinSize(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val a = Relational.t(s, dir, "lineitem")
      .groupBy(col("l_partkey").as("key")).agg(count(lit(1)).as("cnt_a"))
    val b = Relational.t(s, dir, "part")
      .groupBy(col("p_partkey").as("key")).agg(count(lit(1)).as("cnt_b"))
    val contrib = a.join(b, "key")
      .select(col("key"), col("cnt_a"), col("cnt_b"),
        (col("cnt_a") * col("cnt_b")).as("contrib"))
    val tot = contrib.agg(sum(col("contrib")).as("total_rows"))
    contrib.crossJoin(broadcast(tot))
      .orderBy(col("contrib").desc, col("key").asc).limit(10)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("contrib").desc, col("key").asc)))
      .select(col("rk"), col("key"), col("cnt_a"), col("cnt_b"),
        col("contrib"), col("total_rows"),
        expr("(contrib * 10000) DIV total_rows").as("share_bp"))
      .orderBy("rk")
  }

  /** Sketch-based join-size estimate (`stats_join_size_sketch`) — the
    * 100 TB twin of [[statsJoinSize]]: when per-key count tables are
    * themselves too large to move, a Fast-AGMS count sketch per side
    * (d=5 signed hash rows × w=256 buckets — KB-sized whatever the key
    * cardinality) estimates |A ⋈ B| as the MEDIAN over rows of the
    * per-row inner products Σ_b csA[j][b]·csB[j][b]. Hashing is the
    * proven portable multiplicative family and everything is integer,
    * so the estimate — and its deviation from the exact answer, also
    * emitted — replays bit-for-bit in the oracle.
    *
    * Scale shape: each sketch is one map-side-combined (row, bucket)
    * aggregate over the key column (d·w = 1280 cells per side at any
    * data size); the estimate joins the two cell tables and the median
    * runs over d = 5 rows. Exact-side comparison reuses the key-count
    * product sum.
    */
  def statsJoinSizeSketch(s: SparkSession, dir: String, d: Int = 5,
      w: Int = 256): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // AGMS needs 4-wise-independent SIGN hashes — the cheap multiplicative
    // family's sign products correlate across colliding keys and blow the
    // variance (measured: 50% error where theory says ~6%); the md5 fold
    // (the stats_checksum idiom) behaves fully random and lands the
    // estimate within a few percent at the gate SFs. Bucket and sign come
    // from disjoint bit regions of one 60-bit digest per (row, key).
    def sketch(table: String, key: String, out: String): DataFrame =
      Relational.t(s, dir, table)
        .groupBy(col(key).as("k")).agg(count(lit(1)).as("cnt"))
        .withColumn("j", explode(expr(s"sequence(0, ${d - 1})")))
        .withColumn("hv", conv(substring(md5(
          concat(col("j").cast("string"), lit(":"),
            col("k").cast("string"))), 1, 15), 16, 10).cast("long"))
        .withColumn("b", col("hv") % w)
        .withColumn("sgn", expr(s"(hv DIV $w) % 2") * 2L - 1L)
        .groupBy("j", "b").agg(sum(col("sgn") * col("cnt")).as(out))
    val est = sketch("lineitem", "l_partkey", "va")
      .join(sketch("part", "p_partkey", "vb"), Seq("j", "b"))
      .groupBy("j").agg(sum(col("va") * col("vb")).as("est"))
      .withColumn("rn", row_number().over(
        Window.orderBy(col("est").asc, col("j").asc)))
      .filter(col("rn") === (d + 1) / 2)
      .select(col("est").as("est_rows"))
    val exact = Relational.t(s, dir, "lineitem")
      .groupBy(col("l_partkey").as("k")).agg(count(lit(1)).as("ca"))
      .join(Relational.t(s, dir, "part")
        .groupBy(col("p_partkey").as("k")).agg(count(lit(1)).as("cb")), "k")
      .agg(sum(col("ca") * col("cb")).as("exact_rows"))
    est.crossJoin(exact)
      .select(col("est_rows"), col("exact_rows"),
        expr("(abs(est_rows - exact_rows) * 10000) DIV exact_rows")
          .as("err_bp"))
  }

  /** Exact moment matrix (`stats_moments`) — the distributed
    * covariance/correlation primitive for feature screening: for each
    * numeric column pair, the exact second-order moments
    * (n, Σx, Σy, Σx², Σy², Σxy) plus the covariance numerator
    * n·Σxy − Σx·Σy, all on integer projections (cents / basis points)
    * with per-row products and sums in DECIMAL(38,0), so the whole
    * matrix is bit-exact — the float corr is one driver-side division
    * away, but the heavy pass over the data never touches floats.
    * Factors widen to decimal BEFORE multiplying (matching the
    * oracle's HUGEINT-first order), so an input outside the documented
    * cents ≤ ~10⁹ domain widens instead of silently wrapping in LONG.
    *
    * Output canonicalization (round-11 driver finding): the wide sums
    * are emitted as STRINGs, not DECIMAL(38,0) — the external gate's
    * hasher canonicalizes Spark decimal128 and DuckDB HUGEINT→DECIMAL
    * differently, so oracle outputs are restricted to
    * BIGINT/DOUBLE/STRING/DATE; both engines render the exact integer
    * digits identically as strings.
    *
    * Scale shape: ONE scan computes every moment in a single partial-
    * aggregated (map-side combined) global aggregate — one row crosses
    * the network per partition — then `inline` unpivots the single row
    * into one row per pair, driver-free. Adding a column pair adds six
    * aggregate slots, not a pass.
    */
  def statsMoments(s: SparkSession, dir: String): DataFrame = {
    val proj = Relational.tFan(s, dir, "lineitem").select(
      col("l_quantity").cast("long").as("qty"),
      expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").as("price_c"),
      expr("CAST(floor(l_discount * 10000 + 0.5) AS BIGINT)").as("disc_bp"))
    val pairs = Seq(("qty", "price_c"), ("qty", "disc_bp"),
      ("price_c", "disc_bp"))
    val dec38 = "decimal(38,0)"
    def d(c: String) = col(c).cast(dec38)
    val aggs = count(lit(1)).as("n") +: pairs.flatMap { case (x, y) =>
      Seq(
        sum(d(x)).as(s"_sx_${x}_$y"),
        sum(d(y)).as(s"_sy_${x}_$y"),
        sum((d(x) * d(x)).cast(dec38)).as(s"_sxx_${x}_$y"),
        sum((d(y) * d(y)).cast(dec38)).as(s"_syy_${x}_$y"),
        sum((d(x) * d(y)).cast(dec38)).as(s"_sxy_${x}_$y"))
    }
    val one = proj.agg(aggs.head, aggs.tail: _*)
    val rows = array(pairs.map { case (x, y) =>
      val k = s"${x}_$y"
      struct(
        lit(x).as("x_name"), lit(y).as("y_name"), col("n"),
        col(s"_sx_$k").cast("string").as("sx"),
        col(s"_sy_$k").cast("string").as("sy"),
        col(s"_sxx_$k").cast("string").as("sxx"),
        col(s"_syy_$k").cast("string").as("syy"),
        col(s"_sxy_$k").cast("string").as("sxy"),
        (col("n").cast(dec38) * col(s"_sxy_$k") -
          col(s"_sx_$k") * col(s"_sy_$k")).cast(dec38)
          .cast("string").as("cov_num"))
    }: _*)
    one.select(inline(rows)).orderBy("x_name", "y_name")
  }
}
