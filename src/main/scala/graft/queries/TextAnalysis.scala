package graft.queries

import graft.functions.TextFunctions.{spanHashes, words}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Training-data-pipeline text operators over `documents`
  * (BASELINE.json north star: text analysis + dedup at 100 TB scale).
  * All are per-row expressions (whole-stage codegen, no UDFs) followed by
  * ordinary aggregations — embarrassingly parallel at scale.
  */
object TextAnalysis {

  /** Token count: whitespace split (documents are space-separated). */
  def tokens = size(split(col("text"), " "))

  /** Token counting, BPE-ish: word pieces / digits / punctuation runs via
    * the GPT-style pre-tokenizer regex (simplified to the character
    * classes present in this corpus). Counted per doc alongside the
    * whitespace tokenization.
    */
  def tokenCounts(s: SparkSession, dir: String): DataFrame =
    Relational.t(s, dir, "documents")
      .select(col("doc_id"),
        tokens.cast("long").as("ws_tokens"),
        size(regexp_extract_all(col("text"),
          lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0)))
          .cast("long").as("bpe_tokens"))
      .orderBy("doc_id")

  /** Per-language corpus stats: doc count, chars, tokens. */
  def textStats(s: SparkSession, dir: String): DataFrame =
    Relational.t(s, dir, "documents")
      .select(col("lang"), col("n_chars"), tokens.as("toks"))
      .groupBy("lang")
      .agg(count(lit(1)).as("docs"),
        sum(col("n_chars")).as("sum_chars"),
        sum(col("toks").cast("long")).as("sum_tokens"))
      .orderBy("lang")

  /** Exact dedup by content hash (hash-groupBy; the scale path for
    * byte-identical dedup). Emits clusters with >1 member.
    */
  def exactDedup(s: SparkSession, dir: String): DataFrame =
    Relational.t(s, dir, "documents")
      .groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dup_cnt"))
      .filter(col("dup_cnt") > 1)
      .select("keep_id", "dup_cnt")
      .orderBy("keep_id")

  /** Overlapping token-window chunking (`text_chunks`) — the
    * RAG-indexing / training-sequence prep that cuts each document into
    * fixed windows: W=64 tokens, stride 48 (16-token overlap so no
    * boundary-straddling content is lost to retrieval). Boundaries are
    * a PURE integer function of the token count — every engine, rerun,
    * and shard layout cuts identically, so chunk ids are stable join
    * keys for downstream chunk-level dedup — and each chunk carries the
    * md5 of its joined tokens (the dedup/caching key) instead of the
    * text itself (boundaries + slice reconstruct it; emitting text
    * would multiply the corpus by the overlap factor). Map-only:
    * tokenize, explode the per-doc chunk index range, slice — no
    * shuffle at any scale.
    */
  def chunks(s: SparkSession, dir: String, w: Int = 64,
      stride: Int = 48): DataFrame =
    Relational.tFan(s, dir, "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("n", size(col("toks")))
      .withColumn("k", when(col("n") <= w, lit(0))
        .otherwise(expr(s"CAST((n - $w + ${stride - 1}) div $stride AS INT)")))
      .select(col("doc_id"), col("toks"), col("n"),
        explode(sequence(lit(0), col("k"))).as("chunk_id"))
      .withColumn("start_tok", col("chunk_id") * stride)
      .withColumn("end_tok", least(col("start_tok") + w, col("n")))
      .select(col("doc_id"), col("chunk_id"), col("start_tok"),
        col("end_tok"), (col("end_tok") - col("start_tok")).as("n_tok"),
        md5(concat_ws(" ", slice(col("toks"), col("start_tok") + 1,
          col("end_tok") - col("start_tok")))).as("chunk_md5"))
      .orderBy("doc_id", "chunk_id")

  /** BPE vocabulary induction (`text_bpe_merges`): the first `rounds`
    * byte-pair-encoding merges learned from the corpus - per round,
    * count every adjacent symbol pair weighted by word frequency, merge
    * the most frequent pair (ties toward the byte-smaller pair), and
    * rewrite the word table. This is the sennrich-style trainer shape:
    * the input is the WORD-FREQUENCY TABLE, not the corpus, so the
    * iterated frame is vocabulary-bounded at any corpus size - one
    * corpus scan builds it, then each round is an aggregation over
    * |vocab| rows plus a single-row argmax to the driver (the bounded-
    * metadata collect pattern the k-means trainer established).
    *
    * Symbol sequences are SEP-prefixed strings (`\u0001h\u0001e...`);
    * the merge rewrite is a left-to-right FOLD over the symbols: append
    * `x` directly onto the accumulator when the current tail symbol is
    * exactly `l` and `x = r`, else start a new SEP-prefixed symbol.
    * The tail test is `acc.endsWith(SEP + l)` - sound because SEP marks
    * every symbol START and never occurs inside a symbol, so the suffix
    * can only be the whole tail symbol (a plain string `replace` of
    * `SEP l SEP r` is NOT sound: nothing delimits the END of `r`, so it
    * also fires when `r` is a proper prefix of the next symbol). The
    * fold is greedy non-overlapping (a freshly merged tail `lr` never
    * re-matches `l` within the round), exactly the reference BPE
    * application order. Deterministic end to end: integer counts,
    * byte-order ties, and the identical fold in DuckDB's list_reduce -
    * the oracle unrolls the rounds as CTE blocks and the merge table
    * hash-matches.
    */
  def bpeMerges(s: SparkSession, dir: String, rounds: Int = 10): DataFrame =
    bpeMergesFromWords(s,
      Relational.t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("w")), rounds)

  private val Sep = "\u0001"

  /** Input guard shared by the BPE trainer and tokenizer (mirrored in
    * the DuckDB oracle): drop empty words and words carrying either
    * in-band control sentinel — U+0001 is the symbol separator (a word
    * containing it would corrupt its own symbolization in BOTH engines,
    * so the hash gate could never catch it) and U+0002 is the oracle's
    * exhausted-round no-op marker. Control characters carry no BPE
    * signal; excluding them is the honest domain, not a loss.
    */
  private val bpeWordGuard: org.apache.spark.sql.Column =
    length(col("w")) > 0 && !col("w").contains(Sep) &&
      !col("w").contains("\u0002")

  /** `[\s\S]` matches every character in BOTH Java and RE2 regex -
    * `.` does not (Java excludes \r and the unicode line separators,
    * RE2 only \n), so the symbolization must avoid it for the oracle
    * to replay byte-identically on corpora with exotic whitespace.
    */
  private val AnyChar = "([\\s\\S])"

  /** The greedy one-round merge of pair (l, r) as a fold expression
    * over the SEP-delimited symbol string (shared by the trainer and
    * the tokenizer so the two can never diverge).
    */
  private def mergeFold(seq: org.apache.spark.sql.Column, l: String,
      r: String): org.apache.spark.sql.Column = {
    val sy = split(seq, Sep)
    aggregate(
      slice(sy, lit(2), size(sy) - 1), // drop the leading "" element
      lit(""),
      (acc, x) => when(acc.endsWith(lit(Sep + l)) && x === lit(r),
        concat(acc, x)).otherwise(concat(acc, lit(Sep), x)))
  }

  /** [[bpeMerges]] core over an explicit word stream (one row per word
    * OCCURRENCE - frequencies are counted here); the reference-BPE
    * equivalence spec drives this directly.
    */
  private[queries] def bpeMergesFromWords(s: SparkSession, wordsDf: DataFrame,
      rounds: Int): DataFrame = {
    val s2 = s
    import s2.implicits._
    val empty = Seq.empty[(Int, String, String, String, Long)]
      .toDF("rank", "lhs", "rhs", "merged", "pair_count")
    if (rounds <= 0) return empty
    val wf = wordsDf
      .filter(bpeWordGuard)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .withColumn("seq", regexp_replace(col("w"), AnyChar, Sep + "$1"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    wf.count()
    val out = scala.collection.mutable.ArrayBuffer[(Int, String, String, String, Long)]()
    var cur = wf
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val best = cur
        .select(col("cnt"), split(col("seq"), Sep).as("sy"))
        .filter(size(col("sy")) >= 3) // at least two symbols
        .select(col("cnt"), explode(expr(
          "transform(sequence(1, size(sy) - 2), " +
            "i -> named_struct('lhs', sy[i], 'rhs', sy[i + 1]))")).as("p"))
        .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
        .agg(sum(col("cnt")).as("pc"))
        .orderBy(col("pc").desc, col("lhs").asc, col("rhs").asc)
        .head(1)
      if (best.isEmpty) exhausted = true
      else {
        val b = best.head
        val (l, rr, pc) = (b.getString(0), b.getString(1), b.getLong(2))
        out += ((r, l, rr, l + rr, pc))
        // localCheckpoint per round: the fold expressions are large, so
        // letting lineage accumulate makes round N's ANALYSIS cost grow
        // with N (the frame itself is vocabulary-bounded and tiny)
        cur = cur.withColumn("seq", mergeFold(col("seq"), l, rr))
          .localCheckpoint(true)
      }
      r += 1
    }
    wf.unpersist(blocking = true)
    out.toSeq.toDF("rank", "lhs", "rhs", "merged", "pair_count")
      .orderBy("rank")
  }

  /** BPE tokenization with the learned merges (`text_bpe_tokenize`):
    * the APPLY half of [[bpeMerges]] - every word runs the merge list
    * in rank order (the same greedy [[mergeFold]] the trainer used) and
    * docs roll up their piece counts. The model is the <=`rounds`-row
    * merge table, collected once per corpus snapshot (content-
    * fingerprint memo, the PQ-codebook precedent) and inlined as
    * literals in a chained fold EXPRESSION - the corpus scan is
    * map-only (no join, no shuffle before the per-doc rollup), which is
    * the right 100 TB shape for "tokenize everything with this vocab":
    * the vocabulary travels in the plan, not the data.
    */
  private val bpeModelCache = scala.collection.concurrent
    .TrieMap[(String, Int), Array[org.apache.spark.sql.Row]]()

  def bpeTokenize(s: SparkSession, dir: String, rounds: Int = 10): DataFrame = {
    if (bpeModelCache.size > 64) bpeModelCache.clear() // bound the memo
    val merges =
      if (rounds <= 0) Array.empty[org.apache.spark.sql.Row]
      else bpeModelCache.getOrElseUpdate(
        (Dedup.stageTag(s, dir), rounds), bpeMerges(s, dir, rounds).collect())
    val docs = Relational.t(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(bpeWordGuard)
    // fold over DISTINCT words, not occurrences: the merge folds are
    // interpreted lambdas, so run them once per vocabulary entry (the
    // bounded set) and broadcast the word -> piece-count table over the
    // occurrence stream — the vocab-table join every real tokenizer
    // deployment uses. One Project layer per merge keeps the plan
    // linear (nesting the folds would triple the expression per level).
    val wordTok = merges.foldLeft(
      docs.select("w").distinct()
        .withColumn("seq", regexp_replace(col("w"), AnyChar, Sep + "$1"))) {
      (df, m) => df.withColumn("seq",
        mergeFold(col("seq"), m.getString(1), m.getString(2)))
    }.select(col("w"),
      (size(split(col("seq"), Sep)) - 1).cast("long").as("t"))
    docs.join(broadcast(wordTok), "w")
      .groupBy("doc_id")
      .agg(sum(col("t")).as("bpe_tokens"), count(lit(1)).as("n_words"))
      .orderBy("doc_id")
  }

  /** Chunk-level exact dedup (`text_chunk_dedup`): [[chunks]] hashes
    * grouped across the corpus — every window of text that appears more
    * than once (within OR across documents). Catches repeated passages
    * at retrieval granularity: an index keeps `keep_doc`'s copy, the
    * rest are pointers. Hash-groupBy with map-side combine — the
    * exact-dedup shape, one level finer than [[exactDedup]].
    */
  def chunkDedup(s: SparkSession, dir: String): DataFrame =
    chunks(s, dir)
      .groupBy("chunk_md5")
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keep_doc"))
      .filter(col("n_copies") > 1)
      .orderBy("chunk_md5")

  /** Per-document token-distribution Shannon entropy (`text_entropy`)
    * in q4 fixed-point bits — the quality signal that separates natural
    * text (≈ high entropy) from templated/repeated spam (low) where
    * the repetition score only sees ADJACENT duplication: with c_t the
    * doc's count of token t and n its token total,
    *   n·H = Σ_t c_t · (L(n) − L(c_t))
    * using the q4 piecewise-linear log2 `L(x) = (bits(x)−1)·16 +
    * ((x·16) >> (bits(x)−1)) − 16` — integer end to end, so the whole
    * signal (totals, per-token rate, and the low-entropy flag at 2
    * bits/token = 32 q4) replays bit-for-bit in the DuckDB oracle.
    *
    * Scale shape: explode → two map-side-combined aggregations
    * (per-(doc,token) counts, then per-doc roll-up) — one shuffle keyed
    * by doc, linear at any corpus size.
    */
  def entropy(s: SparkSession, dir: String): DataFrame = {
    def l2q4(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val bl = length(bin(c))
      ((bl - 1) * 16).cast("long") +
        call_function("shiftright", c * 16, bl - 1) - 16L
    }
    val tok = Relational.tFan(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .filter(length(col("t")) > 0)
    val perDoc = tok.groupBy("doc_id", "t").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_tok"),
        sum(col("c") * l2q4(col("c"))).as("clog"))
      .select(col("doc_id"), col("n_tok"),
        (col("n_tok") * l2q4(col("n_tok")) - col("clog")).as("ent_total_q4"))
    Relational.t(s, dir, "documents").select("doc_id")
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tok"), lit(0L)).as("n_tok"),
        coalesce(col("ent_total_q4"), lit(0L)).as("ent_total_q4"),
        coalesce(expr("ent_total_q4 DIV n_tok"), lit(0L)).as("ent_per_tok_q4"))
      .withColumn("low_entropy", col("ent_per_tok_q4") < 32)
      .orderBy("doc_id")
  }

  /** Canonical text normalization — the pass every dedup/quality stage
    * upstream of training runs first: lowercase, non-alphanumerics to
    * spaces, whitespace collapsed, trimmed. Emitted as the normalized
    * token count + content hash (the join key for case/punctuation-variant
    * dedup that byte-exact [[exactDedup]] misses) plus a changed flag.
    * Pure per-row codegen'd expressions — map-only at any scale.
    */
  def normalize(s: SparkSession, dir: String): DataFrame =
    Relational.t(s, dir, "documents")
      .select(col("doc_id"), col("text"),
        trim(regexp_replace(regexp_replace(lower(col("text")),
          "[^a-z0-9 ]", " "), " +", " ")).as("norm"))
      .select(col("doc_id"),
        size(split(col("norm"), " ")).cast("long").as("n_tokens_norm"),
        md5(col("norm")).as("sig"),
        (col("norm") =!= col("text")).cast("int").as("changed"))
      .orderBy("doc_id")

  /** Boilerplate mining: the 3-grams shared by the most DOCUMENTS (df,
    * not tf — one vote per doc via the distinct shingle set). At corpus
    * scale these are licenses, navigation chrome, and template text —
    * the shingles a Jaccard-dedup pass wants df-capped and a cleaning
    * pass wants stripped. One explode + hash-groupBy with map-side
    * combine, then a global top-k (TakeOrderedAndProject — per-partition
    * heads, never a full sort).
    */
  /** `release = false` keeps the lazy (inspectable) plan and leaves the
    * shingle cache to the caller — for plan tests; the default
    * materializes the 20-row result and releases the cache (a no-op
    * pass-through when the shingles come from the staged parquet).
    */
  def commonNgrams(s: SparkSession, dir: String,
      release: Boolean = true): DataFrame = {
    // consume the SHARED shingled-corpus artifact (Dedup.docsWithShingles:
    // staged parquet under the stage dir, executor cache otherwise) —
    // same distinct 3-gram sets, so df semantics are identical, and the
    // corpus is shingled once per snapshot across ALL shingle consumers
    // (jaccard, minhash, curate, this) instead of once per query.
    val shingled = Dedup.docsWithShingles(s, dir)
    val out = shingled
      .select(explode(col("sh")).as("ngram"))
      .groupBy("ngram").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("ngram"))
      .limit(20)
    if (release) Dedup.releaseAfter(out, shingled) else out
  }

  /** Corpus drift detection between two snapshots (halves of the id
    * range here; two crawls or two dated partitions in production): the
    * tokens whose frequency SHARE moved most, ranked by the
    * cross-multiplied integer shift |cnt_a·total_b − cnt_b·total_a| —
    * share comparison without a single division, so the ranking is
    * exact integer arithmetic and replays in the oracle. Token counts
    * reduce map-side; the two totals ride along as a broadcast row.
    * (At much larger counts the product needs DECIMAL or pre-scaling;
    * the shape is unchanged.)
    */
  def corpusDrift(s: SparkSession, dir: String): DataFrame = {
    val docs = Relational.t(s, dir, "documents")
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    val splitId = (maxId + 1L) / 2L
    val tok = docs
      .select((col("doc_id") >= splitId).cast("int").as("half"),
        explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
    val counts = tok.groupBy("token").agg(
      sum(when(col("half") === 0, 1L).otherwise(0L)).as("cnt_a"),
      sum(when(col("half") === 1, 1L).otherwise(0L)).as("cnt_b"))
    val totals = counts.agg(sum(col("cnt_a")).as("total_a"),
      sum(col("cnt_b")).as("total_b"))
    counts.crossJoin(broadcast(totals))
      .select(col("token"), col("cnt_a"), col("cnt_b"),
        abs(col("cnt_a") * col("total_b") - col("cnt_b") * col("total_a"))
          .as("xshift"))
      .orderBy(col("xshift").desc, col("token"))
      .limit(20)
  }

  /** Language-ID by marker-token scoring (n-gram/stopword heuristic,
    * deterministic): hits per language's marker set, argmax with a fixed
    * tie order, emitted as a confusion matrix against the labeled lang.
    * (The synthetic corpus shares one vocabulary across langs, so accuracy
    * is incidental — the operator contract is the deterministic scoring.)
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("column", "sort", "window"),
    "fr" -> Seq("order", "query", "customer"),
    "es" -> Seq("part", "hash", "line"),
    "de" -> Seq("small", "data", "scan"),
    "zh" -> Seq("group", "merge", "vector"))

  def langId(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.markerHits
    val hitCols = langMarkers.map { case (l, m) =>
      markerHits(col("text"), m).as(s"h_$l")
    }
    val mx = greatest(langMarkers.map { case (l, _) => col(s"h_$l") }: _*)
    val predicted = langMarkers.init.foldRight(
      lit(langMarkers.last._1): org.apache.spark.sql.Column) {
      case ((l, _), rest) => when(col(s"h_$l") >= mx, l).otherwise(rest)
    }
    Relational.t(s, dir, "documents")
      .select(col("lang") +: hitCols: _*)
      .withColumn("predicted", predicted)
      .groupBy("lang", "predicted")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("lang", "predicted")
  }

  /** Per-document predicted language (argmax of marker hits, fixed tie
    * order — the per-row core of [[langId]], reusable in pipelines).
    */
  def predictedLang(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import graft.functions.TextFunctions.markerHits
    val hits = langMarkers.map { case (l, m) => l -> markerHits(text, m) }
    val mx = greatest(hits.map(_._2): _*)
    hits.init.foldRight(lit(hits.last._1): org.apache.spark.sql.Column) {
      case ((l, h), rest) => when(h >= mx, l).otherwise(rest)
    }
  }

  /** The composed corpus-curation pipeline — what a training-data run
    * actually executes, as ONE declarative plan Catalyst optimizes
    * end-to-end:
    *
    *   1. quality gate (≥ 5 tokens),
    *   2. exact dedup — keep the min doc_id per content hash
    *      (hash-groupBy + semi join: map-side combinable, no global sort),
    *   3. near-dedup — drop the greater doc_id of every exact-Jaccard
    *      ≥ 0.8 pair from [[Dedup.stagedPairs]] (the staged pair artifact
    *      when [[Dedup.StageDirConf]] is on, else a fresh sub-quadratic
    *      prefix-filtered computation; anti join to drop),
    *   4. language tag the survivors.
    *
    * Every stage is oracle-expressible, so the WHOLE pipeline sits under
    * the DuckDB hash gate — not just its pieces.
    */
  def curate(s: SparkSession, dir: String): DataFrame = {
    val q = Relational.t(s, dir, "documents")
      .filter(tokens >= 5)
      .select(col("doc_id"), col("text"), tokens.cast("long").as("n_tokens"))
      .withColumn("h", md5(col("text")))
    val keep = q.groupBy("h").agg(min(col("doc_id")).as("doc_id"))
    val nearDups = Dedup.stagedPairs(s, dir)
      .select(col("id_b").as("doc_id")).distinct()
    q.join(keep, Seq("h", "doc_id"), "left_semi")
      .join(nearDups, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), predictedLang(col("text")).as("predicted"),
        col("n_tokens"))
      .orderBy("doc_id")
  }

  /** Multimodal-column plumbing, portable slice: treat the text as an
    * opaque binary payload (the real image/audio decode path is stubbed —
    * see graft.multimodal); extract byte-level features through the
    * binary column.
    */
  def mmFeatures(s: SparkSession, dir: String): DataFrame =
    Relational.t(s, dir, "documents")
      .select(col("doc_id"),
        length(col("text").cast("binary")).cast("long").as("n_bytes"),
        substring(md5(col("text").cast("binary")), 1, 8).as("sig"))
      .orderBy("doc_id")

  /** Substring-level duplicate spans: per document, how many of its
    * distinct 10-token windows also appear in ANOTHER document — the
    * exact-substring dedup signal (boilerplate, licenses, templated
    * text) that document-level Jaccard misses because a shared paragraph
    * inside two long, otherwise-different documents never lifts whole-doc
    * similarity over threshold. Pipeline use: a high `dup_frac` doc is
    * cut or span-scrubbed before training.
    *
    * Scale shape: explode windows to skinny (doc, span-hash) rows,
    * distinct, count docs per hash — shuffles carry 16-byte pairs
    * (corpus × window-factor), never the texts. Window hashing here is
    * O(tokens × w) per doc via the portable polynomial (exactly
    * replayed by the oracle); the O(tokens) rolling form is a
    * micro-optimization the plan shape doesn't depend on.
    */
  def dupSpans(s: SparkSession, dir: String): DataFrame = {
    val W = 10
    val spans = Relational.tFan(s, dir, "documents")
      .filter(size(words(col("text"))) >= W)
      .select(col("doc_id"), explode(spanHashes(col("text"), W)).as("h"))
      .distinct() // within-doc repeats count once (text_repetition's job)
    val shared = spans.groupBy("h").agg(count(lit(1)).as("docs"))
    spans.join(shared, "h")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("docs") >= 2, 1L).otherwise(0L)).as("dup_spans"))
      .select(col("doc_id"), col("n_spans"), col("dup_spans"),
        (col("dup_spans").cast("double") / col("n_spans").cast("double"))
          .as("dup_frac"))
      .orderBy("doc_id")
  }

  /** Winnowing fingerprint selection (Schleimer–Wilkerson–Aiken — the
    * MOSS rule): hash every W-token span, then keep the MINIMUM hash of
    * each sliding window of `win` consecutive span hashes, rightmost
    * position on ties (the `<=` fold). The guarantee: any token run of
    * ≥ W + win - 1 shared by two docs contributes at least one shared
    * selected fingerprint, at ~2/(win+1) the density of the full
    * span-hash set — the index a plagiarism / license-text matcher
    * stores instead of every window. Selected positions dedup per doc
    * (one hash can win several windows); the per-doc summary (count +
    * XOR of selected hashes) puts the entire selection under the hash
    * gate without shipping fingerprint lists. Pure per-row expression
    * arithmetic — no shuffle until the final skinny aggregate.
    */
  def winnowing(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Rolling-window argmin instead of the per-row nested-lambda form:
    // exploding the span hashes once and taking min(struct(h, -p)) over
    // a bounded ROWS frame selects, per window start, the smallest hash
    // with the RIGHTMOST position on ties (-p inverts the tie order) —
    // the winnowing rule — in codegen'd window machinery. The earlier
    // transform/aggregate-over-element_at form re-inlined the whole
    // span-hash computation at every element access (projection
    // collapse), going quadratic in interpreted expression evaluation.
    val W = 5; val win = 4
    val spans = Relational.tFan(s, dir, "documents")
      .filter(size(words(col("text"))) >= W + win - 1)
      .select(col("doc_id"),
        posexplode(spanHashes(col("text"), W)).as(Seq("p0", "h")))
      .select(col("doc_id"), (col("p0") + 1).as("p"), col("h"))
    val wN = Window.partitionBy("doc_id")
    val wF = Window.partitionBy("doc_id").orderBy(col("p").asc)
      .rowsBetween(Window.currentRow, win - 1)
    spans
      .withColumn("n_spans", count(lit(1)).over(wN))
      .withColumn("m", min(struct(col("h"), (-col("p")).as("np"))).over(wF))
      .filter(col("p") <= col("n_spans") - (win - 1))
      .select(col("doc_id"), col("n_spans"),
        col("m.h").as("fp"), col("m.np").as("np"))
      .distinct() // distinct selected POSITIONS per doc
      .groupBy("doc_id", "n_spans")
      .agg(count(lit(1)).as("n_fp"), expr("bit_xor(fp)").as("fp_xor"))
      .orderBy("doc_id")
  }

  /** Incremental [[dupSpans]]: score a NEW batch's documents against the
    * EXISTING corpus's span set without recomputing the corpus — the
    * streaming-curation shape (does this incoming doc duplicate spans of
    * what we already accepted?). The corpus/increment split is the same
    * deterministic 80%-of-id-range threshold as `dedup_incremental`;
    * under [[graft.queries.Dedup.StageDirConf]] the corpus span SET is
    * staged once (keyed by input dir + split) and each batch pays only
    * its own window hashing + one semi-probe join against the staged
    * index. dup_spans counts increment windows present in the corpus
    * (increment-internal duplication is batch-local and cheap to add).
    */
  def dupSpansIncremental(s: SparkSession, dir: String): DataFrame = {
    val maxId = Relational.t(s, dir, "documents")
      .agg(max(col("doc_id"))).head().getLong(0)
    dupSpansIncrementalAt(s, dir, (maxId + 1L) * 8L / 10L)
  }

  def dupSpansIncrementalAt(s: SparkSession, dir: String,
      split: Long): DataFrame = {
    val W = 10
    val spans = Relational.tFan(s, dir, "documents")
      .filter(size(words(col("text"))) >= W)
      .select(col("doc_id"), explode(spanHashes(col("text"), W)).as("h"))
      .distinct()
    val corpus0 = spans.filter(col("doc_id") < split)
      .select(col("h")).distinct()
    val corpus = s.conf.getOption(Dedup.StageDirConf) match {
      case Some(stage) =>
        Dedup.stagedOrFresh(s,
          s"$stage/${spanIndexName(s, dir, split)}",
          out => corpus0.write.mode("overwrite").parquet(out),
          () => corpus0)
      case None => corpus0
    }
    spans.filter(col("doc_id") >= split)
      .join(corpus.withColumn("in_corpus", lit(1L)), Seq("h"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"),
        sum(coalesce(col("in_corpus"), lit(0L))).as("dup_spans"))
      .select(col("doc_id"), col("n_spans"), col("dup_spans"),
        (col("dup_spans").cast("double") / col("n_spans").cast("double"))
          .as("dup_frac"))
      .orderBy("doc_id")
  }

  private def spanIndexName(s: SparkSession, dir: String,
      split: Long): String =
    s"spanidx_${Dedup.stageTag(s, dir)}_$split"

  /** Span-index append maintenance — the [[graft.queries.Dedup
    * .absorbIncrement]] analog for the dup-span corpus index: after an
    * increment is scored, fold its distinct window hashes into the
    * staged index and publish it under the NEW split, so the next batch
    * joins against the appended index instead of re-hashing the whole
    * corpus. Work is the increment's spans plus one index rewrite;
    * superseded split indexes are TTL-swept.
    */
  def absorbSpanIncrement(s: SparkSession, dir: String,
      oldSplit: Long, newSplit: Long,
      sweepTtlMs: Long = Dedup.StageTtlMs): Unit =
    s.conf.getOption(Dedup.StageDirConf).foreach { stage =>
      val W = 10
      val spans = Relational.t(s, dir, "documents")
        .filter(size(words(col("text"))) >= W)
        .select(col("doc_id"), explode(spanHashes(col("text"), W)).as("h"))
      val oldPath = new org.apache.hadoop.fs.Path(
        s"$stage/${spanIndexName(s, dir, oldSplit)}")
      val fs = oldPath.getFileSystem(s.sparkContext.hadoopConfiguration)
      val old =
        if (fs.exists(new org.apache.hadoop.fs.Path(oldPath, "_SUCCESS")))
          s.read.parquet(oldPath.toString)
        else spans.filter(col("doc_id") < oldSplit).select("h").distinct()
      val inc = spans.filter(col("doc_id") >= oldSplit &&
        col("doc_id") < newSplit).select("h").distinct()
      val kept = spanIndexName(s, dir, newSplit)
      val merged = old.select("h").union(inc).distinct()
      Dedup.stagedOrFresh(s, s"$stage/$kept",
        out => merged.write.mode("overwrite").parquet(out),
        () => merged)
      Dedup.sweepSuperseded(s, stage,
        s"spanidx_${Dedup.stagePathKey(dir)}_", kept, sweepTtlMs)
      ()
    }

  /** Frame-sample PLAN over video metadata: pick up to 8 evenly spaced
    * frames per video and compute each one's timestamp and byte range —
    * the planning half of distributed video decode. At 100 TB the plan
    * rows (media_id, offset, length) are what flows to the decode stage,
    * so work balances by FRAME count, never by video length, and decode
    * tasks range-read slices instead of pulling whole videos. Metadata
    * (frame count, fps, frame size) is derived deterministically from
    * doc_id — this container ships no codecs; the byte-slicing/decode
    * half of the contract lives in [[graft.multimodal.Multimodal
    * .sampleFrames]]. Every step is integer arithmetic, replicated
    * exactly by the oracle.
    */
  def mmFrameSample(s: SparkSession, dir: String): DataFrame =
    Relational.t(s, dir, "documents")
      .filter(col("doc_id") % 3 === 0)
      .select(col("doc_id").as("media_id"),
        (lit(24L) + col("doc_id") % 240L).as("n_frames"),
        when(col("doc_id") % 2 === 0, 24L).otherwise(30L).as("fps"),
        (lit(4096L) + (col("doc_id") % 5L) * 1024L).as("frame_bytes"))
      .select(col("media_id"), col("fps"), col("frame_bytes"),
        explode(sequence(lit(0L), lit(7L))).as("i"),
        col("n_frames"))
      .select(col("media_id"), col("fps"), col("frame_bytes"),
        expr("(i * n_frames) div 8").as("frame_no"))
      .distinct()
      .select(col("media_id"), col("frame_no"),
        expr("(frame_no * 1000) div fps").as("ts_ms"),
        (col("frame_no") * col("frame_bytes")).as("byte_offset"),
        col("frame_bytes").as("byte_len"))
      .orderBy("media_id", "frame_no")

  /** Resize PLAN: output geometry per image — fit the long side to 224,
    * preserve aspect ratio, never upscale; pure integer arithmetic so
    * any engine reproduces it bit-for-bit. The geometry decision is the
    * distributed part of a resize stage (the pixel resample itself is a
    * per-row kernel behind the decode stub).
    */
  def mmResize(s: SparkSession, dir: String): DataFrame =
    Relational.t(s, dir, "documents")
      .select(col("doc_id").as("media_id"),
        (lit(64L) + (col("doc_id") % 13L) * 160L).as("w"),
        (lit(48L) + (col("doc_id") % 7L) * 120L).as("h"))
      .withColumn("m", greatest(col("w"), col("h")))
      .select(col("media_id"), col("w"), col("h"),
        when(col("m") <= 224L, col("w"))
          .otherwise(greatest(lit(1L), expr("(w * 224) div m"))).as("out_w"),
        when(col("m") <= 224L, col("h"))
          .otherwise(greatest(lit(1L), expr("(h * 224) div m"))).as("out_h"))
      .orderBy("media_id")

  /** PII scrubbing — email + phone masking, the redaction pass every
    * training-data pipeline runs before tokenization. Pure codegen'd
    * regexp expressions (no UDF). The synthetic corpus carries no PII,
    * so the query plants one deterministic email + phone per document
    * first (derived from doc_id — clearly marked, same on both engines);
    * the OPERATOR is the generic scrub chain, exercised end to end and
    * hash-gated on the scrubbed output.
    */
  private val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  private val PhoneRe = "\\+?[0-9][0-9 -]{6,}[0-9]"

  def scrubPii(s: SparkSession, dir: String): DataFrame = {
    val augmented = concat(col("text"),
      lit(" contact user"), col("doc_id").cast("string"),
      lit("@example.com or +1 555 "),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0"))
    Relational.t(s, dir, "documents")
      .withColumn("aug", augmented)
      .withColumn("no_email", regexp_replace(col("aug"), EmailRe, "<EMAIL>"))
      .select(col("doc_id"),
        size(regexp_extract_all(col("aug"), lit(EmailRe), lit(0)))
          .cast("long").as("n_emails"),
        size(regexp_extract_all(col("no_email"), lit(PhoneRe), lit(0)))
          .cast("long").as("n_phones"),
        md5(regexp_replace(col("no_email"), PhoneRe, "<PHONE>")).as("sig"))
      .orderBy("doc_id")
  }

  /** PII incidence REPORT — the aggregate view a compliance pass wants
    * before deciding to scrub: per source, how many documents carry each
    * PII class and at what density. Synthetic PII is planted
    * deterministically (email on doc_id ≡ 0 mod 7, phone on ≡ 0 mod 11 —
    * the fixture corpus itself is clean) so the detector has real
    * positives; phones are counted after email masking, mirroring
    * [[scrubPii]]'s overlap rule. Map-side-combinable counts over a
    * single scan — the shape that holds at any corpus size.
    */
  def piiReport(s: SparkSession, dir: String): DataFrame = {
    val aug = concat(col("text"),
      when(col("doc_id") % 7 === 0,
        concat(lit(" reach user"), col("doc_id").cast("string"),
          lit("@example.com"))).otherwise(lit("")),
      when(col("doc_id") % 11 === 0,
        concat(lit(" call +1 555 "),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
        .otherwise(lit("")))
    val perDoc = Relational.t(s, dir, "documents")
      .withColumn("aug", aug)
      .withColumn("no_email", regexp_replace(col("aug"), EmailRe, "<EMAIL>"))
      .select(col("source"),
        size(regexp_extract_all(col("aug"), lit(EmailRe), lit(0)))
          .cast("long").as("ne"),
        size(regexp_extract_all(col("no_email"), lit(PhoneRe), lit(0)))
          .cast("long").as("np"))
    perDoc.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("ne") > 0, 1L).otherwise(0L)).as("docs_email"),
        sum(when(col("np") > 0, 1L).otherwise(0L)).as("docs_phone"),
        sum(col("ne")).as("n_emails"),
        sum(col("np")).as("n_phones"),
        sum(when(col("ne") > 0 || col("np") > 0, 1L).otherwise(0L))
          .as("docs_any"))
      .withColumn("pii_docs_bp", expr("(docs_any * 10000) DIV n_docs"))
      .orderBy("source")
  }

  /** Stopword filtering: drop closed-class tokens before shingling /
    * tokenization. Higher-order array filter — per-row, no shuffle; the
    * kept-text hash sits under the oracle gate.
    */
  val Stopwords: Seq[String] = Seq("a", "the")

  def stopwordFilter(s: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    val kept = filter(toks, t => !t.isInCollection(Stopwords))
    Relational.t(s, dir, "documents")
      .select(col("doc_id"),
        size(kept).cast("long").as("n_kept"),
        (size(toks) - size(kept)).cast("long").as("n_removed"),
        md5(array_join(kept, " ")).as("sig"))
      .orderBy("doc_id")
  }

  /** Quality score: deterministic integer-arithmetic heuristics so the
    * oracle matches exactly — mean word length (chars*100/tokens) and a
    * short-doc flag. (Float-free on purpose.)
    */
  def qualityScore(s: SparkSession, dir: String): DataFrame =
    Relational.t(s, dir, "documents")
      .select(col("doc_id"),
        tokens.cast("long").as("n_tokens"),
        floor(col("n_chars") * 100 / tokens).as("mean_wlen_x100"),
        (tokens < 5).cast("int").as("too_short"))
      .orderBy("doc_id")

  /** Bigram language-model quality score (`text_lm_score`) — the
    * CCNet-style "does a corpus LM find this document predictable"
    * filter, in PORTABLE INTEGER arithmetic. Per bigram occurrence the
    * surprise is `bitlen(B) − bitlen(c(w1,w2))` (B = total bigram
    * occurrences) — the bit-length approximation of the JOINT surprisal
    * −log2 P(w1,w2), the same no-`ln` trick as the HDR sketch — so the
    * whole score replays bit-for-bit in the SQL oracle where a float
    * log-prob would not. (The joint form is the chain-consistent one:
    * conditional surprise −log2 P(w2|w1) alone assigns ZERO bits to any
    * singleton context — an unsmoothed-LM overfit that scores rare-token
    * soup as perfectly predictable.) Output per doc: bigram count, total
    * surprise bits, and surprise per bigram in q4 fixed point (×16,
    * integer-divided). High values = unpredictable text (gibberish /
    * rare-token soup), low = highly templated text — both tails are what
    * an LM-filter curation pass drops.
    *
    * Scale shape: the bigram/context count tables ARE the model —
    * map-side-combined hash aggregations bounded by the observed
    * vocabulary, not the corpus; scoring joins each doc's bigrams to the
    * two count tables (shuffle keyed by token, skew-safe because counts
    * were pre-reduced) and re-aggregates per doc. In production the
    * counts train once per corpus snapshot and persist like any staged
    * index; scoring new batches is then two joins against fixed tables.
    */
  /** `release = false` keeps the lazy (inspectable) plan and leaves the
    * bigram frame persisted — for plan tests; library callers get the
    * default, which materializes and releases the cache.
    */
  def lmScoreFor(docs: DataFrame, release: Boolean = true): DataFrame = {
    val withToks = docs.select(col("doc_id"), split(col("text"), " ").as("t"))
    val bg = withToks.filter(size(col("t")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(t) - 1), i -> struct(t[i-1] AS w1, t[i] AS w2))"))
        .as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    // bg feeds the model counts AND the scoring join — persist across
    // the two consumers instead of re-tokenizing the corpus; the total
    // folds out of c2 (sum of the bigram counts), not a third subtree.
    // releaseAfter below materializes the (per-doc-sized) result and
    // unpersists bg, so a direct library caller doesn't leak executor
    // cache per invocation.
    val bgP = bg.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val c2 = bgP.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val tot = c2.agg(sum(col("c2")).as("bt"))
    val perDoc = bgP
      .join(c2, Seq("w1", "w2"))
      .crossJoin(broadcast(tot))
      .select(col("doc_id"),
        (length(bin(col("bt"))) - length(bin(col("c2")))).cast("long").as("bits"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("bits")).as("lm_bits"))
    val out = withToks.select("doc_id").join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("lm_bits"), lit(0L)).as("lm_bits"),
        when(col("n_bigrams").isNull, lit(null).cast("long"))
          .otherwise(expr("(lm_bits * 16) DIV n_bigrams"))
          .as("bits_per_bigram_q4"))
      .orderBy("doc_id")
    if (release) Dedup.releaseAfter(out, bgP) else out
  }

  def lmScore(s: SparkSession, dir: String): DataFrame =
    lmScoreFor(Relational.t(s, dir, "documents"))

  /** Shard-manifest packing (`mm_shard_manifest`) — the webdataset-style
    * export planner: records in deterministic doc_id order are split
    * into shards at fixed byte offsets (item bytes = payload + a 512 B
    * per-record header allowance), i.e. shard = ⌊bytes-before / budget⌋.
    * The manifest (count, bytes, id range per shard) is what a tar-shard
    * writer consumes; offset splitting keeps every shard within
    * budget + one item of the target size with NO sequential pass.
    *
    * Scale shape: the textbook DISTRIBUTED PREFIX SUM — range-partition
    * by doc_id, one tiny job collects per-partition byte totals (one row
    * per partition, not per record), exclusive-scan them on the driver,
    * broadcast the offsets, then a single map pass assigns shards. A
    * global-order window would funnel 100 TB through one partition; this
    * never shuffles the records at all (the range partitioning is the
    * only exchange, and the final roll-up is per-shard).
    */
  def shardManifest(s: SparkSession, dir: String,
      budget: Long = 32768L): DataFrame = {
    import s.implicits._
    val d = Relational.t(s, dir, "documents")
      .select(col("doc_id"),
        (lit(512L) +
          length(coalesce(col("text"), lit("")).cast("binary")).cast("long"))
          .as("b"))
      .repartitionByRange(s.sparkContext.defaultParallelism, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .as[(Long, Long)]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = d.rdd
      .mapPartitionsWithIndex { (i, it) =>
        Iterator.single((i, it.map(_._2).sum))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = totals.scanLeft(0L)(_ + _) // exclusive prefix per partition
    val bc = s.sparkContext.broadcast(offsets)
    val assigned = s.createDataFrame(
      d.rdd.mapPartitionsWithIndex { (i, it) =>
        var cum = bc.value(i)
        it.map { case (id, b) =>
          val shard = cum / budget
          cum += b
          (shard, id, b)
        }
      }).toDF("shard_id", "doc_id", "b")
    val out = assigned.groupBy("shard_id")
      .agg(count(lit(1)).as("n_items"),
        sum(col("b")).as("shard_bytes"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy("shard_id")
    Dedup.releaseAfter(out, d.toDF())
  }

  /** Readability screen (`text_readability`) — the Flesch reading-ease
    * family in ALL-INTEGER arithmetic: words = non-empty
    * space-separated tokens, sentences = terminal-punctuation runs
    * (`[.!?]+`, floor 1), syllables = vowel-group runs (`[aeiouy]+` on
    * the lowercased text — the standard cheap approximation). The
    * score ×100 uses integer division only
    * (`20683 − 1015·w/(10·s) − 8460·syl/w`), so the whole report
    * hash-matches the SQL oracle — a float Flesch would drift in the
    * last ulp. Training-data use: drop the unreadable tails (token
    * soup scores deeply negative; boilerplate lists score > 100).
    *
    * Scale shape: pure per-row codegen'd regex counting — map-only, no
    * shuffle at any corpus size.
    */
  def readability(s: SparkSession, dir: String): DataFrame =
    Relational.t(s, dir, "documents")
      .select(col("doc_id"),
        size(filter(split(col("text"), " "), w => length(w) > 0))
          .cast("long").as("n_words"),
        greatest(size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0)))
          .cast("long"), lit(1L)).as("n_sentences"),
        size(regexp_extract_all(lower(col("text")), lit("[aeiouy]+"), lit(0)))
          .cast("long").as("n_syllables"))
      .withColumn("flesch_x100",
        when(col("n_words") > 0,
          lit(20683L) - expr("(1015 * n_words) DIV (10 * n_sentences)")
            - expr("(8460 * n_syllables) DIV n_words"))
          .otherwise(lit(null).cast("long")))
      .orderBy("doc_id")

  /** PMI collocation mining (`text_collocations`) — the phrase-detection
    * pass (word2vec's phrase pass, spaCy's collocation lists): bigrams
    * whose observed rate beats the independence expectation. Ranked by
    * the PMI RATIO `(c₁₂·U²)/(B·c₁·c₂)` (PMI = log of it — log is
    * monotone, so the ranking is identical and the ratio stays in exact
    * double arithmetic over integer counts, which the oracle replays
    * bit-for-bit where a float log would not). `minCount` floors the
    * pair support — PMI's classic failure mode is rare-pair explosion.
    *
    * Scale shape: two map-side-combined count aggregations (unigram,
    * bigram — both bounded by vocabulary, not corpus), one join of the
    * bigram table to the unigram table on each side (pre-reduced, so
    * skew-safe), one global top-k. The corpus is scanned once.
    */
  def collocations(s: SparkSession, dir: String,
      minCount: Int = 5, k: Int = 50): DataFrame = {
    val withToks = Relational.tFan(s, dir, "documents")
      .select(split(col("text"), " ").as("t"))
    val uni = withToks.select(explode(col("t")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("c1"))
    val bg = withToks.filter(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(t) - 1), i -> struct(t[i-1] AS w1, t[i] AS w2))"))
        .as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .filter(length(col("w1")) > 0 && length(col("w2")) > 0)
      .groupBy("w1", "w2").agg(count(lit(1)).as("pair_count"))
    val totals = uni.agg(sum(col("c1")).as("ut"))
      .crossJoin(bg.agg(sum(col("pair_count")).as("bt")))
    bg.filter(col("pair_count") >= minCount)
      .join(uni.select(col("w").as("w1"), col("c1").as("c1l")), "w1")
      .join(uni.select(col("w").as("w2"), col("c1").as("c1r")), "w2")
      .crossJoin(broadcast(totals))
      .select(col("w1"), col("w2"), col("pair_count"),
        (col("pair_count").cast("double") * col("ut") * col("ut") /
          (col("bt").cast("double") * col("c1l") * col("c1r")))
          .as("pmi_ratio"))
      .orderBy(col("pmi_ratio").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** χ² term–label association (`stats_chi2_terms`) — the classic
    * feature-selection / corpus-comparison statistic: for each (term,
    * lang) the 2×2 contingency table over document incidence, scored
    * `N·(ad−bc)²/((a+b)(c+d)(a+c)(b+d))`, top-k terms per lang. This is
    * how a curation pass surfaces what characterizes a slice (label
    * leakage audits, domain keyword extraction). Counts are exact
    * integers; the score is ONE double expression over them with fixed
    * association order, so the oracle replays it bit-for-bit.
    * Ubiquitous terms (df = N) are excluded — their table degenerates.
    *
    * Scale shape: incidence dedup and both document-frequency tables
    * are map-side-combined aggregations bounded by vocabulary; the
    * label/total marginals broadcast; one window per lang (bounded
    * cardinality) takes the top-k.
    */
  def chi2Terms(s: SparkSession, dir: String,
      minDf: Int = 10, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = Relational.tFan(s, dir, "documents")
    val inc = d.select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .distinct()
    val nl = d.groupBy("lang").agg(count(lit(1)).as("n_l"))
    val nn = d.agg(count(lit(1)).as("n"))
    val dft = inc.groupBy("w").agg(count(lit(1)).as("df_t"))
    val dftl = inc.groupBy("w", "lang").agg(count(lit(1)).as("df_tl"))
    val scored = dftl
      .join(dft, "w")
      .join(broadcast(nl), "lang")
      .crossJoin(broadcast(nn))
      .filter(col("df_t") >= minDf && col("df_t") < col("n"))
      .withColumn("b", col("df_t") - col("df_tl"))
      .withColumn("adbc",
        col("df_tl") * (col("n") - col("n_l") - col("b")) -
          col("b") * (col("n_l") - col("df_tl")))
      .select(col("lang"), col("w").as("term"), col("df_tl"), col("df_t"),
        (col("adbc").cast("double") * col("adbc") * col("n") /
          (col("df_t").cast("double") * (col("n") - col("df_t")) *
            col("n_l") * (col("n") - col("n_l"))))
          .as("chi2"))
    val w = Window.partitionBy("lang")
      .orderBy(col("chi2").desc, col("term").asc)
    scored.withColumn("rk", row_number().over(w).cast("int"))
      .filter(col("rk") <= k)
      .orderBy("lang", "rk")
  }

  /** Per-document n-gram novelty (`text_novelty`): the fraction of a
    * doc's distinct 3-grams appearing for the FIRST time in the corpus
    * (by doc_id order — crawl order in production). A low-novelty doc is
    * mostly recombined boilerplate even when no single document
    * duplicates it; curation cuts or down-weights it. One shingle
    * explode (the SHARED staged shingle artifact), one min-aggregation
    * per n-gram, one co-partitioned join back — all map-side combined,
    * never quadratic.
    */
  def novelty(s: SparkSession, dir: String): DataFrame = {
    val shingled = Dedup.docsWithShingles(s, dir)
    val ex = shingled.select(col("doc_id"), explode(col("sh")).as("ng"))
    val first = ex.groupBy("ng").agg(min(col("doc_id")).as("fd"))
    val out = ex.join(first, "ng")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("fd") === col("doc_id"), 1L).otherwise(0L)).as("novel"))
      .withColumn("novelty_bp", expr("(novel * 10000) DIV n_shingles"))
      .orderBy("doc_id")
    Dedup.releaseAfter(out, shingled)
  }

  /** Perceptual-hash near-dup candidates over the multimodal payload
    * (`mm_phash_pairs`): the banded-Hamming join a media dedup runs —
    * 60-bit pHash split into 4×15-bit bands (pigeonhole: Hamming ≤ 3
    * guarantees one identical band), band-equality candidates, exact
    * `bit_count(xor)` verify. The pHash itself is the documented STUB
    * (md5 of the payload bytes — this container ships no image codecs);
    * a real DCT pHash drops into the same column and the banding,
    * candidate join, and verify are unchanged. Scale shape: candidates
    * via 4 equality buckets, never an all-pairs compare.
    */
  def mmPhashPairs(s: SparkSession, dir: String): DataFrame = {
    val h = Relational.t(s, dir, "documents")
      .select(col("doc_id"),
        conv(substring(md5(col("text").cast("binary")), 1, 15), 16, 10)
          .cast("long").as("ph"))
    val bandArr = array((0 until 4).map(b =>
      shiftright(col("ph"), b * 15).bitwiseAND(lit(32767L))): _*)
    val bands = h.select(col("doc_id"), col("ph"),
      posexplode(bandArr).as(Seq("b", "bv")))
    bands.as("x").join(bands.as("y"),
        col("x.b") === col("y.b") && col("x.bv") === col("y.bv") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.ph").as("pa"), col("y.ph").as("pb"))
      .distinct()
      .withColumn("hd", bit_count(col("pa").bitwiseXOR(col("pb"))))
      // emit every verified candidate with its distance and the accept
      // flag (≤ 6 bits ≈ pHash near-dup) — the verify stage's full
      // output, so the gate checks the distance arithmetic, not only
      // the (possibly empty) accepted slice
      .withColumn("is_dup", (col("hd") <= 6).cast("int"))
      .select(col("doc_a"), col("doc_b"), col("hd"), col("is_dup"))
      .orderBy("doc_a", "doc_b")
  }

  /** Trained naive-Bayes document classifier (`text_nb_classify`) — the
    * model-based filter family (fastText-style language/quality
    * classifiers) in PORTABLE INTEGER arithmetic: multinomial NB over
    * tokens with add-1 smoothing, log-probs as the q4 piecewise-linear
    * integer log2 (the `text_entropy`/`text_lm_score` primitive), class
    * score = Σ_tokens (L(T_c + V) − L(count(c,tok)+1)) + (L(D) − L(D_c))
    * in bits — SMALLEST total surprise wins (ties: class asc). Trained
    * and scored on the corpus itself (resubstitution — the quality-screen
    * contract: flag docs whose own class model finds them surprising,
    * and measure model/label agreement), fully replayed by the oracle.
    *
    * Scale shape: the model IS two vocabulary-bounded count tables
    * (token×class, class totals) — map-side-combined aggregations;
    * scoring is the token stream crossed with the (tiny, broadcast)
    * class list, one shuffle join against the count table keyed by
    * (class, token), then a doc-keyed min. Nothing is ever pairwise in
    * documents; at 100 TB the count tables train once per snapshot and
    * persist like any staged index.
    */
  def nbClassify(s: SparkSession, dir: String): DataFrame =
    nbClassifyFor(s,
      Relational.t(s, dir, "documents").select("doc_id", "lang", "text"),
      graft.util.Fanout.forTable(s, dir, "documents"))

  /** Core of [[nbClassify]] over an explicit (doc_id, lang, text) frame —
    * the planted-vocabulary spec drives this directly.
    */
  private[queries] def nbClassifyFor(s: SparkSession, docs: DataFrame,
      fan: DataFrame => DataFrame = identity): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id")
      .orderBy(col("bits_q4").asc, col("cand").asc)
    nbScores(s, docs, fan)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("doc_id"), col("lang"), col("cand").as("pred"),
        col("bits_q4"), (col("cand") === col("lang")).cast("int").as("correct"))
      .orderBy("doc_id")
  }

  /** The full per-(doc, class) NB surprise table behind [[nbClassifyFor]]
    * and the uncertainty-sampling selection ([[nbUncertainty]]).
    */
  private def nbScores(s: SparkSession, docs: DataFrame,
      fan: DataFrame => DataFrame = identity): DataFrame = {
    def l2q4(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val bl = length(bin(c))
      ((bl - 1) * 16).cast("long") +
        call_function("shiftright", c * 16, bl - 1) - 16L
    }
    val tok = fan(docs)
      .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("t"))
      .filter(length(col("t")) > 0)
    val prior = docs.groupBy("lang").agg(count(lit(1)).as("d_c"))
      .crossJoin(broadcast(docs.agg(count(lit(1)).as("d_all"))))
      .select(col("lang").as("cand"), (l2q4(col("d_all")) - l2q4(col("d_c"))).as("prior_q4"))
    // r16 optimization (guide §2.3): the class-conditional model counts
    // were recomputed from the raw token stream for each of their three
    // consumers, and the scoring pass joined every token OCCURRENCE ×
    // every class by (cand, t). Now: the model aggregate is built once
    // and persisted (vocab × classes rows — KBs); the token stream is
    // first collapsed to per-(doc, term) COUNTS (one aggregation), the
    // per-term class counts ride along as ONE map-typed join on t, and
    // the class fan-out happens after that join, map-side, feeding the
    // per-(doc, cand) partial aggregation. bits arithmetic is identical:
    // summing (den−num) over n occurrences == n·(den−num) in exact
    // integer math.
    val ct = tok.groupBy("lang", "t").agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tot = ct.groupBy("lang").agg(sum(col("c")).as("t_c"))
    val vocab = ct.select("t").distinct().agg(count(lit(1)).as("v"))
    val denom = tot.crossJoin(vocab)
      .select(col("lang").as("cand"), l2q4(col("t_c") + col("v")).as("den_q4"))
    val ctByTerm = ct.groupBy("t").agg(
      map_from_entries(collect_list(struct(col("lang"), col("c")))).as("cm"))
    val perDocTok = tok.groupBy("doc_id", "lang", "t")
      .agg(count(lit(1)).as("n"))
    val scored = perDocTok
      .join(ctByTerm, Seq("t")) // every doc term counts for its own lang
      .crossJoin(broadcast(prior.select(col("cand"))))
      .withColumn("num_q4", l2q4(
        coalesce(try_element_at(col("cm"), col("cand")), lit(0L)) + lit(1L)))
      .join(broadcast(denom), "cand")
      .groupBy(col("doc_id"), col("lang"), col("cand"))
      .agg(sum((col("den_q4") - col("num_q4")) * col("n")).as("tok_bits"))
      .join(broadcast(prior), "cand")
      .select(col("doc_id"), col("lang"), col("cand"),
        (col("tok_bits") + col("prior_q4")).as("bits_q4"))
    Dedup.releaseAfter(scored, ct)
  }

  /** Uncertainty sampling (`curate_uncertainty`) — the active-learning
    * selection loop's query: which documents should a human label next?
    * Smallest-MARGIN selection over the NB surprise table — margin =
    * (runner-up class bits − best class bits) in q4; a near-zero margin
    * means the model can't tell the top two classes apart, which is
    * exactly where a new label buys the most. Top-50 most uncertain,
    * ties broken by doc_id. Same integer model as [[nbClassify]], so
    * the selection is hash-gated end to end.
    *
    * Scale shape: the surprise table is |docs|·|classes| rows; best and
    * runner-up collapse through one doc-keyed window (WindowGroupLimit
    * partial heads), and the global top-50 cut is TakeOrdered.
    */
  def nbUncertainty(s: SparkSession, dir: String, k: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id")
      .orderBy(col("bits_q4").asc, col("cand").asc)
    val ranked = nbScores(s,
        Relational.t(s, dir, "documents").select("doc_id", "lang", "text"),
        graft.util.Fanout.forTable(s, dir, "documents"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
    val best = ranked.filter(col("rn") === 1)
      .select(col("doc_id"), col("lang"), col("cand").as("pred"),
        col("bits_q4").as("best_q4"))
    val second = ranked.filter(col("rn") === 2)
      .select(col("doc_id"), col("cand").as("runner_up"),
        col("bits_q4").as("second_q4"))
    best.join(second, "doc_id")
      .withColumn("margin_q4", col("second_q4") - col("best_q4"))
      .orderBy(col("margin_q4").asc, col("doc_id").asc).limit(k)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("margin_q4").asc, col("doc_id").asc)))
      .select("rk", "doc_id", "lang", "pred", "runner_up",
        "best_q4", "second_q4", "margin_q4")
      .orderBy("rk")
  }

  /** RAKE keyphrase extraction (`text_rake_keyphrases`) — Rapid
    * Automatic Keyword Extraction (Rose et al.): candidate phrases are
    * the maximal stopword-free token runs (delimited by [[Stopwords]]),
    * capped at 4 tokens; each word scores degree/frequency over the
    * doc's candidate set (degree = Σ lengths of phrases containing it —
    * co-occurrence reach; frequency = its occurrence count), a phrase
    * scores the sum of its words' scores, top-3 per doc. The ratio is
    * q4 integer floor division, so the whole extraction hash-matches —
    * a keyphrase layer above [[collocations]] (corpus-global PMI
    * bigrams): RAKE is per-document and phrase-length-agnostic.
    *
    * Scale shape: phrase segmentation is one doc-keyed window (running
    * stopword count = group id) over the exploded tokens; everything
    * after is (doc, word)/(doc, phrase)-keyed map-side-combined
    * aggregation on the same doc partitioning; the per-doc top-3
    * collapses through WindowGroupLimit partial heads.
    */
  def rakeKeyphrases(s: SparkSession, dir: String, topk: Int = 3,
      maxLen: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = Relational.tFan(s, dir, "documents")
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("p0", "wrd")))
      .select(col("doc_id"), (col("p0") + 1).as("pos"), col("wrd"))
    val wRun = Window.partitionBy("doc_id").orderBy(col("pos").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nf = toks
      .withColumn("stop", col("wrd").isInCollection(Stopwords).cast("int"))
      .withColumn("grp", sum(col("stop")).over(wRun))
      .filter(col("stop") === 0)
    // r16 optimization (guide §2.4): the old shape joined the filtered
    // token stream back onto the phrase table twice (word scores, then
    // phrase scores), re-evaluating the explode + running-sum window
    // lineage up to four times. The phrase table now CARRIES its sorted
    // word array, so both the word-score aggregation and the phrase
    // scoring derive from one persisted phrase frame via a cheap
    // explode — the token window pass runs exactly once. The exploded
    // occurrences are exactly the rows the old nf⋈phr join produced
    // (collect_list keeps duplicates), so every count/sum is identical.
    val phr = nf.groupBy("doc_id", "grp")
      .agg(count(lit(1)).as("len"),
        transform(
          array_sort(collect_list(struct(col("pos"), col("wrd")))),
          x => x.getField("wrd")).as("ws"))
      .filter(col("len") <= maxLen)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val occ = phr.select(col("doc_id"), col("grp"), col("len"),
      explode(col("ws")).as("wrd"))
    val wsc = occ.groupBy("doc_id", "wrd")
      .agg(count(lit(1)).as("freq"), sum(col("len")).as("deg"))
      .withColumn("wscore_q4", expr("(deg * 16) DIV freq"))
    val wr = Window.partitionBy("doc_id")
      .orderBy(col("score_q4").desc, col("phrase").asc)
    val out = occ.join(wsc.select("doc_id", "wrd", "wscore_q4"),
        Seq("doc_id", "wrd"))
      .groupBy("doc_id", "grp").agg(sum(col("wscore_q4")).as("score_q4"))
      .join(phr.select(col("doc_id"), col("grp"), col("len"),
        array_join(col("ws"), " ").as("phrase")), Seq("doc_id", "grp"))
      .withColumn("rk", row_number().over(wr))
      .filter(col("rk") <= topk)
      .select("doc_id", "rk", "phrase", "len", "score_q4")
      .orderBy("doc_id", "rk")
    Dedup.releaseAfter(out, phr)
  }

  /** Per-source boilerplate removal (`text_boilerplate`) — the template
    * scrub every web-scrape pipeline runs before dedup/training: token
    * k-grams that recur across a large share of ONE source's documents
    * (nav chrome, cookie banners, footer blurbs — site templates, not
    * content) are detected by per-source document frequency and every
    * occurrence's token span is removed; surviving tokens are re-joined
    * in order. A k-gram is boilerplate when its source-local df ≥
    * `minDf` docs AND df·100 ≥ sharePct·(source doc count) — the share
    * rule is the semantics (template ⇔ high within-source prevalence),
    * the absolute floor keeps tiny sources from declaring 2-doc
    * coincidences templates. Output per doc: token counts before/after
    * and the md5 of the cleaned text, so the gate checks the whole
    * reconstruction, not just the drop counts.
    *
    * Scale shape: shingling is a map-side explode; df is a (source,
    * shingle)-keyed aggregate with map-side dedup partials; the
    * boilerplate set (tiny by construction — templates are few) joins
    * back to shingle occurrences on (source, shingle); covered
    * positions explode k rows per hit; the rebuild is one doc-keyed
    * aggregate. Everything is linear in corpus token count; nothing is
    * ever pairwise.
    */
  def boilerplate(s: SparkSession, dir: String, k: Int = 3,
      sharePct: Int = 12, minDf: Int = 3): DataFrame =
    boilerplateFor(Relational.t(s, dir, "documents"), k, sharePct, minDf)

  /** Core of [[boilerplate]] over an explicit (doc_id, source, text)
    * frame — the planted-template spec drives this directly.
    * `release = false` keeps the lazy (inspectable) plan and leaves the
    * tokenized frame persisted — for plan tests (the [[lmScoreFor]]
    * convention); library callers get the default, which materializes
    * and releases the cache.
    */
  private[queries] def boilerplateFor(docs: DataFrame, k: Int,
      sharePct: Int, minDf: Int, release: Boolean = true): DataFrame = {
    val d = docs
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sh = d.filter(size(col("w")) >= k)
      .withColumn("pos", explode(expr(s"sequence(1, size(w) - ${k - 1})")))
      .select(col("doc_id"), col("source"), col("pos"),
        expr(s"concat_ws(' ', slice(w, pos, $k))").as("sh"))
    val srcDocs = d.groupBy("source").agg(count(lit(1)).as("nd"))
    val dfq = sh.select("source", "sh", "doc_id").distinct()
      .groupBy("source", "sh").agg(count(lit(1)).as("df"))
    val bp = dfq.join(broadcast(srcDocs), "source")
      .filter(col("df") >= minDf &&
        col("df") * 100 >= col("nd") * sharePct)
      .select("source", "sh")
    val cov = sh.join(bp, Seq("source", "sh"))
      .select(col("doc_id"),
        explode(expr(s"sequence(pos, pos + ${k - 1})")).as("cpos"))
      .distinct()
    val toks = d.select(col("doc_id"), posexplode(col("w")).as(Seq("p0", "word")))
      .select(col("doc_id"), (col("p0") + 1).as("pos"), col("word"))
    val kept = toks.join(cov,
      toks("doc_id") === cov("doc_id") && toks("pos") === cov("cpos"),
      "left_anti")
    val cleaned = kept.groupBy("doc_id").agg(
      count(lit(1)).as("n_kept"),
      md5(array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("word")))),
        x => x.getField("word")), " ")).as("clean_md5"))
    val out = d.select(col("doc_id"), size(col("w")).cast("long").as("n_tokens"))
      .join(cleaned, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("clean_md5"), md5(lit(""))).as("clean_md5"))
      .orderBy("doc_id")
    if (release) graft.queries.Dedup.releaseAfter(out, d) else out
  }
}
