package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-shingling / hashing building blocks for the dedup + text-analysis
  * operators. Everything here is composed from codegen'd Catalyst
  * built-ins (higher-order functions, no UDFs) so the hot path stays
  * inside whole-stage codegen and scales linearly per row — the design
  * rule for the 100 TB target.
  */
object TextFunctions {

  /** Whitespace tokens of `text`. */
  def words(text: Column): Column = split(text, " ")

  /** Distinct word n-gram shingles; empty array when the doc is shorter
    * than n (guards sequence() from descending ranges).
    */
  def shingles(text: Column, n: Int): Column = {
    val w = words(text)
    when(size(w) >= n,
      array_distinct(transform(sequence(lit(0), size(w) - n),
        i => concat_ws(" ", slice(w, i + lit(1), lit(n))))))
      .otherwise(array().cast("array<string>"))
  }

  /** MinHash signature: for each of `k` derived hash functions, the
    * minimum over the shingle set.
    *
    * NOTE (perf): higher-order array functions evaluate interpreted —
    * outside whole-stage codegen — so a per-row
    * `transform(seeds, s -> array_min(transform(sh, hash)))` costs
    * k·|sh| interpreted lambda calls and dominated the benchmark (188 s
    * at sf0.1). Prefer [[graft.queries.Dedup.minhashSignatures]], which
    * explodes shingles and computes the k minima as codegen'd aggregate
    * expressions with map-side partial combine. This per-row variant is
    * kept for small inputs / single-doc scoring.
    */
  def minhashSignature(sh: Column, k: Int): Column = {
    // two real hashes per shingle; g_i = h1 XOR rot_i(h2) (same family as
    // graft.queries.Dedup.derivedHash, ANSI-overflow-free)
    val withHashes = transform(sh,
      x => struct(xxhash64(x).as("h1"), xxhash64(x, lit(1)).as("h2")))
    array((0 until k).map(i =>
      array_min(transform(withHashes,
        p => graft.queries.Dedup.derivedHash(
          p.getField("h1"), p.getField("h2"), i)))): _*)
  }

  /** LSH bands: the signature split into `bands` arrays of `rowsPerBand`.
    * Docs sharing any band become near-dup candidates.
    */
  def lshBands(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => slice(sig, b * lit(rowsPerBand) + lit(1), lit(rowsPerBand)))

  /** Exact Jaccard similarity of two pre-distinct shingle arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    inter / (size(a) + size(b) - inter)
  }

  /** 64-bit SimHash over whitespace tokens (sign-aggregated per-bit votes
    * of xxhash64(token)). Authored as a SQL expression string because the
    * Scala `shiftleft` wrapper only takes literal shift amounts; still
    * pure built-ins.
    */
  def simhash64(textCol: String): Column = expr(
    s"""aggregate(sequence(0, 63), 0L, (acc, b) -> acc + IF(
       |  aggregate(split($textCol, ' '), 0L,
       |    (a, t) -> a + IF(((xxhash64(t) >> b) & 1) = 1, 1L, -1L)) > 0,
       |  shiftleft(1L, b), 0L))""".stripMargin)

  /** Polynomial rolling-hash fingerprint over words — portable: the same
    * arithmetic is expressible in ANSI SQL (see the DuckDB oracle), so
    * fingerprints are engine-independent.
    */
  def fingerprint(text: Column): Column =
    aggregate(words(text), lit(0L),
      (acc, w) => pmod(
        acc * lit(257L) +
          (length(w) * lit(31) + ascii(w) * lit(7) + ascii(reverse(w)) * lit(13)),
        lit(1000000007L)))

  /** All `w`-token window hashes of a text (1 per window start), with
    * the same portable polynomial/token arithmetic as [[fingerprint]] —
    * the primitive of substring-level duplicate detection. Callers must
    * pre-filter to texts with ≥ `w` tokens (an ascending `sequence`
    * needs a non-negative span).
    */
  def spanHashes(text: Column, w: Int): Column = {
    val ws = words(text)
    transform(sequence(lit(1), size(ws) - lit(w) + lit(1)),
      i => aggregate(slice(ws, i, lit(w)), lit(0L),
        (acc, t) => pmod(
          acc * lit(257L) +
            (length(t) * lit(31) + ascii(t) * lit(7) +
              ascii(reverse(t)) * lit(13)),
          lit(1000000007L))))
  }

  /** Count of tokens from a marker set — the language-ID scoring
    * primitive (n-gram/stopword heuristic).
    */
  def markerHits(text: Column, markers: Seq[String]): Column =
    size(filter(words(text), w => w.isin(markers: _*)))
}
