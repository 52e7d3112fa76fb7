package graft.queries

import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Near-duplicate detection over `documents` — the training-data-pipeline
  * dedup suite (BASELINE.json north star).
  *
  * Scale design: both pair-generators avoid the O(N²) all-pairs join.
  *  - [[jaccardPairs]] builds a distributed inverted index
  *    (shingle → docs) and only pairs docs sharing a shingle — the
  *    standard exact algorithm; shuffle is bounded by total shingle
  *    occurrences, and a document-frequency cap can drop stop-shingles at
  *    higher scale.
  *  - [[minhashLsh]] generates candidates by LSH banding (docs sharing
  *    any of 16 bands of a 64-hash MinHash signature), then verifies with
  *    exact Jaccard — the sub-quadratic scale path; candidate volume is
  *    tunable via (bands, rowsPerBand) for the target similarity.
  */
object Dedup {

  private val N = 3 // word-3-gram shingles
  private val NumHashes = 64
  private val Bands = 16
  private val RowsPerBand = 4
  private val Threshold = 0.8

  private def docsWithShingles(s: SparkSession, dir: String): DataFrame =
    Relational.t(s, dir, "documents")
      .select(col("doc_id"), shingles(col("text"), N).as("sh"))
      .filter(size(col("sh")) > 0)

  /** Exact n-gram Jaccard pairs ≥ 0.8 via inverted index self-join. */
  def jaccardPairs(s: SparkSession, dir: String): DataFrame = {
    val docs = docsWithShingles(s, dir)
    val ex = docs.select(col("doc_id"), size(col("sh")).as("n"),
      explode(col("sh")).as("s"))
    ex.alias("a")
      .join(ex.alias("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        col("a.n").as("na"), col("b.n").as("nb"))
      .agg(count(lit(1)).as("shared"))
      .withColumn("jaccard",
        col("shared") / (col("na") + col("nb") - col("shared")))
      .filter(col("jaccard") >= Threshold)
      .select("id_a", "id_b", "jaccard")
      .orderBy("id_a", "id_b")
  }

  /** MinHash + LSH banding candidates, exact-Jaccard verified. Same
    * output contract as [[jaccardPairs]] (recall ≈ 1 at these
    * similarities: P[miss j=0.8] = (1-0.8⁴)¹⁶ ≈ 2e-4).
    */
  def minhashLsh(s: SparkSession, dir: String): DataFrame = {
    val docs = docsWithShingles(s, dir)
      .withColumn("sig", minhashSignature(col("sh"), NumHashes))
    val banded = docs.select(col("doc_id"),
      posexplode(lshBands(col("sig"), Bands, RowsPerBand)).as(Seq("band", "bsig")))
    val cands = banded.alias("a")
      .join(banded.alias("b"),
        col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    cands
      .join(docs.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(docs.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= Threshold)
      .select("id_a", "id_b", "jaccard")
      .orderBy("id_a", "id_b")
  }

  /** SimHash near-dup pairs (Hamming distance ≤ 3), candidates banded on
    * the four 16-bit chunks (any pair within distance 3 shares a chunk by
    * pigeonhole). No DuckDB oracle — xxhash64 is Spark-specific — so the
    * driver records a rows-only check; the spec cross-checks against
    * [[jaccardPairs]] instead.
    */
  def simhashPairs(s: SparkSession, dir: String): DataFrame = {
    val docs = Relational.t(s, dir, "documents")
      .select(col("doc_id"), simhash64("text").as("sh64"))
    val chunked = docs.select(col("doc_id"), col("sh64"),
      posexplode(expr(
        "transform(sequence(0,3), c -> (sh64 >> (16 * c)) & 65535)"))
        .as(Seq("chunk", "cval")))
    chunked.alias("a")
      .join(chunked.alias("b"),
        col("a.chunk") === col("b.chunk") && col("a.cval") === col("b.cval") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        bit_count(col("a.sh64").bitwiseXOR(col("b.sh64"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
      .orderBy("id_a", "id_b")
  }

  /** Portable rolling-hash document fingerprints (oracle-checked). */
  def fingerprints(s: SparkSession, dir: String): DataFrame =
    Relational.t(s, dir, "documents")
      .select(col("doc_id"), fingerprint(col("text")).as("fp"))
      .orderBy("doc_id")
}
