package graft.queries

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
}
