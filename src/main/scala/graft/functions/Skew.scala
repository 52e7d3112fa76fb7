package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for hot-key workloads (the 100 TB concern AQE
  * doesn't always catch: a single grouping/join key holding percent-scale
  * volume).
  *
  * Both transforms are deterministic (hash-derived salt, no RNG) and
  * semantically transparent: results equal the unsalted operation.
  */
object Skew {

  /** Deterministic row salt in [0, n): hash of the whole row's listed
    * columns — spreads a hot key's rows across n sub-keys.
    */
  def rowSalt(cols: Seq[Column], n: Int): Column =
    pmod(xxhash64(cols: _*), lit(n.toLong)).cast("int")

  /** Two-phase salted aggregation: groupBy(keys :+ salt) partial-agg →
    * groupBy(keys) final-agg. Use for algebraic aggregates (sum/count/
    * min/max) when one key dominates; each phase's partitions stay
    * bounded by volume/n.
    *
    * @param partial aggregates over the raw rows (must be re-aggregable)
    * @param fin     aggregates combining the partial columns
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], saltBuckets: Int,
      saltBy: Seq[String])(partial: Seq[Column], fin: Seq[Column]): DataFrame =
    df.withColumn("_salt", rowSalt(saltBy.map(col), saltBuckets))
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(fin.head, fin.tail: _*)

  /** Salted equi-join of a skewed big side against a smaller side: the
    * big side gets a deterministic salt, the small side is replicated
    * `saltBuckets`× with every salt value, and the join key becomes
    * (keys, salt) — a hot key's rows land in `saltBuckets` tasks instead
    * of one. Join type inner or left_outer (left = big side).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      saltBuckets: Int, joinType: String = "inner",
      saltBy: Seq[String] = Seq.empty): DataFrame = {
    val saltCols = if (saltBy.nonEmpty) saltBy else big.columns.toSeq
    val b = big.withColumn("_salt", rowSalt(saltCols.map(big(_)), saltBuckets))
    val s = small
      .withColumn("_salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
      .withColumn("_salt", col("_salt").cast("int"))
    b.join(s, keys :+ "_salt", joinType).drop("_salt")
  }
}
