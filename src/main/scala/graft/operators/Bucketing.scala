package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (pre-shuffled) table layout — the co-located-join lever for
  * joins too big to broadcast and too frequent to re-shuffle.
  *
  * A bucketed write hash-partitions rows into a fixed bucket count ON
  * DISK and records that layout in the catalog; every later join or
  * aggregation keyed on the bucket column reads each bucket as an
  * already-correctly-partitioned split, so Catalyst plans the join with
  * NO Exchange on the bucketed side (spec-asserted). At 100 TB this is
  * the difference between shuffling the fact table once per query and
  * once per INGEST: pay the partitioning when the data lands, join for
  * free forever after — the classic Hive/Spark SMB-join layout, and the
  * batch analog of the lake's key-sorted file groups.
  *
  * Bucket-count guidance: fixed at write time, so size it for the
  * TARGET scale (buckets ≈ data / healthy-partition-size), not the
  * current one — both join sides must agree on the count to co-locate.
  */
object Bucketing {

  /** Write `df` bucketed (and in-bucket sorted) on `key` as a catalog
    * table. Sorting within buckets additionally lets sort-merge joins
    * skip their sort step (files are read pre-sorted per bucket).
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      key: String): Unit =
    writeBucketed(df, table, buckets, Seq(key))

  /** Multi-key form: bucket AND sort by the full key tuple — a join on
    * exactly these keys then reads both sides in place (zero shuffle).
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      keys: Seq[String]): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)

  /** Join two same-bucket-count tables on their bucket keys — plans
    * shuffle-free when both sides were written with the same bucket
    * count on the join keys.
    */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
      leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(left)
    val r = spark.table(right)
    // dataframe-qualified keys: same-named join columns (the common
    // fact-to-fact case) must not trip AMBIGUOUS_REFERENCE
    l.join(r, l(leftKey) === r(rightKey))
  }
}
