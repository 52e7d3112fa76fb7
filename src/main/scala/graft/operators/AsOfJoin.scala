package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the single latest right row whose
  * timestamp is at-or-before the left row's timestamp, matching on equality
  * keys ("most recent prior observation" — trades joining ticks, event
  * attribution, slowly-changing lookups).
  *
  * Spark has no built-in as-of join; the naive encoding
  * (`l.ts >= r.ts` + window-pick) is an inequality join Spark can only run
  * as a broadcast-nested-loop — quadratic per key and driver-limited.
  * This operator instead uses the union + running-aggregate form:
  *
  *   1. tag left (1) and right (0) rows and union them,
  *   2. one window partitioned by the keys, ordered by (ts, tag),
  *   3. running `max(struct(rightTs, rightVals*))` carries the latest
  *      right payload forward (nulls — i.e. left rows — are skipped by
  *      `max`),
  *   4. keep the left rows.
  *
  * Cost: ONE shuffle on the equality keys and a sort — the same price as a
  * sort-merge equi-join, independent of time-overlap fan-out. At 100 TB
  * this is the only shape that survives; a skewed key still concentrates
  * its rows on one task, so pre-split pathological keys with
  * [[graft.functions.Skew]] if one key dominates.
  *
  * Semantics and determinism:
  *  - at-or-before: a right row at exactly the left row's timestamp wins
  *    (right tag 0 sorts before left tag 1);
  *  - right rows tied on the timestamp resolve to the greatest
  *    `(rightVals*)` tuple — deterministic regardless of partition layout
  *    (running `max` is commutative, so tie order inside the sort never
  *    shows through);
  *  - left rows with no prior right row get nulls.
  */
object AsOfJoin {

  /** @param left      probe side; all its columns pass through
    * @param right     build side; only `keys`, `rightTs` and `rightVals`
    *                  are consulted (must not collide with left's columns
    *                  only via the output `prefix`)
    * @param keys      equality-match columns present on both sides
    * @param leftTs    left ordering column (numeric or timestamp)
    * @param rightTs   right ordering column, same type as `leftTs`
    * @param rightVals right payload columns carried onto matches
    * @param prefix    prepended to `rightTs` and each of `rightVals` in
    *                  the output
    */
  def asOfPrior(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightVals: Seq[String] = Nil,
      prefix: String = "asof_"): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one equality key")
    val leftCols = left.columns.toSeq
    val carried = rightTs +: rightVals

    // Right payload travels inside one struct whose FIRST field is the
    // timestamp, so struct ordering (lexicographic by field) makes
    // `max` = "latest, ties broken by greatest payload".
    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("_graft_ts"),
        struct(carried.map(col): _*).as("_graft_asof"),
        lit(0).as("_graft_tag")): _*)
    val l = left
      .withColumn("_graft_ts", col(leftTs))
      .withColumn("_graft_tag", lit(1))

    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("_graft_ts"), col("_graft_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r, allowMissingColumns = true)
      .withColumn("_graft_m", max(col("_graft_asof")).over(w))
      .filter(col("_graft_tag") === 1)
      .select(leftCols.map(col) ++
        carried.map(v => col(s"_graft_m.$v").as(prefix + v)): _*)
  }
}
