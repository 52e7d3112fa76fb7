package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (point-in-interval) join: pair each point `p` with every interval
  * `[lo, hi)` containing it, with NO equality key available.
  *
  * Spark plans a bare `p >= lo AND p < hi` join as a broadcast-nested-loop
  * — O(points × intervals) and broadcast-limited. This operator uses bin
  * replication to turn it into an equi shuffle join:
  *
  *   1. pick a bin width W (≈ the typical interval length),
  *   2. replicate each interval to every W-aligned bin it overlaps
  *      (`explode(sequence(bin(lo), bin(hi-1)))`),
  *   3. hash each point to exactly ONE bin (`bin(p)`),
  *   4. equi-join on the bin id, then apply the exact containment filter.
  *
  * Because a point lives in exactly one bin, each matching (point,
  * interval) pair is emitted exactly once — no post-dedup pass. Cost: one
  * equi shuffle on the bin id; interval-side blow-up is
  * `ceil(len / W) + 1` rows per interval, so W near the median interval
  * length keeps replication ≈ 2×. Dense bins (many points AND many
  * intervals in one W window) are ordinary join skew — AQE's skew-join
  * split handles them, since this IS a plain equi join after rewrite.
  */
object RangeJoin {

  /** Floor division that stays in long arithmetic (correct for negative
    * values too, where `DIV` truncates toward zero).
    */
  private def floorDiv(x: Column, w: Long): Column =
    ((x - pmod(x, lit(w))) / w).cast("long")

  /** @param points    point side; `pointCol` must be an integral column
    *                  (e.g. epoch micros)
    * @param pointCol  the point value
    * @param intervals interval side; column names must not collide with
    *                  `points`' columns
    * @param loCol     inclusive lower bound, same scale as `pointCol`
    * @param hiCol     exclusive upper bound; empty intervals (hi <= lo)
    *                  match nothing
    * @param binWidth  bin width in `pointCol` units
    * @return inner join: all point columns ++ all interval columns, one
    *         row per (point, containing interval)
    */
  def pointInInterval(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val iv = intervals
      .filter(col(hiCol) > col(loCol)) // guard: descending sequence() otherwise
      .withColumn("_graft_ibin",
        explode(sequence(floorDiv(col(loCol), binWidth),
          floorDiv(col(hiCol) - 1, binWidth))))
    val pt = points.withColumn("_graft_pbin", floorDiv(col(pointCol), binWidth))
    pt.join(iv,
        col("_graft_pbin") === col("_graft_ibin") &&
          col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("_graft_pbin", "_graft_ibin")
  }
}
