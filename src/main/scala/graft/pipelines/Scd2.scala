package graft.pipelines

import graft.lake.{LakeTable, Timeline}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Slowly-changing-dimension TYPE 2 materialization from the lake CDC
  * feed: the full version history of every key as
  * `(attrs..., valid_from, valid_to, is_current)` — the classic
  * warehouse dimension shape, derived from change images instead of
  * diffing snapshots.
  *
  * Versions are bounded by COMMIT ORDINALS (the commit's 1-based
  * position on the timeline), not wall-clock instants — ordinals are
  * deterministic replay-stable coordinates (instants are wall-clock and
  * would never hash-gate), and a consumer who wants timestamps joins
  * the ordinal→instant mapping ([[commitOrdinals]]) back on.
  *
  * Semantics per key: each assert image (insert / update_postimage)
  * OPENS a version at its commit's ordinal; the version CLOSES at the
  * next event for the key — the next assert (a newer version) or a
  * delete. An open version (`valid_to` null) is current. A deleted key
  * contributes its closed versions and nothing else: deletes end
  * history, they don't write rows.
  *
  * Scale shape: one change feed per commit range (each already pruned
  * to touched file groups), unioned with the ordinal tag; the chain
  * build is ONE key-partitioned window (lead over ≤ versions-per-key
  * rows) — partitioned by the table key, never a global sort. The
  * from-genesis build here replays every commit (the bootstrap); a
  * production pipeline maintains the dimension INCREMENTALLY by folding
  * each new commit's feed — append the new asserts as open versions,
  * close the previous version of touched keys — which is O(changed
  * rows) per advance, the same maintenance contract as
  * [[RollupMaintain]]/[[JoinMaintain]]/[[DistinctMaintain]].
  */
object Scd2 {

  /** (ordinal, instant) for every commit on the active timeline,
    * ascending — bounded metadata (the timeline), driver-side.
    */
  def commitOrdinals(t: LakeTable): Seq[(Long, String)] =
    t.timeline.instants().zipWithIndex
      .map { case (inst, i) => ((i + 1).toLong, inst) }

  /** The full SCD2 history of `t`: one row per key VERSION carrying the
    * user columns as of that version, `valid_from`/`valid_to` commit
    * ordinals (`valid_to` null = open) and `is_current`.
    */
  def history(t: LakeTable, keyCols: Seq[String]): DataFrame = {
    val ords = commitOrdinals(t)
    require(ords.nonEmpty, "empty table has no history")
    val perCommit = ords.zipWithIndex.map { case ((ord, inst), i) =>
      val begin = if (i == 0) Timeline.Earliest else ords(i - 1)._2
      t.changes(begin, inst)
        .withColumn("_ord", lit(ord))
    }
    val events = perCommit.reduce(_ unionAll _)
      // SCD events: asserts open versions, deletes close them;
      // update_preimage is the closing side of its own assert — drop it
      .filter(col(LakeTable.ChangeTypeCol) =!= "update_preimage")
      .withColumn("_assert",
        col(LakeTable.ChangeTypeCol).isin("insert", "update_postimage"))
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col("_ord"))
    events
      .withColumn("valid_to", lead(col("_ord"), 1).over(w))
      .filter(col("_assert"))
      .drop(LakeTable.ChangeTypeCol, LakeTable.ChangeCommitCol, "_assert")
      .withColumnRenamed("_ord", "valid_from")
      .withColumn("is_current", col("valid_to").isNull)
  }
}
