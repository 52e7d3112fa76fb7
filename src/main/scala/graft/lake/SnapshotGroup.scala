package graft.lake

import org.apache.spark.sql.DataFrame

/** Mutually consistent reads across SEVERAL tables — the joint-read
  * primitive a multi-table pipeline needs (join documents to their
  * embeddings table at one cut, export a coherent set of marts) when
  * each table advances under its own independent writers.
  *
  * The cut is the minimum of the per-table stable frontiers
  * ([[Timeline.stableInstant]]: the latest committed instant, capped
  * strictly below any live in-flight reservation). Reading every table
  * `snapshotAsOf(cut)` is then REPEATABLE: nothing can ever publish at
  * or below the cut afterwards — pending writers are already above it
  * by the cap, and new reservations number above every committed
  * instant — so re-running the group read returns byte-identical
  * results on every table, no matter how the tables keep moving.
  * Instants are wall-clock ordered strings, so the cut is also a
  * meaningful point in time across tables on one writer clock domain.
  *
  * At 100 TB this is metadata-only coordination: one timeline read per
  * table to choose the cut, then ordinary pruned as-of scans — no
  * locks held across tables and no data moved.
  */
object SnapshotGroup {

  /** The group's consistent cut, `None` when any table has no stable
    * commit yet (a joint read would see an empty member).
    */
  def cut(tables: Seq[LakeTable]): Option[String] = {
    require(tables.nonEmpty, "snapshot group needs at least one table")
    val fronts = tables.map(_.timeline.stableInstant())
    if (fronts.exists(_.isEmpty)) None else Some(fronts.flatten.min)
  }

  /** Every table's snapshot at the group cut, keyed by table name. */
  def read(tables: Seq[LakeTable]): Option[Map[String, DataFrame]] =
    cut(tables).map(c =>
      tables.map(t => t.meta.name -> t.snapshotAsOf(c)).toMap)
}
