package graft.pipelines

import graft.lake.LakeTable
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Incremental view maintenance (IVM) over the lake CDC feed: a
  * sum/count rollup kept current by applying each commit range's CHANGE
  * IMAGES instead of recomputing from the snapshot. The change feed's
  * four image types map to signed contributions — `insert` /
  * `update_postimage` add, `delete` / `update_preimage` subtract — so
  * `state ⊕ delta(changes(a, b)) = fullState(snapshot@b)` for any
  * committed range: the algebra the oracle query and the specs pin.
  *
  * Why this matters at 100 TB: a nightly rollup over a petabyte table
  * rescans the world; this maintains it with O(changed rows) work per
  * advance — the change feed is already pruned to touched file groups
  * ([[LakeTable.changes]]), the delta aggregate combines map-side, and
  * the state join is rollup-sized (groups, not rows).
  *
  * Sums use DECIMAL so maintained state is EXACTLY equal to a fresh
  * recompute (float addition order would differ between the two paths).
  *
  * Persisted form ([[advance]]): state generations under
  * `stateDir/gen_<instant>/` (the instant the state is current AS OF,
  * `_SUCCESS`-marked); readers take the max published generation, a new
  * advance folds `changes(cur, latest)` into the next generation and
  * sweeps older ones after. Calling advance twice (or replaying after a
  * crash between write and sweep) is a no-op — the generation name IS
  * the watermark.
  */
object RollupMaintain {

  private val Dec = "decimal(28,2)"

  /** The maintained rollup, computed fresh from a snapshot. */
  def fullState(snapshot: DataFrame, groupCols: Seq[String],
      value: Column): DataFrame =
    snapshot.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        sum(value.cast(Dec)).cast(Dec).as("sum_v"))

  /** Signed per-group delta from a change-image frame. */
  def delta(changes: DataFrame, groupCols: Seq[String],
      value: Column): DataFrame = {
    val sign = when(col(LakeTable.ChangeTypeCol)
      .isin("insert", "update_postimage"), 1L).otherwise(-1L)
    changes.groupBy(groupCols.map(col): _*)
      .agg(sum(sign).as("dcnt"),
        sum((value.cast(Dec)) * sign).cast(Dec).as("dsum"))
  }

  /** state ⊕ delta: full-outer on the group key (a group may be brand
    * new or newly emptied), coalesced adds, groups netting to zero rows
    * dropped. The join is rollup×rollup — groups, never data.
    */
  def applyDelta(state: DataFrame, d: DataFrame,
      groupCols: Seq[String]): DataFrame =
    state.join(d, groupCols, "full_outer")
      .select(groupCols.map(col) ++ Seq(
        (coalesce(col("cnt"), lit(0L)) + coalesce(col("dcnt"), lit(0L)))
          .as("cnt"),
        (coalesce(col("sum_v"), lit(0).cast(Dec)) +
          coalesce(col("dsum"), lit(0).cast(Dec))).cast(Dec)
          .as("sum_v")): _*)
      .filter(col("cnt") =!= 0)

  private def fs(s: SparkSession, dir: String) =
    new Path(dir).getFileSystem(s.sparkContext.hadoopConfiguration)

  /** Published generations, newest first. */
  private def generations(s: SparkSession, stateDir: String): Seq[String] = {
    val p = new Path(stateDir)
    val f = fs(s, stateDir)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toIndexedSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("gen_") &&
        f.exists(new Path(st.getPath, "_SUCCESS")))
      .map(_.getPath.getName.stripPrefix("gen_"))
      .sorted.reverse
  }

  /** The persisted state and the instant it is current as of. */
  def current(s: SparkSession, stateDir: String): Option[(DataFrame, String)] =
    generations(s, stateDir).headOption.map { inst =>
      (s.read.parquet(s"$stateDir/gen_$inst"), inst)
    }

  /** Fold everything committed since the last advance into a new state
    * generation. Returns the instant the state is now current as of (or
    * None when the table has no commits yet). Idempotent: re-invocation
    * with no new commits — including a crash-replay that already wrote
    * the newest generation — only re-sweeps.
    */
  def advance(s: SparkSession, table: LakeTable, stateDir: String,
      groupCols: Seq[String], value: Column): Option[String] = {
    val latest = table.latestCommit.getOrElse(return None)
    // VALIDITY (the secondaryIndexAsOf contract): a stored watermark no
    // longer on the active timeline means the generation is orphaned — a
    // restore below it rolled back commits the state already folded (and
    // `inst >= latest` would keep serving it, since post-restore commits
    // take higher wall-clock instants), an archival past it collapsed
    // the commits the delta feed needs into a net checkpoint. Discard
    // and re-bootstrap from the current snapshot.
    val cur = current(s, stateDir).filter { case (_, inst) =>
      val valid = table.timeline.instants().contains(inst)
      if (!valid) generations(s, stateDir).foreach { old =>
        fs(s, stateDir).delete(new Path(s"$stateDir/gen_$old"), true)
      }
      valid
    }
    val next = cur match {
      case Some((_, inst)) if inst >= latest => None // nothing new
      case Some((state, inst)) =>
        // bound the feed to the watermark this generation is named for
        // (concurrent OCC writer between latestCommit and the delta job
        // would otherwise be folded but not covered → double-counted on
        // the next advance)
        Some(applyDelta(state, delta(table.changes(inst, latest), groupCols,
          value), groupCols))
      case None =>
        Some(fullState(table.snapshotAsOf(latest), groupCols, value))
    }
    next.foreach { st =>
      st.write.mode("overwrite").parquet(s"$stateDir/gen_$latest")
    }
    // sweep superseded generations (readers already pick the max)
    val f = fs(s, stateDir)
    generations(s, stateDir).drop(1).foreach { old =>
      f.delete(new Path(s"$stateDir/gen_$old"), true)
    }
    Some(generations(s, stateDir).headOption.getOrElse(latest))
  }

  /** One CDC micro-batch folded into the persisted state, keyed by the
    * STREAM's batch id (zero-padded so generation names stay ordered).
    * Idempotent per batch id — a replay after a crash between the state
    * write and the stream's checkpoint commit sees its own generation
    * and skips. Use a state dir per maintenance mode: batch-id
    * generations (this) and instant generations ([[advance]]) don't mix.
    */
  def applyBatch(s: SparkSession, batch: DataFrame, stateDir: String,
      groupCols: Seq[String], value: Column, batchId: Long): Unit = {
    val gen = f"gen_$batchId%020d"
    if (fs(s, stateDir).exists(new Path(s"$stateDir/$gen/_SUCCESS"))) return
    val d = delta(batch, groupCols, value)
    val next = current(s, stateDir) match {
      case Some((state, _)) => applyDelta(state, d, groupCols)
      // no state yet: from-earliest CDC classifies everything as an
      // insert, so the first delta IS the rollup
      case None => applyDelta(d.limit(0)
        .select(groupCols.map(col) ++ Seq(col("dcnt").as("cnt"),
          col("dsum").as("sum_v")): _*), d, groupCols)
    }
    next.write.mode("overwrite").parquet(s"$stateDir/$gen")
    val f = fs(s, stateDir)
    generations(s, stateDir).drop(1).foreach { old =>
      f.delete(new Path(s"$stateDir/gen_$old"), true)
    }
  }

  /** Continuous IVM: the lake CDC streaming source feeds [[applyBatch]]
    * — the rollup stays current with every commit, end to end O(changed
    * rows), with the stream checkpoint + per-batch generations making
    * the whole loop crash-replay safe.
    */
  def runStream(spark: SparkSession, tablePath: String, stateDir: String,
      groupCols: Seq[String], value: Column, checkpointDir: String,
      triggerSeconds: Int = 1): StreamingQuery =
    spark.readStream.format("graft-lake")
      .option("query.type", "changes")
      .load(tablePath)
      .writeStream
      .queryName("rollup-maintain")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(s"$triggerSeconds seconds"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          applyBatch(batch.sparkSession, batch, stateDir, groupCols, value,
            batchId)
      }
      .start()
}
