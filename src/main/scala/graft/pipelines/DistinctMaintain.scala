package graft.pipelines

import graft.lake.LakeTable
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Incremental view maintenance for the NON-self-maintainable aggregates
  * — COUNT(DISTINCT v), MIN(v), MAX(v) per group — the third IVM family
  * next to [[RollupMaintain]] (sums/counts) and [[JoinMaintain]] (joins).
  *
  * Sums are self-maintainable: a delete subtracts and you are done.
  * Distinct/min/max are NOT — when a delete removes the group's current
  * minimum, no function of (old aggregate, change row) can tell you the
  * new minimum, and when it removes one occurrence of a value, nothing
  * in the aggregate says whether another occurrence survives. The
  * classic fix (Gupta/Mumick's counting algorithm) is an auxiliary
  * MULTIPLICITY state: `(group, value) → cnt`, maintained with the same
  * signed change-image algebra the other families use (insert /
  * update_postimage +1, delete / update_preimage −1). The view is then
  * a pure function of the aux state: distinct = values with cnt > 0,
  * min/max = extremes over those values — all three delete-safe.
  *
  * Invariant (what the oracle query and the spec pin):
  * `view(aux ⊕ delta(changes(a, b))) = fresh distinct/min/max @ b` for
  * any committed range, exactly — integer counts, untouched values, no
  * float arithmetic anywhere.
  *
  * Why this matters at 100 TB: the delta is a map-side-combined groupBy
  * over O(changed rows); the merge is aux×delta keyed on (group, value)
  * — with the aux table written bucketed on exactly that (group, value)
  * pair, a co-located sliver join (plan-asserted in BucketingSpec: zero
  * shuffle on the aux side of applyDelta). The aux state is bounded by DISTINCT (group, value)
  * pairs, not rows — the whole point of maintaining it instead of
  * rescanning a petabyte to re-count distincts nightly. The final view
  * aggregate is aux-sized and map-side combinable.
  */
object DistinctMaintain {

  private def sign = when(col(LakeTable.ChangeTypeCol)
    .isin("insert", "update_postimage"), 1L).otherwise(-1L)

  /** The multiplicity aux state, computed fresh from a snapshot:
    * `(groupCols..., v, cnt)`.
    */
  def fullAux(snapshot: DataFrame, groupCols: Seq[String],
      value: Column): DataFrame =
    snapshot.select((groupCols.map(col) :+ value.as("v")): _*)
      .groupBy((groupCols :+ "v").map(col): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Signed multiplicity delta from a change-image frame. */
  def delta(changes: DataFrame, groupCols: Seq[String],
      value: Column): DataFrame =
    changes.select((groupCols.map(col) :+ value.as("v") :+
        sign.as("_sgn")): _*)
      .groupBy((groupCols :+ "v").map(col): _*)
      .agg(sum(col("_sgn")).as("dcnt"))

  /** aux ⊕ delta: full-outer on (group, value) — a value may be brand
    * new to the group or newly extinct — counts added, pairs netting to
    * zero dropped. aux×delta sized, never data sized.
    */
  def applyDelta(aux: DataFrame, d: DataFrame,
      groupCols: Seq[String]): DataFrame =
    aux.join(d, groupCols :+ "v", "full_outer")
      .select((groupCols :+ "v").map(col) ++ Seq(
        (coalesce(col("cnt"), lit(0L)) + coalesce(col("dcnt"), lit(0L)))
          .as("cnt")): _*)
      .filter(col("cnt") =!= 0)

  /** The maintained view, read off the aux state: exact distinct count
    * and delete-safe min/max per group.
    */
  def view(aux: DataFrame, groupCols: Seq[String]): DataFrame =
    aux.filter(col("cnt") > 0)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_distinct"),
        min(col("v")).as("min_v"),
        max(col("v")).as("max_v"))

  // ---------------------------------------------- persisted generations

  private def fs(s: SparkSession, dir: String) =
    new Path(dir).getFileSystem(s.sparkContext.hadoopConfiguration)

  /** Published generations, newest first — the [[RollupMaintain]]
    * single-watermark contract: `gen_<instant>` names are zero-padded
    * instants, the lexicographic max is the newest state.
    */
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

  /** The persisted aux state and the instant it is current as of. */
  def current(s: SparkSession, stateDir: String): Option[(DataFrame, String)] =
    generations(s, stateDir).headOption.map { inst =>
      (s.read.parquet(s"$stateDir/gen_$inst"), inst)
    }

  /** Fold everything committed since the last advance into a new aux
    * generation; bootstrap from the snapshot when no state exists.
    * Idempotent: re-invocation with no new commits — including a
    * crash-replay that already wrote the newest generation — only
    * re-sweeps. Returns the instant the state is now current as of.
    */
  def advance(s: SparkSession, table: LakeTable, stateDir: String,
      groupCols: Seq[String], value: Column): Option[String] = {
    val latest = table.latestCommit.getOrElse(return None)
    // VALIDITY (the secondaryIndexAsOf contract): the stored watermark
    // must still be a commit on the active timeline. A restore below it
    // leaves rolled-back rows folded into the aux state (and new commits
    // take HIGHER wall-clock instants, so `inst >= latest` would keep
    // serving the orphan); an archival past it collapses the commits the
    // delta feed needs into a net checkpoint (double-count). Either way:
    // discard the orphaned generations and re-bootstrap from the current
    // snapshot, which is always correct.
    val cur = current(s, stateDir).filter { case (_, inst) =>
      val valid = table.timeline.instants().contains(inst)
      if (!valid) {
        val f = fs(s, stateDir)
        generations(s, stateDir).foreach { old =>
          f.delete(new Path(s"$stateDir/gen_$old"), true)
        }
      }
      valid
    }
    val next = cur match {
      case Some((_, inst)) if inst >= latest => None // nothing new
      case Some((aux, inst)) =>
        // bound the feed to the watermark this generation is named for:
        // a concurrent OCC writer can commit between the latestCommit
        // read and the delta job, and an open-ended feed would fold that
        // commit into state WITHOUT covering it by the watermark — the
        // next advance re-applies it and silently double-counts
        Some(applyDelta(aux, delta(table.changes(inst, latest), groupCols,
          value), groupCols))
      case None =>
        Some(fullAux(table.snapshotAsOf(latest), groupCols, value))
    }
    next.foreach(_.write.mode("overwrite").parquet(s"$stateDir/gen_$latest"))
    val f = fs(s, stateDir)
    generations(s, stateDir).drop(1).foreach { old =>
      f.delete(new Path(s"$stateDir/gen_$old"), true)
    }
    Some(generations(s, stateDir).headOption.getOrElse(latest))
  }

  /** One CDC micro-batch folded into the persisted aux state, keyed by
    * the STREAM's batch id (the [[RollupMaintain.applyBatch]] contract:
    * zero-padded generation names, idempotent per batch id — a replay
    * after a crash between the state write and the stream's checkpoint
    * commit sees its own generation and skips).
    */
  def applyBatch(s: SparkSession, batch: DataFrame, stateDir: String,
      groupCols: Seq[String], value: Column, batchId: Long): Unit = {
    val gen = f"gen_$batchId%020d"
    if (fs(s, stateDir).exists(new Path(s"$stateDir/$gen/_SUCCESS"))) return
    val d = delta(batch, groupCols, value)
    val next = current(s, stateDir) match {
      case Some((aux, _)) => applyDelta(aux, d, groupCols)
      // no state yet: from-earliest CDC classifies everything as an
      // insert, so the first delta IS the aux state
      case None => d.select(((groupCols :+ "v").map(col) :+
        col("dcnt").as("cnt")): _*).filter(col("cnt") =!= 0)
    }
    next.write.mode("overwrite").parquet(s"$stateDir/$gen")
    val f = fs(s, stateDir)
    generations(s, stateDir).drop(1).foreach { old =>
      f.delete(new Path(s"$stateDir/gen_$old"), true)
    }
  }

  /** Continuous maintenance: the lake CDC streaming source feeds
    * [[applyBatch]] — distinct/min/max stay current with every commit,
    * end to end O(changed rows), crash-replay safe through the stream
    * checkpoint + per-batch generations.
    */
  def runStream(spark: SparkSession, tablePath: String, stateDir: String,
      groupCols: Seq[String], value: Column, checkpointDir: String,
      triggerSeconds: Int = 1): StreamingQuery =
    spark.readStream.format("graft-lake")
      .option("query.type", "changes")
      .load(tablePath)
      .writeStream
      .queryName("distinct-maintain")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(s"$triggerSeconds seconds"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          applyBatch(batch.sparkSession, batch, stateDir, groupCols, value,
            batchId)
      }
      .start()
}
