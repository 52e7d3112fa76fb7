package graft.pipelines

import graft.lake.LakeTable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Incremental view maintenance for a materialized equi-JOIN — the
  * second IVM family next to [[RollupMaintain]]'s aggregates: keep
  * `V = A ⋈ B` current from both tables' CDC feeds without ever
  * re-joining the full tables. The bilateral delta is the classic
  * asymmetric split
  *
  *   V@b − V@a = ΔA ⋈ B@b  ∪  A@a ⋈ ΔB
  *
  * — the NEW snapshot on the A-delta side, the OLD snapshot on the
  * B-delta side, so ΔA×ΔB interactions are counted exactly once. The
  * lake table supplies both ingredients natively: the change feed
  * ([[LakeTable.changes]], pruned to touched file groups) and the old
  * snapshot via time travel ([[LakeTable.snapshotAsOf]]) — no shadow
  * copies of table state anywhere. Change images carry signs
  * (insert/update_postimage +1, delete/update_preimage −1), so an
  * update that MOVES the join key retracts the old joined rows and
  * asserts the new ones in the same advance.
  *
  * The maintained state is the joined-row MULTISET as (row, cnt) —
  * integer counts, no floats — and `state ⊕ delta(a→b) =
  * fullState(A@b ⋈ B@b)` exactly, for any committed range (the algebra
  * the oracle query and the spec pin).
  *
  * Why this matters at 100 TB: the deltas are O(changed rows) and each
  * joins ONE side's snapshot — with both tables bucketed on the join
  * key even those are co-located hash joins of a sliver against a
  * pruned scan; the state merge is state×delta keyed on the full row,
  * map-side combinable. A nightly full re-join of two petabyte tables
  * is the thing this replaces.
  */
object JoinMaintain {

  private def sign = when(col(LakeTable.ChangeTypeCol)
    .isin("insert", "update_postimage"), 1L).otherwise(-1L)

  /** Every ROUTED column name — the output columns and the two join
    * keys — must resolve on exactly one side: routing in [[delta]] is
    * by name, and a name both tables carry would silently bind to the
    * wrong side (or, for aKey == bKey, make the key equality trivially
    * true under unqualified resolution). Loud contract instead of
    * silent garbage. Columns both tables carry but that are NOT routed
    * (lake metadata like `_record_key`/`_commit_time`, incidental
    * same-named fields) are fine — both sides are projected through
    * qualified frame references before the join.
    */
  private def requireUnambiguous(a: DataFrame, b: DataFrame, aKey: String,
      bKey: String, outCols: Seq[String]): Unit = {
    val shared = a.columns.toSet.intersect(b.columns.toSet)
    val routed = (outCols.toSet + aKey + bKey).intersect(shared)
    require(routed.isEmpty,
      s"JoinMaintain output/key columns must be unique to one side " +
        s"(rename one side); ambiguous: ${routed.toSeq.sorted.mkString(", ")}")
  }

  /** The maintained multiset, computed fresh: distinct joined rows with
    * multiplicities.
    */
  def fullState(a: DataFrame, b: DataFrame, aKey: String, bKey: String,
      outCols: Seq[String]): DataFrame = {
    requireUnambiguous(a, b, aKey, bKey, outCols)
    a.join(b, a(aKey) === b(bKey))
      .groupBy(outCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Signed joined-row delta for one advance: A's change images join the
    * NEW B snapshot; the OLD A snapshot joins B's change images. Every
    * join side is a freshly-selected frame and the key equality is
    * qualified through those frame references — never unqualified
    * `col(...)` that could resolve across sides.
    */
  def delta(aChanges: DataFrame, aOld: DataFrame, bNew: DataFrame,
      bChanges: DataFrame, aKey: String, bKey: String,
      outCols: Seq[String]): DataFrame = {
    requireUnambiguous(aOld, bNew, aKey, bKey, outCols)
    val aCols = outCols.filter(aOld.columns.contains)
    val bCols = outCols.filterNot(aCols.contains)
    val aSel = aChanges.select(
      ((aCols :+ aKey).distinct.map(aChanges(_)) :+ sign.as("_sgn")): _*)
    val bSnap = bNew.select((bCols :+ bKey).distinct.map(bNew(_)): _*)
    val d1 = aSel.join(bSnap, aSel(aKey) === bSnap(bKey))
    val aSnap = aOld.select((aCols :+ aKey).distinct.map(aOld(_)): _*)
    val bSel = bChanges.select(
      ((bCols :+ bKey).distinct.map(bChanges(_)) :+ sign.as("_sgn")): _*)
    val d2 = aSnap.join(bSel, aSnap(aKey) === bSel(bKey))
    d1.select((outCols.map(col) :+ col("_sgn")): _*)
      .unionByName(d2.select((outCols.map(col) :+ col("_sgn")): _*))
      .groupBy(outCols.map(col): _*)
      .agg(sum(col("_sgn")).as("dcnt"))
  }

  /** state ⊕ delta: full-outer on the whole row, counts added, rows
    * netting to zero dropped — state×delta sized, never data sized.
    */
  def applyDelta(state: DataFrame, d: DataFrame,
      outCols: Seq[String]): DataFrame =
    state.join(d, outCols, "full_outer")
      .select(outCols.map(col) ++ Seq(
        (coalesce(col("cnt"), lit(0L)) + coalesce(col("dcnt"), lit(0L)))
          .as("cnt")): _*)
      .filter(col("cnt") =!= 0)

  /** Drive one advance over lake tables: fold the (aFrom→aTo, bFrom→bTo)
    * commit ranges into `state`.
    */
  def advance(state: DataFrame, a: LakeTable, b: LakeTable,
      aFrom: String, aTo: String, bFrom: String, bTo: String,
      aKey: String, bKey: String, outCols: Seq[String]): DataFrame = {
    // from-genesis advances have an empty old-A side (instants are
    // zero-padded digit strings, so the "earliest" sentinel must not
    // reach the lexicographic as-of compare)
    val aOld =
      if (aFrom == graft.lake.Timeline.Earliest)
        a.snapshot().filter(lit(false))
      else a.snapshotAsOf(aFrom)
    applyDelta(state,
      delta(a.changes(aFrom, aTo), aOld, b.snapshotAsOf(bTo),
        b.changes(bFrom, bTo), aKey, bKey, outCols),
      outCols)
  }

  /** An empty state with the right schema. */
  def emptyState(a: DataFrame, b: DataFrame, aKey: String, bKey: String,
      outCols: Seq[String]): DataFrame =
    fullState(a, b, aKey, bKey, outCols).filter(lit(false))

  // ---------------------------------------------- persisted generations

  private def fs(s: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)

  /** Published generations, newest first. A generation name carries BOTH
    * watermarks — `gen_<aInstant>_<bInstant>` — and both are zero-padded
    * fixed-width instants advancing monotonically, so the lexicographic
    * max is the newest state (the [[RollupMaintain]] contract, two-table
    * form).
    */
  private def generations(s: SparkSession, stateDir: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(stateDir)
    val f = fs(s, stateDir)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toIndexedSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("gen_") &&
        f.exists(new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")))
      .map(_.getPath.getName.stripPrefix("gen_"))
      .sorted.reverse
  }

  /** The persisted state and the (aInstant, bInstant) it is current as
    * of.
    */
  def current(s: SparkSession, stateDir: String)
      : Option[(DataFrame, (String, String))] =
    generations(s, stateDir).headOption.map { g =>
      val Array(ai, bi) = g.split("_", 2)
      (s.read.parquet(s"$stateDir/gen_$g"), (ai, bi))
    }

  /** Fold everything committed on EITHER table since the last advance
    * into a new state generation; bootstrap from a fresh join when no
    * state exists. Idempotent: re-invocation with no new commits —
    * including a crash-replay that already wrote the newest generation —
    * only re-sweeps. Returns the new (aInstant, bInstant) watermarks.
    */
  def advancePersisted(s: SparkSession, a: LakeTable, b: LakeTable,
      stateDir: String, aKey: String, bKey: String,
      outCols: Seq[String]): Option[(String, String)] = {
    val aLatest = a.latestCommit.getOrElse(return None)
    val bLatest = b.latestCommit.getOrElse(return None)
    // VALIDITY (the secondaryIndexAsOf contract): BOTH stored watermarks
    // must still be commits on their table's active timeline — a restore
    // below either leaves rolled-back joined rows in the state (served
    // forever, since post-restore commits take higher instants), an
    // archival past either collapses the commits its delta feed needs.
    // Discard the orphaned generations and re-bootstrap from a full join.
    val cur = current(s, stateDir).filter { case (_, (ai, bi)) =>
      val valid = a.timeline.instants().contains(ai) &&
        b.timeline.instants().contains(bi)
      if (!valid) generations(s, stateDir).foreach { old =>
        fs(s, stateDir).delete(
          new org.apache.hadoop.fs.Path(s"$stateDir/gen_$old"), true)
      }
      valid
    }
    val next = cur match {
      case Some((_, (ai, bi))) if ai >= aLatest && bi >= bLatest => None
      case Some((state, (ai, bi))) =>
        Some(advance(state, a, b, ai, aLatest, bi, bLatest,
          aKey, bKey, outCols))
      case None =>
        Some(fullState(a.snapshotAsOf(aLatest), b.snapshotAsOf(bLatest),
          aKey, bKey, outCols))
    }
    next.foreach(_.write.mode("overwrite")
      .parquet(s"$stateDir/gen_${aLatest}_$bLatest"))
    val f = fs(s, stateDir)
    generations(s, stateDir).drop(1).foreach { old =>
      f.delete(new org.apache.hadoop.fs.Path(s"$stateDir/gen_$old"), true)
    }
    current(s, stateDir).map(_._2)
  }

  /** Continuous maintenance of the joined view: EITHER table's CDC
    * stream triggers one [[advancePersisted]], which folds everything
    * committed on BOTH sides since the stored two-table watermark — the
    * bilateral analog of [[RollupMaintain]]/[[DistinctMaintain]]/
    * [[Scd2]]'s runStream. One stream (the union of both change feeds,
    * reduced to ticks) drives one sequential foreachBatch, so two
    * advances never race on the state dir; idempotence + watermark
    * bounding make crash replay a re-sweep.
    */
  def runStream(spark: org.apache.spark.sql.SparkSession, aPath: String,
      bPath: String, stateDir: String, aKey: String, bKey: String,
      outCols: Seq[String], checkpointDir: String, triggerSeconds: Int = 1)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    def ticks(path: String) =
      spark.readStream.format("graft-lake")
        .option("query.type", "changes")
        .load(path)
        .select(org.apache.spark.sql.functions.lit(1).as("_tick"))
    ticks(aPath).unionByName(ticks(bPath))
      .writeStream
      .queryName("join-maintain")
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime(s"$triggerSeconds seconds"))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          advancePersisted(s, graft.lake.LakeTable.load(s, aPath),
            graft.lake.LakeTable.load(s, bPath), stateDir,
            aKey, bKey, outCols)
          ()
        }
      }
      .start()
  }
}
