package graft.lake

import graft.util.Json
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame

import java.nio.charset.StandardCharsets

/** Atomic multi-TABLE transactions — the WRITE-side companion of
  * [[SnapshotGroup]]'s consistent cross-table reads.
  *
  * The reference's medallion hops persist an aggregation watermark
  * non-transactionally beside the data write (reference
  * DWD2DM.scala:81-82; SURVEY hard-part #5: a replayed batch
  * double-counts). This closes that hole with a two-phase commit over
  * the lake timeline:
  *
  *  1. **Prepare** — each table runs its ordinary write path
  *     ([[LakeTable.txnPrepare]]: same staging, OCC conflict check,
  *     atomic publish), but the commit carries in-doubt markers, so it
  *     is INVISIBLE to every reader, and its in-flight reservation is
  *     left held so incremental consumers' stable watermark stays below
  *     it (no consumer can advance past an instant that may later
  *     become visible).
  *  2. **Decide** — one coordinator decision record
  *     (`<first-table>/_lake/txn/<txnId>.json`) is published
  *     atomically under the coordinator table's writer lock. Its
  *     content flipping to `committed` is the single visibility point:
  *     before it readers see NEITHER table's half, after it they see
  *     BOTH (each timeline resolves its in-doubt commits against the
  *     record, [[Timeline.txnVisible]]).
  *  3. **Release** — reservations drop; consumers advance over the now
  *     visible commits.
  *
  * Crash recovery is presumed-abort ([[LakeTable.recoverTxns]]): a dead
  * writer's undecided prepares are aborted through the same
  * lock-serialized decision write (so a paused coordinator waking later
  * LOSES the race and learns it) and rolled back; decided-committed
  * prepares need no action — they are already visible everywhere.
  *
  * At 100 TB the coordination cost is metadata-only: one tiny decision
  * record, no locks held across tables during the data writes, and no
  * data moved beyond what each table's own write path stages.
  */
object TxnGroup {

  /** Cap on concurrently running prepares inside one [[commit]] — each
    * is a full Spark write; more in flight than the cluster can overlap
    * only adds scheduler pressure.
    */
  private val MaxParallelPrepares = 8

  /** One table's operation inside a transaction. `extra` rides in the
    * prepare's commit metadata like any single-table write's extra —
    * e.g. a pipeline's incremental watermark, which then advances on
    * EVERY participant or none (the multi-mart medallion shape the
    * reference's non-transactional watermark cannot express).
    */
  sealed trait TxnOp {
    def table: LakeTable
    def extra: Map[String, String]
  }
  final case class TxnInsert(table: LakeTable, data: DataFrame,
      extra: Map[String, String] = Map.empty) extends TxnOp
  final case class TxnUpsert(table: LakeTable, data: DataFrame,
      combine: Boolean = true,
      extra: Map[String, String] = Map.empty) extends TxnOp
  final case class TxnDelete(table: LakeTable, data: DataFrame,
      extra: Map[String, String] = Map.empty) extends TxnOp

  /** Atomically apply all `ops` — every table's write becomes visible at
    * one instant, or none does. All tables must live on one filesystem
    * (the decision record must be readable from every participant).
    * Throws `ConcurrentModificationException` if a conflict or recovery
    * aborted the transaction; the caller retries the whole statement.
    *
    * @return the transaction id (the coordinator record is
    *         `<first-table>/_lake/txn/<id>.json`)
    */
  def commit(ops: Seq[TxnOp]): String = {
    require(ops.nonEmpty, "transaction needs at least one operation")
    require(ops.map(_.table.path).distinct.size == ops.size,
      "one operation per table: a second prepare on the same table " +
        "cannot see the first's still-invisible half (combine the " +
        "batches into one operation instead)")
    val coordTable = ops.head.table
    val fs = coordTable.fs
    val txnId = f"${System.currentTimeMillis()}%017d_" +
      java.util.UUID.randomUUID().toString.take(8)
    val decisionPath = fs.makeQualified(
      new Path(coordTable.tablePath, s"_lake/txn/$txnId.json"))
    val coord = decisionPath.toString
    val prepared = scala.collection.mutable.ArrayBuffer[(LakeTable, String)]()
    def releaseAll(): Unit =
      prepared.foreach { case (t, i) => t.timeline.releaseReservation(i) }
    def rollbackAll(): Unit =
      prepared.foreach { case (t, i) =>
        try t.txnRollback(i) finally t.timeline.releaseReservation(i)
      }
    val tablePaths = ops.map(_.table.path)
    def abort(cause: Throwable): Nothing = {
      decide(fs, coord, "aborted", tablePaths) match {
        case "committed" =>
          // impossible unless this coordinator already decided commit —
          // in which case we would not be here; treat as fatal
          releaseAll()
          throw new IllegalStateException(
            s"txn $txnId found committed while aborting", cause)
        case _ => rollbackAll(); throw cause
      }
    }
    // prepares run in PARALLEL: they are independent until the decision
    // (each table stages, OCC-checks, and publishes on its own timeline;
    // fencing and the decision are order-free), so N marts of a wide
    // micro-batch cost ~the slowest single prepare instead of the sum.
    // Every future resolves to a Try and ALL are awaited before any
    // failure is acted on — rollback must cover every half that actually
    // published, including ones that completed after the first failure.
    {
      val done = new java.util.concurrent.atomic.AtomicInteger(0)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(ops.size, MaxParallelPrepares))
      val ec = scala.concurrent.ExecutionContext.fromExecutorService(pool)
      val attempts: Seq[scala.util.Try[(LakeTable, String)]] =
        try {
          val futs = ops.map { op =>
            scala.concurrent.Future {
              val instant = op match {
                case TxnInsert(t, d, ex) =>
                  t.txnPrepare("insert", d, txnId, coord, userExtra = ex)
                case TxnUpsert(t, d, cb, ex) =>
                  t.txnPrepare("upsert", d, txnId, coord, cb, ex)
                case TxnDelete(t, d, ex) =>
                  t.txnPrepare("delete", d, txnId, coord, userExtra = ex)
              }
              // completion-order probe point: txn.prepared.k fires when
              // the k-th prepare (any table) has published
              FaultInjection.point(s"txn.prepared.${done.incrementAndGet()}")
              (op.table, instant)
            }(ec).transform(scala.util.Success(_))(ec)
          }
          scala.concurrent.Await.result(
            scala.concurrent.Future.sequence(futs)(implicitly, ec),
            scala.concurrent.duration.Duration.Inf)
        } finally pool.shutdown()
      prepared ++= attempts.collect { case scala.util.Success(p) => p }
      attempts.collectFirst { case scala.util.Failure(e) => e }
        .foreach(e => abort(e))
    }
    // fencing AT the decision, inside the decision lock: every prepare
    // must still be on its active timeline (no restore rolled it away)
    // with a LIVE reservation (no stale-sweep let consumers advance
    // past it) — otherwise committing could surface a half readers
    // already skipped. Running the check under the same lock that
    // serializes recovery's abort write closes the zombie-coordinator
    // window: recovery only aborts once a reservation went stale, so
    // "all reservations live" inside the lock proves no abort decision
    // exists or can be written before ours lands.
    val fence = () => {
      val dead = prepared.filter { case (t, i) =>
        !t.timeline.reservationLive(i) || !t.timeline.instants().contains(i)
      }
      if (dead.nonEmpty)
        throw new VerifyFailed(
          s"txn $txnId: prepare(s) ${dead.map(_._2).mkString(", ")} were " +
            "swept or rolled back while the transaction ran; re-run it")
    }
    val decision =
      try decide(fs, coord, "committed", tablePaths, Some(fence))
      catch { case e: VerifyFailed => abort(e) }
    decision match {
      case "committed" =>
        FaultInjection.point("txn.decided")
        releaseAll()
        txnId
      case _ =>
        // recovery decided abort while we paused between fencing and
        // decision — our halves are (being) rolled back
        rollbackAll()
        throw new java.util.ConcurrentModificationException(
          s"txn $txnId was aborted by recovery while in flight; re-run it")
    }
  }

  /** Decision record body, parsed by [[Timeline.txnState]]; `tables`
    * (the participant paths, known to the coordinator) lets retention
    * verify every participant has stopped referencing the record before
    * deleting it — recovery-written abort records carry no list and are
    * retired under the weaker aborted-record rule (see
    * `LakeTable.cleanTxnRecords`).
    */
  private def decisionJson(txnId: String, state: String,
      tables: Seq[String]): String =
    Json.write(Map("txnId" -> txnId, "state" -> state, "tables" -> tables))

  /** Thrown inside [[decide]] when the caller's `verify` hook fails
    * under the decision lock — the coordinator must abort instead.
    */
  private[lake] final class VerifyFailed(msg: String)
    extends java.util.ConcurrentModificationException(msg)

  /** Publish (or read back) the coordinator decision — EXACTLY-ONE
    * winner, serialized by the coordinator table's writer lock: read
    * the record inside the lock, and only write ours if none exists.
    * The write is temp-file + rename (atomic content), and
    * `requireLockHeld` fences a zombie whose lock was broken as stale
    * mid-decision. Returns the decision that HOLDS after the call,
    * which may be the other party's.
    *
    * `verify` (when given) runs INSIDE the lock, after "no existing
    * record" is established and before anything is written: the
    * committing coordinator passes its prepares-still-live check here,
    * so the check and the decision write are one serialized critical
    * section — a recovery abort (also lock-serialized through this
    * method) can no longer slip between the coordinator's fence and
    * its rename. On failure the hook throws [[VerifyFailed]] out of
    * the lock and the caller aborts through the normal path.
    *
    * Because some local filesystems implement rename as an OVERWRITE
    * (`RawLocalFileSystem` delegates to `File.renameTo`), the record's
    * absence is re-checked via a raw existence probe immediately
    * before the rename — `txnState` alone could report "pending" for a
    * present-but-transiently-unreadable record and let an abort clobber
    * a committed decision.
    */
  private[lake] def decide(fs: FileSystem, coordPath: String,
      state: String, tables: Seq[String] = Seq.empty,
      verify: Option[() => Unit] = None): String = {
    val decisionPath = new Path(coordPath)
    val txnDir = decisionPath.getParent          // <table>/_lake/txn
    val coordTablePath = txnDir.getParent.getParent
    val tl = new Timeline(fs, coordTablePath)
    tl.withLock() {
      val existing = tl.txnState(coordPath)
      if (existing != "pending") existing
      else if (fs.exists(decisionPath)) {
        // present but txnState could not parse a terminal state —
        // NEVER rename over it; surface the inconsistency instead
        throw new IllegalStateException(
          s"txn decision record $coordPath exists but is unreadable; " +
            "refusing to overwrite it")
      } else {
        verify.foreach(_.apply())
        val txnId = decisionPath.getName.stripSuffix(".json")
        fs.mkdirs(txnDir)
        val tmp = new Path(txnDir, s".$txnId.tmp")
        val out = fs.create(tmp, true)
        try out.write(decisionJson(txnId, state, tables)
          .getBytes(StandardCharsets.UTF_8))
        finally out.close()
        tl.requireLockHeld(s"txn decision $txnId")
        if (fs.exists(decisionPath))
          throw new IllegalStateException(
            s"txn decision record $coordPath appeared mid-write; " +
              "refusing to overwrite it")
        if (!fs.rename(tmp, decisionPath))
          throw new IllegalStateException(
            s"txn decision rename failed for $txnId")
        state
      }
    }
  }
}
