package graft.lake

import graft.util.Json
import org.apache.hadoop.fs.{FileSystem, Path}

import java.nio.charset.StandardCharsets

/** Commit timeline of a lake table: `_lake/timeline/<instant>.commit.json`.
  *
  * Replaces Hudi's `.hoodie/` timeline the reference depends on for
  * incremental queries (ODS2DWD.scala:51-56, DWD2DM.scala:59-64). Instants
  * are zero-padded epoch-millis strings — lexicographic order == commit
  * order, monotonic even under same-millisecond commits. Commits become
  * visible atomically via temp-file + rename (single-writer OCC; the
  * reference used a Zookeeper lock, package.scala:38-47).
  */
class Timeline(fs: FileSystem, tablePath: Path) {
  private val dir = new Path(tablePath, "_lake/timeline")
  private val inflightDir = new Path(tablePath, "_lake/timeline/inflight")

  /** Parsed-commit cache, keyed by instant and validated by (length,
    * mtime) from the SAME directory listing every timeline query already
    * performs — so a warm read path costs one `listStatus` and zero file
    * opens / JSON parses. Commit files are immutable with one exception:
    * `archive` rewrites the boundary instant as a checkpoint — the
    * validation catches that (content differs → length/mtime differ) and
    * re-parses. At 100 TB-scale commit counts this turns `liveFiles` from
    * O(commits) driver round-trips into O(1) listings.
    */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Timeline.Entry]()

  private def instantOf(name: String): String =
    name.stripSuffix(Timeline.Suffix).stripSuffix(Timeline.CheckpointSuffix)

  /** Committed-commit file statuses, sorted ascending by instant.
    *
    * An archive CHECKPOINT (`<instant>.checkpoint.json`) supersedes
    * every commit at or below its instant: the active view is the newest
    * checkpoint (if any) followed by the ordinary commits above it.
    * Commit files at or below the checkpoint may transiently coexist —
    * an archiver that crashed between publishing the checkpoint and
    * moving the originals to the cold store leaves them — and are
    * ignored here (the checkpoint already carries their net effect; the
    * next archive run sweeps them).
    */
  private def listCommits(): Seq[org.apache.hadoop.fs.FileStatus] = {
    if (!fs.exists(dir)) return Seq.empty
    val all = fs.listStatus(dir)
    val ckpt = all
      .filter(_.getPath.getName.endsWith(Timeline.CheckpointSuffix))
      .sortBy(_.getPath.getName).lastOption
    val floor = ckpt.map(st => instantOf(st.getPath.getName)).getOrElse("")
    (ckpt.toSeq ++ all.filter { st =>
      val n = st.getPath.getName
      n.endsWith(Timeline.Suffix) && instantOf(n) > floor
    }).sortBy(st => instantOf(st.getPath.getName))
      .toSeq
  }

  private def parseCommit(p: Path, len: Long): CommitMeta = {
    val in = fs.open(p)
    try {
      val bytes = new Array[Byte](len.toInt)
      in.readFully(bytes)
      Json.read(new String(bytes, StandardCharsets.UTF_8), classOf[CommitMeta])
    } finally in.close()
  }

  private def readAt(st: org.apache.hadoop.fs.FileStatus): CommitMeta = {
    val instant = instantOf(st.getPath.getName)
    val cur = cache.get(instant)
    if (cur != null && cur.len == st.getLen &&
        cur.mtime == st.getModificationTime) cur.meta
    else {
      val m = parseCommit(st.getPath, st.getLen)
      cache.put(instant, Timeline.Entry(st.getLen, st.getModificationTime, m))
      m
    }
  }

  /** Sorted ascending list of committed instants — the RAW name view,
    * including in-doubt multi-table-transaction commits ([[txnVisible]]).
    * Instant allocation, OCC conflict candidates, restore and orphan
    * sweeps need this view (an in-doubt commit's instant is taken and
    * its files must never be treated as orphans); DATA reads go through
    * [[liveFiles]]/[[between]]/[[addedBetween]], which resolve txn
    * visibility, or [[visibleInstants]] for the filtered instant list.
    */
  def instants(): Seq[String] =
    listCommits().map(st => instantOf(st.getPath.getName))

  /** Instants whose commits are VISIBLE to readers: everything except
    * in-doubt / aborted multi-table-transaction commits. Optimistic
    * writers capture their plan-time `visible` baseline from this view:
    * an in-doubt commit's data was invisible to the plan, so if it later
    * commits it must be a conflict CANDIDATE, not part of the baseline.
    */
  def visibleInstants(): Seq[String] =
    listCommits().map(readAt).filter(txnVisible).map(_.instant)

  // ----------------------------------- multi-table transaction visibility

  /** Terminal decision cache: a committed/aborted transaction decision is
    * immutable, so each process resolves a given coordinator record at
    * most once. "pending" is never cached.
    */
  private val txnDecisions =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Is this commit visible to readers? Ordinary commits always are. A
    * commit carrying `txn.pending` is the PREPARE half of a multi-table
    * transaction ([[TxnGroup]]): visible iff the coordinator decision
    * record says committed — before the decision (or after an abort)
    * readers see NEITHER table's half, which is what makes the decision
    * rename the atomic visibility point across tables.
    */
  private[lake] def txnVisible(m: CommitMeta): Boolean =
    !m.extra.get(Timeline.TxnPendingKey).contains("true") ||
      m.extra.get(Timeline.TxnCoordKey)
        .exists(c => txnState(c) == "committed")

  /** Resolve a coordinator decision record: "committed" / "aborted" /
    * "pending" (record ABSENT). Terminal states cache forever;
    * resolving a pending transaction costs one metadata read per
    * timeline query until it decides — bounded by the number of
    * concurrently in-flight transactions, not by table size.
    *
    * Only `FileNotFoundException` maps to "pending": a transient read
    * failure of an EXISTING record must not be mistaken for "no
    * decision yet" — recovery would presume-abort (and
    * [[graft.lake.TxnGroup.decide]] would write its own record over)
    * a transaction that may already be committed. Other IOExceptions
    * retry briefly, then propagate to the caller.
    */
  private[lake] def txnState(coordPath: String): String = {
    val cached = txnDecisions.get(coordPath)
    if (cached != null) return cached
    def readOnce(): String = {
      val p = new Path(coordPath)
      val len = fs.getFileStatus(p).getLen.toInt
      val in = fs.open(p)
      try {
        val bytes = new Array[Byte](len)
        in.readFully(bytes)
        val node =
          Json.mapper.readTree(new String(bytes, StandardCharsets.UTF_8))
        Option(node.get("state")).map(_.asText()).getOrElse("pending")
      } finally in.close()
    }
    var attempt = 0
    var st: String = null
    while (st == null) {
      try st = readOnce()
      catch {
        case _: java.io.FileNotFoundException => st = "pending"
        case e: java.io.IOException =>
          attempt += 1
          if (attempt >= 3) throw e
          Thread.sleep(50L * attempt)
      }
    }
    if (st == "committed" || st == "aborted") txnDecisions.put(coordPath, st)
    st
  }

  def latestInstant(): Option[String] = instants().lastOption

  /** Next instant id: strictly greater than every committed instant AND
    * every live in-flight reservation — an optimistic writer's reserved
    * instant must never be handed out again while its job runs.
    */
  def nextInstant(): String = {
    val now = f"${System.currentTimeMillis()}%017d"
    (instants() ++ pendingInstants()).maxOption match {
      case Some(last) if last >= now => f"${last.toLong + 1}%017d"
      case _                         => now
    }
  }

  // ------------------------------------------- in-flight instant reservation

  /** Reserve the next instant for an optimistic (lock-free-while-writing)
    * commit: a marker file under `_lake/timeline/inflight/` makes the
    * intent visible so (a) concurrent writers number strictly above it and
    * (b) incremental consumers do not advance past it while the write is
    * still in flight — publication order then never violates consumption
    * monotonicity, the classic lost-commit anomaly of out-of-order
    * instant completion. Taken under the writer lock (creation must be
    * mutually exclusive); released by [[releaseReservation]] or swept
    * once stale ([[Timeline.InflightStaleMs]] without an mtime heartbeat
    * — crashed writers stop blocking consumers automatically).
    */
  def reserveInstant(): String = withLock() {
    sweepStaleReservations()
    val i = nextInstant()
    fs.mkdirs(inflightDir)
    val out = fs.create(new Path(inflightDir, i + Timeline.InflightSuffix), false)
    out.close()
    // keep the reservation live for as long as THIS process is: a
    // daemon renews the marker mtime while the write job runs (any
    // path — programmatic or DSv2), and dies with a crashed writer so
    // the marker goes stale exactly when it should
    val hb = new Thread(() => {
      try while (true) {
        Thread.sleep(math.max(Timeline.InflightStaleMs / 4, 1000L))
        renewReservation(i)
      } catch { case _: InterruptedException => () }
    }, s"lake-inflight-heartbeat-${tablePath.getName}-$i")
    hb.setDaemon(true)
    hb.start()
    reservationHeartbeats.put(i, hb)
    i
  }

  /** Drop a reservation (after publishing its commit, or on abort). The
    * heartbeat thread is JOINED before the marker is deleted: a renewal
    * already past its exists-check would otherwise recreate the marker
    * AFTER the delete, leaving an orphan that caps consumers' stable
    * watermark for the whole staleness window. (The heartbeat loop exits
    * on the next sleep after the interrupt, so the join is bounded by
    * one in-flight renewal's I/O.)
    */
  def releaseReservation(instant: String): Unit = {
    Option(reservationHeartbeats.remove(instant)).foreach { t =>
      t.interrupt()
      try t.join(10000) catch { case _: InterruptedException => () }
    }
    sweptReservations.remove(instant)
    renewFailures.remove(instant)
    fs.delete(new Path(inflightDir, instant + Timeline.InflightSuffix), false)
    ()
  }

  private val reservationHeartbeats =
    new java.util.concurrent.ConcurrentHashMap[String, Thread]()
  /** Reservations THIS process created that a renewal later found missing
    * (swept as stale by a peer while we were paused): the reservation is
    * gone for good — consumers may already have advanced their stable
    * watermark past it, so resurrecting the marker would not restore
    * safety. [[reservationLive]] reports these as dead.
    */
  private val sweptReservations =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val renewFailures =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  /** Refresh a reservation's liveness (long jobs call this periodically —
    * the inflight analog of the writer lock's heartbeat). Renewal
    * RECREATES the marker file rather than `fs.setTimes` it: create is
    * universally supported, while mtime updates are a silent no-op or an
    * error on object stores — a silently-dead heartbeat would let any
    * write longer than [[Timeline.InflightStaleMs]] be swept mid-flight.
    * A marker found MISSING means a peer already swept us, and a marker
    * found STALE means every consumer was already free to ignore it
    * (they filter on mtime, not on deletion) — both are recorded as
    * swept (never resurrected; the stale one is deleted so peers
    * converge) so the publish-time liveness check aborts instead of
    * committing below consumers' watermark. Repeated renewal I/O
    * failures are surfaced on stderr instead of swallowed.
    */
  def renewReservation(instant: String): Unit = {
    val p = new Path(inflightDir, instant + Timeline.InflightSuffix)
    try {
      val st =
        try Some(fs.getFileStatus(p))
        catch { case _: java.io.FileNotFoundException => None }
      st match {
        case None =>
          sweptReservations.add(instant)
          ()
        case Some(stat) if System.currentTimeMillis() -
            stat.getModificationTime > Timeline.InflightStaleMs =>
          // woke from a pause longer than the staleness window: the
          // reservation is gone for good even though the file survived
          sweptReservations.add(instant)
          fs.delete(p, false)
          ()
        case Some(_) =>
          fs.create(p, true).close() // overwrite ⇒ fresh mtime everywhere
          renewFailures.remove(instant)
          ()
      }
    } catch {
      case e: java.io.IOException =>
        val n = renewFailures.merge(instant, 1, (a, b) => a + b)
        if (n >= 3) System.err.println(
          s"[graft-lake] WARNING: inflight reservation $instant of " +
            s"$tablePath failed $n consecutive heartbeat renewals " +
            s"(${e.getMessage}); the write risks being swept as stale")
    }
  }

  /** Is this reservation still live — marker present, FRESH, and never
    * observed swept by a renewal? Optimistic publishers MUST verify this
    * under the writer lock before committing: once the marker is swept,
    * consumers may have advanced their stable watermark past the
    * instant, and a late commit below that watermark is skipped forever
    * (the lost-commit anomaly the reservation exists to prevent).
    * Freshness is part of liveness: consumers ignore a stale marker by
    * MTIME alone ([[pendingInstants]]) without waiting for anyone to
    * delete it, so the moment the marker's mtime crossed the staleness
    * window a consumer may have advanced — a marker that is still on
    * disk but was ever stale is exactly as dead as a swept one, and a
    * writer waking from a long pause must abort, not publish (nor can a
    * renewal restore safety by refreshing the mtime after the fact).
    */
  def reservationLive(instant: String): Boolean =
    !sweptReservations.contains(instant) &&
      (try {
        val st = fs.getFileStatus(
          new Path(inflightDir, instant + Timeline.InflightSuffix))
        System.currentTimeMillis() - st.getModificationTime <=
          Timeline.InflightStaleMs
      } catch { case _: java.io.IOException => false })

  /** Live (non-stale) reserved instants, ascending. */
  def pendingInstants(): Seq[String] = {
    if (!fs.exists(inflightDir)) return Seq.empty
    val now = System.currentTimeMillis()
    fs.listStatus(inflightDir)
      .filter(_.getPath.getName.endsWith(Timeline.InflightSuffix))
      .filter(now - _.getModificationTime <= Timeline.InflightStaleMs)
      .map(_.getPath.getName.stripSuffix(Timeline.InflightSuffix))
      .sorted.toSeq
  }

  private def sweepStaleReservations(): Unit = {
    if (!fs.exists(inflightDir)) return
    val now = System.currentTimeMillis()
    fs.listStatus(inflightDir)
      .filter(_.getPath.getName.endsWith(Timeline.InflightSuffix))
      .filter(now - _.getModificationTime > Timeline.InflightStaleMs)
      .foreach(st => fs.delete(st.getPath, false))
  }

  /** Latest instant an incremental CONSUMER may safely advance to: the
    * latest completed instant, capped strictly below the oldest live
    * in-flight reservation. Advancing past a pending writer would skip
    * its commit forever once it publishes (its instant sorts below the
    * already-consumed watermark).
    */
  def stableInstant(): Option[String] =
    pendingInstants().headOption match {
      // visibleInstants on both branches: an in-doubt txn commit must
      // never become a consumer watermark — its data is filtered from
      // between(), and on abort the commit file is DROPPED, which would
      // leave the watermark pointing at a nonexistent instant
      case Some(p) => visibleInstants().filter(_ < p).lastOption
      case None    => visibleInstants().lastOption
    }

  /** `end` capped strictly below the oldest live reservation. */
  def stableEnd(end: String): String =
    pendingInstants().headOption match {
      case Some(p) if p <= end => f"${p.toLong - 1}%017d"
      case _                   => end
    }

  def read(instant: String): CommitMeta =
    readAt(
      // checkpoint FIRST: at the archival boundary a checkpoint always
      // supersedes the original commit file, which can transiently
      // coexist with it until a crashed archiver's stragglers are swept
      try fs.getFileStatus(
        new Path(dir, instant + Timeline.CheckpointSuffix))
      catch { case _: java.io.FileNotFoundException =>
        fs.getFileStatus(new Path(dir, instant + Timeline.Suffix))
      })

  /** Coarse single-writer lock: atomic create of `_lake/lock` holding a
    * per-acquisition UUID token. Replaces the reference's Zookeeper OCC
    * lock (package.scala:38-47). Safety properties:
    *
    *  - **ownership**: the holder releases only a lock that still carries
    *    its own token — if the lock was broken and re-acquired by someone
    *    else mid-write, the original holder's release is a no-op instead
    *    of deleting the new holder's lock;
    *  - **heartbeat**: a daemon thread refreshes the lock mtime every
    *    `staleAfterMs / 4` while the body runs, so a long write (large COW
    *    rewrite, compaction) is never mistaken for a crashed holder;
    *  - **single-winner stale break**: a stale lock (no heartbeat for
    *    `staleAfterMs` — the lazy failed-writes policy, HudiConfig's LAZY
    *    clean analog) is broken by *renaming* it to a unique grave name;
    *    rename of a now-missing source fails, so of N waiters exactly one
    *    wins the break. If the grave turns out fresh after all (the
    *    check-then-rename race), it is renamed straight back.
    */
  def withLock[T](staleAfterMs: Long = Timeline.LockStaleMs)(body: => T): T = {
    // REENTRANT within a thread (per Timeline instance): a locked write
    // path may call a helper that itself locks (e.g. schema evolution
    // from both locked and optimistic writers)
    if (holdDepth.get() > 0) {
      holdDepth.set(holdDepth.get() + 1)
      try return body finally holdDepth.set(holdDepth.get() - 1)
    }
    fs.mkdirs(new Path(tablePath, "_lake"))
    val token = java.util.UUID.randomUUID().toString

    // LocalFileSystem.create(overwrite=false) is exists()-then-create —
    // NOT atomic, so two local writers could both "acquire" it. Use NIO's
    // atomic createFile (O_CREAT|O_EXCL) for file:// and
    // FileSystem.create for HDFS (atomic at the NameNode); on S3 swap for
    // a conditional put. The token body is written just after the atomic
    // create; a concurrently-observed empty lock is simply "held, owner
    // unknown" — never treated as ours, broken only by mtime staleness.
    def tryAcquire(): Boolean =
      if (fs.getScheme == "file") {
        val p = java.nio.file.Paths.get(
          fs.makeQualified(lockPath).toUri.getPath)
        try {
          java.nio.file.Files.createFile(p)
          java.nio.file.Files.write(p, token.getBytes(StandardCharsets.UTF_8))
          true
        } catch { case _: java.nio.file.FileAlreadyExistsException => false }
      } else {
        try {
          val out = fs.create(lockPath, false)
          try out.write(token.getBytes(StandardCharsets.UTF_8))
          finally out.close()
          true
        } catch { case _: java.io.IOException => false }
      }

    def breakIfStale(): Unit = {
      val stale =
        try System.currentTimeMillis() -
          fs.getFileStatus(lockPath).getModificationTime > staleAfterMs
        catch { case _: java.io.IOException => false }
      if (!stale) return
      val grave = new Path(tablePath, s"_lake/.lock.broken.$token")
      val won = try fs.rename(lockPath, grave)
        catch { case _: java.io.IOException => false }
      if (won) {
        // re-verify after winning the break: if the file we renamed was
        // actually fresh (its holder created/heartbeated it between our
        // staleness check and the rename), put it straight back.
        val freshAfterAll =
          try System.currentTimeMillis() -
            fs.getFileStatus(grave).getModificationTime <= staleAfterMs
          catch { case _: java.io.IOException => false }
        if (freshAfterAll && fs.rename(grave, lockPath)) ()
        else { fs.delete(grave, true); () }
      }
    }

    val deadline = System.currentTimeMillis() + 60 * 1000L
    var acquired = false
    while (!acquired) {
      if (tryAcquire()) acquired = true
      else {
        breakIfStale()
        if (!acquired && System.currentTimeMillis() > deadline)
          throw new IllegalStateException(
            s"could not acquire writer lock $lockPath within 60s")
        if (!acquired) Thread.sleep(100)
      }
    }

    @volatile var held = true
    val heartbeat = new Thread(() => {
      val interval = math.max(staleAfterMs / 4, 1000L)
      var run = true
      while (run && held) {
        try Thread.sleep(interval)
        catch { case _: InterruptedException => run = false }
        if (run && held && readLockToken().contains(token)) {
          // mtime refresh keeps readers seeing exactly the token the
          // breaker checks; where setTimes is unsupported (object
          // stores throw or silently no-op — the same weakness the
          // inflight-reservation heartbeat had) fall back to rewriting
          // the lock file with our token, which refreshes mtime on any
          // filesystem. The commit fence keeps a heartbeat failure SAFE
          // (the holder aborts rather than corrupting); this keeps it
          // also LIVE on stores without mtime updates.
          try fs.setTimes(lockPath, System.currentTimeMillis(), -1)
          catch { case _: java.io.IOException =>
            try {
              val out = fs.create(lockPath, true)
              try out.write(token.getBytes(StandardCharsets.UTF_8))
              finally out.close()
            } catch { case e: java.io.IOException =>
              System.err.println(
                s"[graft-lake] WARNING: writer-lock heartbeat on " +
                  s"$tablePath failed (${e.getMessage}); the lock risks " +
                  "being broken as stale mid-write")
            }
          }
        }
      }
    }, s"lake-lock-heartbeat-${tablePath.getName}")
    heartbeat.setDaemon(true)
    heartbeat.start()

    holdDepth.set(1)
    heldToken.set(token)
    try body
    finally {
      holdDepth.set(0)
      heldToken.remove()
      held = false
      heartbeat.interrupt()
      // release only our own lock: if it was broken and re-acquired by a
      // new holder, leave the new holder's lock alone.
      if (readLockToken().contains(token)) fs.delete(lockPath, false)
      ()
    }
  }

  private val holdDepth = new ThreadLocal[Int] {
    override def initialValue(): Int = 0
  }

  /** The on-disk lock token this thread's outermost [[withLock]] wrote —
    * the fencing identity [[commit]] re-verifies before publishing.
    */
  private val heldToken = new ThreadLocal[String]

  private def lockPath = new Path(tablePath, "_lake/lock")

  private def readLockToken(): Option[String] =
    try {
      val in = fs.open(lockPath)
      try {
        val len = fs.getFileStatus(lockPath).getLen.toInt
        val bytes = new Array[Byte](len)
        in.readFully(bytes)
        Some(new String(bytes, StandardCharsets.UTF_8))
      } finally in.close()
    } catch { case _: java.io.IOException => None }

  /** Archive commits older than the newest `keepCommits` into
    * `_lake/timeline/archive/`, leaving a checkpoint commit at the
    * archival boundary that carries the net live-file set of the archived
    * history — snapshots stay reconstructible from the active timeline
    * alone (reference archival knobs HudiConfig.scala:35-37). Incremental
    * / time-travel reads older than the boundary stop working — the same
    * retention footgun SURVEY §7 documents for the reference's
    * keep-2-commits default.
    */
  def archive(keepCommits: Int): Seq[String] = {
    val inst = instants()
    if (inst.size <= keepCommits) return Seq.empty
    var toArchive = inst.dropRight(keepCommits)
    // an UNDECIDED multi-table prepare must stay on the active timeline:
    // archiving it would fold nothing into the checkpoint (in-doubt
    // commits are invisible) while retiring the commit file — a later
    // commit decision would then surface NOTHING here and the other
    // table's half alone (a torn transaction). Cap the boundary below
    // the oldest undecided prepare; decided-committed prepares fold
    // into the checkpoint (implicitly sealed), aborted ones archive as
    // the no-ops they are after rollback.
    val oldestInDoubt = toArchive.map(read).find(m =>
      m.extra.get(Timeline.TxnPendingKey).contains("true") &&
        m.extra.get(Timeline.TxnCoordKey)
          .forall(c => txnState(c) == "pending"))
      .map(_.instant)
    oldestInDoubt.foreach(i => toArchive = toArchive.filter(_ < i))
    if (toArchive.isEmpty) return Seq.empty
    val boundary = toArchive.last
    val metas = toArchive.map(read)
    val netLive = liveFiles(boundary) // live set of the archived prefix
    // The checkpoint must also carry the cumulative REMOVED set of the
    // archived history (minus files a clean already physically deleted):
    // clean() derives deletable files from active commits' removed lists,
    // so dropping the archived removal records would leave those files
    // orphaned on disk forever — logically dead but never cleanable.
    val cleaned = metas.filter(_.operation == "clean")
      .flatMap(_.removed).toSet
    val removedNet = metas.filterNot(_.operation == "clean")
      .flatMap(_.removed).distinct.filterNot(cleaned.contains)
    val dest = new Path(dir, "archive")
    fs.mkdirs(dest)
    requireLockHeld("archive")
    // 1. Publish the checkpoint FIRST, under its own suffix (never
    //    colliding with the boundary's original commit file). From this
    //    atomic rename on, readers see checkpoint + retained commits and
    //    every pre-boundary commit file is superseded; a crash at ANY
    //    point leaves a readable timeline — before the rename the active
    //    timeline is untouched, after it stragglers are ignored. (The
    //    old order — move originals out, then write the checkpoint —
    //    lost the archived history entirely if the archiver died between
    //    the two steps.) Re-archiving at an unchanged boundary skips the
    //    rewrite: the existing checkpoint's content is identical by
    //    construction, and a delete-then-rename would open a window with
    //    no checkpoint on disk at all.
    val ckptPath = new Path(dir, boundary + Timeline.CheckpointSuffix)
    if (!fs.exists(ckptPath)) {
      val ckpt =
        CommitMeta(boundary, "archive-checkpoint", netLive, removedNet)
      val tmp = new Path(dir, s".$boundary.checkpoint.tmp")
      val out = fs.create(tmp, true)
      try out.write(Json.write(ckpt).getBytes(StandardCharsets.UTF_8))
      finally out.close()
      if (!fs.rename(tmp, ckptPath))
        throw new IllegalStateException(
          s"archive checkpoint rename failed for $boundary")
    }
    FaultInjection.point("archive.checkpointed")
    // 2. Move the superseded ORIGINALS to the cold store — from a raw
    //    listing, so stragglers of a previously crashed run are swept
    //    too — and retire older checkpoints the new one supersedes. A
    //    move that fails because a prior run already archived that file
    //    deletes the leftover duplicate instead.
    val all = fs.listStatus(dir)
    def retire(st: org.apache.hadoop.fs.FileStatus): Unit =
      if (!fs.rename(st.getPath, new Path(dest, st.getPath.getName))) {
        fs.delete(st.getPath, false)
        ()
      }
    all.filter { st =>
      val n = st.getPath.getName
      n.endsWith(Timeline.Suffix) && instantOf(n) <= boundary
    }.foreach(retire)
    all.filter { st =>
      val n = st.getPath.getName
      n.endsWith(Timeline.CheckpointSuffix) && instantOf(n) < boundary
    }.foreach(retire)
    toArchive.foreach(cache.remove)
    toArchive
  }

  /** Fencing check for the lock LEASE: a holder whose heartbeat stalled
    * past the stale window may have been broken and replaced
    * mid-critical-section — before any destructive or publishing step,
    * re-verify the on-disk lock still carries this thread's token, so a
    * woken zombie aborts instead of acting on a lock it no longer owns.
    * The unfenced window shrinks from the whole pause to one
    * read-then-act round trip. No-op outside a [[withLock]] scope.
    */
  def requireLockHeld(op: String): Unit =
    Option(heldToken.get()).foreach { tok =>
      if (!readLockToken().contains(tok))
        throw new java.util.ConcurrentModificationException(
          s"writer lock lost during $op: broken as stale while this " +
            "writer was paused; retry the statement")
    }

  /** Atomically publish a commit: write to a temp name, then rename. */
  def commit(meta: CommitMeta): Unit = {
    requireLockHeld(s"commit ${meta.instant}")
    fs.mkdirs(dir)
    val tmp = new Path(dir, s".${meta.instant}.inflight")
    val out = fs.create(tmp, true)
    try out.write(Json.write(meta).getBytes(StandardCharsets.UTF_8))
    finally out.close()
    val finalPath = new Path(dir, meta.instant + Timeline.Suffix)
    if (!fs.rename(tmp, finalPath))
      throw new IllegalStateException(s"commit rename failed for ${meta.instant}")
    // warm the cache with the just-published commit (read-after-write
    // without re-opening the file)
    try {
      val st = fs.getFileStatus(finalPath)
      cache.put(meta.instant,
        Timeline.Entry(st.getLen, st.getModificationTime, meta))
    } catch { case _: java.io.IOException => () }
  }

  /** Parsed commits at instants `<= asOf`, one directory listing. Data
    * reads flow through here, so in-doubt transaction halves are
    * filtered out ([[txnVisible]]) — a reader between a transaction's
    * prepares and its decision sees NEITHER table's half.
    */
  private def commitsUpTo(asOf: String): Seq[CommitMeta] =
    listCommits()
      .filter(_.getPath.getName.stripSuffix(Timeline.Suffix) <= asOf)
      .map(readAt)
      .filter(txnVisible)

  /** Remove commit files from the active timeline (restore/rollback).
    * Caller must hold the writer lock and own the correctness argument.
    */
  private[lake] def dropCommits(instants: Seq[String]): Unit = {
    requireLockHeld("dropCommits")
    // NEWEST FIRST: a crash after any prefix of descending deletes
    // leaves a timeline identical to a completed restore to some higher
    // intermediate instant — always a consistent snapshot — and
    // re-running the original restore finishes the job. Ascending
    // deletes would instead leave a HOLE: an older commit gone while a
    // newer one that built on its state survives.
    instants.sorted.reverse.foreach { i =>
      fs.delete(new Path(dir, i + Timeline.Suffix), false)
      cache.remove(i)
      ()
    }
  }

  /** Commits in `(begin, end]`; begin="000..0"/"earliest" ⇒ from start. */
  def between(begin: String, end: String): Seq[CommitMeta] = {
    val b = if (begin == "earliest") "" else begin
    commitsUpTo(end).filter(_.instant > b)
  }

  /** Files added by commits in `(begin, end]` and not removed by any commit
    * `<= end` — the read set of an incremental query. Rows that an in-range
    * COW rewrite merely carried over still hold their original (pre-range)
    * `_commit_time` and are filtered out row-wise by the reader.
    */
  def addedBetween(begin: String, end: String): Seq[FileStat] = {
    val b = if (begin == "earliest") "" else begin
    val commits = commitsUpTo(end)
    val removedAll = commits.flatMap(_.removed).toSet
    commits.filter(_.instant > b)
      .flatMap(_.added).filterNot(f => removedAll.contains(f.path))
  }

  /** Live file set (relative paths) as of `asOf` (inclusive); files added
    * then later removed (COW rewrite / delete / clean) are excluded.
    */
  def liveFiles(asOf: String = "99999999999999999"): Seq[FileStat] = {
    val commits = commitsUpTo(asOf)
    val removed = commits.flatMap(_.removed).toSet
    commits.flatMap(_.added).filterNot(f => removed.contains(f.path))
  }
}

object Timeline {
  val Suffix = ".commit.json"
  val CheckpointSuffix = ".checkpoint.json"
  val Earliest = "earliest"
  val InflightSuffix = ".inflight"

  /** Commit-meta extra keys marking a multi-table-transaction PREPARE:
    * id, absolute path of the coordinator decision record, and the
    * in-doubt flag readers resolve through [[Timeline.txnState]].
    */
  val TxnIdKey = "txn.id"
  val TxnCoordKey = "txn.coord"
  val TxnPendingKey = "txn.pending"

  /** A reservation with no heartbeat for this long is a crashed writer:
    * swept on the next reservation, ignored by consumers. Mutable so
    * tests can exercise the sweep without waiting.
    */
  private[lake] var InflightStaleMs: Long = 30 * 60 * 1000L

  /** Grace period before an ABORTED txn decision record may retire
    * (deleting it returns the txn to "pending", which a zombie
    * coordinator could then decide "committed" for rolled-back halves).
    * Negative ⇒ derive 2 × [[InflightStaleMs]]; mutable so tests can
    * exercise the retirement without waiting.
    */
  private[lake] var TxnAbortGraceMs: Long = -1L
  private[lake] def txnAbortGraceMs: Long =
    if (TxnAbortGraceMs >= 0) TxnAbortGraceMs else 2 * InflightStaleMs

  /** Writer-lock staleness window: a lock whose heartbeat stalled for
    * this long may be broken by a waiting writer (the lazy failed-writes
    * policy). Tunable via `-Dgraft.lake.lock.staleMs` — an ops knob for
    * how fast survivors reclaim a crashed holder's lock, at the price of
    * how long a live holder may pause before being fenced out.
    */
  private[lake] var LockStaleMs: Long =
    sys.props.get("graft.lake.lock.staleMs").map(_.toLong)
      .getOrElse(10 * 60 * 1000L)

  /** Cache entry: commit parse validated by file (length, mtime). */
  private[lake] case class Entry(len: Long, mtime: Long, meta: CommitMeta)
}
