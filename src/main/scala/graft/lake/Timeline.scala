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

  /** Sorted ascending list of committed instants. */
  def instants(): Seq[String] = {
    if (!fs.exists(dir)) return Seq.empty
    fs.listStatus(dir)
      .map(_.getPath.getName)
      .filter(_.endsWith(Timeline.Suffix))
      .map(_.stripSuffix(Timeline.Suffix))
      .sorted
      .toSeq
  }

  def latestInstant(): Option[String] = instants().lastOption

  /** Next instant id: strictly greater than every committed instant. */
  def nextInstant(): String = {
    val now = f"${System.currentTimeMillis()}%017d"
    latestInstant() match {
      case Some(last) if last >= now => f"${last.toLong + 1}%017d"
      case _                         => now
    }
  }

  def read(instant: String): CommitMeta = {
    val p = new Path(dir, instant + Timeline.Suffix)
    val in = fs.open(p)
    try {
      val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
      in.readFully(bytes)
      Json.read(new String(bytes, StandardCharsets.UTF_8), classOf[CommitMeta])
    } finally in.close()
  }

  /** Coarse single-writer lock: atomic create of `_lake/lock`
    * (FileSystem.create with overwrite=false is atomic on HDFS/local; on
    * S3 swap for a conditional-put). Replaces the reference's Zookeeper
    * OCC lock (package.scala:38-47). Stale locks (older than
    * `staleAfterMs`) are broken — the lazy failed-writes policy
    * (HudiConfig's LAZY clean analog).
    */
  def withLock[T](staleAfterMs: Long = 10 * 60 * 1000L)(body: => T): T = {
    val lockPath = new Path(tablePath, "_lake/lock")
    fs.mkdirs(new Path(tablePath, "_lake"))
    // LocalFileSystem.create(overwrite=false) is exists()-then-create —
    // NOT atomic, so two local writers could both "acquire" it. Use NIO's
    // atomic createFile for file:// and FileSystem.create for HDFS
    // (where create(false) is atomic at the NameNode).
    def tryAcquire(): Boolean =
      if (fs.getScheme == "file") {
        val p = java.nio.file.Paths.get(
          fs.makeQualified(lockPath).toUri.getPath)
        try { java.nio.file.Files.createFile(p); true }
        catch { case _: java.nio.file.FileAlreadyExistsException => false }
      } else {
        try { fs.create(lockPath, false).close(); true }
        catch { case _: java.io.IOException => false }
      }
    val deadline = System.currentTimeMillis() + 60 * 1000L
    var acquired = false
    while (!acquired) {
      if (tryAcquire()) acquired = true
      else {
        val stale =
          try System.currentTimeMillis() -
            fs.getFileStatus(lockPath).getModificationTime > staleAfterMs
          catch { case _: java.io.IOException => false }
        if (stale) fs.delete(lockPath, false)
        else if (System.currentTimeMillis() > deadline)
          throw new IllegalStateException(
            s"could not acquire writer lock $lockPath within 60s")
        else Thread.sleep(100)
      }
    }
    try body
    finally { fs.delete(lockPath, false); () }
  }

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
    val toArchive = inst.dropRight(keepCommits)
    val boundary = toArchive.last
    val netLive = liveFiles(boundary) // live set of the archived prefix
    val dest = new Path(dir, "archive")
    fs.mkdirs(dest)
    toArchive.foreach { i =>
      fs.rename(new Path(dir, i + Timeline.Suffix),
        new Path(dest, i + Timeline.Suffix))
    }
    commit(CommitMeta(boundary, "archive-checkpoint", netLive, Seq.empty))
    toArchive
  }

  /** Atomically publish a commit: write to a temp name, then rename. */
  def commit(meta: CommitMeta): Unit = {
    fs.mkdirs(dir)
    val tmp = new Path(dir, s".${meta.instant}.inflight")
    val out = fs.create(tmp, true)
    try out.write(Json.write(meta).getBytes(StandardCharsets.UTF_8))
    finally out.close()
    val finalPath = new Path(dir, meta.instant + Timeline.Suffix)
    if (!fs.rename(tmp, finalPath))
      throw new IllegalStateException(s"commit rename failed for ${meta.instant}")
  }

  /** Commits in `(begin, end]`; begin="000..0"/"earliest" ⇒ from start. */
  def between(begin: String, end: String): Seq[CommitMeta] = {
    val b = if (begin == "earliest") "" else begin
    instants().filter(i => i > b && i <= end).map(read)
  }

  /** Files added by commits in `(begin, end]` and not removed by any commit
    * `<= end` — the read set of an incremental query. Rows that an in-range
    * COW rewrite merely carried over still hold their original (pre-range)
    * `_commit_time` and are filtered out row-wise by the reader.
    */
  def addedBetween(begin: String, end: String): Seq[FileStat] = {
    val removedAll = instants().filter(_ <= end).map(read).flatMap(_.removed).toSet
    between(begin, end).flatMap(_.added).filterNot(f => removedAll.contains(f.path))
  }

  /** Live file set (relative paths) as of `asOf` (inclusive); files added
    * then later removed (COW rewrite / delete / clean) are excluded.
    */
  def liveFiles(asOf: String = "99999999999999999"): Seq[FileStat] = {
    val commits = instants().filter(_ <= asOf).map(read)
    val removed = commits.flatMap(_.removed).toSet
    commits.flatMap(_.added).filterNot(f => removed.contains(f.path))
  }
}

object Timeline {
  val Suffix = ".commit.json"
  val Earliest = "earliest"
}
