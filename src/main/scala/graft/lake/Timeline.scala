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
