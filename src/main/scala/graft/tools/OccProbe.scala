package graft.tools

import graft.lake.LakeTable
import graft.util.Sessions
import org.apache.hadoop.fs.Path

/** Multi-PROCESS optimistic-concurrency workload: each invocation runs a
  * loop of ROW-LEVEL (reserve → stage → conflict-check → publish)
  * commits against a shared table from its own JVM — the cross-process
  * proof behind [[LakeTable.rowLevelCommit]]'s write-set OCC, the same
  * way UpsertProbe proves the locked write paths.
  *
  * Modes:
  *  - `disjoint`: every process writes its OWN partition (and key
  *    namespace). Under `indexScope=partition` none of these commits may
  *    ever conflict — the probe treats an abort as a hard failure and
  *    prints `aborts=0` for the spec to assert.
  *  - `contend`: every process writes the SAME partition and keys.
  *    Overlapping publishes abort and retry with a fresh snapshot; the
  *    values are chosen equal across processes so the final state is
  *    exact regardless of who wins each round.
  *  - `upsert-contend`: same contention through the PUBLIC
  *    [[LakeTable.upsert]] API on a COW table — the whole
  *    reserve/plan/merge/stage/conflict-check path races across
  *    processes, retrying aborted publishes.
  *  - `mixed`: the table-service soak — each process interleaves keyed
  *    upserts on its OWN partition with a rotating table service
  *    (partition compaction / small-file pack / clean) and asserts read
  *    invariants after EVERY publish: its own keys read back at their
  *    latest version, time travel to its last commit resolves exactly,
  *    and every live file named by the timeline physically exists. The
  *    dark corner this soaks: data commits racing content-preserving
  *    service rewrites from other JVMs (the pairwise specs cover races
  *    two-at-a-time; this drives all of them together).
  *
  * Usage: OccProbe <tableDir> <procId> <rounds> <rows>
  *        <disjoint|contend|upsert-contend|mixed>
  */
object OccProbe {
  def main(args: Array[String]): Unit = {
    val Array(tableDir, procIdS, roundsS, rowsS, mode) = args
    val procId = procIdS.toInt
    val rounds = roundsS.toInt
    val nRows = rowsS.toInt
    val spark = Sessions.local(s"occ-probe-$procId", "2")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    var aborts = 0
    try {
      val t = LakeTable.load(spark, tableDir)
      val fs = new Path(tableDir).getFileSystem(
        spark.sessionState.newHadoopConf())
      if (mode == "upsert-contend") {
        for (r <- 1 to rounds) {
          val batch = (0 until nRows)
            .map(i => (i, r.toLong, "shared", r.toDouble))
            .toDF("id", "ts", "part", "v")
          var done = false
          var attempts = 0
          while (!done) {
            try { t.upsert(batch); done = true }
            catch {
              case _: java.util.ConcurrentModificationException =>
                aborts += 1
                attempts += 1
                require(attempts < 40, "conflict retries exhausted")
            }
          }
        }
        println(s"[occ-probe] proc=$procId aborts=$aborts")
        return
      }
      if (mode == "mixed") {
        import org.apache.spark.sql.functions.col
        val part = s"p$procId"
        var services = 0
        for (r <- 1 to rounds) {
          val batch = (0 until nRows)
            .map(i => (procId * 1000 + i, r.toLong, part,
              (r * 100 + i).toDouble))
            .toDF("id", "ts", "part", "v")
          var lastCommit: String = null
          var attempts = 0
          while (lastCommit == null) {
            try lastCommit = t.upsert(batch)
            catch {
              case _: java.util.ConcurrentModificationException =>
                aborts += 1
                attempts += 1
                require(attempts < 40, "conflict retries exhausted")
            }
          }
          // rotate a table service against the SHARED table — every
          // service is lock-serialized and content-preserving, so no
          // assertion below may ever observe it
          (procId + r) % 3 match {
            case 0 => t.compactPartitions(Set(s"part=$part")); ()
            case 1 => t.packSmallFiles(targetBytes = 4L * 1024 * 1024); ()
            case _ => t.clean(retainCommits = 100); ()
          }
          services += 1
          // invariant 1: my keys (nobody else's namespace) read back at
          // exactly this round's version, whatever services just ran
          val mine = t.snapshot().filter(col("part") === part)
            .select("id", "ts", "v").collect()
            .map(x => (x.getInt(0), x.getLong(1), x.getDouble(2))).sorted
          require(mine.length == nRows,
            s"round $r: ${mine.length} of $nRows own rows visible")
          mine.zipWithIndex.foreach { case ((id, ts, v), i) =>
            require(id == procId * 1000 + i && ts == r.toLong &&
              v == (r * 100 + i).toDouble,
              s"round $r: own row drifted: ($id, $ts, $v)")
          }
          // invariant 2: time travel to my own commit resolves my rows
          // exactly, across any later service rewrites
          val tt = t.snapshotAsOf(lastCommit).filter(col("part") === part)
          require(tt.count() == nRows.toLong,
            s"round $r: time travel to $lastCommit lost rows")
          // invariant 3: the timeline's live file set is physically
          // intact (no service deleted a file another commit still
          // references). A file found missing is re-checked against a
          // FRESH listing: a concurrent rewrite+clean may legitimately
          // retire it between our listing and the probe — only a file
          // still live while absent on disk is corruption.
          t.timeline.liveFiles().foreach { f =>
            if (!fs.exists(new Path(tableDir, f.path)))
              require(!t.timeline.liveFiles().exists(_.path == f.path),
                s"round $r: live file ${f.path} missing on disk")
          }
        }
        println(s"[occ-probe] proc=$procId aborts=$aborts services=$services")
        return
      }
      for (r <- 1 to rounds) {
        val part = if (mode == "contend") "shared" else s"p$procId"
        var done = false
        while (!done) {
          val visible = t.committedInstants()
          val instant = t.rowLevelBegin()
          val staging = t.rowLevelStaging(instant)
          val rows = (0 until nRows).map { i =>
            val id = if (mode == "contend") i else procId * 1000 + i
            val v =
              if (mode == "contend") r.toDouble
              else (procId * 100000 + r * 100 + i).toDouble
            (id, r.toLong, v, s"$part|$id", instant, false)
          }
          rows.toDF("id", "ts", "v", "_record_key", "_commit_time", "_deleted")
            .coalesce(1).write.parquet(new Path(staging, s"part=$part").toString)
          val files = fs.listStatus(new Path(staging, s"part=$part")).toSeq
            .map(_.getPath).filter(_.getName.endsWith(".parquet"))
          try {
            t.rowLevelCommit(instant, staging, files, "merge", visible)
            done = true
          } catch {
            case _: java.util.ConcurrentModificationException =>
              aborts += 1
              if (mode == "disjoint")
                throw new IllegalStateException(
                  "disjoint-partition commit aborted: false conflict")
          }
        }
      }
      println(s"[occ-probe] proc=$procId aborts=$aborts")
    } finally spark.stop()
  }
}
