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
  *
  * Usage: OccProbe <tableDir> <procId> <rounds> <rows>
  *        <disjoint|contend|upsert-contend>
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
