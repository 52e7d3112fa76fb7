package graft.tools

import graft.lake.LakeTable
import graft.util.Sessions

/** Multi-PROCESS concurrent-writer workload: each invocation runs a full
  * keyed-upsert loop against a shared table from its own JVM + Spark
  * session — the real contention test behind the writer lock (LockProbe
  * proves exclusion; this proves whole WRITE paths interleave safely:
  * file prune, merge, stage, publish, commit).
  *
  * Keys are namespaced per process (`procId * 1000 + i`), each round
  * re-upserts the same keys with a higher precombine — so the expected
  * final table is exact regardless of how the processes' commits
  * interleave. Usage: UpsertProbe <tableDir> <procId> <rounds> <rows>
  */
object UpsertProbe {
  def main(args: Array[String]): Unit = {
    val Array(tableDir, procIdS, roundsS, rowsS) = args
    val procId = procIdS.toInt
    val rounds = roundsS.toInt
    val rows = rowsS.toInt
    val spark = Sessions.local(s"upsert-probe-$procId", "2")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    try {
      val t = LakeTable.load(spark, tableDir)
      for (r <- 1 to rounds) {
        val batch = (0 until rows)
          .map(i => (procId * 1000 + i, r.toLong, s"p${i % 2}",
            (r * 100 + i).toDouble))
          .toDF("id", "ts", "part", "v")
        t.upsert(batch)
      }
    } finally spark.stop()
  }
}
