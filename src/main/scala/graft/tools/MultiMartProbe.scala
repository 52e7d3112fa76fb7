package graft.tools

import graft.pipelines.{MultiMartHop, PipelineConfig}
import graft.util.Sessions

/** Crash-injection workload for the streaming multi-mart hop: drains the
  * DWD change feed through [[MultiMartHop.runStreaming]] into two marts
  * (sum of l_quantity by l_returnflag / by l_linestatus). Armed
  * crashpoints (`txn.prepared.k`, `txn.decided`) halt the JVM mid-batch
  * inside the marts' 2PC; `PipelinesSpec` asserts the survivors see no
  * torn mart pair and that a rerun converges without double-counting.
  *
  * Usage: MultiMartProbe <dwdDir> <mart1Dir> <mart2Dir> <checkpointDir>
  */
object MultiMartProbe {
  def main(args: Array[String]): Unit = {
    val Array(dwdDir, mart1, mart2, ckpt) = args
    val spark = Sessions.local("multimart-probe", "4")
    spark.sparkContext.setLogLevel("ERROR")
    def cfg(path: String, name: String, key: String) = PipelineConfig(
      sourceTablePath = dwdDir, targetTablePath = path, tableName = name,
      recordKeyFields = Seq(key), aggKeys = Seq(key), aggCol = "l_quantity",
      checkpointDir = ckpt, triggerSeconds = 1)
    val q = MultiMartHop.runStreaming(spark, Seq(
      cfg(mart1, "mart_rf", "l_returnflag"),
      cfg(mart2, "mart_ls", "l_linestatus")))
    q.processAllAvailable()
    q.stop()
    println("[multimart] done")
    spark.stop()
  }
}
