package graft.tools
import graft.lake.{LakeTable, TableMeta}
import graft.util.Sessions
import org.apache.spark.sql.functions._
object PruneCheck {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("prune", "4")
    spark.sparkContext.setLogLevel("ERROR")
    val work = java.nio.file.Files.createTempDirectory("prune").toString
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .withColumn("created_ts", col("l_shipdate").cast("timestamp_ltz").cast("long"))
    val t = LakeTable.create(spark, s"$work/t",
      TableMeta("p", Seq("l_orderkey", "l_linenumber"), "created_ts", Seq("l_returnflag")))
    t.upsert(li)
    val q = t.snapshot().filter(col("l_returnflag") === "A")
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator.find(_.contains("FileScan")).getOrElse("")
    println("[prune] " + scanLine.trim.take(400))
    println("[prune] files scanned = " + q.queryExecution.executedPlan.collectLeaves()
      .map(_.metrics.get("numFiles").map(_.value).getOrElse(-1L)).mkString(","))
    println("[prune] total live files = " + t.timeline.liveFiles().size)
    // incremental read: _commit_time filter must reach the parquet scan
    val c1 = t.latestCommit.get
    t.upsert(li.filter(col("l_orderkey") < 50)
      .withColumn("created_ts", col("created_ts") + 1))
    val inc = t.incremental(c1)
    inc.collect()
    val incPlan = inc.queryExecution.executedPlan.toString
    val scanBlock = incPlan.linesIterator.filter(l =>
      l.contains("PushedFilters") || l.contains("DataFilters")).mkString(" | ")
    println("[prune] incremental " + scanBlock.replaceAll("#\\d+", "").take(600))
    spark.stop()
  }
}
