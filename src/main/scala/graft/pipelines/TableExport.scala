package graft.pipelines

import graft.lake.LakeTable
import graft.util.Sessions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Lake snapshot → JSON-lines export (reference Hudi2MSK.scala:36-50:
  * snapshot read, `to_json(struct(*))`, Kafka producer). The Kafka sink is
  * stood in by a text directory of JSON lines — same P4 projection.
  */
object TableExport {

  def run(spark: SparkSession, cfg: PipelineConfig): Unit = {
    val snap = LakeTable.load(spark, cfg.sourceTablePath).snapshotUser()
    snap
      .select(to_json(struct(snap.columns.map(col).toIndexedSeq: _*)).as("value")) // P4
      .write.mode("overwrite").text(cfg.outputDir) // K2 stand-in
  }

  def main(args: Array[String]): Unit = {
    val cfg = PipelineConfig.parse(args)
    val spark = Sessions.local("table-export")
    spark.sparkContext.setLogLevel("WARN")
    run(spark, cfg)
    println(s"[table-export] wrote ${cfg.outputDir}")
    spark.stop()
  }
}
