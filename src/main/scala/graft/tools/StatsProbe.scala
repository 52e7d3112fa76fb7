package graft.tools
import graft.util.Sessions
import org.apache.spark.sql.SaveMode

/** Diagnostic: shows which statistics the OPTIMIZER actually sees for a
  * v2 lake read (Spark 4.1 wraps V1Scans in a V1ScanWrapper that drops
  * SupportsReportStatistics — this probe is how that was discovered) vs
  * what the scan itself reports. Run:
  * `sbt "runMain graft.tools.StatsProbe"`.
  */
object StatsProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("stats-probe", "4")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val p = java.nio.file.Files.createTempDirectory("sp").toString + "/t"
    Seq((1, 10L, "a", 1.0), (7, 42L, "b", 2.0)).toDF("id", "ts", "part", "v")
      .write.format("graft-lake-v2")
      .option("recordkey.field", "id").option("precombine.field", "ts")
      .mode(SaveMode.Append).save(p)
    val t = spark.read.format("graft-lake-v2").load(p)
    val op = t.queryExecution.optimizedPlan
    println("== optimized ==\n" + op)
    op.foreach {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        println(s"scan class: ${r.scan.getClass}")
        r.scan match {
          case s: org.apache.spark.sql.connector.read.SupportsReportStatistics =>
            val es = s.estimateStatistics()
            println(s"estimate: size=${es.sizeInBytes()} rows=${es.numRows()} cols=${es.columnStats()}")
          case _ => println("scan does NOT report statistics")
        }
        println(s"relation stats: ${r.stats}")
      case n => println(s"${n.getClass.getSimpleName}: ${n.stats}")
    }
    spark.stop()
  }
}
