package graft.tools

import graft.queries.Similarity
import org.apache.spark.sql.DataFrame

/** Diagnostic: smallest rerank depth at which the PQ shortlist holds the
  * true top-10 (output equals brute force). Run:
  * `sbt "runMain graft.tools.PqProbe [sfDir...]"`.
  */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    val spark = graft.util.Sessions.local("pq-probe", "4")
    spark.sparkContext.setLogLevel("ERROR")
    def rows(df: DataFrame) = df.collect().map(_.toSeq).toSeq
    for (dir <- dirs) {
      val brute = rows(Similarity.topKBruteForce(spark, dir))
      val depths = Seq(16, 32, 64, 128, 256, 500)
      val eqAt = depths.map(d =>
        d -> (rows(Similarity.pqTopK(spark, dir, d)) == brute)).toMap
      depths.foreach(d => println(s"$dir rerank=$d equal=${eqAt(d)}"))
      println(s"$dir smallest passing rerank: " +
        depths.find(eqAt).map(_.toString).getOrElse("none"))
    }
    spark.stop()
  }
}
