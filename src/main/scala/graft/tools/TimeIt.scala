package graft.tools

import graft.queries.{Dedup, Relational, Similarity}
import graft.functions.TextFunctions._
import graft.util.Sessions
import org.apache.spark.sql.functions._

/** Scratch profiling harness for stage-level timing (not part of the
  * driver contract). Usage: runMain graft.tools.TimeIt <sfDir>
  */
object TimeIt {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = Sessions.local("timeit", "32")
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[timeit] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
    }

    val docs = Relational.t(spark, dir, "documents")
      .repartition(spark.sparkContext.defaultParallelism)
    val sh = docs.select(col("doc_id"), shingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    time("warm scan")(docs.count())
    time("shingle (32-way)")(sh.select(sum(size(col("sh")))).count())
    time("shingle again")(sh.select(sum(size(col("sh")))).count())
    time("sigs k=8")(Dedup.minhashSignatures(sh, 8).count())
    time("sigs k=64")(Dedup.minhashSignatures(sh, 64).count())
    time("sigs k=64 again")(Dedup.minhashSignatures(sh, 64).count())
    time("full minhashLsh")(Dedup.minhashLsh(spark, dir).count())
    time("full minhashLsh again")(Dedup.minhashLsh(spark, dir).count())
    time("full jaccardPairs")(Dedup.jaccardPairs(spark, dir).count())
    time("full simhashPairs")(Dedup.simhashPairs(spark, dir).count())
    time("lshTopK")(Similarity.lshTopK(spark, dir).count())
    spark.stop()
  }
}
