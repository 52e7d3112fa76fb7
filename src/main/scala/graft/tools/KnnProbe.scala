package graft.tools

import graft.queries.{Dedup, Similarity}

/** One-off timing breakdown for sim_knn_graph. */
object KnnProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.util.Sessions.builder("knn-probe")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stage = java.nio.file.Files.createTempDirectory("knnprobe").toString
    spark.conf.set(Dedup.StageDirConf, stage)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    t("warm") { spark.read.parquet(s"$dir/embeddings.parquet").count() }
    t("stage ivf (via ivfTopK)") {
      Similarity.ivfTopK(spark, dir).write.format("noop").mode("overwrite").save()
    }
    t("knn run1") {
      Similarity.knnGraph(spark, dir).write.format("noop").mode("overwrite").save()
    }
    t("knn run2") {
      Similarity.knnGraph(spark, dir).write.format("noop").mode("overwrite").save()
    }
    val g = t("plan build") { Similarity.knnGraph(spark, dir) }
    t("exec prebuilt") { g.write.format("noop").mode("overwrite").save() }
    println(g.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Exchange") || l.contains("Join") ||
        l.contains("Window") || l.contains("Scan parquet"))
      .mkString("\n"))
    spark.stop()
  }
}
