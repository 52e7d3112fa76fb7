package graft.tools

import graft.queries.{Dedup, Similarity}

/** One-off timing breakdown for sim_pq_topk (bench attribution probe). */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.util.Sessions.builder("pq-probe")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stage = java.nio.file.Files.createTempDirectory("pqprobe").toString
    spark.conf.set(Dedup.StageDirConf, stage)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    t("warm session (count embeddings)") {
      spark.read.parquet(s"$dir/embeddings.parquet").count()
    }
    t("run1 full (train+stage)") {
      Similarity.pqTopK(spark, dir).write.format("noop").mode("overwrite").save()
    }
    t("run2 full (staged)") {
      Similarity.pqTopK(spark, dir).write.format("noop").mode("overwrite").save()
    }
    t("run3 full (staged)") {
      Similarity.pqTopK(spark, dir).write.format("noop").mode("overwrite").save()
    }
    // fine-grained: where do the 2s go?
    val df = t("plan build (pqTopK call only)") { Similarity.pqTopK(spark, dir) }
    t("execute prebuilt plan") {
      df.write.format("noop").mode("overwrite").save()
    }
    t("execute prebuilt plan again") {
      df.write.format("noop").mode("overwrite").save()
    }
    println(df.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Exchange") || l.contains("Join") ||
        l.contains("Scan") || l.contains("Window") || l.contains("Sort"))
      .mkString("\n"))
    spark.stop()
  }
}
