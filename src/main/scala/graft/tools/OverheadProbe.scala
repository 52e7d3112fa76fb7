package graft.tools

import org.apache.spark.sql.functions._

/** Fixed-overhead characterization (not part of the driver contract):
  * times one shuffle round-trip over a trivial frame at several source
  * partition counts, and a cached-frame rescan, to separate per-task /
  * per-stage scheduling overhead from real work — the measurement behind
  * the size-derived partitioning change (guide §2: scale-adaptive
  * partitioning instead of a constant).
  */
object OverheadProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.util.Sessions.builder("graft-overhead")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[ovh] $name%-44s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }

    val n = 2000L // tiny: overhead dominates by construction
    for (p <- Seq(32, 8, 1); rep <- 1 to 3) {
      val df = spark.range(0, n).repartition(p)
        .select(col("id"), (col("id") % 17).as("k"))
      time(s"groupBy over p=$p rep$rep") {
        df.groupBy("k").agg(sum("id")).write.format("noop")
          .mode("overwrite").save()
      }
    }
    // join loop: 5 rounds of join+agg like the centrality shape
    for (p <- Seq(32, 8, 1); rep <- 1 to 2) {
      val edges = spark.range(0, n).select((col("id") % 500).as("a"),
        (col("id") % 499).as("b")).repartition(p)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      edges.count()
      time(s"5-round join loop p=$p rep$rep") {
        var r = edges.select(col("a").as("k")).distinct()
          .withColumn("v", lit(1L))
        for (_ <- 1 to 5) {
          r = edges.join(r, edges("a") === r("k"))
            .groupBy("b").agg(sum("v").as("v"))
            .select(col("b").as("k"), col("v"))
        }
        r.write.format("noop").mode("overwrite").save()
      }
      edges.unpersist(true)
    }
    // cached scan cost at 32 vs 1 partitions
    for (p <- Seq(32, 1)) {
      val c = spark.range(0, n).repartition(p)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      c.count()
      for (rep <- 1 to 3)
        time(s"cached rescan p=$p rep$rep") {
          c.write.format("noop").mode("overwrite").save()
        }
      c.unpersist(true)
    }
    spark.stop()
  }
}
