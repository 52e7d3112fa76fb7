package graft.tools

import graft.lake.{LakeTable, TableMeta}
import graft.util.Sessions
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Scale soak (not part of the driver contract): synthesizes `mult`×
  * sf0.1 lineitem by key-shifted unions (~600k × mult rows), then drives
  * bootstrap upsert → wide update slice → narrow update → delete →
  * incremental → snapshot, printing per-step seconds and file counts.
  * Usage: runMain graft.tools.Soak [mult] [keyEncoding] [indexScope]
  */
object Soak {
  def main(args: Array[String]): Unit = {
    val mult = if (args.nonEmpty) args(0).toInt else 5
    val keyEncoding = if (args.length > 1) args(1) else "plain"
    val indexScope = if (args.length > 2) args(2) else "global"
    val spark = Sessions.local("soak", "32")
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[soak] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val base = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      .withColumn("created_ts",
        col("l_shipdate").cast("timestamp_ltz").cast("long"))
    val big = (0 until mult).map(i =>
      base.withColumn("l_orderkey", col("l_orderkey") + lit(i * 10000000L)))
      .reduce(_ union _)
      // key-unique per (orderkey, linenumber) after the shift? source has
      // dup keys — dedup once so upserts can run combine=false
      .dropDuplicates("l_orderkey", "l_linenumber")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = time(s"materialize ${mult}x input")(big.count())
    println(s"[soak] rows = $n")

    val work = Files.createTempDirectory("soak").toString
    println(s"[soak] keyEncoding=$keyEncoding indexScope=$indexScope")
    val t = LakeTable.create(spark, s"$work/t",
      TableMeta("soak", Seq("l_orderkey", "l_linenumber"), "created_ts",
        Seq("l_returnflag"), "cow",
        keyEncoding = keyEncoding, indexScope = indexScope))
    val c1 = time("bootstrap upsert")(t.upsert(big, combine = false))
    println(s"[soak] files after bootstrap = ${t.timeline.liveFiles().size}")

    val wide = big.filter(pmod(col("l_orderkey"), lit(100)) === 0)
      .withColumn("l_quantity", col("l_quantity") + 1)
      .withColumn("created_ts", col("created_ts") + 1)
    val c2 = time("wide update (1% of keys, all files)")(
      t.upsert(wide, combine = false))

    val bulk = big.filter(pmod(col("l_orderkey"), lit(4)) === 0)
      .withColumn("l_quantity", col("l_quantity") + 3)
      .withColumn("created_ts", col("created_ts") + 3)
    time("bulk update (25% of keys, sort-merge path)")(
      t.upsert(bulk, combine = false))

    val narrow = big.filter(col("l_orderkey").between(1000, 1199))
      .withColumn("l_quantity", col("l_quantity") + 2)
      .withColumn("created_ts", col("created_ts") + 2)
    time("narrow update (key range)")(t.upsert(narrow, combine = false))
    val lastCommit = t.timeline.read(t.latestCommit.get)
    println(s"[soak] narrow update rewrote ${lastCommit.removed.size} of " +
      s"${t.timeline.liveFiles().size} files")

    time("delete (key range)")(
      t.delete(big.filter(col("l_orderkey").between(2000, 2099))))

    time("incremental (c1, c2] + noop")(
      t.incremental(c1, c2).write.format("noop").mode("overwrite").save())
    time("snapshot + noop")(
      t.snapshot().write.format("noop").mode("overwrite").save())
    time("snapshot filtered partition")(
      t.snapshot().filter(col("l_returnflag") === "A")
        .write.format("noop").mode("overwrite").save())
    big.unpersist()
    spark.stop()
  }
}
