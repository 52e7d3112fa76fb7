package graft.tools

import graft.lake.{LakeTable, TableMeta}
import graft.util.Sessions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import java.nio.file.Files

/** Scratch profiling harness for the lake write/read path (not part of
  * the driver contract). Usage: runMain graft.tools.LakeTimeIt <sfDir>
  */
object LakeTimeIt {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = Sessions.local("laketimeit", "32")
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[timeit] $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val w = Window.partitionBy("l_orderkey", "l_linenumber")
      .orderBy(col("l_shipdate").desc, col("l_partkey").desc,
        col("l_suppkey").desc, col("l_quantity").desc,
        col("l_extendedprice").desc)
    val b1 = spark.read.parquet(s"$dir/lineitem.parquet")
      .withColumn("created_ts", col("l_shipdate").cast("timestamp_ltz").cast("long"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("materialize b1")(b1.count())
    val b2 = b1.filter(col("l_orderkey") < 500)
      .withColumn("l_quantity", col("l_quantity") + 1000)
      .withColumn("created_ts", col("created_ts") + 1)

    val work = Files.createTempDirectory("laketime").toString
    val t = LakeTable.create(spark, s"$work/t",
      TableMeta("lt", Seq("l_orderkey", "l_linenumber"), "created_ts",
        Seq("l_returnflag"), "cow"))
    val c1 = time("upsert b1 (bootstrap)")(t.upsert(b1, combine = false))
    val c2 = time("upsert b2 (update slice)")(t.upsert(b2, combine = false))
    time("incremental read + noop") {
      t.incremental(c1, c2).write.format("noop").mode("overwrite").save()
    }
    time("incremental again") {
      t.incremental(c1, c2).write.format("noop").mode("overwrite").save()
    }
    time("snapshot + noop") {
      t.snapshot().write.format("noop").mode("overwrite").save()
    }
    time("incremental w/ order+select") {
      t.incremental(c1, c2)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "created_ts")
        .orderBy("l_orderkey", "l_linenumber")
        .write.format("noop").mode("overwrite").save()
    }
    b1.unpersist()
    spark.stop()
  }
}
