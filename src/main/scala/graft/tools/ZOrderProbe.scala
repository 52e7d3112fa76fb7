package graft.tools

import graft.lake.{LakeTable, TableMeta}
import graft.util.Sessions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import java.nio.file.Files

/** Scratch profiling harness for the z-order clustering service (not
  * part of the driver contract): builds the bench's two-commit COW
  * table and times `clusterZOrder` in isolation.
  * Usage: runMain graft.tools.ZOrderProbe [sfDir]
  */
object ZOrderProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = Sessions.local("zorderprobe", "32")
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

    val work = Files.createTempDirectory("zorderprobe").toString
    val t = LakeTable.create(spark, s"$work/t",
      TableMeta("zp", Seq("l_orderkey", "l_linenumber"), "created_ts",
        Seq("l_returnflag"), "cow", keyEncoding = "padded"))
    time("upsert b1")(t.upsert(b1, combine = false))
    time("upsert b2")(t.upsert(b2, combine = false))
    time("clusterZOrder")(t.clusterZOrder(Seq("l_partkey", "l_suppkey")))
    time("post-cluster box read")(
      t.snapshot()
        .filter(col("l_partkey") <= 200 && col("l_suppkey") <= 20)
        .count())
    spark.stop()
  }
}
