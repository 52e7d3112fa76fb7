package graft.tools

import graft.lake.{LakeTable, TableMeta}
import graft.util.Sessions
import org.apache.spark.sql.functions._

/** Demo / smoke CLI: drives the full lake-table lifecycle on the
  * driver-provided testdata. Usage:
  *   runMain graft.tools.LakeDemo <sfDir> <workDir>
  * Mirrors the reference's bootstrap-then-mutate flow
  * (Hive2Hudi → upsert → incremental, reference Hive2Hudi.scala:23-45,
  * ODS2DWD.scala:51-56).
  */
object LakeDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val work = if (args.length > 1) args(1) else "/tmp/lakedemo"
    val spark = Sessions.local("lake-demo", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("WARN")

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .withColumn("created_ts", col("l_shipdate").cast("timestamp_ltz").cast("long"))
    val tblPath = s"$work/lineitem_lake"
    val t = LakeTable.create(spark, tblPath,
      TableMeta("lineitem_lake", Seq("l_orderkey", "l_linenumber"),
        "created_ts", Seq("l_returnflag")))

    val c1 = t.upsert(li)
    println(s"[demo] commit1=$c1 snapshot rows=${t.snapshot().count()} (source=${li.count()})")

    // update a slice: bump quantity on orders < 100, newer precombine
    val upd = li.filter(col("l_orderkey") < 100)
      .withColumn("l_quantity", col("l_quantity") + 1000)
      .withColumn("created_ts", col("created_ts") + 1)
    val c2 = t.upsert(upd)
    val inc = t.incremental(c1, c2)
    println(s"[demo] commit2=$c2 incremental rows=${inc.count()} (updated=${upd.count()})")
    println(s"[demo] updated rows visible in snapshot=${t.snapshot().filter(col("l_quantity") > 900).count()}")

    val c3 = t.delete(li.filter(col("l_orderkey") < 50))
    println(s"[demo] commit3=$c3 after delete rows=${t.snapshot().count()}")
    println(s"[demo] time-travel rows@c1=${t.snapshotAsOf(c1).count()}")
    t.snapshot().orderBy("l_orderkey", "l_linenumber").show(3)
    spark.stop()
  }
}
