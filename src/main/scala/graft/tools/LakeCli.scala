package graft.tools

import graft.lake.LakeTable
import graft.util.Sessions

/** Table inspection CLI.
  *
  * Usage:
  *   runMain graft.tools.LakeCli describe   <tablePath>
  *   runMain graft.tools.LakeCli history    <tablePath>
  *   runMain graft.tools.LakeCli partitions <tablePath>
  *   runMain graft.tools.LakeCli show       <tablePath> [n]
  */
object LakeCli {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: LakeCli describe|history|show <tablePath> [n]")
    val (cmd, path) = (args(0), args(1))
    val spark = Sessions.local("lake-cli", "8")
    spark.sparkContext.setLogLevel("ERROR")
    val t = LakeTable.load(spark, path)
    cmd match {
      case "describe" =>
        val m = t.meta
        println(s"table:        ${m.name}")
        println(s"type:         ${m.tableType}")
        println(s"record key:   ${m.recordKeyFields.mkString(",")}")
        println(s"precombine:   ${m.precombineField}")
        println(s"partitions:   ${m.partitionFields.mkString(",")}")
        val live = t.timeline.liveFiles()
        println(s"live files:   ${live.size} (${live.count(_.isDelta)} delta)")
        println(s"live rows:    ${live.map(_.numRecords).sum}")
        println(s"size:         ${live.map(_.sizeBytes).sum / 1024} KiB")
        // read amplification: a MOR snapshot must merge every delta row —
        // the fraction below is the extra work vs a read-optimized scan,
        // and the signal for when to compact
        val deltaRows = live.filter(_.isDelta).map(_.numRecords).sum
        val totalRows = live.map(_.numRecords).sum.max(1L)
        println(f"merge debt:   $deltaRows rows in deltas " +
          f"(${100.0 * deltaRows / totalRows}%.1f%% of live rows)")
        println(s"tombstones:   ${live.map(_.tombstones).sum}")
        println(s"commits:      ${t.timeline.instants().size} (latest ${t.latestCommit.getOrElse("-")})")
        t.userSchema.foreach(s => println(s"schema:       ${s.simpleString}"))
      case "partitions" =>
        t.timeline.liveFiles().groupBy(_.partition).toSeq.sortBy(_._1)
          .foreach { case (p, fs) =>
            println(f"${if (p.isEmpty) "<unpartitioned>" else p}%-40s " +
              f"${fs.size}%4d files ${fs.map(_.numRecords).sum}%10d rows " +
              f"${fs.map(_.sizeBytes).sum / 1024}%8d KiB")
          }
      case "history" =>
        t.timeline.instants().foreach { i =>
          val c = t.timeline.read(i)
          println(f"$i  ${c.operation}%-18s +${c.added.size}%3d files " +
            f"-${c.removed.size}%3d files  ${c.added.map(_.numRecords).sum}%8d rows" +
            (if (c.extra.nonEmpty) s"  extra=${c.extra}" else ""))
        }
      case "show" =>
        val n = if (args.length > 2) args(2).toInt else 20
        t.snapshot().show(n, truncate = false)
      case other => sys.error(s"unknown command: $other")
    }
    spark.stop()
  }
}
