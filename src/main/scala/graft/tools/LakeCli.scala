package graft.tools

import graft.lake.LakeTable
import graft.util.Sessions

/** Table inspection + maintenance CLI.
  *
  * Usage:
  *   runMain graft.tools.LakeCli describe    <tablePath>
  *   runMain graft.tools.LakeCli history     <tablePath>
  *   runMain graft.tools.LakeCli partitions  <tablePath>
  *   runMain graft.tools.LakeCli show        <tablePath> [n]
  *   runMain graft.tools.LakeCli compact     <tablePath> [partitionDir...]
  *   runMain graft.tools.LakeCli cluster     <tablePath> <col>[,col...]
  *   runMain graft.tools.LakeCli zorder      <tablePath> <col>,<col>[,col...]
  *   runMain graft.tools.LakeCli hilbert     <tablePath> <col>,<col>[,col...] [incremental]
  *   runMain graft.tools.LakeCli pack        <tablePath> [targetBytes]
  *   runMain graft.tools.LakeCli maintain    <tablePath> [targetBytes] [retainCommits]
  *   runMain graft.tools.LakeCli recover-txns <tablePath>  # in-doubt 2PC halves
  *   runMain graft.tools.LakeCli clean       <tablePath> [retainCommits]
  *   runMain graft.tools.LakeCli expire-partitions <tablePath> <column> <cutoff>
  *   runMain graft.tools.LakeCli sweep       <tablePath>        # orphaned data
  *   runMain graft.tools.LakeCli archive     <tablePath> [keepCommits]
  *   runMain graft.tools.LakeCli restore     <tablePath> <instant>
  *   runMain graft.tools.LakeCli rename-col  <tablePath> <old> <new>
  *   runMain graft.tools.LakeCli drop-col    <tablePath> <col>
  *   runMain graft.tools.LakeCli secidx-build   <tablePath> <col>
  *   runMain graft.tools.LakeCli secidx-refresh <tablePath> <col>
  *   runMain graft.tools.LakeCli scd2-advance     <tablePath> <stateDir> <key>[,key...]
  *   runMain graft.tools.LakeCli distinct-advance <tablePath> <stateDir> <grp>[,grp...] <valueCol>
  *   runMain graft.tools.LakeCli rollup-advance   <tablePath> <stateDir> <grp>[,grp...] <valueCol>
  *   runMain graft.tools.LakeCli branch      <tablePath> <destPath> <name>
  *   runMain graft.tools.LakeCli key-history <tablePath> <col=val[,col=val...]>
  *   runMain graft.tools.LakeCli multimart   <sourceTablePath> <basePath> <ckptDir> <name:aggKey[+k2]:aggCol[,...]> [once]
  *   runMain graft.tools.LakeCli ann-maintain <embeddingsTablePath> <indexRoot> <ckptDir> [rebuildEvery] [once]
  */
object LakeCli {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("lake-cli", "8")
    spark.sparkContext.setLogLevel("ERROR")
    run(spark, args)
    spark.stop()
  }

  /** The command dispatch, session-agnostic so specs can smoke each
    * subcommand on their own session.
    */
  def run(spark: org.apache.spark.sql.SparkSession,
      args: Array[String]): Unit = {
    require(args.length >= 2, "usage: LakeCli describe|history|show <tablePath> [n]")
    val (cmd, path) = (args(0), args(1))
    val t = LakeTable.load(spark, path)
    cmd match {
      case "describe" =>
        val m = t.meta
        println(s"table:        ${m.name}")
        println(s"type:         ${m.tableType}")
        println(s"record key:   ${m.recordKeyFields.mkString(",")}")
        println(s"precombine:   ${m.precombineField}")
        println(s"partitions:   ${m.partitionFields.mkString(",")}")
        if (m.bucketCount > 0) println(s"buckets:      ${m.bucketCount}")
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
      case "compact" =>
        val done =
          if (args.length > 2) t.compactPartitions(args.drop(2).toSet)
          else t.compact()
        println(done.fold("nothing to compact")(i => s"compacted at $i"))
      case "cluster" =>
        require(args.length > 2, "cluster needs sort columns")
        val done = t.cluster(args(2).split(",").map(_.trim).toSeq)
        println(done.fold("empty table")(i => s"clustered at $i"))
      case "pack" =>
        val target = if (args.length > 2) args(2).toLong else 128L * 1024 * 1024
        val done = t.packSmallFiles(target)
        println(done.fold("nothing to pack")(i => s"packed at $i"))
      case "maintain" =>
        val target = if (args.length > 2) args(2).toLong else 128L * 1024 * 1024
        val retain = if (args.length > 3) args(3).toInt else 8
        val did = t.maintain(target, retain)
        if (did.isEmpty) println("table healthy: nothing to do")
        else did.foreach { case (svc, i) => println(s"$svc: $i") }
      case "recover-txns" =>
        val did = t.recoverTxns()
        if (did.isEmpty) println("no in-doubt transactions")
        else did.foreach { case (i, o) => println(s"$i: $o") }
      case "zorder" =>
        require(args.length > 2, "zorder needs curve columns")
        val done = t.clusterZOrder(args(2).split(",").map(_.trim).toSeq)
        println(done.fold("empty table")(i => s"z-ordered at $i"))
      case "hilbert" =>
        require(args.length > 2, "hilbert needs curve columns")
        val incr = args.length > 3 && args(3) == "incremental"
        val done = t.clusterHilbert(args(2).split(",").map(_.trim).toSeq,
          incremental = incr)
        println(done.fold("nothing to cluster")(i =>
          s"hilbert-clustered at $i${if (incr) " (incremental)" else ""}"))
      case "clean" =>
        t.clean(if (args.length > 2) args(2).toInt else 2)
        println("clean done")
      case "expire-partitions" =>
        require(args.length > 3, "expire-partitions <table> <column> <cutoff>")
        val dropped = t.expirePartitions(args(2), args(3))
        println(s"expired ${dropped.size} partition value(s): " +
          dropped.mkString(", "))
      case "sweep" =>
        println(s"removed ${t.cleanOrphanedData()} orphaned data file(s)")
      case "archive" =>
        val archived =
          t.archiveTimeline(if (args.length > 2) args(2).toInt else 10)
        println(s"archived ${archived.size} commit(s)")
      case "restore" =>
        require(args.length > 2, "restore needs an instant")
        t.restore(args(2), force = args.length > 3 && args(3) == "force")
        println(s"restored to ${args(2)}")
      case "rename-col" =>
        require(args.length > 3, "rename-col needs <old> <new>")
        t.renameColumn(args(2), args(3))
        println(s"renamed ${args(2)} -> ${args(3)}")
      case "drop-col" =>
        require(args.length > 2, "drop-col needs a column")
        t.dropColumn(args(2))
        println(s"dropped ${args(2)}")
      case "secidx-build" =>
        require(args.length > 2, "secidx-build needs a column")
        val done = t.buildSecondaryIndex(args(2))
        println(done.fold("empty table")(i => s"index built as of $i"))
      case "secidx-refresh" =>
        require(args.length > 2, "secidx-refresh needs a column")
        val done = t.refreshSecondaryIndex(args(2))
        println(done.fold("nothing to refresh")(i => s"index refreshed to $i"))
      case "scd2-advance" =>
        require(args.length > 3, "scd2-advance needs <stateDir> <key>[,key...]")
        val done = graft.pipelines.Scd2.advance(spark, t, args(2),
          args(3).split(",").map(_.trim).toSeq)
        println(done.fold("empty table")(w =>
          s"dimension advanced to ${w._1} (ordinal ${w._2})"))
      case "distinct-advance" =>
        require(args.length > 4,
          "distinct-advance needs <stateDir> <grp>[,grp...] <valueCol>")
        val done = graft.pipelines.DistinctMaintain.advance(spark, t, args(2),
          args(3).split(",").map(_.trim).toSeq,
          org.apache.spark.sql.functions.col(args(4)))
        println(done.fold("empty table")(i => s"aux state advanced to $i"))
      case "rollup-advance" =>
        require(args.length > 4,
          "rollup-advance needs <stateDir> <grp>[,grp...] <valueCol>")
        val done = graft.pipelines.RollupMaintain.advance(spark, t, args(2),
          args(3).split(",").map(_.trim).toSeq,
          org.apache.spark.sql.functions.col(args(4)))
        println(done.fold("empty table")(i => s"rollup state advanced to $i"))
      case "branch" =>
        require(args.length > 3, "branch needs <destPath> <name>")
        val br = t.shallowCloneTo(args(2), args(3))
        println(s"branched to ${br.path} " +
          s"(genesis ${br.latestCommit.getOrElse("-")})")
      case "key-history" =>
        // per-key audit lookup: key-history <tablePath> <col=val[,col=val...]>
        require(args.length > 2, "key-history needs col=val[,col=val...]")
        val kv = args(2).split(",").map(_.split("=", 2)).map {
          case Array(k, v) => k.trim -> v.trim
          case other => sys.error(s"bad key spec: ${other.mkString("=")}")
        }
        val schema = t.userSchema.get
        val row = org.apache.spark.sql.Row.fromSeq(kv.toIndexedSeq.map {
          case (k, v) =>
            schema(schema.fieldIndex(k)).dataType match {
              case org.apache.spark.sql.types.LongType    => v.toLong
              case org.apache.spark.sql.types.IntegerType => v.toInt
              case org.apache.spark.sql.types.DoubleType  => v.toDouble
              case _                                      => v
            }
        })
        val probe = spark.createDataFrame(
          java.util.Collections.singletonList(row),
          org.apache.spark.sql.types.StructType(kv.toIndexedSeq.map {
            case (k, _) => schema(schema.fieldIndex(k))
          }))
        t.keyHistory(probe).show(100, truncate = false)
      case "ann-maintain" =>
        // ann-maintain <embeddingsTablePath> <indexRoot> <ckptDir>
        //   [rebuildEvery] [once]
        // `once` drains the available CDC feed and stops; otherwise the
        // maintenance stream runs until interrupted.
        require(args.length > 3,
          "ann-maintain needs <indexRoot> <ckptDir> [rebuildEvery] [once]")
        val rebuildEvery =
          if (args.length > 4 && args(4).forall(_.isDigit)) args(4).toInt
          else 0
        val q = graft.pipelines.AnnMaintain.runStream(spark, path,
          args(2), args(3), rebuildEvery = rebuildEvery)
        if (args.last == "once") {
          q.processAllAvailable()
          q.stop()
          val idx = graft.queries.IvfStreamIndex(spark, args(2))
          println(s"ann index at ${args(2)} drained: " +
            s"rebuiltThrough=${idx.rebuiltThrough} " +
            s"pendingBatches=${idx.pendingBatches}")
        } else q.awaitTermination()
      case "multimart" =>
        // multimart <sourceTablePath> <basePath> <checkpointDir>
        //   <name:aggKey[+k2]:aggCol[,name:...]> [once]
        // `once` drains the available data and stops (spec smoke /
        // catch-up runs); otherwise the hop streams until interrupted.
        require(args.length > 4, "multimart needs <basePath> " +
          "<checkpointDir> <name:aggKey[+k2]:aggCol[,...]> [once]")
        val base = graft.pipelines.PipelineConfig.parse(Array(
          "--source-table-path", path, "--base-path", args(2),
          "--checkpoint-dir", args(3), "--trigger-seconds", "1"))
        val marts = graft.pipelines.MultiMartHop.parseMarts(base, args(4))
        val q = graft.pipelines.MultiMartHop.runStreaming(spark, marts)
        if (args.length > 5 && args(5) == "once") {
          q.processAllAvailable()
          q.stop()
          println(s"multimart hop drained into " +
            marts.map(_.tablePath).mkString(", "))
        } else q.awaitTermination()
      case other => sys.error(s"unknown command: $other")
    }
  }
}
