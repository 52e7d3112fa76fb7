package graft.pipelines

import graft.lake.{LakeTable, TableMeta, TxnGroup}
import graft.util.Sessions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming DWD → N marts under ONE transaction per micro-batch — the
  * reference's DWD2DM loop (reference DWD2DM.scala:54-85) at streaming
  * cadence, made atomic across marts.
  *
  * Every micro-batch from the graft-lake streaming source (an exact
  * commit range of the DWD table) fans out into one additive merge per
  * mart ([[DwdToDm.aggregate]]/[[DwdToDm.merge]] — each mart has its own
  * grouping keys), and ALL mart upserts commit through
  * [[TxnGroup.commit]] with the shared source watermark riding every
  * prepare's extra. Consequences:
  *
  *  - a crash anywhere inside the batch — including BETWEEN two marts'
  *    prepares, the reference's torn-write window (SURVEY hard part #5)
  *    — leaves every mart's visible state and watermark at the previous
  *    batch: the checkpoint replays the range, the watermark guard sees
  *    it is still unapplied, and the rerun converges with no double
  *    count on ANY mart;
  *  - after the decision, all marts advance together — a consumer
  *    joining two marts never observes one post-batch and one pre-batch.
  *
  * Prepares inside the commit run in parallel (TxnGroup), so the hop's
  * per-batch wall is ~the slowest single mart merge, not the sum.
  *
  * Startup runs [[LakeTable.recoverTxns]] on every mart: a previous
  * run's crashed in-doubt prepares (stale reservations) abort and roll
  * back before the first batch; a still-live writer's prepares are left
  * alone and this run's first commit fails its OCC check instead —
  * fencing, not laundering.
  *
  * Scale: per batch, each mart's delta agg is a map-side-combined hash
  * agg over the increment only, the merge join is keyed by the mart's
  * grouping columns, and the 2PC adds one tiny decision record — no
  * cross-mart data movement.
  */
object MultiMartHop {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Start the hop. Every element of `marts` names its own target table
    * (`targetTablePath`/`tableName`) and aggregation shape
    * (`aggKeys`/`aggCol`); the source, checkpoint, trigger, and
    * maintenance cadence (`maintainEvery` — run each mart's one-call
    * `maintain()` after every N non-empty batches, 0 disables; the
    * StreamIngest auto-optimize knob) come from the head config.
    */
  def runStreaming(spark: SparkSession, marts: Seq[PipelineConfig])
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(marts.nonEmpty, "need at least one mart")
    require(marts.map(_.tablePath).distinct.size == marts.size,
      "each mart needs its own table path")
    val maintainEvery = marts.head.maintainEvery
    val batchesSinceMaintain = new java.util.concurrent.atomic.AtomicInteger(0)
    val src = marts.head.sourceTablePath
    val tables = marts.map(c => LakeTable.create(spark, c.tablePath,
      TableMeta(c.tableName, c.recordKeyFields, c.precombineField,
        c.partitionFields, c.tableType)))
    tables.foreach(_.recoverTxns())
    graft.streaming.ProgressListener.attach(spark, "multimart-hop")
    spark.readStream.format("graft-lake").load(src)
      .writeStream
      .queryName("multimart-hop")
      .option("checkpointLocation", marts.head.checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime(s"${marts.head.triggerSeconds} seconds"))
      .foreachBatch { (b: DataFrame, _: Long) =>
        if (!b.isEmpty) {
          val batch = org.apache.spark.sql.graft.ColumnBridge.asBatch(b)
            .persist() // feeds the watermark probe AND every mart's delta
          try {
            val end = batch.agg(max(col(LakeTable.CommitTimeCol)))
              .head().getString(0)
            // all marts share one watermark (they advance atomically or
            // not at all), so the head's committed value speaks for all
            val wm = DwdToDm.resumeWatermark(tables.head).getOrElse("")
            if (end > wm) { // replayed batch: already merged everywhere
              val inc = batch.drop(LakeTable.RecordKeyCol,
                LakeTable.CommitTimeCol, LakeTable.DeletedCol)
              val ops = marts.lazyZip(tables).map { (cfg, dm) =>
                val delta = DwdToDm.aggregate(inc, cfg)
                val current =
                  if (dm.userSchema.isDefined) dm.snapshotUser()
                  else spark.createDataFrame(
                    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
                    delta.schema)
                val merged = DwdToDm.merge(delta, current, cfg)
                  .withColumn(cfg.precombineField, lit(end.toLong))
                TxnGroup.TxnUpsert(dm, merged,
                  extra = Map(DwdToDm.WatermarkKey -> end))
              }
              TxnGroup.commit(ops)
              // auto-maintenance OUTSIDE the transaction (services are
              // per-table housekeeping commits, never txn participants)
              // and BEST-EFFORT: the batch is already committed, so a
              // housekeeping failure must not abort the stream
              if (maintainEvery > 0 &&
                  batchesSinceMaintain.incrementAndGet() >= maintainEvery) {
                batchesSinceMaintain.set(0)
                tables.foreach { dm =>
                  try { dm.maintain(); () }
                  catch {
                    case scala.util.control.NonFatal(e) => log.warn(
                      s"maintain() failed on ${dm.path} (batch already " +
                        s"committed; will retry next cadence)", e)
                  }
                }
              }
              ()
            }
          } finally { batch.unpersist(); () }
        }
      }
      .start()
  }

  /** Parse the `name:aggKey[+aggKey...]:aggCol[,name:...]` marts spec
    * into per-mart configs under `base` (shared by [[main]] and the
    * `LakeCli multimart` subcommand). Record keys default to the
    * grouping keys (one row per group).
    */
  private[graft] def parseMarts(base: PipelineConfig,
      spec: String): Seq[PipelineConfig] =
    spec.split(",").map(_.trim).filter(_.nonEmpty).map { m =>
      val Array(name, keys, aggCol) = m.split(":")
      val aggKeys = keys.split("\\+").toSeq
      base.copy(tableName = name, targetTablePath = s"${base.basePath}/$name",
        recordKeyFields = aggKeys, aggKeys = aggKeys, aggCol = aggCol)
    }.toSeq

  /** CLI: `--source-table-path <dwd> --base-path <root> --checkpoint-dir
    * <ckpt> --marts name:aggKey[+aggKey...]:aggCol[,name:...]`.
    */
  def main(args: Array[String]): Unit = {
    val (martArg, rest) = {
      val i = args.indexOf("--marts")
      require(i >= 0 && i + 1 < args.length, "--marts is required")
      (args(i + 1), args.patch(i, Nil, 2))
    }
    val marts = parseMarts(PipelineConfig.parse(rest), martArg)
    val spark = Sessions.local("multimart-hop")
    spark.sparkContext.setLogLevel("WARN")
    runStreaming(spark, marts).awaitTermination()
  }
}
