package graft.pipelines

import graft.lake.{LakeTable, TableMeta}
import graft.util.Sessions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** DWD → DM: incremental aggregation with additive merge (reference
  * DWD2DM.scala:22-97) — manual incremental-view maintenance:
  * `new_total = delta_sum + nvl(old_total, 0)`.
  *
  * Replay safety (SURVEY §7 hard part 5): the reference double-counts if
  * a delta batch is re-applied after a crash. Here the begin-watermark is
  * committed atomically with the DM upsert (`extra`), and resume reads it
  * back from the timeline.
  *
  * Scale: the delta aggregation is a partial (map-side combined) hash agg
  * over only the incremental files; the merge join touches the DM table
  * keyed by the grouping columns — both shuffle-bounded by delta size,
  * not table size.
  */
object DwdToDm {

  val WatermarkKey = "dwd.watermark"
  private val dec = DecimalType(27, 2)

  private def sumName(cfg: PipelineConfig) = s"${cfg.aggCol}_sum"

  def aggregate(df: DataFrame, cfg: PipelineConfig): DataFrame =
    df.groupBy(cfg.aggKeys.map(col): _*)
      .agg(sum(col(cfg.aggCol).cast(dec)).as(sumName(cfg))) // A1

  def resumeWatermark(dm: LakeTable): Option[String] =
    // visibleInstants, not instants: an in-doubt multi-table prepare's
    // watermark must not be resumed from until its txn commits
    dm.timeline.visibleInstants().reverse.iterator
      .map(dm.timeline.read)
      .flatMap(_.extra.get(WatermarkKey))
      .nextOption()

  /** Delta agg ⟕ current DM, additive merge (DWD2DM.scala:75-79). */
  def merge(delta: DataFrame, current: DataFrame, cfg: PipelineConfig): DataFrame = {
    val s = sumName(cfg)
    delta.as("i")
      .join(current.select((cfg.aggKeys :+ s).map(col): _*).as("c"),
        cfg.aggKeys, "left") // J2 composite-key left join
      .select(
        cfg.aggKeys.map(col) :+
          (col(s"i.$s") + coalesce(col(s"c.$s"), lit(0).cast(dec))).as(s): _*)
  }

  def iteration(spark: SparkSession, cfg: PipelineConfig, dwd: LakeTable,
      dm: LakeTable, begin: String): String = {
    val end = dwd.latestCommit.getOrElse(return begin)
    if (begin == end) return begin
    val inc = dwd.incremental(begin, end).drop("_record_key", "_commit_time")
    if (inc.isEmpty) return end
    val delta = aggregate(inc, cfg)
    // precombine = the source watermark instant: monotone across
    // iterations and identical on replay of the same delta, so a crashed
    // and re-run iteration converges instead of racing wall-clock.
    val merged = merge(delta, dm.snapshotUser(), cfg)
      .withColumn(cfg.precombineField, lit(end.toLong))
    dm.upsert(merged, extra = Map(WatermarkKey -> end))
    end
  }

  /** The same hop driven by the graft-lake streaming source: each
    * micro-batch is an exact commit range `(begin, end]` (the first one
    * replays the whole timeline — the init aggregation falls out for
    * free), foreachBatch applies the SAME additive merge, and the
    * commit-extra watermark keeps a checkpoint-replayed batch from
    * double-counting — end-to-end exactly-once on top of at-least-once
    * delivery.
    */
  def runStreaming(spark: SparkSession,
      cfg: PipelineConfig): org.apache.spark.sql.streaming.StreamingQuery = {
    val dm = LakeTable.create(spark, cfg.tablePath,
      TableMeta(cfg.tableName, cfg.recordKeyFields, cfg.precombineField,
        cfg.partitionFields, cfg.tableType))
    graft.streaming.ProgressListener.attach(spark, s"dwd2dm-${cfg.tableName}")
    spark.readStream.format("graft-lake").load(cfg.sourceTablePath)
      .writeStream
      .queryName(s"dwd2dm-${cfg.tableName}")
      .option("checkpointLocation", cfg.checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime(s"${cfg.triggerSeconds} seconds"))
      .foreachBatch { (b: DataFrame, _: Long) =>
        if (!b.isEmpty) {
          val batch = org.apache.spark.sql.graft.ColumnBridge.asBatch(b)
            .persist() // feeds the watermark probe AND the delta agg
          try {
            val end = batch.agg(max(col(LakeTable.CommitTimeCol)))
              .head().getString(0)
            val wm = resumeWatermark(dm).getOrElse("")
            if (end > wm) { // replayed batch: already merged, skip
              val inc = batch.drop(LakeTable.RecordKeyCol,
                LakeTable.CommitTimeCol, LakeTable.DeletedCol)
              val delta = aggregate(inc, cfg)
              // very first batch: no DM schema yet — merge against empty
              val current =
                if (dm.userSchema.isDefined) dm.snapshotUser()
                else spark.createDataFrame(
                  spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
                  delta.schema)
              val merged = merge(delta, current, cfg)
                .withColumn(cfg.precombineField, lit(end.toLong))
              dm.upsert(merged, extra = Map(WatermarkKey -> end))
              ()
            }
          } finally { batch.unpersist(); () }
        }
      }
      .start()
  }

  def run(spark: SparkSession, cfg: PipelineConfig): Unit = {
    val dwd = LakeTable.load(spark, cfg.sourceTablePath)
    val dm = LakeTable.create(spark, cfg.tablePath,
      TableMeta(cfg.tableName, cfg.recordKeyFields, cfg.precombineField,
        cfg.partitionFields, cfg.tableType))
    var begin = resumeWatermark(dm) match {
      case Some(w) => w
      case None =>
        // init: full snapshot aggregation (DWD2DM.scala:28-41), pinned to
        // the recorded watermark: aggregating the LIVE snapshot would
        // include a DWD commit landing between latestCommit and the scan,
        // which the next incremental(begin = end) re-reads — double count.
        val end = dwd.latestCommit.getOrElse("earliest")
        if (end != "earliest") {
          val init = aggregate(dwd.snapshotAsOf(end)
            .drop(LakeTable.RecordKeyCol, LakeTable.CommitTimeCol), cfg)
            .withColumn(cfg.precombineField, lit(end.toLong))
          dm.upsert(init, extra = Map(WatermarkKey -> end))
        }
        end
    }
    var iter = 0
    while (cfg.maxIterations < 0 || iter < cfg.maxIterations) { // T6
      if (iter > 0) Thread.sleep(cfg.pollIntervalMs)
      begin = iteration(spark, cfg, dwd, dm, begin)
      iter += 1
    }
  }

  def main(args: Array[String]): Unit = {
    val cfg = PipelineConfig.parse(args)
    val spark = Sessions.local("dwd-to-dm")
    spark.sparkContext.setLogLevel("WARN")
    if (cfg.streamingMode) runStreaming(spark, cfg).awaitTermination() // T7
    else { run(spark, cfg); spark.stop() }
  }
}
