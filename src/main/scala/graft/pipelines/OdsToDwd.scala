package graft.pipelines

import graft.lake.{LakeTable, TableMeta}
import graft.util.Sessions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** ODS → DWD: poll-loop incremental read + dim enrichment join + keyed
  * upsert (reference ODS2DWD.scala:22-81).
  *
  * Differences from the reference, on purpose:
  *  - the dim snapshot is re-read every iteration (the reference caches a
  *    stale temp view for the life of the loop — SURVEY §3.2 footgun);
  *  - the incremental begin-watermark is persisted in the DWD commit
  *    (`extra`), so a crash between read and write cannot double-apply;
  *  - the loop is bounded by `--max-iterations` for testability (T6).
  *
  * Scale: the dim side is broadcast (small dimension table, reference
  * relies on CBO for the same plan, SparkHelper.scala:18); the incremental
  * read only opens files added in `(begin, end]`.
  */
object OdsToDwd {

  val WatermarkKey = "ods.watermark"

  def resumeWatermark(dwd: LakeTable): String =
    dwd.timeline.instants().reverse.iterator
      .map(dwd.timeline.read)
      .flatMap(_.extra.get(WatermarkKey))
      .nextOption()
      .getOrElse("earliest")

  def iteration(spark: SparkSession, cfg: PipelineConfig, ods: LakeTable,
      dwd: LakeTable, begin: String): String = {
    val end = ods.latestCommit.getOrElse(return begin)
    if (begin == end) return begin
    val inc = ods.incremental(begin, end).drop("_record_key")
    if (inc.isEmpty) return end
    val dimDf =
      if (LakeTable.exists(spark, cfg.dimTablePath))
        LakeTable.load(spark, cfg.dimTablePath).snapshotUser()
      else spark.read.parquet(cfg.dimTablePath)
    val enrichCols = cfg.dimSelect.map(c =>
      coalesce(col(c), lit(cfg.dimDefault)).as(c)) // nvl defaults, P13
    // Precombine for the DWD upsert preserves the SOURCE commit ordering
    // (the ODS `_commit_time` of each row) rather than a per-batch
    // constant: if one batch carries several source commits, or a batch
    // is replayed, the downstream max-precombine merge still resolves
    // deterministically to the newest source version.
    val joined = inc
      .join(broadcast(dimDf.select((cfg.joinRightKey +: cfg.dimSelect).distinct.map(col): _*)),
        inc(cfg.joinLeftKey) === dimDf(cfg.joinRightKey), "left") // J1
      .select(inc.columns.map(inc(_)).toIndexedSeq ++ enrichCols: _*)
      .withColumn(cfg.precombineField, col(LakeTable.CommitTimeCol).cast("long"))
      .drop(LakeTable.CommitTimeCol)
    dwd.upsert(joined, extra = Map(WatermarkKey -> end))
    end
  }

  def run(spark: SparkSession, cfg: PipelineConfig): Unit = {
    val ods = LakeTable.load(spark, cfg.sourceTablePath)
    val dwd = LakeTable.create(spark, cfg.tablePath,
      TableMeta(cfg.tableName, cfg.recordKeyFields, cfg.precombineField,
        cfg.partitionFields, cfg.tableType))
    var begin = resumeWatermark(dwd) // reference: max(_hoodie_commit_time)
    var iter = 0
    while (cfg.maxIterations < 0 || iter < cfg.maxIterations) { // T6
      if (iter > 0) Thread.sleep(cfg.pollIntervalMs)
      begin = iteration(spark, cfg, ods, dwd, begin)
      iter += 1
    }
  }

  def main(args: Array[String]): Unit = {
    val cfg = PipelineConfig.parse(args)
    val spark = Sessions.local("ods-to-dwd")
    spark.sparkContext.setLogLevel("WARN")
    run(spark, cfg)
    spark.stop()
  }
}
