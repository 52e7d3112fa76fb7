package graft.pipelines

import graft.cdc.{CanalParser, CdcOp, CdcRecord}
import graft.lake.{LakeTable, TableMeta}
import graft.util.Sessions
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{MapType, StringType}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** CDC stream (Canal binlog envelopes) → lake table with per-op routing
  * (reference KDS2Hudi.scala:83-147 + cdc/CanalParser.scala:11-32).
  *
  * Unlike the reference — which parses Canal driver-side — the parse runs
  * as a typed `Dataset[String] → Dataset[CdcRecord]` flatMap on executors
  * (SURVEY §2.8), so a 100 TB backlog parses in parallel. Row payloads are
  * string-typed maps (Canal emits all values as strings); they are cast
  * column-wise to the target table schema.
  */
object CdcIngest {

  /** Distributed parse of raw Canal JSON lines. */
  def parse(lines: Dataset[String]): Dataset[CdcRecord] = {
    import lines.sparkSession.implicits._
    lines.flatMap(CanalParser.parse _)
  }

  /** Cast the string-map payloads of `records` to the table schema,
    * keeping per-row op/ordering columns (`_op`, `_ts`, `_pos`).
    */
  def typedRows(spark: SparkSession, records: Dataset[CdcRecord],
      table: LakeTable): DataFrame = {
    val userFields = table.userSchema.get.fields
    records.toDF()
      .select(col("op").as("_op"), col("ts").as("_ts"),
        explode(col("rows")).as("row"))
      .withColumn("_pos", monotonically_increasing_id())
      .select(Seq(col("_op"), col("_ts"), col("_pos"),
        from_json(col("row"), MapType(StringType, StringType)).as("m")): _*)
      .select(col("_op") +: col("_ts") +: col("_pos") +:
        userFields.toIndexedSeq.map(f =>
          col("m").getItem(f.name).cast(f.dataType).as(f.name)): _*)
  }

  /** DMS-style two-level envelope `{data: struct, metadata: struct}`
    * (reference KDS2Hudi.scala:36-81, hand-declared schema; SURVEY A2):
    * expand `data.*`, route by `metadata.operation`
    * (insert/update → upsert, delete → delete — KDS2Hudi.scala:117-136).
    */
  def applyDmsBatch(spark: SparkSession, batch: DataFrame,
      table: LakeTable): Unit = {
    import org.apache.spark.sql.types._
    val dataSchema = table.userSchema.get
    val envelope = StructType(Seq(
      StructField("data", dataSchema),
      StructField("metadata", StructType(Seq(
        StructField("operation", StringType),
        StructField("record-type", StringType),
        StructField("table-name", StringType),
        StructField("timestamp", StringType))))))
    val parsed = batch
      .select(from_json(col("value").cast("string"), envelope).as("e"), // P1+P2
        monotonically_increasing_id().as("_pos"))
      .where(col("e.data").isNotNull) // P9
      .select(col("e.metadata.operation").as("_op"),
        col("e.metadata.timestamp").as("_ts"), col("_pos"), col("e.data.*")) // P3
    // Resolve the FINAL operation per key within the batch before routing:
    // applying "all upserts then all deletes" would leave a key deleted
    // even when a delete is followed by a re-insert later in the stream.
    // Per-record order is recovered from metadata.timestamp (DMS commit
    // ts), tie-broken by arrival position in the batch.
    val keyFields = table.meta.recordKeyFields
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyFields.map(col): _*)
      .orderBy(col("_ts").desc_nulls_last, col("_pos").desc)
    val finalOps = parsed
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", "_ts", "_pos")
      .persist()
    try {
      val upserts = finalOps.filter(col("_op").isin("insert", "update", "load"))
        .drop("_op")
      // key-unique by construction after the window — skip combine
      if (!upserts.isEmpty) { table.upsert(upserts, combine = false); () }
      val deletes = finalOps.filter(col("_op") === "delete").drop("_op")
      if (!deletes.isEmpty) { table.delete(deletes); () }
    } finally { finalOps.unpersist(); () }
  }

  def applyBatch(spark: SparkSession, batch: DataFrame, cfg: PipelineConfig,
      table: LakeTable): Unit = {
    import spark.implicits._
    var recs = parse(batch.select(col("value").cast("string")).as[String])
    if (cfg.cdcTableFilter.nonEmpty) // package.scala:158 equality filter
      recs = recs.filter(col("table") === cfg.cdcTableFilter).as[CdcRecord]
    // Resolve the FINAL operation per key within the batch (binlog ts,
    // then stream position) before routing — same contract as the DMS
    // path: an insert→delete ends deleted, a delete→re-insert survives,
    // regardless of how ops interleave inside one micro-batch.
    val keyFields = table.meta.recordKeyFields
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyFields.map(col): _*)
      .orderBy(col("_ts").desc, col("_pos").desc)
    val finalOps = typedRows(spark, recs, table)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", "_ts", "_pos")
      .persist() // multi-action fan-out, reference Y2
    try {
      val upserts = finalOps
        .filter(col("_op").isin(CdcOp.Insert, CdcOp.Upsert)).drop("_op")
      if (!upserts.isEmpty) { table.upsert(upserts, combine = false); () }
      val deletes = finalOps.filter(col("_op") === CdcOp.Delete).drop("_op")
      if (!deletes.isEmpty) { table.delete(deletes); () }
    } finally { finalOps.unpersist(); () }
  }

  def run(spark: SparkSession, cfg: PipelineConfig): StreamingQuery = {
    val table = LakeTable.create(spark, cfg.tablePath,
      TableMeta(cfg.tableName, cfg.recordKeyFields, cfg.precombineField,
        cfg.partitionFields, cfg.tableType))
    require(table.userSchema.isDefined || cfg.sampleJson.nonEmpty,
      "CDC target needs an existing schema or --sample-json")
    if (table.userSchema.isEmpty) {
      // bootstrap schema from a sample row JSON (all-string Canal payloads
      // keep declared types via the sample's inferred schema)
      import spark.implicits._
      val inferred = spark.read.json(Seq(cfg.sampleJson).toDS())
      table.insert(inferred.limit(0))
    }
    spark.readStream.format("text").load(cfg.inboxDir)
      .writeStream
      .queryName(s"cdc-${cfg.tableName}")
      .option("checkpointLocation", cfg.checkpointDir)
      .trigger(Trigger.ProcessingTime(s"${cfg.triggerSeconds} seconds"))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          if (cfg.cdcFormat == "dms") applyDmsBatch(spark, batch, table)
          else applyBatch(spark, batch, cfg, table)
        }
      }
      .start()
  }

  def main(args: Array[String]): Unit = {
    val cfg = PipelineConfig.parse(args)
    val spark = Sessions.local("cdc-ingest")
    spark.sparkContext.setLogLevel("WARN")
    run(spark, cfg).awaitTermination()
  }
}
