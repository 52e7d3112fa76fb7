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

  /** Cast the string-map payloads of parsed envelopes to the table
    * schema, keeping per-row op/ordering columns. `records` carries one
    * row per envelope: the CdcRecord fields plus its source position
    * (`_src`, `_line`). The resulting order tuple (binlog ts, binlog
    * event id, source file, line, row index inside the envelope) is
    * deterministic — resolution never depends on how Spark happened to
    * partition the batch.
    */
  def typedRows(spark: SparkSession, records: DataFrame,
      table: LakeTable): DataFrame = {
    val userFields = table.userSchema.get.fields
    records
      .select(col("op").as("_op"), col("ts").as("_ts"), col("seq").as("_seq"),
        col("_src"), col("_line"),
        posexplode(col("rows")).as(Seq("_idx", "row")))
      .select(Seq(col("_op"), col("_ts"), col("_seq"), col("_src"),
        col("_line"), col("_idx"),
        from_json(col("row"), MapType(StringType, StringType)).as("m")): _*)
      .select(Seq(col("_op"), col("_ts"), col("_seq"), col("_src"),
        col("_line"), col("_idx")) ++
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
    // Per-record order within a file: _line = row_number by read order
    // inside each source file. Within a file split Spark reads lines in
    // offset order and `monotonically_increasing_id` is ascending within
    // a partition, with split/partition indexes following file offsets —
    // so (_src, _line) is a DETERMINISTIC per-record position, unlike a
    // bare monotonically_increasing_id whose cross-partition order is
    // arbitrary. (A real Kinesis source would use the shard sequence
    // number here; the file stand-in uses file name + line.)
    val wLine = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_src")).orderBy(monotonically_increasing_id())
    val parsed = batch
      .select(from_json(col("value").cast("string"), envelope).as("e"), // P1+P2
        input_file_name().as("_src"))
      .withColumn("_line", row_number().over(wLine))
      .where(col("e.data").isNotNull) // P9
      .select(col("e.metadata.operation").as("_op"),
        col("e.metadata.timestamp").as("_ts"), col("_src"), col("_line"),
        col("e.data.*")) // P3
    // Resolve the FINAL operation per key within the batch before routing:
    // applying "all upserts then all deletes" would leave a key deleted
    // even when a delete is followed by a re-insert later in the stream.
    // Per-record order is recovered from metadata.timestamp (DMS commit
    // ts, microsecond precision), tie-broken by source position (later
    // file, later line wins — inbox files are named monotonically by the
    // producer).
    val keyFields = table.meta.recordKeyFields
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyFields.map(col): _*)
      .orderBy(col("_ts").desc_nulls_last, col("_src").desc, col("_line").desc)
    val finalOps = parsed
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", "_ts", "_src", "_line")
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

  /** Distributed parse of a raw inbox batch into one row per Canal
    * envelope, tagged with its deterministic source position (see
    * [[applyDmsBatch]] for the (_src, _line) ordering argument).
    */
  private def parsedRecords(spark: SparkSession, batch: DataFrame): DataFrame = {
    import spark.implicits._
    // envelope source position (file name + line within file) — the
    // LAST-resort tiebreak for degenerate binlogs whose events share both
    // ts and event id; see the DMS path for the line-order reasoning
    val wLine = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_src")).orderBy(monotonically_increasing_id())
    batch
      .select(col("value").cast("string").as("value"),
        input_file_name().as("_src"))
      .withColumn("_line", row_number().over(wLine))
      .as[(String, String, Int)]
      .flatMap { case (v, src, line) => CanalParser.parse(v).map(r =>
        (r.database, r.table, r.op, r.rows, r.ts, r.seq, src, line)) }
      .toDF("database", "table", "op", "rows", "ts", "seq", "_src", "_line")
  }

  /** Resolve the FINAL operation per key within the batch (binlog ts,
    * then binlog event id, then source position, then row index in the
    * envelope — deterministic under any partition layout) before
    * routing — same contract as the DMS path: an insert→delete ends
    * deleted, a delete→re-insert survives, regardless of how ops
    * interleave inside one micro-batch. `recs` must already be scoped to
    * ONE target table's envelopes.
    */
  private def routeFinalOps(spark: SparkSession, recs: DataFrame,
      table: LakeTable): Unit = {
    val keyFields = table.meta.recordKeyFields
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyFields.map(col): _*)
      .orderBy(col("_ts").desc, col("_seq").desc, col("_src").desc,
        col("_line").desc, col("_idx").desc)
    val finalOps = typedRows(spark, recs, table)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", "_ts", "_seq", "_src", "_line", "_idx")
      .persist() // multi-action fan-out, reference Y2
    try {
      val upserts = finalOps
        .filter(col("_op").isin(CdcOp.Insert, CdcOp.Upsert)).drop("_op")
      if (!upserts.isEmpty) { table.upsert(upserts, combine = false); () }
      val deletes = finalOps.filter(col("_op") === CdcOp.Delete).drop("_op")
      if (!deletes.isEmpty) { table.delete(deletes); () }
    } finally { finalOps.unpersist(); () }
  }

  def applyBatch(spark: SparkSession, batch: DataFrame, cfg: PipelineConfig,
      table: LakeTable): Unit = {
    var recs = parsedRecords(spark, batch)
    if (cfg.cdcTableFilter.nonEmpty) // package.scala:158 equality filter
      recs = recs.filter(col("table") === cfg.cdcTableFilter)
    routeFinalOps(spark, recs, table)
  }

  /** Multi-table fan-out (reference package.scala:145-183,
    * `writeMultiTable2HudiFromDF`): one inbox batch carrying MANY tables'
    * Canal envelopes — a whole-database binlog topic — routed to N lake
    * tables under `basePath/database/<table>`. The batch parses ONCE
    * (distributed, persisted across the per-table passes); the distinct
    * table list is the reference's `select("topic").distinct().collect()`
    * (SURVEY A4 — a bounded control-flow collect, O(tables) not O(rows));
    * each table resolves final ops and routes through the same keyed
    * write path as single-table mode, with key/partition metadata read
    * from the per-table properties file (TableMeta — the P14 substitution
    * for the reference's JDBC `getPrimaryAndPartitionKey`). Targets must
    * exist up front, exactly as the reference reads each target Hudi
    * table's schema before writing (package.scala:164-169).
    */
  def applyMultiTableBatch(spark: SparkSession, batch: DataFrame,
      cfg: PipelineConfig): Unit = {
    import spark.implicits._
    val recs = parsedRecords(spark, batch)
      .persist() // one parse feeds every per-table pass
    try {
      val tables = recs.select(col("table")).distinct()
        .as[String].collect().sorted
      tables.foreach { tn =>
        val path = s"${cfg.basePath}/${cfg.database}/$tn"
        require(LakeTable.exists(spark, path),
          s"multi-table CDC target $path does not exist; create the " +
            "table (schema + record key) before ingesting its binlog")
        routeFinalOps(spark, recs.filter(col("table") === tn),
          LakeTable.load(spark, path))
      }
    } finally { recs.unpersist(); () }
  }

  def run(spark: SparkSession, cfg: PipelineConfig): StreamingQuery = {
    // multi-table mode: targets are located per batch by envelope table
    // name under basePath/database/; no single table to prepare up front
    val table: Option[LakeTable] =
      if (cfg.cdcMultiTable) {
        require(cfg.basePath.nonEmpty,
          "multi-table CDC requires --base-path (targets live at " +
            "basePath/database/<table>)")
        None
      } else Some {
        val t = LakeTable.create(spark, cfg.tablePath,
          TableMeta(cfg.tableName, cfg.recordKeyFields, cfg.precombineField,
            cfg.partitionFields, cfg.tableType))
        require(t.userSchema.isDefined || cfg.sampleJson.nonEmpty,
          "CDC target needs an existing schema or --sample-json")
        if (t.userSchema.isEmpty) {
          // bootstrap schema from a sample row JSON (all-string Canal
          // payloads keep declared types via the sample's inferred schema)
          import spark.implicits._
          val inferred = spark.read.json(Seq(cfg.sampleJson).toDS())
          t.insert(inferred.limit(0))
        }
        t
      }
    val name = if (cfg.cdcMultiTable) s"cdc-multi-${cfg.database}"
      else s"cdc-${cfg.tableName}"
    // T4: per-batch progress logging (reference Log2Hudi.scala:40-48)
    graft.streaming.ProgressListener.attach(spark, name)
    spark.readStream.format("text").load(cfg.inboxDir)
      .writeStream
      .queryName(name)
      .option("checkpointLocation", cfg.checkpointDir)
      .trigger(Trigger.ProcessingTime(s"${cfg.triggerSeconds} seconds"))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) table match {
          case None    => applyMultiTableBatch(spark, batch, cfg)
          case Some(t) =>
            if (cfg.cdcFormat == "dms") applyDmsBatch(spark, batch, t)
            else applyBatch(spark, batch, cfg, t)
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
