package graft.sources

import graft.lake.{KeyBloom, LakeTable}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection}
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, SortOrder}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.execution.datasources.{OutputWriter, OutputWriterFactory}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graft.TaskWriteBridge
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

import scala.collection.mutable

/** SQL row-level operations — `MERGE INTO`, `UPDATE`, and
  * subquery/complex `DELETE` — as DELTA-BASED v2 row-level commands
  * ([[org.apache.spark.sql.connector.write.SupportsDelta]]).
  *
  * Design, and why delta-based instead of group-based:
  *
  *  - Spark rewrites the statement into a join between the target scan
  *    and the source, emitting only the CHANGED rows, each tagged
  *    insert/update/delete. A group-based operation would instead rewrite
  *    every affected file wholesale through the writer (and Spark demands
  *    a native `BatchWrite` for it — the V1Write fallback shims the thin
  *    provider uses do not reach it). Delta-based write cost is
  *    O(changed rows), the same contract as the lake's MOR write path —
  *    which this rides verbatim: updates/inserts land as data delta
  *    files, deletes as tombstone deltas, both resolved by the ordinary
  *    merge-on-read (precombine, commit-time) resolution. No second
  *    merge implementation to drift.
  *  - Row identity is the lake's own `_record_key` — exposed to Spark as
  *    the operation's `rowId`. Delete deltas then carry exactly the key,
  *    never a full row.
  *  - COW tables keep their contract (no outstanding deltas) by
  *    compacting the affected file groups inline right after the commit,
  *    under the same writer lock ([[LakeTable.rowLevelCommit]]).
  *  - Concurrency is optimistic: the instant is allocated up front, no
  *    lock is held during the distributed job, and the commit aborts if
  *    anything else committed in between (the rewrite read the
  *    pre-statement snapshot, so publishing over a concurrent commit
  *    would be write skew).
  *
  * Versioning semantics match the table's upsert contract (Hudi's
  * payload model, reference HudiConfig.scala:45): a written row wins
  * against equal-or-older precombine values (later commit breaks ties),
  * but a stored row with a STRICTLY newer precombine value than the
  * assignment survives — row-level ops are precombine-versioned, not
  * last-statement-wins.
  */
class LakeRowLevelBuilder(params: Map[String, String],
    info: RowLevelOperationInfo) extends RowLevelOperationBuilder {
  override def build(): RowLevelOperation =
    new LakeRowLevelOperation(params, info.command())
}

class LakeRowLevelOperation(params: Map[String, String],
    cmd: RowLevelOperation.Command)
    extends RowLevelOperation with SupportsDelta {

  override def command(): RowLevelOperation.Command = cmd

  override def description(): String =
    s"graft-lake $cmd ${params.getOrElse("path", "")}"

  /** Completed instants visible when the statement's scan plan was built
    * — the baseline for publish-time write-conflict detection. Captured
    * at operation construction and refreshed at [[newScanBuilder]] (the
    * scan's file listing happens at-or-after that point, so everything
    * in this set is guaranteed visible to the scan — any commit outside
    * it is treated as concurrent).
    */
  @volatile private[sources] var visibleAtPlan: Set[String] = capture()

  private def capture(): Set[String] =
    LakeTable.load(SparkSession.active, LakeDataSource.path(params))
      .committedInstants()

  /** The scan side: the same pruned/pushdown scan a read takes, over the
    * full shape (meta columns included — the rewrite asks for the rowId
    * column on top of the user columns).
    */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val spark = SparkSession.active
    val table = LakeTable.load(spark, LakeDataSource.path(params))
    visibleAtPlan = table.committedInstants()
    new LakeV2ScanBuilder(table.fullSchema, params)
  }

  override def rowId(): Array[NamedReference] =
    Array(Expressions.column(LakeTable.RecordKeyCol))

  override def representUpdateAsDeleteAndInsert(): Boolean = false

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite =
        new LakeDeltaWrite(params, info, cmd, () => visibleAtPlan)
    }
}

/** The delta write: task-level parquet writers staging MOR delta files,
  * published as one commit. Requests clustering by the table's partition
  * columns so each partition dir is written by few tasks (file-count
  * control — without it every task could open a writer per partition).
  */
class LakeDeltaWrite(params: Map[String, String], info: LogicalWriteInfo,
    cmd: RowLevelOperation.Command, visible: () => Set[String])
    extends DeltaWrite with RequiresDistributionAndOrdering {

  private val spark = SparkSession.active
  private val table = LakeTable.load(spark, LakeDataSource.path(params))

  override def description(): String = s"graft-lake delta $cmd"

  override def requiredDistribution(): Distribution =
    // a DELETE's plan carries only row ids — partition columns would not
    // resolve (and its tombstones all land in one dir anyway)
    if (table.meta.partitionFields.isEmpty ||
        cmd == RowLevelOperation.Command.DELETE) Distributions.unspecified()
    else Distributions.clustered(
      table.meta.partitionFields.map(Expressions.column).toArray[
        org.apache.spark.sql.connector.expressions.Expression])

  override def requiredOrdering(): Array[SortOrder] = Array.empty

  override def toBatch: DeltaBatchWrite =
    new LakeDeltaBatchWrite(spark, params, info, cmd, visible())
}

/** Serializable per-task write plan: schemas, ordinal mappings, the bound
  * key expression, and the parquet factory.
  */
case class LakeDeltaWriteSpec(
    physSchema: StructType,          // what delta files physically contain
    srcIdx: Array[Int],              // phys ordinal -> data-row ordinal (-1 = meta)
    physTypes: Array[DataType],
    keyOrd: Int, timeOrd: Int, delOrd: Int,
    keyExpr: Expression,             // bound against the data-row schema
    recordKeyIdx: Array[Int],        // PK-not-null guard ordinals
    partFields: Array[String],
    partExprs: Array[Expression],    // bound cast-to-string per partition col
    instant: String,
    stagingRoot: String,
    factory: OutputWriterFactory,
    conf: SerializableConfiguration)

case class LakeDeltaCommitMessage(files: Seq[String]) extends WriterCommitMessage

object LakeDeltaWriteSpec {
  /** Build the per-task write plan for `dataSchema` rows into `table`'s
    * delta-file layout at `instant`. `deleteOnly` = the statement's
    * write carries only row ids (no data columns; the writer only ever
    * emits tombstones).
    */
  def build(spark: SparkSession, table: LakeTable, dataSchema: StructType,
      deleteOnly: Boolean, instant: String,
      stagingRoot: String): LakeDeltaWriteSpec = {
    val meta = table.meta
    val full = table.fullSchema
    val metaCols =
      Set(LakeTable.RecordKeyCol, LakeTable.CommitTimeCol, LakeTable.DeletedCol)
    // physical file shape == any other lake data file: fullSchema minus
    // the partition columns (their values live in the dir path), user
    // fields nullable (tombstone rows null them all)
    val phys = StructType(full.fields
      .filterNot(f => meta.partitionFields.contains(f.name))
      .map(f => if (metaCols.contains(f.name)) f else f.copy(nullable = true)))
    val srcIdx = phys.fields.map { f =>
      if (metaCols.contains(f.name)) -1
      else dataSchema.fieldNames.indexOf(f.name) match {
        case -1 if deleteOnly => -1
        case -1 => throw new IllegalStateException(
          s"row-level write is missing table column ${f.name}")
        case i => i
      }
    }
    val (factory, serConf) =
      TaskWriteBridge.parquetFactory(spark, phys, KeyBloom.writerOptions)
    LakeDeltaWriteSpec(
      physSchema = phys,
      srcIdx = srcIdx,
      physTypes = phys.fields.map(_.dataType),
      keyOrd = phys.fieldIndex(LakeTable.RecordKeyCol),
      timeOrd = phys.fieldIndex(LakeTable.CommitTimeCol),
      delOrd = phys.fieldIndex(LakeTable.DeletedCol),
      keyExpr =
        if (deleteOnly) org.apache.spark.sql.catalyst.expressions.Literal(
          null, org.apache.spark.sql.types.StringType)
        else TaskWriteBridge.bind(spark,
          table.keyColumnFor(dataSchema), dataSchema),
      recordKeyIdx =
        if (deleteOnly) Array.empty
        else meta.recordKeyFields.map(dataSchema.fieldIndex).toArray,
      partFields = meta.partitionFields.toArray,
      partExprs =
        if (deleteOnly) Array.empty
        else meta.partitionFields.map(f =>
          TaskWriteBridge.bind(spark, col(f).cast("string"), dataSchema)).toArray,
      instant = instant,
      stagingRoot = stagingRoot,
      factory = factory,
      conf = serConf)
  }
}

class LakeDeltaBatchWrite(spark: SparkSession, params: Map[String, String],
    info: LogicalWriteInfo, cmd: RowLevelOperation.Command,
    visible: Set[String]) extends DeltaBatchWrite {

  private val table = LakeTable.load(spark, LakeDataSource.path(params))
  private val instant = table.rowLevelBegin()
  private val staging = table.rowLevelStaging(instant)

  private def opName: String = cmd match {
    case RowLevelOperation.Command.MERGE  => "merge"
    case RowLevelOperation.Command.UPDATE => "update"
    case _                                => "delete"
  }

  override def createBatchWriterFactory(
      pInfo: PhysicalWriteInfo): DeltaWriterFactory =
    new LakeDeltaWriterFactory(LakeDeltaWriteSpec.build(spark, table,
      info.schema(), deleteOnly = cmd == RowLevelOperation.Command.DELETE,
      instant, staging.toString))

  /** Task-completion heartbeat: a long job keeps its instant reservation
    * live so consumers stay blocked on it rather than sweeping it stale.
    */
  override def onDataWriterCommit(message: WriterCommitMessage): Unit =
    table.renewReservation(instant)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val files = messages.toSeq
      .collect { case m: LakeDeltaCommitMessage => m.files }
      .flatten.map(new Path(_))
    table.rowLevelCommit(instant, staging, files, opName, visible)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    table.rowLevelAbort(instant, staging)
}

/** Dynamic partition overwrite (`INSERT OVERWRITE` under
  * partitionOverwriteMode=dynamic / `writeTo.overwritePartitions()`):
  * Spark provides NO V1 fallback for `OverwritePartitionsDynamicExec`,
  * so this is a real `BatchWrite` riding the same task-level writers as
  * the row-level operations — every row is an insert, files land as
  * BASE files, and the commit atomically removes the previous files of
  * exactly the partitions the batch touched.
  */
class LakeDynamicOverwriteWrite(params: Map[String, String],
    info: LogicalWriteInfo) extends Write {
  override def description(): String = "graft-lake dynamic-partition-overwrite"
  override def toBatch: BatchWrite = {
    val spark = SparkSession.active
    new LakeDynamicOverwriteBatchWrite(spark, params, info)
  }
}

class LakeDynamicOverwriteBatchWrite(spark: SparkSession,
    params: Map[String, String], info: LogicalWriteInfo) extends BatchWrite {

  private val table = LakeTable.load(spark, LakeDataSource.path(params))
  // no target scan: "visible" is simply everything completed at begin —
  // any commit completing after this point into our partitions conflicts
  private val visible = table.committedInstants()
  private val instant = table.rowLevelBegin()
  private val staging = table.rowLevelStaging(instant)

  override def createBatchWriterFactory(
      pInfo: PhysicalWriteInfo): DataWriterFactory =
    new LakeDeltaWriterFactory(LakeDeltaWriteSpec.build(spark, table,
      info.schema(), deleteOnly = false, instant, staging.toString))

  override def onDataWriterCommit(message: WriterCommitMessage): Unit =
    table.renewReservation(instant)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val files = messages.toSeq
      .collect { case m: LakeDeltaCommitMessage => m.files }
      .flatten.map(new Path(_))
    table.dynamicOverwriteCommit(instant, staging, files, visible)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    table.rowLevelAbort(instant, staging)
}

class LakeDeltaWriterFactory(spec: LakeDeltaWriteSpec)
    extends DeltaWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DeltaWriter[InternalRow] =
    new LakeDeltaWriter(spec, partitionId, taskId)
}

/** One task's delta writer. Data rows (insert / update) are routed to a
  * parquet writer per partition dir; tombstones (delete, and the
  * old-identity half of a key-changing update) go to the null-partition
  * dir, exactly like the DataFrame delete path. Everything is evaluated
  * with bound, codegen'd projections — no per-row driver logic, no row
  * buffering beyond parquet's own column pages.
  */
class LakeDeltaWriter(spec: LakeDeltaWriteSpec, partitionId: Int,
    taskId: Long) extends DeltaWriter[InternalRow] {

  private lazy val keyProj = UnsafeProjection.create(
    scala.collection.immutable.ArraySeq.unsafeWrapArray(Array(spec.keyExpr)))
  private lazy val partProj =
    if (spec.partExprs.isEmpty) null
    else UnsafeProjection.create(
      scala.collection.immutable.ArraySeq.unsafeWrapArray(spec.partExprs))
  private val commitTime = UTF8String.fromString(spec.instant)
  // dir -> (writer, absolute file path)
  private val writers = mutable.LinkedHashMap[String, (OutputWriter, String)]()
  private lazy val tombDir =
    spec.partFields.map(TaskWriteBridge.partitionPathFragment(_, null))
      .mkString("/")

  private def writerFor(dir: String): OutputWriter =
    writers.getOrElseUpdate(dir, {
      val name = f"part-$partitionId%05d-$taskId-" +
        s"${java.util.UUID.randomUUID().toString.take(8)}.parquet"
      val rel = if (dir.isEmpty) name else s"$dir/$name"
      val abs = new Path(spec.stagingRoot, rel)
      val ctx =
        TaskWriteBridge.taskAttemptContext(spec.conf.value, partitionId, taskId)
      val fs = abs.getFileSystem(spec.conf.value)
      fs.mkdirs(abs.getParent)
      (spec.factory.newInstance(abs.toString, spec.physSchema, ctx),
        abs.toString)
    })._1

  private def dirOf(row: InternalRow): String =
    if (spec.partFields.isEmpty) ""
    else {
      val r = partProj(row)
      spec.partFields.indices.map { i =>
        val v = if (r.isNullAt(i)) null else r.getUTF8String(i).toString
        TaskWriteBridge.partitionPathFragment(spec.partFields(i), v)
      }.mkString("/")
    }

  private def dataRow(row: InternalRow, key: UTF8String): InternalRow = {
    val out = new GenericInternalRow(spec.physSchema.length)
    var i = 0
    while (i < spec.srcIdx.length) {
      val s = spec.srcIdx(i)
      if (s >= 0 && !row.isNullAt(s))
        out.update(i, row.get(s, spec.physTypes(i)))
      i += 1
    }
    out.update(spec.keyOrd, key)
    out.update(spec.timeOrd, commitTime)
    out.update(spec.delOrd, false)
    out
  }

  private def tombRow(key: UTF8String): InternalRow = {
    val out = new GenericInternalRow(spec.physSchema.length)
    out.update(spec.keyOrd, key)
    out.update(spec.timeOrd, commitTime)
    out.update(spec.delOrd, true)
    out
  }

  /** PK-not-null guard — same semantics as the batch write's generated
    * filter (reference genPrimaryKeyFilter, package.scala:185-188).
    */
  private def hasNullKeyField(row: InternalRow): Boolean = {
    var i = 0
    while (i < spec.recordKeyIdx.length) {
      if (row.isNullAt(spec.recordKeyIdx(i))) return true
      i += 1
    }
    false
  }

  override def insert(row: InternalRow): Unit = {
    if (hasNullKeyField(row)) return
    val key = keyProj(row).getUTF8String(0).clone()
    writerFor(dirOf(row)).write(dataRow(row, key))
  }

  override def update(metadata: InternalRow, id: InternalRow,
      row: InternalRow): Unit = {
    val oldKey = id.getUTF8String(0).clone()
    if (hasNullKeyField(row)) {
      // the assignment nulled a key field: the new identity is invalid
      // (PK guard drops it), the old identity is gone — net: a delete
      writerFor(tombDir).write(tombRow(oldKey))
      return
    }
    val newKey = keyProj(row).getUTF8String(0).clone()
    // key/partition-field assignment moved the row's identity: kill the
    // old identity, write the new one (global-index row move)
    if (!newKey.equals(oldKey)) writerFor(tombDir).write(tombRow(oldKey))
    writerFor(dirOf(row)).write(dataRow(row, newKey))
  }

  override def delete(metadata: InternalRow, id: InternalRow): Unit =
    writerFor(tombDir).write(tombRow(id.getUTF8String(0).clone()))

  override def commit(): WriterCommitMessage = {
    writers.values.foreach(_._1.close())
    LakeDeltaCommitMessage(writers.values.map(_._2).toSeq)
  }

  override def abort(): Unit = {
    writers.values.foreach { case (w, p) =>
      try w.close() catch { case _: Exception => () }
      try {
        val path = new Path(p)
        path.getFileSystem(spec.conf.value).delete(path, false)
        ()
      } catch { case _: Exception => () }
    }
  }

  override def close(): Unit = ()
}
