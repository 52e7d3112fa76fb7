package graft.lake

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, BoundReference, Expression, Predicate}
import org.apache.spark.sql.execution.datasources.{FileIndex, FileStatusWithMetadata, PartitionDirectory}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** A Catalyst FileIndex backed entirely by commit metadata.
  *
  * The default read path (spark.read.parquet over an explicit file list)
  * builds an InMemoryFileIndex — one driver-side getFileStatus per file
  * per query, which at 100 TB / 10⁵⁺ files is a metadata storm on every
  * snapshot. All the information Spark needs (paths, sizes, partition
  * values) is already in the commit timeline, so this index serves
  * listings from memory: zero filesystem calls at plan time, and
  * partition pruning evaluates `partitionFilters` against the timeline's
  * partition values (same role as Hudi's convertMetastoreParquet=false +
  * input-format file selection, reference SparkHelper.scala:16,35).
  */
class LakeFileIndex(
    spark: SparkSession,
    tablePath: Path,
    files: Seq[FileStat],
    override val partitionSchema: StructType)
    extends FileIndex {

  override def rootPaths: Seq[Path] = Seq(tablePath)

  private def partitionRow(partition: String): InternalRow = {
    val raw =
      if (partition.isEmpty) Array.empty[String]
      else partition.split("/").map(_.split("=", 2)(1))
    InternalRow.fromSeq(partitionSchema.fields.toSeq.zip(raw.toSeq).map {
      case (f, v) => LakeFileIndex.castValue(v, f.dataType)
    })
  }

  private lazy val directories: Seq[(PartitionDirectory, Seq[FileStat])] =
    files.groupBy(_.partition).toSeq.map { case (part, stats) =>
      val fsStats = stats.map { f =>
        FileStatusWithMetadata(new FileStatus(
          f.sizeBytes, false, 1, 128L * 1024 * 1024, 0L,
          new Path(tablePath, f.path)))
      }
      (PartitionDirectory(partitionRow(part), fsStats), stats)
    }

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val afterPart =
      if (partitionFilters.isEmpty || partitionSchema.isEmpty) directories
      else {
        // bind the filter's attribute references to partition-row ordinals
        val bound = partitionFilters.reduce(And).transform {
          case a: AttributeReference =>
            val idx = partitionSchema.indexWhere(_.name == a.name)
            BoundReference(idx, partitionSchema(idx).dataType, nullable = true)
        }
        val predicate = Predicate.create(bound, Nil)
        predicate.initialize(0)
        directories.filter(d => predicate.eval(d._1.values))
      }
    if (dataFilters.isEmpty) afterPart.map(_._1)
    else afterPart.flatMap { case (dir, stats) =>
      val zipped = dir.files.zip(stats)
        .filter { case (_, st) =>
          dataFilters.forall(f => ZonePrune.couldMatch(st, f))
        }
      if (zipped.isEmpty) None
      else Some(PartitionDirectory(dir.values, zipped.map(_._1)))
    }
  }

  override def inputFiles: Array[String] =
    files.map(f => new Path(tablePath, f.path).toString).toArray

  override def refresh(): Unit = ()

  override def sizeInBytes: Long = {
    val known = files.map(_.sizeBytes).sum
    // legacy stats without sizes: estimate so the optimizer never treats
    // a big table as broadcastable
    if (known > 0) known else files.map(_.numRecords * 128L).sum.max(1L)
  }
}

/** THE partition-dir decoding, shared by the scan's partition rows and
  * the metadata-aggregate replay ([[graft.sources]]`.PartitionPrune`) —
  * one parser, so the two paths can never drift (unescape-then-sentinel
  * order, exact integer widths, `LocalDate.parse` dates, `UTF8String`
  * strings).
  */
private[graft] object LakeFileIndex {

  def castValue(raw: String, dt: DataType): Any = {
    val v = unescapePathName(raw)
    if (v == "__HIVE_DEFAULT_PARTITION__") null
    else dt match {
      case StringType  => UTF8String.fromString(v)
      case IntegerType => v.toInt
      case LongType    => v.toLong
      case DoubleType  => v.toDouble
      case FloatType   => v.toFloat
      case ShortType   => v.toShort
      case ByteType    => v.toByte
      case BooleanType => v.toBoolean
      case DateType    => java.time.LocalDate.parse(v).toEpochDay.toInt
      case other =>
        throw new UnsupportedOperationException(s"partition type $other")
    }
  }

  /** Hive-style %XX unescaping (Spark escapes e.g. ':' in dir names). */
  def unescapePathName(s: String): String =
    if (!s.contains('%')) s
    else {
      val sb = new StringBuilder
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '%' && i + 2 < s.length) {
          sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
          i += 3
        } else { sb.append(c); i += 1 }
      }
      sb.toString
    }

  /** Positional per-field values of a dir string — exactly the values
    * the scan's partition rows carry (null = hive default). `None` when
    * the dir does not parse (wrong arity, missing `=`, bad value): the
    * caller must treat the partition as unprovable, never guess.
    */
  def partitionValues(partition: String,
      schema: StructType): Option[Seq[Any]] = {
    val segs =
      if (partition.isEmpty) Array.empty[String]
      else partition.split("/")
    val raw = segs.map { seg =>
      val i = seg.indexOf('=')
      if (i < 0) return None
      seg.substring(i + 1)
    }
    if (raw.length != schema.length) return None
    try Some(schema.fields.toSeq.zip(raw.toSeq).map {
      case (f, v) => castValue(v, f.dataType)
    })
    catch { case _: Exception => None }
  }
}
