package graft.sources

import graft.lake.LakeTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

import java.util.Collections
import scala.jdk.CollectionConverters._

/** SQL `CALL`-able table services for the lake catalog — the maintenance
  * operations every table format ships as stored procedures (compaction,
  * clustering, small-file packing, retention, rollback), exposed through
  * Spark 4's `ProcedureCatalog` so they are one SQL statement instead of
  * library calls:
  *
  * {{{
  *   CALL lake.system.compact(table => 'ods.users')
  *   CALL lake.system.cluster(table => 'ods.users', sort_cols => 'ts')
  *   CALL lake.system.zorder(table => 'ods.users', cols => 'x,y')
  *   CALL lake.system.pack_small_files(table => 'ods.users')
  *   CALL lake.system.clean(table => 'ods.users', retain_commits => 4)
  *   CALL lake.system.archive_timeline(table => 'ods.users', keep_commits => 10)
  *   CALL lake.system.restore(table => 'ods.users', instant => '0...17')
  *   CALL lake.system.cleanup_orphans(table => 'ods.users')
  * }}}
  *
  * Each returns a one-row result (the service's commit instant or count),
  * planned as a LocalScan. The reference reaches the same services only
  * through Hudi's inline-write options (HudiConfig.scala:22-37); a SQL
  * surface makes them schedulable from any SQL client.
  */
object LakeProcedures {

  /** name -> (parameters, output schema, body(table, args) -> result
    * ROWS (each a seq of column values)). `args` are the call's argument
    * values aligned to the parameter order, strings already decoded.
    */
  private type Body = (LakeTable, Seq[Any]) => Seq[Seq[Any]]

  private def p(name: String, dt: DataType,
      default: Option[String] = None): ProcedureParameter = {
    val b = ProcedureParameter.in(name, dt)
    default.foreach(b.defaultValue)
    b.build()
  }

  private val instantOut = new StructType().add("instant", StringType)
  private val countOut = new StructType().add("count", LongType)

  private case class Spec(params: Seq[ProcedureParameter], out: StructType,
      body: Body, description: String,
      /** Multi-table procedures resolve their own participants via the
        * catalog loader instead of the pre-resolved first-arg table.
        */
      multi: Option[(Seq[Any], String => LakeTable) => Seq[Seq[Any]]] = None)

  private val specs: Map[String, Spec] = Map(
    "compact" -> Spec(
      Seq(p("table", StringType), p("partitions", StringType, Some("NULL"))),
      instantOut,
      (t, args) => Seq(Seq(args(1) match {
        case null => t.compact().orNull
        case parts: String =>
          t.compactPartitions(parts.split(",").map(_.trim).toSet).orNull
      })),
      "Merge MOR delta files into base files (whole table, or only the " +
        "given comma-separated partition dirs)"),
    "cluster" -> Spec(
      Seq(p("table", StringType), p("sort_cols", StringType)),
      instantOut,
      (t, args) => Seq(Seq(t.cluster(
        args(1).asInstanceOf[String].split(",").map(_.trim).toSeq).orNull)),
      "Rewrite live files range-clustered and sorted by the given columns"),
    "zorder" -> Spec(
      Seq(p("table", StringType), p("cols", StringType),
        p("bits_per_col", IntegerType, Some("8"))),
      instantOut,
      (t, args) => Seq(Seq(t.clusterZOrder(
        args(1).asInstanceOf[String].split(",").map(_.trim).toSeq,
        args(2).asInstanceOf[Int]).orNull)),
      "Rewrite live files along a z-order curve over the given numeric columns"),
    "hilbert" -> Spec(
      Seq(p("table", StringType), p("cols", StringType),
        p("bits_per_col", IntegerType, Some("8")),
        p("incremental", StringType, Some("false"))),
      instantOut,
      (t, args) => Seq(Seq(t.clusterHilbert(
        args(1).asInstanceOf[String].split(",").map(_.trim).toSeq,
        args(2).asInstanceOf[Int],
        incremental = args(3).asInstanceOf[String].toBoolean).orNull)),
      "Rewrite live files along a Hilbert curve over the given numeric " +
        "columns; incremental => only files added since the last " +
        "matching clustering, reusing its stored bounds"),
    "group_cut" -> Spec(
      Seq(p("tables", StringType)),
      instantOut,
      (_, _) => Seq.empty,
      "The consistent snapshot-group cut across the given comma-" +
        "separated tables: the minimum stable frontier, safe to use as " +
        "as.of on every member for a repeatable joint read",
      multi = Some((args, load) => {
        val names = args.head.asInstanceOf[String]
          .split(",").map(_.trim).toSeq
        Seq(Seq(
          graft.lake.SnapshotGroup.cut(names.map(load)).orNull))
      })),
    "maintain" -> Spec(
      Seq(p("table", StringType),
        p("target_bytes", LongType, Some("134217728")),
        p("retain_commits", IntegerType, Some("8"))),
      new StructType().add("service", StringType).add("result", StringType),
      (t, args) => t.maintain(args(1).asInstanceOf[Long],
        args(2).asInstanceOf[Int]).map { case (s, r) => Seq(s, r) },
      "Run every maintenance service the table needs: txn recovery, " +
        "compact, pack, incremental curve clustering, retention clean"),
    "recover_txns" -> Spec(
      Seq(p("table", StringType)),
      new StructType().add("instant", StringType).add("outcome", StringType),
      (t, _) => t.recoverTxns().map { case (i, o) => Seq(i, o) },
      "Resolve in-doubt multi-table transaction commits: roll back " +
        "undecided prepares of dead writers, report decided ones"),
    "pack_small_files" -> Spec(
      Seq(p("table", StringType),
        p("target_bytes", LongType, Some("134217728")),
        p("min_files", IntegerType, Some("2"))),
      instantOut,
      (t, args) => Seq(Seq(t.packSmallFiles(args(1).asInstanceOf[Long],
        args(2).asInstanceOf[Int]).orNull)),
      "Bin-pack partitions holding several under-sized base files"),
    "clean" -> Spec(
      Seq(p("table", StringType), p("retain_commits", IntegerType, Some("2"))),
      countOut,
      (t, args) => Seq(Seq(t.clean(args(1).asInstanceOf[Int]).toLong)),
      "Physically delete file versions removed before the retention window"),
    "expire_partitions" -> Spec(
      Seq(p("table", StringType), p("column", StringType),
        p("cutoff", StringType)),
      new StructType().add("partition_value", StringType),
      (t, args) => t.expirePartitions(args(1).asInstanceOf[String],
        args(2).asInstanceOf[String]).map(Seq(_)),
      "Logically drop partition dirs whose value sorts below the cutoff " +
        "(metadata-only; clean() physically deletes after retention)"),
    "archive_timeline" -> Spec(
      Seq(p("table", StringType), p("keep_commits", IntegerType)),
      countOut,
      (t, args) =>
        Seq(Seq(t.archiveTimeline(args(1).asInstanceOf[Int]).size.toLong)),
      "Roll commits older than the newest keep_commits into the archive"),
    "restore" -> Spec(
      Seq(p("table", StringType), p("instant", StringType),
        p("force", StringType, Some("'false'"))),
      instantOut,
      (t, args) => { t.restore(args(1).asInstanceOf[String],
          force = args(2) == "true")
        Seq(Seq(args(1))) },
      "Roll the table back to an instant, deleting later commits and " +
        "files; force => 'true' overrides active savepoints above it"),
    "build_secondary_index" -> Spec(
      Seq(p("table", StringType), p("column", StringType)),
      instantOut,
      (t, args) =>
        Seq(Seq(t.buildSecondaryIndex(args(1).asInstanceOf[String]).orNull)),
      "Build the posting-list secondary index on a non-key column"),
    "refresh_secondary_index" -> Spec(
      Seq(p("table", StringType), p("column", StringType)),
      instantOut,
      (t, args) =>
        Seq(Seq(t.refreshSecondaryIndex(args(1).asInstanceOf[String]).orNull)),
      "Advance the secondary index to the latest commit (new files only)"),
    "savepoint" -> Spec(
      Seq(p("table", StringType), p("instant", StringType)),
      instantOut,
      (t, args) => { t.savepoint(args(1).asInstanceOf[String])
        Seq(Seq(args(1))) },
      "Pin an instant: clean and archive keep its snapshot reachable"),
    "release_savepoint" -> Spec(
      Seq(p("table", StringType), p("instant", StringType)),
      instantOut,
      (t, args) => { t.releaseSavepoint(args(1).asInstanceOf[String])
        Seq(Seq(args(1))) },
      "Release a savepoint, returning its files to normal retention"),
    "cleanup_orphans" -> Spec(
      Seq(p("table", StringType)),
      countOut,
      (t, args) =>
        Seq(Seq((t.cleanOrphanedStaging() + t.cleanOrphanedData()).toLong)),
      "Remove crash residue: stale staging dirs and never-committed data files"),
    "timeline" -> Spec(
      Seq(p("table", StringType)),
      new StructType().add("instant", StringType)
        .add("operation", StringType)
        .add("files_added", IntegerType).add("files_removed", IntegerType)
        .add("rows_added", LongType).add("bytes_added", LongType)
        .add("extra", StringType),
      (t, _) => t.history().map { h =>
        Seq(h.instant, h.operation, h.filesAdded, h.filesRemoved,
          h.rowsAdded, h.bytesAdded,
          if (h.extra.isEmpty) null
          else h.extra.toSeq.sorted.map { case (k, v) => s"$k=$v" }
            .mkString(","))
      },
      "The commit history: one row per active-timeline commit, newest last"))

  def names: Seq[String] = specs.keys.toSeq.sorted

  def load(procName: String,
      tableDirOf: String => String): Option[UnboundProcedure] =
    specs.get(procName).map { spec =>
      new UnboundProcedure {
        override def name(): String = procName
        override def description(): String = spec.description
        override def bind(inputType: StructType): BoundProcedure =
          new BoundProcedure {
            override def name(): String = procName
            override def description(): String = spec.description
            override def parameters(): Array[ProcedureParameter] =
              spec.params.toArray
            override def isDeterministic: Boolean = false
            override def call(input: InternalRow): java.util.Iterator[Scan] = {
              val args = spec.params.zipWithIndex.map { case (param, i) =>
                if (input.isNullAt(i)) null
                else param.dataType() match {
                  case StringType  => input.getUTF8String(i).toString
                  case IntegerType => input.getInt(i)
                  case LongType    => input.getLong(i)
                  case dt => input.get(i, dt)
                }
              }
              val loader: String => LakeTable = n =>
                LakeTable.load(SparkSession.active, tableDirOf(n))
              val rows = spec.multi match {
                case Some(m) => m(args, loader)
                case None =>
                  spec.body(loader(args.head.asInstanceOf[String]), args)
              }
              val resultRows = rows.map { values =>
                new GenericInternalRow(values.map {
                  case s: String => UTF8String.fromString(s)
                  case v         => v
                }.toArray[Any]): InternalRow
              }.toArray
              val scan: Scan = new LocalScan {
                override def rows(): Array[InternalRow] = resultRows
                override def readSchema(): StructType = spec.out
              }
              Collections.singletonList(scan).iterator()
            }
          }
      }
    }
}
