package graft.sources

import graft.lake.{LakeTable, TableMeta}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import java.util
import scala.jdk.CollectionConverters._

/** A V2 `TableCatalog` over a warehouse directory of lake tables — the
  * catalog-native completion of the reference's Hive meta sync (K4,
  * HudiConfig.scala:38-44): where the reference syncs each Hudi table
  * into the Hive metastore so SQL can see it, here the catalog IS the
  * metastore — every `warehouse/<ns>/<table>` directory with a lake
  * `_lake` marker is a live SQL table, with no sync step to run or
  * forget.
  *
  * Register and use:
  * {{{
  *   spark.sql.catalog.lake            = graft.sources.LakeCatalog
  *   spark.sql.catalog.lake.warehouse  = /data/lakehouse
  *
  *   CREATE TABLE lake.ods.users (id INT, ts BIGINT, v DOUBLE)
  *     PARTITIONED BY (region)  OPTIONS ('recordkey.field' 'id', ...)
  *   INSERT INTO lake.ods.users ...      -- keyed upsert
  *   ALTER TABLE lake.ods.users RENAME COLUMN v TO score
  *   SHOW TABLES IN lake.ods / DROP TABLE / RENAME
  * }}}
  *
  * Reads and writes reuse [[LakeV2Table]] (V1Scan/V1Write over the one
  * LakeTable path); `ALTER TABLE RENAME/DROP COLUMN` map onto the
  * metadata-only schema-evolution commits, so they are O(1) operations
  * regardless of table size — nothing rewrites data files.
  */
class LakeCatalog extends TableCatalog with SupportsNamespaces
    with ProcedureCatalog {

  private var catalogName: String = _
  private var warehouse: String = _

  private def spark = SparkSession.active
  private def fs =
    new Path(warehouse).getFileSystem(spark.sessionState.newHadoopConf())

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name requires spark.sql.catalog.$name.warehouse"))
  }

  override def name(): String = catalogName

  private def nsDir(namespace: Array[String]): Path =
    namespace.foldLeft(new Path(warehouse))((p, n) => new Path(p, n))

  private def tableDir(ident: Identifier): Path =
    new Path(nsDir(ident.namespace()), ident.name())

  // ---- TableCatalog ----

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = nsDir(namespace)
    if (!fs.exists(dir)) throw new NoSuchNamespaceException(namespace)
    fs.listStatus(dir).filter(_.isDirectory)
      .filter(s => LakeTable.exists(spark, s.getPath.toString))
      .map(s => Identifier.of(namespace, s.getPath.getName))
  }

  override def tableExists(ident: Identifier): Boolean =
    LakeTable.exists(spark, tableDir(ident).toString)

  override def loadTable(ident: Identifier): Table = {
    val dir = tableDir(ident).toString
    if (!LakeTable.exists(spark, dir)) {
      // Iceberg-style metadata tables: `SELECT * FROM <cat>.<ns>.<t>.history`
      // (commit log) / `.changes` (full-history CDC feed) / `.partitions`
      // (per-partition live totals + MOR health) / `.files` (live file
      // inventory with key ranges, as-of-able) — the trailing
      // identifier component selects the view over the PARENT table
      val meta = ident.name()
      if ((meta == "history" || meta == "changes" || meta == "partitions" ||
          meta == "files") && ident.namespace().nonEmpty) {
        val parent = Identifier.of(ident.namespace().dropRight(1),
          ident.namespace().last)
        val pdir = tableDir(parent).toString
        if (LakeTable.exists(spark, pdir)) {
          val t = LakeTable.load(spark, pdir)
          val schema =
            if (meta == "history") LakeDataSource.HistorySchema
            else if (meta == "partitions") LakeDataSource.PartitionsSchema
            else if (meta == "files") LakeDataSource.FilesSchema
            else t.changesSchema
          return new LakeMetaTable(schema,
            Map("path" -> pdir, "query.type" -> meta), meta)
        }
      }
      throw new NoSuchTableException(ident)
    }
    val t = LakeTable.load(spark, dir)
    // DDL-declared tables expose exactly their user columns; tables born
    // from DataFrame writes expose the full shape, meta columns included
    // (identical to the two v1 relation modes)
    new LakeV2Table(t.userSchema.getOrElse(t.fullSchema), Map("path" -> dir))
  }

  /** SQL time travel — `SELECT ... FROM t VERSION AS OF '<instant>'`:
    * the returned table's scans are pinned to `snapshotAsOf(version)`
    * (the same contract as the read option `as.of`). Writes to a
    * time-travel relation are rejected by Spark itself.
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    val dir = tableDir(ident).toString
    if (!LakeTable.exists(spark, dir)) throw new NoSuchTableException(ident)
    val t = LakeTable.load(spark, dir)
    require(t.timeline.instants().contains(version),
      s"no commit at instant $version in ${ident.name()}; " +
        s"available: ${t.timeline.instants().mkString(", ")}")
    new LakeV2Table(t.userSchema.getOrElse(t.fullSchema),
      Map("path" -> dir, "as.of" -> version))
  }

  /** `TIMESTAMP AS OF <ts>` — Spark hands epoch MICROseconds; instants
    * are zero-padded epoch millis, so the cutoff is a direct encode (the
    * snapshot includes every commit at or before the timestamp).
    */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val dir = tableDir(ident).toString
    if (!LakeTable.exists(spark, dir)) throw new NoSuchTableException(ident)
    val t = LakeTable.load(spark, dir)
    new LakeV2Table(t.userSchema.getOrElse(t.fullSchema),
      Map("path" -> dir, "as.of" -> f"${timestamp / 1000}%017d"))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val dir = tableDir(ident).toString
    if (LakeTable.exists(spark, dir)) throw new TableAlreadyExistsException(ident)
    val props = properties.asScala.toMap
    // OPTIONS(...) arrive under TableCatalog.OPTION_PREFIX; accept plain
    // keys too so programmatic createTable calls read naturally
    val opts = props.collect {
      case (k, v) if k.startsWith(TableCatalog.OPTION_PREFIX) =>
        k.stripPrefix(TableCatalog.OPTION_PREFIX) -> v
    } ++ props.view.filterKeys(!_.startsWith(TableCatalog.OPTION_PREFIX))
    // PARTITIONED BY (col, days(ts), bucket(4, id), ...) — identity
    // transforms become lake partition fields; time transforms become
    // HIDDEN derived partition fields (value computed at write, never
    // supplied — TableMeta.partitionDerivations); bucket(n, key) maps to
    // the lake's hash-bucket layout when its columns ARE the record key
    // (the only layout where the bucket route and the key index agree).
    // An explicit option wins over the derived spec.
    val derivations = scala.collection.mutable.LinkedHashMap[String, String]()
    var bucketN = 0
    val partCols = partitions.toSeq.flatMap { t =>
      val refs = t.references().toSeq
        .map(_.fieldNames().mkString("."))
      t.name() match {
        case "identity" => refs.headOption
        case fn @ ("days" | "months" | "years" | "hours") =>
          val src = refs.head
          val dcol = s"${src}_$fn"
          derivations += dcol -> s"$fn($src)"
          Some(dcol)
        case "bucket" =>
          val n = t.arguments().collectFirst {
            case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
              l.value().toString.toInt
          }.getOrElse(throw new IllegalArgumentException(
            s"bucket transform needs a literal count: $t"))
          val keys = opts.get("recordkey.field")
            .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty)
          if (refs.toSet != keys)
            throw new UnsupportedOperationException(
              s"bucket(${refs.mkString(",")}) must cover exactly the " +
                s"record key (${keys.mkString(",")}): the lake's bucket " +
                "layout routes by the record key")
          bucketN = n
          None // bucketing is a layout, not a partition directory
        case _ =>
          throw new UnsupportedOperationException(
            s"unsupported partition transform '$t' (supported: identity, " +
              "days/months/years/hours(col), bucket(n, recordKey))")
      }
    }
    val withParts = {
      var o = opts
      if (partCols.nonEmpty && !o.contains("partition.fields"))
        o += ("partition.fields" -> partCols.mkString(","))
      if (derivations.nonEmpty && !o.contains("partition.derive"))
        o += ("partition.derive" -> derivations
          .map { case (k, v) => s"$k=$v" }.mkString(","))
      if (bucketN > 0 && !o.contains("bucket.count"))
        o += ("bucket.count" -> bucketN.toString)
      o
    }
    LakeDataSource.ensureTable(spark, dir,
      withParts + ("path" -> dir) +
        ("table.name" -> (ident.namespace() :+ ident.name()).mkString(".")),
      Some(schema))
    new LakeV2Table(schema, Map("path" -> dir))
  }

  /** Column rename/drop route to the metadata-only evolution commits;
    * everything else is explicitly unsupported (additions happen
    * implicitly on the next widening write).
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val dir = tableDir(ident).toString
    if (!LakeTable.exists(spark, dir)) throw new NoSuchTableException(ident)
    val t = LakeTable.load(spark, dir)
    changes.foreach {
      case r: TableChange.RenameColumn if r.fieldNames().length == 1 =>
        t.renameColumn(r.fieldNames()(0), r.newName())
      case d: TableChange.DeleteColumn if d.fieldNames().length == 1 =>
        t.dropColumn(d.fieldNames()(0))
      case a: TableChange.AddColumn if a.fieldNames().length == 1 =>
        t.addColumn(a.fieldNames()(0), a.dataType())
      case w: TableChange.UpdateColumnType if w.fieldNames().length == 1 =>
        t.widenColumn(w.fieldNames()(0), w.newDataType())
      case other => throw new UnsupportedOperationException(
        s"lake catalog does not support table change $other")
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val dir = tableDir(ident)
    LakeTable.exists(spark, dir.toString) && fs.delete(dir, true)
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent)) throw new TableAlreadyExistsException(newIdent)
    val dst = tableDir(newIdent)
    if (!fs.exists(dst.getParent)) throw new NoSuchNamespaceException(
      newIdent.namespace())
    if (!fs.rename(tableDir(oldIdent), dst))
      throw new IllegalStateException(s"rename $oldIdent -> $newIdent failed")
  }

  // ---- ProcedureCatalog ----

  /** `CALL <catalog>.system.<proc>(table => 'ns.tbl', ...)` — the table
    * services as SQL stored procedures (see [[LakeProcedures]]). The
    * `table` argument is a dotted identifier relative to this catalog's
    * warehouse.
    */
  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure = {
    val ok = ident.namespace().sameElements(Array("system"))
    (if (ok) LakeProcedures.load(ident.name(), name => {
      val dir = nsDir(name.split('.').toSeq.init.toArray)
      new Path(dir, name.split('.').last).toString
    }) else None).getOrElse(throw new RuntimeException(
      s"no such procedure: ${ident.namespace().mkString(".")}.${ident.name()}" +
        s" (available: system.{${LakeProcedures.names.mkString(", ")}})"))
  }

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.sameElements(Array("system")))
      LakeProcedures.names.map(Identifier.of(Array("system"), _)).toArray
    else Array.empty

  // ---- SupportsNamespaces ----

  override def listNamespaces(): Array[Array[String]] = {
    val root = new Path(warehouse)
    if (!fs.exists(root)) Array.empty
    else fs.listStatus(root).filter(_.isDirectory)
      .filterNot(s => LakeTable.exists(spark, s.getPath.toString))
      .map(s => Array(s.getPath.getName))
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException(namespace)

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty ||
      (fs.exists(nsDir(namespace)) &&
        !LakeTable.exists(spark, nsDir(namespace).toString))

  override def loadNamespaceMetadata(
      namespace: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    Map(SupportsNamespaces.PROP_LOCATION -> nsDir(namespace).toString).asJava
  }

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit =
    fs.mkdirs(nsDir(namespace))

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "lake catalog namespaces carry no mutable metadata")

  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean = {
    val dir = nsDir(namespace)
    if (!fs.exists(dir)) return false
    if (!cascade && fs.listStatus(dir).nonEmpty)
      throw new IllegalStateException(s"namespace ${namespace.mkString(".")} not empty")
    fs.delete(dir, true)
  }
}
