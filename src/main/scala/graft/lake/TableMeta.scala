package graft.lake

import graft.util.Json
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

import java.nio.charset.StandardCharsets

/** Table-properties descriptor of a lake table.
  *
  * Mirrors the reference's table identity surface: record key columns
  * (comma list → ComplexKeyGenerator, reference package.scala:24,52),
  * precombine column (package.scala:25, HudiConfig.scala:30), hive-style
  * partition columns (package.scala:51-56), and table type COW/MOR
  * (HudiConfig.scala:17-26). Same shape as the reference's unused
  * conf/TableInfo.scala:3.
  *
  * @param tableType "cow" (read-merge-rewrite on upsert) — "mor" reserved.
  */
case class TableMeta(
    name: String,
    recordKeyFields: Seq[String],
    precombineField: String,
    partitionFields: Seq[String] = Seq.empty,
    tableType: String = "cow",
    /** MOR only: compact inline after this many delta commits (reference
      * `inlineMax`, default 20 at Config.scala:24; 0 disables).
      */
    inlineCompactMax: Int = 0,
    /** MOR only: run the `inlineCompactMax` debt policy on a background
      * thread AFTER publish instead of inside the commit path (reference
      * KDS2Hudi.scala:131-133 `ASYNC_COMPACT_ENABLE`) — ingest latency
      * never pays for compaction. The async job re-evaluates debt under
      * the writer lock, so triggers coalesce safely.
      */
    asyncCompact: Boolean = false,
    /** MOR only: byte-based debt alongside the file-count policy — a
      * partition whose OUTSTANDING delta bytes reach this compacts even
      * below the count threshold (few huge deltas should not wait for
      * many small ones). 0 disables; either policy alone can trigger.
      */
    inlineCompactMaxBytes: Long = 0L,
    /** Spark StructType.json of the user columns; captured on first write.
      * Supplying it back at read time keeps partition-directory values
      * typed exactly (no partition-type inference surprises).
      */
    schemaJson: String = "",
    /** Names removed by [[LakeTable.dropColumn]] — tombstoned so a later
      * batch cannot re-add the name and resurrect stale values still
      * sitting in old data files.
      */
    droppedColumns: Seq[String] = Seq.empty,
    /** Rename history: current column name → the prior physical names it
      * replaced (newest first). Old data files keep the old physical
      * name; reads coalesce current-then-prior names, writes emit only
      * the current name, and compaction/clustering rewrites retire the
      * old name physically.
      */
    renamedFrom: Map[String, Seq[String]] = Map.empty,
    /** `_record_key` encoding, fixed at table creation (an encoding
      * change on a live table would orphan existing keys):
      *  - "plain": string concat of key values (the reference's
      *    ComplexKeyGenerator shape) — string order, so numeric keys
      *    interleave ("100|1" < "1|1") and file key ranges go loose;
      *  - "padded": integral key components zero-padded to fixed width —
      *    string order == numeric order, so range-clustered files get
      *    TIGHT min/max key stats and keyed writes prune far fewer files.
      *    Best for non-negative numeric keys (negatives stay correct —
      *    the encoding is injective — but prune poorly).
      */
    keyEncoding: String = "plain",
    /** Record-identity scope, fixed at table creation:
      *  - "global" (reference parity, HudiConfig.scala:47-48 GLOBAL index):
      *    a key is unique across the whole table; an upsert whose
      *    partition value changed MOVES the row. Key matching must
      *    consider every partition, and merged MOR reads resolve keys
      *    table-wide (partition filters cannot prune below the merge).
      *  - "partition" (Hudi's default non-global index): identity =
      *    (partition values, key) — the record key embeds the partition
      *    prefix. Same user key in two partitions = two rows; a
      *    partition change INSERTS rather than moves. In exchange, key
      *    matching and MOR key resolution are partition-local, so
      *    partition filters prune files even under merged reads — the
      *    100 TB-friendly scope when keys never migrate.
      */
    indexScope: String = "global",
    /** Fixed-N hash-bucket layout on the record key columns (Hudi's
      * BUCKET index analog; 0 = off). Fixed at table creation — changing
      * it on a live table would mis-route every existing file. When on,
      * every base write hash-routes rows with Spark's own bucket function
      * (`pmod(murmur3(keyCols), n)` — exactly `HashPartitioning`), names
      * files with the Spark bucket tag, and snapshot reads of an
      * all-base file set expose a real `BucketSpec`: joins between two
      * co-bucketed tables on the key run WITHOUT a shuffle on either
      * side (the storage-partitioned-join shape), and key-equality
      * filters prune to one bucket's files at plan time. Trade-off:
      * files are hash-scattered, so per-file key RANGES span the key
      * space — point-write tagging relies on the bucket route + bloom
      * instead, and curve-clustering services (cluster/zorder/hilbert)
      * are refused.
      */
    bucketCount: Int = 0,
    /** Hidden/transform partitioning (Iceberg `PARTITIONED BY (days(ts))`):
      * derived partition column → derivation, e.g. `"ts_days" ->
      * "days(ts)"` with days/months/years/hours over a timestamp, date,
      * or epoch-millis integral source column. Derived columns are
      * listed in [[partitionFields]] and baked into the directory
      * layout, but are NEVER part of the user schema: no writer ever
      * supplies them (an INSERT's arity never includes them — the
      * Iceberg contract), and every staged write re-derives the value
      * from the source column in UTC at the one write choke point
      * (`LakeTable.writeStaging`), so the partition value is
      * writer-timezone-independent and rewrites reproduce it exactly.
      * Reads prune on the SOURCE column through the per-file zone maps
      * (a file never spans a derived dir, so its source min/max is
      * transform-tight) — queries need not mention the derived column
      * at all; `LakeTable.snapshotWithDerived` appends the values for
      * consumers that want them, and `LakeTable.expirePartitions` is
      * the dir-granular retention lever. Requires
      * `indexScope = "global"`: the key-only delete paths cannot
      * re-derive partition-prefixed keys.
      */
    partitionDerivations: Map[String, String] = Map.empty
)

/** Per-data-file statistics recorded in each commit — drives file pruning
  * on upsert (the role of Hudi's bloom/key-range index,
  * reference HudiConfig.scala:47-48). Paths are relative to the table root.
  */
case class FileStat(
    path: String,
    partition: String, // "p1=v1/p2=v2" or "" for unpartitioned
    numRecords: Long,
    minKey: String,
    maxKey: String,
    /** "base" | "delta" — MOR delta files carry not-yet-compacted upserts
      * (Hudi's log files, reference HudiConfig.scala:17-26); null in
      * commits written before this field existed ⇒ treat as base.
      */
    kind: String = "base",
    /** Physical size — lets readers build a file index from commit
      * metadata alone (no filesystem listing) with honest plan stats.
      */
    sizeBytes: Long = 0L,
    /** Rows in this file that are delete tombstones (MOR delete writes
      * them as delta rows with `_deleted = true` — Hudi's delete blocks).
      * Readers only mount the tombstone-resolution join when a live file
      * reports a non-zero count, so COW tables and tombstone-free MOR
      * reads pay nothing. Missing in old commits ⇒ 0.
      */
    tombstones: Long = 0L,
    /** Row-level `_commit_time` range inside the file. A COW rewrite (or
      * delete) carries survivor rows that keep their ORIGINAL commit
      * times, so a file's row commit range is wider than its add instant;
      * incremental reads skip files whose maxCommit falls at or before
      * the range start without opening them. Missing in old commits ⇒
      * null ⇒ never skipped.
      */
    minCommit: String = null,
    maxCommit: String = null,
    /** Zone maps: per-column `name -> [min, max]` for user data columns,
      * read from the parquet footer at publish time (exact or
      * conservatively widened — see [[FooterStats]]). Values are encoded
      * in Catalyst-internal form as strings (ints/longs verbatim, dates
      * as epoch days, timestamps as epoch micros) and parsed back against
      * the attribute type at prune time. Best-effort: a column may be
      * absent (truncated stats, unsupported physical type, legacy
      * commit ⇒ null map) — absent means "cannot prune", never
      * "no rows". Drives data-filter file skipping in [[LakeFileIndex]].
      */
    cols: Map[String, Seq[String]] = Map.empty,
    /** Hash-bucket id of every row in this file (bucketed tables only;
      * None = written outside the routed path, e.g. before bucketing
      * existed or by the task-staged dynamic-overwrite writer). The
      * read side claims a `BucketSpec` only when EVERY live base file
      * carries its id — commit metadata is the source of truth, never
      * a file-name parse.
      */
    bucket: Option[Int] = None
) {
  def isDelta: Boolean = kind == "delta"

  /** Null-safe accessor — commits written before zone maps existed
    * deserialize with a null `cols`.
    */
  def colRanges: Map[String, Seq[String]] =
    if (cols == null) Map.empty else cols
}

/** One row of [[LakeTable.history]]: a commit summarized from its
  * metadata (counts and sizes, no data access).
  */
case class CommitSummary(
    instant: String,
    operation: String,
    filesAdded: Int,
    filesRemoved: Int,
    rowsAdded: Long,
    bytesAdded: Long,
    extra: Map[String, String])

/** One commit on the timeline (reference: Hudi instant + commit metadata,
  * instants `yyyyMMddHHmmssSSS` at ODS2DWD.scala:16).
  */
case class CommitMeta(
    instant: String,
    operation: String, // insert | upsert | delete | clean
    added: Seq[FileStat] = Seq.empty,
    removed: Seq[String] = Seq.empty,
    /** Pipeline-supplied metadata committed atomically with the data —
      * e.g. the incremental-read watermark of an additive-merge pipeline,
      * making replays after a crash double-count-safe (SURVEY §7 hard
      * part 5; the reference's DWD2DM.scala:77 is NOT replay-safe).
      */
    extra: Map[String, String] = Map.empty
)

object TableMeta {
  val MetaFile = "_lake/table.json"

  def save(fs: FileSystem, tablePath: Path, meta: TableMeta): Unit = {
    val p = new Path(tablePath, MetaFile)
    val out = fs.create(p, true)
    try out.write(Json.write(meta).getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  def load(fs: FileSystem, tablePath: Path): TableMeta = {
    val p = new Path(tablePath, MetaFile)
    val in = fs.open(p)
    try {
      val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
      in.readFully(bytes)
      Json.read(new String(bytes, StandardCharsets.UTF_8), classOf[TableMeta])
    } finally in.close()
  }

  def exists(fs: FileSystem, tablePath: Path): Boolean =
    fs.exists(new Path(tablePath, MetaFile))

  def hadoopConf(): Configuration = new Configuration()
}
