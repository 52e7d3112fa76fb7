package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Size-adaptive scan fan-out (optimization round r16, guide §2/§6).
  *
  * The query pack used a flat `repartition(defaultParallelism)` after
  * single-file corpus scans so CPU-heavy per-row work (shingling,
  * tokenizing, cosine) engages every core. That constant is tuned for
  * neither end of the scale:
  *
  *  - locally a 32-way fan-out of a sub-MB corpus makes EVERY downstream
  *    stage a 32-task stage (persisted frames keep their partitioning),
  *    and a trivial 32-task stage costs ~0.5 s of pure per-task fixed
  *    overhead (measured, [[graft.tools.OverheadProbe]]: a tiny groupBy
  *    is 0.76 s from a 32-partition source vs 0.19 s from 1);
  *  - at 100 TB the repartition is a full corpus round-robin shuffle
  *    (plus its mandatory local sort, SPARK-23207) that moves every
  *    payload byte across the network once — for parallelism the scan
  *    itself already provides, since a large input splits into
  *    `bytes / maxPartitionBytes` tasks anyway (guide §2.4: remove
  *    shuffles outright; §6: input split size is the parallelism knob).
  *
  * So: derive the fan-out from the INPUT SIZE — one partition per
  * [[BytesPerPartitionConf]] input bytes, capped at the core count — and
  * skip the repartition entirely when the scan already yields at least
  * that many splits. Small inputs get a cheap many-way shuffle (the
  * bytes are trivial precisely when the fan-out matters most), huge
  * inputs get NO extra shuffle.
  */
object Fanout {

  /** Input bytes that justify one fan-out partition. The default (32 KiB)
    * is the measured sweet spot of the bench-scale sweep (16K/32K/64K/
    * 256K at sf0.1): the text/embedding operators do enough per-row work
    * (shingle explodes, token hashing, cosine re-scoring) that one fan
    * partition per ~32 KiB of compressed input amortizes the ~15-20 ms
    * fixed per-task cost. The value only shapes SMALL inputs: past
    * `cores × bytesPerPartition` the width is capped at the core count,
    * and once the scan itself splits at least that wide the repartition
    * is skipped entirely — so at cluster scale this conf is inert and
    * the scan split size (`spark.sql.files.maxPartitionBytes`) governs.
    */
  val BytesPerPartitionConf = "spark.graft.fanout.bytesPerPartition"
  val DefaultBytesPerPartition: Long = 32L << 10

  private val sizeMemo =
    scala.collection.concurrent.TrieMap.empty[String, Long]

  /** Total bytes under `path` (file or directory), memoized per path —
    * one FS metadata call per (JVM, path), never a Spark job.
    */
  def pathBytes(s: SparkSession, path: String): Long =
    sizeMemo.getOrElseUpdate(path, {
      try {
        val p = new org.apache.hadoop.fs.Path(path)
        p.getFileSystem(s.sparkContext.hadoopConfiguration)
          .getContentSummary(p).getLength
      } catch { case _: java.io.IOException => 0L }
    })

  /** The size-derived fan-out width for `bytes` of input. */
  def partitionsFor(s: SparkSession, bytes: Long): Int = {
    val bpp = s.conf.getOption(BytesPerPartitionConf)
      .map(_.toLong).getOrElse(DefaultBytesPerPartition)
    val cores = s.sparkContext.defaultParallelism
    math.max(1L, math.min((bytes + bpp - 1) / bpp, cores.toLong)).toInt
  }

  /** Fan `df` (a fresh scan of `bytes` input bytes) out for CPU-heavy
    * per-row work: repartition to [[partitionsFor]] — unless the scan
    * already splits at least that wide, in which case the frame passes
    * through UNSHUFFLED (the 100 TB path).
    */
  def scan(s: SparkSession, df: DataFrame, bytes: Long): DataFrame = {
    val n = partitionsFor(s, bytes)
    if (n <= 1) return df
    val maxSplit = math.max(1L,
      s.sessionState.conf.filesMaxPartitionBytes)
    val scanSplits = (bytes + maxSplit - 1) / maxSplit
    if (scanSplits >= n) df else df.repartition(n)
  }

  /** [[scan]] for a table file/dir at `path`. */
  def scanPath(s: SparkSession, df: DataFrame, path: String): DataFrame =
    scan(s, df, pathBytes(s, path))

  /** A reusable fan function for the table at `dir/name.parquet` — apply
    * it to exactly the branch that needs the per-row parallelism (fanning
    * a frame that feeds several plan branches would replicate the
    * repartition into each).
    */
  def forTable(s: SparkSession, dir: String,
      name: String): DataFrame => DataFrame =
    df => scanPath(s, df, s"$dir/$name.parquet")
}
