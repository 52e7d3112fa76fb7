package graft.queries

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A continuously-maintained IVF index — the faiss add/remove contract
  * ([[Similarity.ivfIncrementalTopK]] / [[Similarity.ivfDeleteTopK]])
  * restated as a LONG-LIVED artifact a streaming pipeline appends to:
  *
  *  - `base/` — the trained index: centroids (`cent/`) + the corpus
  *    assigned and hive-partitioned BY CELL (probing = partition
  *    pruning). Written once by [[build]]; never rewritten afterwards.
  *  - `add/b<batchId>/` — one cell-partitioned directory per add
  *    micro-batch: new vectors assigned to the EXISTING centroids (the
  *    standard IVF add; centroids drift only at the next rebuild).
  *  - `del/b<batchId>/` — one tiny vec_id parquet per delete
  *    micro-batch: the tombstone sidecar; probes mask candidates via a
  *    broadcast anti join before any cosine (faiss remove_ids — no
  *    retrain, no rewrite).
  *
  * Batch directories are keyed by the STREAMING BATCH ID and written
  * with overwrite, so a checkpoint-replayed micro-batch converges on
  * the same files instead of duplicating vectors — the add/delete
  * analog of the IVM families' per-batch generation dirs. Readers only
  * mount `_SUCCESS`-complete batch dirs, so a crash mid-append is
  * invisible until its replay completes it.
  *
  * A rebuild ([[build]] again) is the compaction lever once tombstones
  * or adds grow — identical to the sim_ivf_delete contract.
  */
final case class IvfStreamIndex(s: SparkSession, root: String) {

  private val fs = new Path(root)
    .getFileSystem(s.sparkContext.hadoopConfiguration)

  private def basePath = s"$root/base"
  private def centPath = s"$root/cent"

  def exists: Boolean =
    fs.exists(new Path(basePath, "_SUCCESS")) &&
      fs.exists(new Path(centPath, "_SUCCESS"))

  /** Train + assign from scratch over `e` (vec_id, embedding) and drop
    * every batch dir — the rebuild/compaction lever.
    */
  def build(e: DataFrame, cells: Int = Similarity.IvfCells): Unit = {
    val cent = Similarity.ivfCentroids(e, cells)
    cent.write.mode("overwrite").parquet(centPath)
    e.select(col("vec_id"), col("embedding"))
      .join(Similarity.assignCells(e, cent), "vec_id")
      .write.mode("overwrite").partitionBy("cell").parquet(basePath)
    fs.delete(new Path(s"$root/add"), true)
    fs.delete(new Path(s"$root/del"), true)
  }

  def centroids: DataFrame = s.read.parquet(centPath)

  /** Fold an add micro-batch (vec_id, embedding) in: assign to the
    * existing centroids, write the batch's own cell-partitioned dir.
    * Idempotent per `batchId` (overwrite) — replay converges.
    */
  def addBatch(newVecs: DataFrame, batchId: Long): Unit =
    newVecs.select(col("vec_id"), col("embedding"))
      .join(Similarity.assignCells(newVecs, centroids), "vec_id")
      .write.mode("overwrite").partitionBy("cell")
      .parquet(f"$root/add/b$batchId%09d")

  /** Register a delete micro-batch (vec_id): append-only tombstones,
    * index files byte-untouched. Idempotent per `batchId`.
    */
  def deleteBatch(delIds: DataFrame, batchId: Long): Unit =
    delIds.select(col("vec_id"))
      .write.mode("overwrite").parquet(f"$root/del/b$batchId%09d")

  /** `_SUCCESS`-complete batch dirs, oldest first. */
  private def batchDirs(kind: String): Seq[String] = {
    val d = new Path(s"$root/$kind")
    if (!fs.exists(d)) return Seq.empty
    fs.listStatus(d).filter(_.isDirectory).map(_.getPath)
      .filter(p => fs.exists(new Path(p, "_SUCCESS")))
      .map(_.toString).sorted.toSeq
  }

  /** The probe-able corpus: base ∪ complete add batches. */
  def corpus: DataFrame =
    (Seq(basePath) ++ batchDirs("add"))
      .map(s.read.parquet(_)).reduce(_.unionByName(_))

  def tombstones: Option[DataFrame] = batchDirs("del") match {
    case Nil => None
    case ds  => Some(ds.map(s.read.parquet(_)).reduce(_.unionByName(_)))
  }

  /** Probed top-10 per query over the maintained index: masked against
    * the tombstones, exact-rescored — [[Similarity.ivfProbeTopK]]
    * verbatim, so full probe ≡ brute force over the surviving corpus.
    */
  def topK(probe: Int = Similarity.IvfProbe): DataFrame =
    Similarity.ivfProbeTopK(centroids, corpus, probe, tombstones)
}
