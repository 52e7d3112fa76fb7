package graft.queries

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A continuously-maintained IVF index — the faiss add/remove contract
  * ([[Similarity.ivfIncrementalTopK]] / [[Similarity.ivfDeleteTopK]])
  * restated as a LONG-LIVED artifact a streaming pipeline appends to.
  *
  * Layout is GENERATIONAL: `<root>/GEN` (a tiny pointer file, swapped by
  * temp+rename) names the current generation directory `g<N>/`, which
  * holds:
  *
  *  - `cent/` + `base/` — the trained index: centroids and the corpus
  *    assigned and hive-partitioned BY CELL (probing = partition
  *    pruning). Written once per generation; never rewritten.
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
  * [[rebuild]] is the compaction lever (faiss's rebuild): retrain +
  * reassign over the surviving corpus INTO THE NEXT generation dir,
  * then swap the pointer — crash-atomic (a crash mid-rebuild leaves the
  * current generation byte-untouched and the half-written next one
  * unreferenced). Retention keeps one generation back, so a probe that
  * resolved the pointer just before a swap finishes reading its files.
  * The pointer records the highest folded batch id
  * so checkpoint replays of already-folded batches NO-OP instead of
  * re-appending vectors the new base already holds.
  */
final case class IvfStreamIndex(s: SparkSession, root: String) {

  private val fs = new Path(root)
    .getFileSystem(s.sparkContext.hadoopConfiguration)

  /** (generation, highest batch id folded into its base). */
  private def pointer: Option[(Long, Long)] = {
    val p = new Path(root, "GEN")
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val txt =
        try new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8).trim
        finally in.close()
      val Array(g, thr) = txt.split(" ")
      Some((g.toLong, thr.toLong))
    }
  }

  private def swapPointer(gen: Long, through: Long): Unit = {
    val tmp = new Path(root, ".GEN.tmp")
    val out = fs.create(tmp, true)
    try out.write(s"$gen $through"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    fs.delete(new Path(root, "GEN"), false)
    if (!fs.rename(tmp, new Path(root, "GEN")))
      throw new IllegalStateException(s"GEN pointer swap failed for $root")
  }

  private def gen: Long = pointer.map(_._1).getOrElse(
    throw new IllegalStateException(s"no IVF index at $root — build first"))

  /** Highest batch id folded into the current base by a [[rebuild]] —
    * a checkpoint-replayed batch at or below it must NO-OP (its vectors
    * already live in the rebuilt base; re-registering would duplicate
    * them). -1 before any rebuild.
    */
  def rebuiltThrough: Long = pointer.map(_._2).getOrElse(-1L)

  private def genDir(g: Long) = s"$root/g$g"
  private def basePath = s"${genDir(gen)}/base"
  private def centPath = s"${genDir(gen)}/cent"

  /** Current generation's base directory (spec probes immutability). */
  def baseDir: String = basePath

  def exists: Boolean = pointer.isDefined &&
    fs.exists(new Path(basePath, "_SUCCESS")) &&
    fs.exists(new Path(centPath, "_SUCCESS"))

  /** Train + assign from scratch over `e` (vec_id, embedding) into a
    * fresh generation and swap the pointer to it.
    */
  def build(e: DataFrame, cells: Int = Similarity.IvfCells): Unit =
    buildGen(e, cells, pointer.map(_._1 + 1).getOrElse(0L), -1L)

  private def buildGen(e: DataFrame, cells: Int, g: Long,
      through: Long): Unit = {
    fs.delete(new Path(genDir(g)), true)
    val cent = Similarity.ivfCentroids(e, cells)
    cent.write.mode("overwrite").parquet(s"${genDir(g)}/cent")
    e.select(col("vec_id"), col("embedding"))
      .join(Similarity.assignCells(e, cent), "vec_id")
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"${genDir(g)}/base")
    swapPointer(g, through)
    // retention keeps exactly ONE generation back: an in-flight probe
    // that resolved the pointer just before the swap can finish reading
    // the previous generation's files; anything older is garbage
    if (!fs.exists(new Path(root))) return
    fs.listStatus(new Path(root)).map(_.getPath.getName)
      .filter(n => n.length > 1 && n.startsWith("g") &&
        n.drop(1).forall(_.isDigit))
      .map(_.drop(1).toLong).filter(_ < g - 1)
      .foreach(old => fs.delete(new Path(genDir(old)), true))
  }

  def centroids: DataFrame = s.read.parquet(centPath)

  /** Fold an add micro-batch (vec_id, embedding) in: assign to the
    * existing centroids, write the batch's own cell-partitioned dir.
    * Idempotent per `batchId` (overwrite) — replay converges; a batch
    * already folded by a rebuild no-ops.
    */
  def addBatch(newVecs: DataFrame, batchId: Long): Unit =
    if (batchId > rebuiltThrough)
      newVecs.select(col("vec_id"), col("embedding"))
        .join(Similarity.assignCells(newVecs, centroids), "vec_id")
        .write.mode("overwrite").partitionBy("cell")
        .parquet(f"${genDir(gen)}/add/b$batchId%09d")

  /** Register a delete micro-batch (vec_id): append-only tombstones,
    * index files byte-untouched. Idempotent per `batchId`; a batch
    * already folded by a rebuild no-ops.
    */
  def deleteBatch(delIds: DataFrame, batchId: Long): Unit =
    if (batchId > rebuiltThrough)
      delIds.select(col("vec_id"))
        .write.mode("overwrite").parquet(f"${genDir(gen)}/del/b$batchId%09d")

  /** `_SUCCESS`-complete batch dirs of the current generation, oldest
    * first.
    */
  private def batchDirs(kind: String): Seq[String] = {
    val d = new Path(s"${genDir(gen)}/$kind")
    if (!fs.exists(d)) return Seq.empty
    fs.listStatus(d).filter(_.isDirectory).map(_.getPath)
      .filter(p => fs.exists(new Path(p, "_SUCCESS")))
      .map(_.toString).sorted.toSeq
  }

  /** Count of registered (unfolded) batch dirs — the rebuild trigger. */
  def pendingBatches: Int = batchDirs("add").size + batchDirs("del").size

  /** The probe-able corpus: base ∪ complete add batches. */
  def corpus: DataFrame =
    (Seq(basePath) ++ batchDirs("add"))
      .map(s.read.parquet(_)).reduce(_.unionByName(_))

  def tombstones: Option[DataFrame] = batchDirs("del") match {
    case Nil => None
    case ds  => Some(ds.map(s.read.parquet(_)).reduce(_.unionByName(_)))
  }

  /** The compaction lever (faiss rebuild): retrain + reassign over the
    * SURVIVING corpus (base ∪ adds minus tombstones) into the next
    * generation, pointer-swapped in atomically. `throughBatch` is the
    * highest batch id the survivor set covers — replays at or below it
    * no-op afterwards. Crash-safe: the survivor snapshot is written to
    * a side dir before anything else, the current generation is never
    * touched, and a crash before the swap leaves the index exactly as
    * it was (re-run the rebuild).
    */
  def rebuild(throughBatch: Long,
      cells: Int = Similarity.IvfCells): Unit = {
    val snap = s"$root/rebuild_snap"
    val survivors = tombstones match {
      case Some(t) => corpus.join(broadcast(t.select(col("vec_id"))),
        Seq("vec_id"), "left_anti")
      case None => corpus
    }
    survivors.select(col("vec_id"), col("embedding"))
      .write.mode("overwrite").parquet(snap)
    buildGen(s.read.parquet(snap), cells, gen + 1, throughBatch)
    fs.delete(new Path(snap), true)
  }

  /** Probed top-10 per query over the maintained index: masked against
    * the tombstones, exact-rescored — [[Similarity.ivfProbeTopK]]
    * verbatim, so full probe ≡ brute force over the surviving corpus.
    */
  def topK(probe: Int = Similarity.IvfProbe): DataFrame =
    Similarity.ivfProbeTopK(centroids, corpus, probe, tombstones)
}
