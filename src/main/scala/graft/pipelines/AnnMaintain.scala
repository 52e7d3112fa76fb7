package graft.pipelines

import graft.lake.LakeTable
import graft.queries.IvfStreamIndex
import graft.util.Sessions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming ANN index maintenance: an embeddings LAKE table's CDC feed
  * keeps an [[IvfStreamIndex]] current — inserts fold in as cell
  * appends, deletes as tombstone appends, one idempotent batch dir per
  * micro-batch — the faiss add/remove contract at streaming cadence,
  * closing the loop with the lake CDC source the way the IVM families
  * (rollup/distinct/join/SCD2) already do.
  *
  * First start builds the index from the table's current snapshot and
  * begins the change stream AT that instant, so the feed carries only
  * post-build changes; restarts resume from the stream checkpoint.
  * Updates are refused loudly: the tombstone mask is by vec_id, so an
  * update's re-add would be masked by its own delete half — faiss's
  * remove-then-re-add needs a rebuild here too (the documented
  * compaction lever).
  *
  * Scale: per batch, assignment is a broadcast-centroid map-side job
  * over the batch only; deletes write KBs; probes stay partition
  * pruning + one broadcast anti join. Nothing rescans the corpus.
  */
object AnnMaintain {

  /** @param rebuildEvery compaction cadence: once this many batch dirs
    *   have accumulated, fold them (minus tombstones) into a fresh
    *   generation via [[IvfStreamIndex.rebuild]] — pointer-swapped in
    *   atomically, replays of folded batches no-op. 0 disables (run
    *   rebuilds from a maintenance window instead).
    */
  def runStream(spark: SparkSession, tablePath: String, indexRoot: String,
      checkpointDir: String, triggerSeconds: Int = 1,
      cells: Int = graft.queries.Similarity.IvfCells,
      rebuildEvery: Int = 0): StreamingQuery = {
    val t = LakeTable.load(spark, tablePath)
    val idx = IvfStreamIndex(spark, indexRoot)
    val startPath = new org.apache.hadoop.fs.Path(indexRoot, "start.at")
    val fs = startPath
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val startAt =
      if (!idx.exists) {
        val at = t.latestCommit.getOrElse(throw new IllegalStateException(
          s"$tablePath has no commits to build the index from"))
        idx.build(t.snapshotAsOf(at).select("vec_id", "embedding"), cells)
        val out = fs.create(startPath, true)
        try out.write(at.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
        at
      } else {
        val in = fs.open(startPath)
        try new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8)
        finally in.close()
      }
    spark.readStream.format("graft-lake")
      .option("query.type", "changes")
      .option("start.at", startAt)
      .load(tablePath)
      .writeStream
      .queryName("ann-maintain")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(s"$triggerSeconds seconds"))
      .foreachBatch { (b: DataFrame, batchId: Long) =>
        if (!b.isEmpty) {
          val batch = org.apache.spark.sql.graft.ColumnBridge.asBatch(b)
            .persist()
          try {
            val ct = col(LakeTable.ChangeTypeCol)
            if (!batch.filter(ct === "update_postimage").isEmpty)
              throw new IllegalStateException(
                "ann-maintain supports insert/delete only (the faiss " +
                  "add/remove contract): an update's re-add would be " +
                  "masked by its own tombstone — rebuild the index to " +
                  "absorb updates")
            val dels = batch.filter(ct === "delete").select("vec_id")
            val adds = batch.filter(ct === "insert")
              .select("vec_id", "embedding")
            if (!dels.isEmpty) idx.deleteBatch(dels, batchId)
            if (!adds.isEmpty) idx.addBatch(adds, batchId)
            if (rebuildEvery > 0 && idx.pendingBatches >= rebuildEvery)
              idx.rebuild(batchId, cells)
            ()
          } finally { batch.unpersist(); () }
        }
      }
      .start()
  }

  /** CLI: `--source-table-path <embeddings lake table> --output-dir
    * <index root> --checkpoint-dir <ckpt> [--trigger-seconds n]`.
    */
  def main(args: Array[String]): Unit = {
    val cfg = PipelineConfig.parse(args)
    val spark = Sessions.local("ann-maintain")
    spark.sparkContext.setLogLevel("WARN")
    runStream(spark, cfg.sourceTablePath, cfg.outputDir, cfg.checkpointDir,
      cfg.triggerSeconds).awaitTermination()
  }
}
