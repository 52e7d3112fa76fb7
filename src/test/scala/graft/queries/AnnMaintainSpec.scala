package graft.queries

import graft.lake.{LakeTable, TableMeta}
import graft.pipelines.AnnMaintain
import graft.util.Sessions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Streaming ANN maintenance ([[AnnMaintain]] / [[IvfStreamIndex]]):
  * an embeddings lake table's CDC feed keeps the staged IVF index
  * current — adds as cell appends, deletes as tombstone appends —
  * and the probed result equals a batch-built index over the same
  * final corpus.
  */
class AnnMaintainSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Sessions.local("ann-maintain-test", "4")

  override def afterAll(): Unit = spark.stop()

  private def emb(id: Long): Array[Float] =
    Array.tabulate(8)(j => (((id * 7 + j * 3) % 17) - 8).toFloat + 0.5f)

  private def vecs(ids: Seq[Long], ts: Long): DataFrame = {
    val s = spark
    import s.implicits._
    ids.map(i => (i, emb(i), ts)).toDF("vec_id", "embedding", "created_ts")
  }

  private def baseFiles(baseDir: String): Seq[(String, Long, Long)] = {
    val p = java.nio.file.Paths.get(baseDir)
    import scala.jdk.CollectionConverters._
    Files.walk(p).iterator().asScala.filter(Files.isRegularFile(_))
      .map(f => (f.toString, Files.size(f),
        Files.getLastModifiedTime(f).toMillis)).toSeq.sortBy(_._1)
  }

  test("CDC stream maintains the index: adds + deletes, equals batch-built on the final corpus") {
    val work = Files.createTempDirectory("annmaint").toString
    val t = LakeTable.create(spark, s"$work/emb",
      TableMeta("emb", Seq("vec_id"), "created_ts", Seq.empty))
    t.upsert(vecs(0L until 40L, 1L))

    val q = AnnMaintain.runStream(spark, t.path, s"$work/idx",
      s"$work/ckpt", cells = 4)
    try {
      q.processAllAvailable() // builds base at the current instant
      val idx = IvfStreamIndex(spark, s"$work/idx")
      assert(idx.exists)
      val frozen = baseFiles(idx.baseDir)

      t.upsert(vecs(40L until 50L, 2L)) // add batch 1
      q.processAllAvailable()
      t.delete(vecs(10L until 18L, 3L)) // delete batch
      q.processAllAvailable()
      t.upsert(vecs(50L until 55L, 4L)) // add batch 2
      q.processAllAvailable()

      // the index files the build wrote are byte-untouched: adds and
      // deletes landed ONLY as new batch dirs beside them
      assert(baseFiles(idx.baseDir) == frozen,
        "streaming maintenance must never rewrite the built index")
      assert(idx.tombstones.exists(_.count() == 8))

      val finalCorpus = t.snapshotUser().select("vec_id", "embedding")
      assert(finalCorpus.count() == 40 + 10 + 5 - 8)

      // FULL probe: the maintained index ≡ a fresh index batch-built
      // over the same final corpus (both ≡ brute force — completeness:
      // nothing lost, nothing duplicated, every delete masked)
      val fresh = IvfStreamIndex(spark, s"$work/idx_rebuild")
      fresh.build(finalCorpus, cells = 4)
      val got = idx.topK(probe = 4).collect().map(_.toSeq).toSeq
      val want = fresh.topK(probe = 4).collect().map(_.toSeq).toSeq
      assert(got == want && got.nonEmpty)

      // PARTIAL probe: ≡ the trainer replay with the SAME centroids —
      // masking post-assignment equals filtering the corpus pre-
      // assignment (the sim_ivf_delete contract)
      val replayCorpus = finalCorpus
        .join(Similarity.assignCells(finalCorpus, idx.centroids), "vec_id")
      val replay = Similarity
        .ivfProbeTopK(idx.centroids, replayCorpus, probe = 2)
        .collect().map(_.toSeq).toSeq
      assert(idx.topK(probe = 2).collect().map(_.toSeq).toSeq == replay)

      // updates are refused loudly: the tombstone mask is by vec_id, so
      // an update's re-add would mask itself — rebuild is the lever
      t.upsert(vecs(Seq(5L), 9L))
      val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(err.getMessage.contains("ann-maintain supports insert/delete")
        || Option(err.getCause).exists(_.getMessage
          .contains("ann-maintain supports insert/delete")))
    } finally q.stop()
  }

  test("rebuild folds batches into a fresh generation; folded replays no-op") {
    val work = Files.createTempDirectory("annreb").toString
    val idx = IvfStreamIndex(spark, s"$work/idx")
    idx.build(vecs(0L until 30L, 1L).select("vec_id", "embedding"), cells = 4)
    val adds = vecs(30L until 40L, 2L).select("vec_id", "embedding")
    val dels = vecs(Seq(3L, 4L, 5L), 2L).select("vec_id")
    idx.addBatch(adds, 1L); idx.deleteBatch(dels, 2L)
    assert(idx.pendingBatches == 2)
    val before = idx.topK(probe = 4).collect().map(_.toSeq).toSeq
    idx.rebuild(throughBatch = 2L, cells = 4)
    // batch dirs folded away; the probe is unchanged (full probe ≡
    // brute force over the same surviving corpus, old or new centroids)
    assert(idx.pendingBatches == 0 && idx.tombstones.isEmpty)
    assert(idx.corpus.count() == 30 + 10 - 3)
    assert(idx.topK(probe = 4).collect().map(_.toSeq).toSeq == before)
    // a checkpoint REPLAY of a folded batch must no-op — its vectors
    // are already in the rebuilt base
    idx.addBatch(adds, 1L); idx.deleteBatch(dels, 2L)
    assert(idx.pendingBatches == 0, "folded replays must not re-register")
    assert(idx.corpus.count() == 37)
    // post-rebuild batches register normally
    idx.addBatch(vecs(Seq(50L), 3L).select("vec_id", "embedding"), 3L)
    assert(idx.pendingBatches == 1 && idx.corpus.count() == 38)
  }

  test("streaming auto-rebuild: rebuildEvery folds the index inside the stream") {
    val work = Files.createTempDirectory("annautoreb").toString
    val t = LakeTable.create(spark, s"$work/emb",
      TableMeta("emb2", Seq("vec_id"), "created_ts", Seq.empty))
    t.upsert(vecs(0L until 30L, 1L))
    val q = AnnMaintain.runStream(spark, t.path, s"$work/idx",
      s"$work/ckpt", cells = 4, rebuildEvery = 2)
    try {
      q.processAllAvailable()
      val idx = IvfStreamIndex(spark, s"$work/idx")
      t.upsert(vecs(30L until 35L, 2L)); q.processAllAvailable()
      t.delete(vecs(Seq(7L), 3L));       q.processAllAvailable()
      t.upsert(vecs(35L until 38L, 4L)); q.processAllAvailable()
      // at least one rebuild fired (cadence 2), nothing lost or doubled
      assert(idx.rebuiltThrough >= 0, "auto-rebuild should have run")
      assert(idx.pendingBatches < 3)
      val fresh = IvfStreamIndex(spark, s"$work/idx_rebuild")
      fresh.build(t.snapshotUser().select("vec_id", "embedding"), cells = 4)
      assert(idx.topK(probe = 4).collect().map(_.toSeq).toSeq ==
        fresh.topK(probe = 4).collect().map(_.toSeq).toSeq)
    } finally q.stop()
  }

  test("batch registration is idempotent per batch id (checkpoint replay converges)") {
    val work = Files.createTempDirectory("annidem").toString
    val idx = IvfStreamIndex(spark, s"$work/idx")
    idx.build(vecs(0L until 30L, 1L).select("vec_id", "embedding"), cells = 4)
    val adds = vecs(30L until 36L, 2L).select("vec_id", "embedding")
    val dels = vecs(Seq(3L, 4L), 2L).select("vec_id")
    idx.addBatch(adds, 7L); idx.deleteBatch(dels, 8L)
    val once = idx.topK(probe = 4).collect().map(_.toSeq).toSeq
    // a replayed micro-batch re-registers under the SAME batch id
    idx.addBatch(adds, 7L); idx.deleteBatch(dels, 8L)
    assert(idx.topK(probe = 4).collect().map(_.toSeq).toSeq == once)
    assert(idx.corpus.count() == 36, "replay must not duplicate vectors")
  }
}
