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
  * current — adds as cell appends, deletes as tombstone appends,
  * updates as same-batch remove-then-add — and the probed result
  * equals a batch-built index over the same final corpus, including
  * delete-then-re-insert revivals (the order-aware tombstone mask).
  */
class AnnMaintainSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Sessions.local("ann-maintain-test", "4")

  override def afterAll(): Unit = spark.stop()

  private def emb(id: Long): Array[Float] =
    Array.tabulate(8)(j => (((id * 7 + j * 3) % 17) - 8).toFloat + 0.5f)

  /** A second deterministic embedding for the same id — the "updated"
    * vector, far from emb(id) so a stale copy would change top-k.
    */
  private def embU(id: Long): Array[Float] =
    Array.tabulate(8)(j => (((id * 11 + j * 5) % 19) - 9).toFloat - 0.25f)

  private def vecs(ids: Seq[Long], ts: Long,
      e: Long => Array[Float] = emb): DataFrame = {
    val s = spark
    import s.implicits._
    ids.map(i => (i, e(i), ts)).toDF("vec_id", "embedding", "created_ts")
  }

  private def baseFiles(baseDir: String): Seq[(String, Long, Long)] = {
    val p = java.nio.file.Paths.get(baseDir)
    import scala.jdk.CollectionConverters._
    Files.walk(p).iterator().asScala.filter(Files.isRegularFile(_))
      .map(f => (f.toString, Files.size(f),
        Files.getLastModifiedTime(f).toMillis)).toSeq.sortBy(_._1)
  }

  test("CDC stream maintains the index: adds, deletes, revivals, updates — equals batch-built on the final corpus") {
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
      // REVIVAL: two deleted keys net-re-insert in a LATER batch — the
      // lake revives them, and the order-aware mask must too (an
      // order-blind vec_id anti join would mask them forever)
      t.upsert(vecs(Seq(10L, 11L), 5L))
      q.processAllAvailable()
      // UPDATE: two live keys change embedding — decomposed into a
      // same-batch tombstone + re-add; the add wins the tie, every
      // older copy of the key stays masked
      t.upsert(vecs(Seq(5L, 20L), 6L, embU))
      q.processAllAvailable()

      // the index files the build wrote are byte-untouched: adds,
      // deletes, and updates landed ONLY as new batch dirs beside them
      assert(baseFiles(idx.baseDir) == frozen,
        "streaming maintenance must never rewrite the built index")
      // 8 deletes + 2 update tombstones
      assert(idx.tombstones.exists(_.count() == 10))

      val finalCorpus = t.snapshotUser().select("vec_id", "embedding")
      assert(finalCorpus.count() == 40 + 10 + 5 - 8 + 2)
      assert(idx.survivors.count() == finalCorpus.count(),
        "exactly one live copy per surviving key")

      // FULL probe: the maintained index ≡ a fresh index batch-built
      // over the same final corpus (both ≡ brute force — completeness:
      // nothing lost, nothing duplicated, every delete masked, revived
      // keys present, updated keys at their NEW embedding)
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

  test("delete-then-re-insert revives the key; rebuild keeps it; update re-add wins its same-batch tombstone") {
    val work = Files.createTempDirectory("annrevive").toString
    val idx = IvfStreamIndex(spark, s"$work/idx")
    idx.build(vecs(0L until 30L, 1L).select("vec_id", "embedding"), cells = 4)
    idx.addBatch(vecs(30L until 35L, 2L).select("vec_id", "embedding"), 1L)
    idx.deleteBatch(vecs(Seq(3L, 30L), 2L).select("vec_id"), 2L)
    // batch 3 re-inserts both deleted keys (the revival) …
    idx.addBatch(vecs(Seq(3L, 30L), 3L).select("vec_id", "embedding"), 3L)
    // … and batch 4 is an UPDATE of key 7: tombstone + re-add under the
    // SAME batch id (AnnMaintain's decomposition) — add wins the tie
    idx.deleteBatch(vecs(Seq(7L), 4L).select("vec_id"), 4L)
    idx.addBatch(vecs(Seq(7L), 4L, embU).select("vec_id", "embedding"), 4L)

    // survivors: every key 0..34 alive exactly once, key 7 at embU
    assert(idx.survivors.count() == 35)
    val fresh = IvfStreamIndex(spark, s"$work/fresh")
    fresh.build(
      vecs(0L until 35L, 9L, i => if (i == 7L) embU(i) else emb(i))
        .select("vec_id", "embedding"), cells = 4)
    assert(idx.topK(probe = 4).collect().map(_.toSeq).toSeq ==
      fresh.topK(probe = 4).collect().map(_.toSeq).toSeq)

    // rebuild keeps revived + updated keys (same mask, folded in)
    idx.rebuild(throughBatch = 4L, cells = 4)
    assert(idx.corpus.count() == 35 && idx.tombstones.isEmpty)
    assert(idx.topK(probe = 4).collect().map(_.toSeq).toSeq ==
      fresh.topK(probe = 4).collect().map(_.toSeq).toSeq)
  }

  test("a rebuild racing a batch write cannot strand or duplicate the batch") {
    val work = Files.createTempDirectory("annrace").toString
    val idx = IvfStreamIndex(spark, s"$work/idx")
    idx.build(vecs(0L until 30L, 1L).select("vec_id", "embedding"), cells = 4)
    // a maintenance-window rebuild lands right after the batch dir is
    // written, before the post-write pointer re-check (the race window)
    idx.onBatchWrite = () => {
      idx.onBatchWrite = () => ()
      idx.rebuild(throughBatch = 0L, cells = 4)
    }
    idx.addBatch(vecs(30L until 33L, 2L).select("vec_id", "embedding"), 1L)
    // the rebuild folded the just-written dir (its through watermark
    // covers every dir it read), so the re-check no-ops: 33 vectors,
    // present exactly once, no pending dir left behind
    assert(idx.rebuiltThrough == 1L)
    assert(idx.pendingBatches == 0)
    assert(idx.corpus.count() == 33)
    assert(idx.corpus.select("vec_id").distinct().count() == 33)
    // and a generation swap that did NOT fold the in-flight dir (a
    // rebuild whose scan missed it) forces a re-append into the live
    // generation instead of stranding the batch in the superseded one
    idx.onBatchWrite = () => {
      idx.onBatchWrite = () => ()
      idx.build(vecs(0L until 33L, 5L).select("vec_id", "embedding"),
        cells = 4)
    }
    idx.addBatch(vecs(Seq(40L), 3L).select("vec_id", "embedding"), 2L)
    assert(idx.pendingBatches == 1,
      "the re-appended batch must land in the live generation")
    assert(idx.corpus.count() == 34)
    assert(idx.corpus.filter(col("vec_id") === 40L).count() == 1)
  }

  test("an in-flight probe pinned before a swap still reads its generation's files") {
    val work = Files.createTempDirectory("annpin").toString
    val idx = IvfStreamIndex(spark, s"$work/idx")
    idx.build(vecs(0L until 30L, 1L).select("vec_id", "embedding"), cells = 4)
    // the probe plan resolves (pins) generation 0 NOW, lazily
    val inFlight = idx.topK(probe = 4)
    val expected = inFlight.collect().map(_.toSeq).toSeq
    // a rebuild swaps to generation 1; retention keeps g0 one back
    idx.addBatch(vecs(Seq(50L), 2L).select("vec_id", "embedding"), 1L)
    idx.rebuild(throughBatch = 1L, cells = 4)
    assert(idx.corpus.count() == 31)
    // the pinned probe still executes against g0 — same result, no
    // FileNotFoundException, no mixing of g0 centroids with g1 corpus
    assert(inFlight.collect().map(_.toSeq).toSeq == expected)
    // a FRESH probe pins the new generation (vec 50 is a survivor)
    assert(idx.survivors.count() == 31)
    assert(idx.topK(probe = 4).collect().nonEmpty)
  }

  test("pointer is versioned: highest wins, a stale one beside it is harmless, legacy GEN still reads") {
    val work = Files.createTempDirectory("annptr").toString
    val idx = IvfStreamIndex(spark, s"$work/idx")
    idx.build(vecs(0L until 20L, 1L).select("vec_id", "embedding"), cells = 4)
    idx.rebuild(throughBatch = 5L, cells = 4)
    val fs = new org.apache.hadoop.fs.Path(work)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // exactly one live pointer after the swap retired the old one
    val ptrs = fs.listStatus(new org.apache.hadoop.fs.Path(s"$work/idx"))
      .map(_.getPath.getName).filter(_.startsWith("GEN.g")).sorted
    assert(ptrs.toSeq == Seq("GEN.g1"))
    assert(idx.rebuiltThrough == 5L)
    // a crashed swap's leftover STALE pointer must not win resolution
    val out = fs.create(
      new org.apache.hadoop.fs.Path(s"$work/idx/GEN.g0"), true)
    try out.write("0 -1".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    assert(idx.rebuiltThrough == 5L, "highest pointer version must win")
    assert(idx.corpus.count() == 20)
    // legacy unversioned GEN file (pre-versioning layout) still resolves
    fs.delete(new org.apache.hadoop.fs.Path(s"$work/idx/GEN.g1"), false)
    fs.delete(new org.apache.hadoop.fs.Path(s"$work/idx/GEN.g0"), false)
    val leg = fs.create(new org.apache.hadoop.fs.Path(s"$work/idx/GEN"), true)
    try leg.write("1 5".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally leg.close()
    assert(idx.rebuiltThrough == 5L && idx.exists)
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

  test("LakeCli ann-maintain drives the maintenance stream from the CLI surface") {
    val work = Files.createTempDirectory("anncli").toString
    val t = LakeTable.create(spark, s"$work/emb",
      TableMeta("emb3", Seq("vec_id"), "created_ts", Seq.empty))
    t.upsert(vecs(0L until 25L, 1L))
    graft.tools.LakeCli.run(spark, Array("ann-maintain", t.path,
      s"$work/idx", s"$work/ckpt", "once"))
    val idx = IvfStreamIndex(spark, s"$work/idx")
    assert(idx.exists && idx.corpus.count() == 25)
    // a second CLI run resumes the checkpoint and folds new changes
    t.upsert(vecs(25L until 30L, 2L))
    graft.tools.LakeCli.run(spark, Array("ann-maintain", t.path,
      s"$work/idx", s"$work/ckpt", "once"))
    assert(idx.corpus.count() == 30)
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
