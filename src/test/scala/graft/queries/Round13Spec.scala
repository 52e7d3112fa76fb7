package graft.queries

import graft.util.Sessions
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 additions. */
class Round13Spec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Sessions.local("round13-test", "4")
  val dir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  test("sim_matryoshka_probe: well-formed top-10, recall vs the full-dim probe") {
    val full = Similarity.ivfTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rows = Similarity.matryoshkaProbe(spark, dir).collect()
    // shape: 10 ranked rows per query, sims non-increasing within a query
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L, 2L))
    byQ.values.foreach { qr =>
      assert(qr.map(_.getInt(3)).sorted.toSeq == (1 to 10))
      val sims = qr.sortBy(_.getInt(3)).map(_.getDouble(2)).toSeq
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
    // recall vs the full-dim probe over the same index: the prefix
    // shortlist keeps most of the true neighborhood (NOT asserted
    // monotone or near-1 — at this SF recall jitters; the measured
    // trade-off is sim_matryoshka_recall's job)
    val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = full.intersect(got).size.toDouble / full.size
    assert(recall >= 0.5, s"prefix-probe recall collapsed: $recall")
  }

  test("sim_ivf_incr: staged append equals from-scratch assignment; index files untouched") {
    val stage = java.nio.file.Files
      .createTempDirectory("graft_r13_stage").toString
    spark.conf.set(Dedup.StageDirConf, stage)
    try {
      val staged = Similarity.ivfIncrementalTopK(spark, dir)
        .collect().map(_.toSeq).toSeq
      // the staged artifact holds every vector exactly once across the
      // two write generations
      val corpusDir = new java.io.File(stage).listFiles()
        .filter(_.getName.startsWith("ivf_inc_corpus_")).head
      val art = spark.read.parquet(corpusDir.toString)
      val n = Relational.t(spark, dir, "embeddings").count()
      assert(art.count() == n)
      assert(art.select("vec_id").distinct().count() == n)
      // appending was append-only: re-running the query must not change
      // a single artifact file (produce-once + untouched generations)
      def fileState(): Set[(String, Long)] = {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
        walk(corpusDir).filter(_.getName.endsWith(".parquet"))
          .map(f => (f.getPath, f.lastModified())).toSet
      }
      val before = fileState()
      val again = Similarity.ivfIncrementalTopK(spark, dir)
        .collect().map(_.toSeq).toSeq
      assert(fileState() == before, "artifact files were rewritten")
      assert(again == staged)
      // and the appended index answers exactly like a from-scratch
      // assignment of the union to the same fixed centroids
      spark.conf.unset(Dedup.StageDirConf)
      val fresh = Similarity.ivfIncrementalTopK(spark, dir)
        .collect().map(_.toSeq).toSeq
      assert(staged == fresh)
    } finally {
      spark.conf.unset(Dedup.StageDirConf)
    }
  }

  test("matryoshka probe with the full 64-dim prefix degenerates to the IVF probe") {
    // dims = 64 makes the prefix ranking THE full ranking, so the
    // 50-candidate shortlist is a superset of the top-10 and the final
    // re-scored result must equal the plain IVF probe bit-for-bit
    val e = Relational.t(spark, dir, "embeddings")
    val cent = Similarity.ivfCentFor(spark, dir, e)
    val corpus = Similarity.ivfCorpusFor(spark, dir, e, cent)
    val a = Similarity.matryoshkaProbeTopK(cent, corpus,
      Similarity.IvfProbe, 64, Similarity.MatryoshkaCand)
      .collect().map(_.toSeq).toSet
    val b = Similarity.ivfProbeTopK(cent, corpus, Similarity.IvfProbe)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
