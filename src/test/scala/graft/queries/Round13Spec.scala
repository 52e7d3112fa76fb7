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
