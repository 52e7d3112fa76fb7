package graft.queries

import graft.util.Sessions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Empirical sub-quadratic guards: the candidate volumes of the
  * near-dup paths, measured at BOTH gate scale factors, must grow no
  * faster than ~linearly with their input — so a future knob or plan
  * change that silently reintroduces quadratic candidate generation
  * (a broken rank filter, a dropped distinct, a collapsed band
  * structure) fails CI on real data instead of surviving as a
  * scale-killer only the 100× run would expose.
  *
  * Bounds are SELF-CALIBRATING: each test measures the input growth
  * (docs / tokens / vectors) in the same run and allows a small
  * constant slack over it, so fixture regeneration cannot silently
  * invalidate a hardcoded ratio. Quadratic growth would exceed every
  * bound here by an order of magnitude (input ratios are 4-10×, so
  * N² ⇒ 16-100× against linear bounds of ≤3× slack).
  */
class ScaleGuardSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Sessions.local("scaleguard-test", "8")
  val sfSmall = "/root/testdata/sf0.01"
  val sfBig = "/root/testdata/sf0.1"

  override def afterAll(): Unit = spark.stop()

  private def ratio(big: Long, small: Long): Double =
    big.toDouble / small.toDouble

  test("minhash LSH band-collision candidates grow ~linearly in docs") {
    def measure(dir: String): (Long, Long) = {
      val shingled = Dedup.docsWithShingles(spark, dir)
      val banded = Dedup.bandedDocs(shingled)
      val cands = banded.alias("a")
        .join(banded.alias("b"),
          col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id"), col("b.doc_id"))
        .distinct().count()
      val docs = shingled.count()
      spark.sharedState.cacheManager.clearCache()
      (docs, cands)
    }
    val (docsS, candS) = measure(sfSmall)
    val (docsB, candB) = measure(sfBig)
    assert(candS > 0 && candB > 0)
    info(s"docs $docsS -> $docsB (${ratio(docsB, docsS)}x), " +
      s"candidates $candS -> $candB (${ratio(candB, candS)}x)")
    assert(ratio(candB, candS) <= 3.0 * ratio(docsB, docsS),
      s"LSH candidate growth ${ratio(candB, candS)}x exceeds 3x the " +
        s"doc growth ${ratio(docsB, docsS)}x — banding has gone quadratic")
  }

  test("semantic IVF candidates grow ~linearly at bounded cell size") {
    // the production contract: cells scale with the corpus so cell size
    // stays bounded — replicate that scaling here (≈16 vectors/cell)
    def measure(dir: String): (Long, Long) = {
      val e = Relational.t(spark, dir, "embeddings")
        .repartition(spark.sparkContext.defaultParallelism)
        .persist()
      val n = e.count()
      val cells = math.max(8, math.ceil(n / 16.0).toInt)
      val cent = Similarity.ivfCentroids(e, cells)
      val assigned = Similarity.multiAssignCells(e, cent, Similarity.SemAssign)
      val cand = assigned.select(col("cell"), col("vec_id").as("id_a"))
        .join(assigned.select(col("cell"), col("vec_id").as("id_b")), Seq("cell"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct().count()
      e.unpersist(blocking = true)
      (n, cand)
    }
    val (nS, candS) = measure(sfSmall)
    val (nB, candB) = measure(sfBig)
    assert(candS > 0 && candB > 0)
    info(s"vectors $nS -> $nB (${ratio(nB, nS)}x), " +
      s"candidates $candS -> $candB (${ratio(candB, candS)}x)")
    assert(ratio(candB, candS) <= 3.0 * ratio(nB, nS),
      s"semantic candidate growth ${ratio(candB, candS)}x exceeds 3x the " +
        s"vector growth ${ratio(nB, nS)}x — multi-assign has gone quadratic")
  }

  test("the default semantic knobs keep expected cell size bounded") {
    // connects the DEFAULT configuration to the linearity guard above:
    // shrinking SemCells (or blowing up SemAssign) without rescaling
    // would unbound the per-cell pair work at the gate scale
    val n = Relational.t(spark, sfBig, "embeddings").count()
    val meanCell = Similarity.SemAssign.toDouble * n / Similarity.SemCells
    info(s"n=$n assign=${Similarity.SemAssign} cells=${Similarity.SemCells} " +
      s"-> mean cell size $meanCell")
    assert(meanCell <= 512.0,
      s"default knobs put ${meanCell} vectors in a mean cell at sf0.1 — " +
        "per-cell pair work is no longer bounded")
  }

  test("dup-span rows grow ~linearly in corpus tokens") {
    import graft.functions.TextFunctions.{spanHashes, words}
    val W = 10
    def measure(dir: String): (Long, Long) = {
      val docs = Relational.t(spark, dir, "documents")
        .repartition(spark.sparkContext.defaultParallelism)
      val tokens = docs.agg(sum(size(words(col("text"))))).head.getLong(0)
      val spanRows = docs
        .filter(size(words(col("text"))) >= W)
        .select(col("doc_id"), explode(spanHashes(col("text"), W)).as("h"))
        .distinct().count()
      (tokens, spanRows)
    }
    val (tokS, spanS) = measure(sfSmall)
    val (tokB, spanB) = measure(sfBig)
    assert(spanS > 0 && spanB > 0)
    info(s"tokens $tokS -> $tokB (${ratio(tokB, tokS)}x), " +
      s"span rows $spanS -> $spanB (${ratio(spanB, spanS)}x)")
    assert(ratio(spanB, spanS) <= 1.5 * ratio(tokB, tokS),
      s"span-row growth ${ratio(spanB, spanS)}x exceeds 1.5x the token " +
        s"growth ${ratio(tokB, tokS)}x — windowing is no longer linear")
  }
}
