package graft.queries

import graft.util.Sessions
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 text/association metrics: readability, PMI collocations,
  * chi-square term-label association, k-means cluster report.
  */
class TextMetricsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Sessions.local("textmetrics-test", "4")
  val dir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  test("readability matches an independent per-doc reference") {
    val texts = Relational.t(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = TextAnalysis.readability(spark, dir).collect()
    assert(rows.length == texts.size)
    rows.foreach { r =>
      val t = texts(r.getLong(0))
      val w = t.split(" ").count(_.nonEmpty).toLong
      val sents = math.max("[.!?]+".r.findAllIn(t).size.toLong, 1L)
      val syl = "[aeiouy]+".r.findAllIn(t.toLowerCase).size.toLong
      assert(r.getLong(1) == w && r.getLong(2) == sents && r.getLong(3) == syl)
      if (w == 0) assert(r.isNullAt(4))
      else assert(r.getLong(4) ==
        20683L - (1015 * w) / (10 * sents) - (8460 * syl) / w)
    }
  }

  test("collocations: support floor holds and the ratio is the PMI ratio") {
    val out = TextAnalysis.collocations(spark, dir).collect()
    assert(out.nonEmpty && out.length <= 50)
    assert(out.forall(_.getLong(2) >= 5))
    val ratios = out.map(_.getDouble(3))
    assert(ratios.zip(ratios.tail).forall { case (a, b) => a >= b })
    // independent recount for the top pair
    val toks = Relational.t(spark, dir, "documents")
      .select("text").collect().map(_.getString(0).split(" "))
    val uni = toks.flatten.filter(_.nonEmpty)
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val bgs = toks.filter(_.length >= 2)
      .flatMap(t => t.init.zip(t.tail))
      .filter { case (a, b) => a.nonEmpty && b.nonEmpty }
    val bgc = bgs.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val ut = uni.values.sum
    val bt = bgs.length.toLong
    val top = out.head
    val (w1, w2) = (top.getString(0), top.getString(1))
    assert(top.getLong(2) == bgc((w1, w2)))
    val expected =
      top.getLong(2).toDouble * ut * ut / (bt.toDouble * uni(w1) * uni(w2))
    assert(top.getDouble(3) == expected)
  }

  test("chi2 terms: per-lang top-k with an independently recomputed score") {
    val out = TextAnalysis.chi2Terms(spark, dir).collect()
    assert(out.nonEmpty)
    val byLang = out.groupBy(_.getString(0))
    byLang.values.foreach { rs =>
      val rks = rs.map(_.getInt(5)).sorted
      assert(rks.head == 1 && rks.length <= 10)
      assert(rks.zip(rks.tail).forall { case (a, b) => b == a + 1 })
    }
    assert(out.forall(_.getDouble(4) >= 0.0))
    // recompute one row from raw incidence
    val docs = Relational.t(spark, dir, "documents")
      .select("doc_id", "lang", "text").collect()
    val n = docs.length.toLong
    val nl = docs.groupBy(_.getString(1)).map { case (k, v) => k -> v.length.toLong }
    val inc = docs.flatMap(r => r.getString(2).split(" ").filter(_.nonEmpty)
      .distinct.map(w => (r.getString(1), w)))
    val r0 = out.head
    val (lang, term) = (r0.getString(0), r0.getString(1))
    val a = inc.count { case (l, w) => l == lang && w == term }.toLong
    val dfT = inc.count { case (_, w) => w == term }.toLong
    assert(r0.getLong(2) == a && r0.getLong(3) == dfT)
    val b = dfT - a
    val adbc = a * (n - nl(lang) - b) - b * (nl(lang) - a)
    val chi2 = adbc.toDouble * adbc * n /
      (dfT.toDouble * (n - dfT) * nl(lang) * (n - nl(lang)))
    assert(r0.getDouble(4) == chi2)
  }

  test("shard manifest equals a single-threaded offset-split reference") {
    val docs = Relational.t(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        512L + Option(r.getString(1)).getOrElse("").getBytes("UTF-8").length))
      .sortBy(_._1)
    val budget = 32768L
    var cum = 0L
    val ref = docs.map { case (id, b) =>
      val shard = cum / budget; cum += b; (shard, id, b)
    }.groupBy(_._1).map { case (s, xs) =>
      s -> (xs.length.toLong, xs.map(_._3).sum, xs.map(_._2).min, xs.map(_._2).max)
    }
    val out = TextAnalysis.shardManifest(spark, dir).collect()
    assert(out.length == ref.size)
    out.foreach { r =>
      val e = ref(r.getLong(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) == e)
    }
  }

  test("kmeans report partitions the corpus and bounds the q12 mean") {
    val total = Relational.t(spark, dir, "embeddings").count()
    val rows = Similarity.kmeansStats(spark, dir).collect()
    assert(rows.map(_.getLong(1)).sum == total)
    rows.foreach { r =>
      val (nMem, mn, mx) = (r.getLong(1), r.getDouble(2), r.getDouble(3))
      assert(nMem > 0 && mn <= mx)
      val mean = r.getLong(5)
      assert(mean >= math.floor(mn * 4096).toLong &&
        mean <= math.floor(mx * 4096).toLong)
      assert(mean == math.floor(r.getLong(4).toDouble / nMem).toLong)
    }
  }
}
