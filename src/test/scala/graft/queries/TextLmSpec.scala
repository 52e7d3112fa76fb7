package graft.queries

import graft.util.Sessions
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class TextLmSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Sessions.local("textlm-test", "4")

  override def afterAll(): Unit = spark.stop()

  test("templated text scores far more predictable than rare-token soup") {
    val s = spark
    import s.implicits._
    // doc 1 repeats one bigram; doc 2 is all singleton bigrams; docs
    // 3-4 are the templated "corpus" that makes doc 1's bigrams common
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "zx qw er ty ui op"),
      (3L, "the cat sat on the mat again"),
      (4L, "the cat sat on the mat too")).toDF("doc_id", "text")
    val out = TextAnalysis.lmScoreFor(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // n_bigrams = tokens - 1
    assert(out(1)._1 == 5 && out(2)._1 == 5)
    // common bigrams -> low surprise; singleton bigrams in a corpus of
    // shared contexts -> every bigram still costs >= 0 bits, and the
    // rare doc costs strictly more per bigram
    assert(out(1)._3 < out(2)._3)
    assert(out.values.forall(_._2 >= 0))
  }

  test("docs with fewer than two tokens get zero bigrams and null rate") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "solo"), (2L, ""), (3L, "two tokens"))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.lmScoreFor(docs).collect()
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getLong(1) == 0 && byId(1L).isNullAt(3))
    assert(byId(2L).getLong(1) == 0 && byId(2L).isNullAt(3))
    assert(byId(3L).getLong(1) == 1 && !byId(3L).isNullAt(3))
  }

  test("entropy equals the integer reference; repeated text scores zero") {
    val dir = "/root/testdata/sf0.001"
    def l2q4(x: Long): Long = {
      val bl = 64 - java.lang.Long.numberOfLeadingZeros(x)
      (bl - 1).toLong * 16 + ((x * 16) >> (bl - 1)) - 16
    }
    val texts = Relational.t(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = TextAnalysis.entropy(spark, dir).collect()
    assert(rows.length == texts.size)
    rows.foreach { r =>
      val toks = texts(r.getLong(0)).split(" ").filter(_.nonEmpty)
      val n = toks.length.toLong
      val expected =
        if (n == 0) 0L
        else n * l2q4(n) -
          toks.groupBy(identity).values.map(g =>
            g.length.toLong * l2q4(g.length.toLong)).sum
      assert(r.getLong(1) == n && r.getLong(2) == expected,
        s"doc ${r.getLong(0)}: got ${r.getLong(2)} want $expected")
      assert(r.getLong(3) == (if (n == 0) 0L else expected / n))
      assert(r.getBoolean(4) == (r.getLong(3) < 32))
    }
    // extremes: all-same tokens -> exactly zero; all-distinct -> n*L(n)
    val allSame = rows.find(r =>
      texts(r.getLong(0)).split(" ").filter(_.nonEmpty).distinct.length == 1)
    allSame.foreach(r => assert(r.getLong(2) == 0L))
    val allDistinct = rows.find { r =>
      val t = texts(r.getLong(0)).split(" ").filter(_.nonEmpty)
      t.nonEmpty && t.distinct.length == t.length
    }
    allDistinct.foreach(r =>
      assert(r.getLong(2) == r.getLong(1) * l2q4(r.getLong(1))))
  }
}
