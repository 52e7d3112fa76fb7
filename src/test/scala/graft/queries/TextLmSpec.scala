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
}
