package graft.queries

import graft.util.Sessions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class SemIncrSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Sessions.local("semincr-test", "4")

  override def afterAll(): Unit = spark.stop()

  /** Cross-split all-pairs baseline with the SAME cosine expression. */
  private def bruteCrossSplit(dir: String, split: Long) = {
    val e = Relational.t(spark, dir, "embeddings")
    val a = e.filter(col("vec_id") < split)
      .select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = e.filter(col("vec_id") >= split)
      .select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    a.crossJoin(b)
      .select(col("id_a"), col("id_b"),
        Similarity.cosine(col("va"), col("vb")).as("sim"))
      .filter(col("sim") >= Similarity.SemThreshold)
      .orderBy("id_a", "id_b")
      .collect().map(_.toSeq).toSeq
  }

  for (sf <- Seq("sf0.001", "sf0.01")) {
    test(s"incremental semantic dedup equals the cross-split baseline at $sf") {
      val dir = s"/root/testdata/$sf"
      val maxId = Relational.t(spark, dir, "embeddings")
        .agg(max(col("vec_id"))).head().getLong(0)
      val split = (maxId + 1L) * 8L / 10L
      val got = Similarity.semanticIncrementalAt(spark, dir, split)
        .collect().map(_.toSeq).toSeq
      assert(got == bruteCrossSplit(dir, split))
      // increment ids strictly on the increment side, corpus on corpus
      assert(got.forall(r =>
        r(0).asInstanceOf[Long] < split && r(1).asInstanceOf[Long] >= split))
    }
  }
}
