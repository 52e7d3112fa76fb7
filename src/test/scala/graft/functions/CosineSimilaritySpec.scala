package graft.functions

import graft.queries.{Relational, Similarity}
import graft.util.Sessions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class CosineSimilaritySpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Sessions.local("cosine-spec", "4")

  override def afterAll(): Unit = spark.stop()

  test("native expression is bit-identical to the HOF fold on real embeddings") {
    val e = Relational.t(spark, "/root/testdata/sf0.001", "embeddings")
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"))
    val both = e.crossJoin(broadcast(q))
      .select(
        Similarity.cosine(col("embedding"), col("qv")).as("native"),
        Similarity.cosineHof(col("embedding"), col("qv")).as("hof"))
    val mismatches = both.filter(col("native") =!= col("hof")).count()
    assert(mismatches == 0)
    assert(both.count() == 500)
  }

  test("self-similarity is ~1, orthogonal-ish vectors below 1") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f)),
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (Array(1.0f, 2.0f), Array(2.0f, 4.0f))).toDF("a", "b")
    val sims = df.select(Similarity.cosine(col("a"), col("b")).as("s"))
      .collect().map(_.getDouble(0))
    assert(math.abs(sims(0) - 1.0) < 1e-12)
    assert(math.abs(sims(1)) < 1e-12)
    assert(math.abs(sims(2) - 1.0) < 1e-12)
  }

  test("quantized cosine matches the HOF quantization recipe bit-for-bit") {
    val e = Relational.t(spark, "/root/testdata/sf0.001", "embeddings")
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"))
    // the composed-built-ins statement of the emb_quantize recipe
    def codes(c: org.apache.spark.sql.Column) = {
      val absMax = array_max(transform(c, v => abs(v.cast("double"))))
      val scale = when(absMax > 0, lit(127.0) / absMax).otherwise(lit(0.0))
      transform(c, v => floor(v.cast("double") * scale + 0.5).cast("long"))
    }
    def sq(c: org.apache.spark.sql.Column) =
      aggregate(transform(c, v => v * v), lit(0L), (a, v) => a + v)
    val both = e.crossJoin(broadcast(q))
      .withColumn("qa", codes(col("embedding")))
      .withColumn("qb", codes(col("qv")))
      .withColumn("hof",
        when(sq(col("qa")) === 0 || sq(col("qb")) === 0, lit(-1.0))
          .otherwise(
            aggregate(zip_with(col("qa"), col("qb"), (x, y) => x * y),
              lit(0L), (a, v) => a + v).cast("double") /
              (sqrt(sq(col("qa")).cast("double")) *
                sqrt(sq(col("qb")).cast("double")))))
      .select(
        graft.functions.QuantizedCosine(col("embedding"), col("qv")).as("native"),
        col("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
    assert(both.count() == 500)
    // zero vector scores -1, not NaN
    val s = spark
    import s.implicits._
    val z = Seq((Array(0.0f, 0.0f), Array(1.0f, 2.0f))).toDF("a", "b")
      .select(graft.functions.QuantizedCosine(col("a"), col("b")).as("s"))
      .head().getDouble(0)
    assert(z == -1.0)
  }

  test("expression participates in codegen (no interpreted fallback)") {
    val e = Relational.t(spark, "/root/testdata/sf0.001", "embeddings")
    val q = e.limit(1).select(col("embedding").as("qv"))
    val df = e.crossJoin(broadcast(q))
      .select(Similarity.cosine(col("embedding"), col("qv")).as("sim"))
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    // the `*(n)` prefix marks WholeStageCodegen membership in tree output
    val projLine = plan.linesIterator
      .find(_.contains("cosinesimilarity")).getOrElse("")
    assert(projLine.contains("*("), s"not codegen'd: $projLine")
  }
}
