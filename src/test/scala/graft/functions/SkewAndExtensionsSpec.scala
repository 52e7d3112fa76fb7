package graft.functions

import graft.queries.Relational
import graft.util.Sessions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class SkewAndExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Sessions.local("skew-spec", "4")
  val sf = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  test("saltedAggregate equals plain aggregation on skewed keys") {
    val li = Relational.t(spark, sf, "lineitem") // l_returnflag is 3-valued: skewed
    val plain = li.groupBy("l_returnflag")
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("s"),
        count(lit(1)).as("c"))
    val salted = Skew.saltedAggregate(li, Seq("l_returnflag"), 8,
      saltBy = Seq("l_orderkey", "l_linenumber"))(
      Seq(sum(col("l_quantity").cast("decimal(18,2)")).as("ps"),
        count(lit(1)).as("pc")),
      Seq(sum(col("ps")).as("s"), sum(col("pc")).as("c")))
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
  }

  test("saltedJoin equals plain join (inner and left)") {
    val li = Relational.t(spark, sf, "lineitem")
    val part = Relational.t(spark, sf, "part")
      .withColumnRenamed("p_partkey", "l_partkey")
    for (jt <- Seq("inner", "left")) {
      val plain = li.join(part, Seq("l_partkey"), jt)
      val salted = Skew.saltedJoin(li, part, Seq("l_partkey"), 4, jt)
      assert(plain.count() == salted.count(), jt)
      assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty, jt)
    }
  }

  test("cosine_sim registered as a SQL function via extensions") {
    spark.read.parquet(s"$sf/embeddings.parquet").createOrReplaceTempView("emb")
    val out = spark.sql(
      """SELECT e.vec_id, cosine_sim(e.embedding, q.embedding) AS sim
        |FROM emb e JOIN emb q ON q.vec_id = 0
        |ORDER BY sim DESC LIMIT 3""".stripMargin).collect()
    assert(out.head.getLong(0) == 0L) // self-match first
    assert(math.abs(out.head.getDouble(1) - 1.0) < 1e-9)
  }
}
