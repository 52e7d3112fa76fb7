package graft.operators

import graft.util.Sessions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The bucketed layout's whole point is the PLAN: a join of two tables
  * bucketed on their join keys must run with zero shuffle exchanges —
  * and it must return exactly what the unbucketed join returns.
  */
class BucketingSpec extends AnyFunSuite with BeforeAndAfterAll
    with AdaptiveSparkPlanHelper {

  lazy val spark: SparkSession = Sessions.local("bucketing-test", "4")

  override def afterAll(): Unit = spark.stop()

  test("same-bucket-count join plans with zero shuffles, same rows") {
    val s = spark
    import s.implicits._
    // force the co-location path: no broadcast escape hatch
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val orders = (0 until 2000).map(i => (i.toLong, s"prio${i % 3}"))
        .toDF("o_key", "o_prio")
      val items = (0 until 6000).map(i => ((i % 2000).toLong, i.toLong, i % 50))
        .toDF("l_key", "l_item", "l_qty")
      Bucketing.writeBucketed(orders, "bk_orders", 8, "o_key")
      Bucketing.writeBucketed(items, "bk_items", 8, "l_key")

      val joined = Bucketing.colocatedJoin(spark, "bk_orders", "bk_items",
        "o_key", "l_key")
      val rows = joined.count() // materialize → final adaptive plan
      assert(rows == 6000)

      val shuffles = collectWithSubqueries(joined.queryExecution.executedPlan) {
        case e: ShuffleExchangeLike => e
      }
      assert(shuffles.isEmpty,
        s"bucketed join shuffled:\n${joined.queryExecution.executedPlan}")

      // value parity with the plain (shuffling) join
      val expect = orders.join(items, $"o_key" === $"l_key")
        .select("o_key", "l_item", "o_prio", "l_qty").collect()
        .map(_.toSeq).toSet
      val got = joined.select("o_key", "l_item", "o_prio", "l_qty").collect()
        .map(_.toSeq).toSet
      assert(got == expect)

      // a MISMATCHED bucket count cannot co-locate: the 4-bucket side
      // (at least) must re-shuffle — the layout contract, not magic
      Bucketing.writeBucketed(items, "bk_items4", 4, "l_key")
      val mixed = Bucketing.colocatedJoin(spark, "bk_orders", "bk_items4",
        "o_key", "l_key")
      mixed.count()
      val mixedShuffles = collectWithSubqueries(mixed.queryExecution.executedPlan) {
        case e: ShuffleExchangeLike => e
      }
      assert(mixedShuffles.nonEmpty)
      // same-named keys on both sides (the common fact-to-fact case)
      // resolve without ambiguity and still co-locate
      Bucketing.writeBucketed(items.withColumnRenamed("l_key", "k"),
        "bk_a", 8, "k")
      Bucketing.writeBucketed(orders.withColumnRenamed("o_key", "k"),
        "bk_b", 8, "k")
      val same = Bucketing.colocatedJoin(spark, "bk_a", "bk_b", "k", "k")
      assert(same.count() == 6000)
      assert(collectWithSubqueries(same.queryExecution.executedPlan) {
        case e: ShuffleExchangeLike => e
      }.isEmpty)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS bk_orders")
      spark.sql("DROP TABLE IF EXISTS bk_items")
      spark.sql("DROP TABLE IF EXISTS bk_items4")
      spark.sql("DROP TABLE IF EXISTS bk_a")
      spark.sql("DROP TABLE IF EXISTS bk_b")
    }
  }
}
