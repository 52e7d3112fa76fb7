package graft.queries

import graft.util.Sessions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the round-12 query additions, beyond the DuckDB hash
  * gate: estimator quality against exact ground truth (which the gate's
  * arithmetic replay alone cannot measure) and structural bounds that
  * hold at any scale factor.
  */
class Round12Spec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Sessions.local("round12-test", "4")
  val dir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  test("stats_kmv_setops: estimates land near exact set sizes; sample partitions exactly") {
    val r = Sketches.kmvSetOps(spark, dir).collect().head
    val nUnion = r.getAs[Long]("n_union")
    val nBoth = r.getAs[Long]("n_both")
    val nA = r.getAs[Long]("n_a_only")
    val nB = r.getAs[Long]("n_b_only")
    // the union sample partitions exactly into the three regions
    assert(nBoth + nA + nB == nUnion)
    assert(r.getAs[Long]("theta") > 0L)
    // exact ground truth for the same split
    val orders = Relational.t(spark, dir, "orders")
    def keys(cond: org.apache.spark.sql.Column): Set[Long] =
      orders.filter(cond).select("o_custkey").distinct()
        .collect().map(_.getLong(0)).toSet
    val a = keys(year(col("o_orderdate")) < 1998)
    val b = keys(year(col("o_orderdate")) >= 1998)
    // unfull sketch (sf0.001): the sample is the whole set → EXACT.
    // full sketch: k=256 → std err ≈ 6.3%; assert within 4σ.
    val full = (a ++ b).size >= 256
    def close(est: Double, exact: Long): Unit =
      if (full)
        assert(math.abs(est - exact) <= 0.25 * (a ++ b).size + 1,
          s"est $est vs exact $exact")
      else assert(est == exact.toDouble, s"unfull sketch must be exact: " +
        s"est $est vs exact $exact")
    close(r.getAs[Double]("est_union"), (a ++ b).size.toLong)
    close(r.getAs[Double]("est_intersect"), a.intersect(b).size.toLong)
    close(r.getAs[Double]("est_a_only"), (a -- b).size.toLong)
    close(r.getAs[Double]("est_b_only"), (b -- a).size.toLong)
    // region estimates reassemble the union estimate exactly (shared
    // denominator): both/k + aOnly/k + bOnly/k = 1
    assert(math.abs(r.getAs[Double]("est_intersect") +
      r.getAs[Double]("est_a_only") + r.getAs[Double]("est_b_only") -
      r.getAs[Double]("est_union")) < 1e-9 * r.getAs[Double]("est_union"))
  }

  test("sim_matryoshka_recall: full-dim leg is exact; truncated legs bounded") {
    val rows = Similarity.matryoshkaRecall(spark, dir).collect()
    assert(rows.length == Similarity.MatryoshkaDims.length * 3)
    rows.foreach { r =>
      val bp = r.getAs[Long]("recall_bp")
      assert(bp >= 0L && bp <= 10000L)
      assert(bp == r.getAs[Long]("hits") * 1000L)
      if (r.getAs[Long]("dims") == 64L)
        assert(bp == 10000L, s"full-dim self-check: $r")
    }
    // truncation must actually lose something at the smallest prefix
    // (8 of 64 dims recovering all three exact top-10s would mean the
    // embedding carries no information past dim 8)
    val d8 = rows.filter(_.getAs[Long]("dims") == 8L)
      .map(_.getAs[Long]("recall_bp"))
    assert(d8.exists(_ < 10000L))
  }

  test("lake_scd2: per-key chains are contiguous with at most one open version") {
    val rows = LakeQueries.lakeScd2(spark, dir).collect()
    val byKey = rows.groupBy(r => (r.getLong(0), r.getInt(1)))
    byKey.foreach { case (k, vs) =>
      val chain = vs.sortBy(_.getAs[Long]("valid_from"))
      // contiguity: each closed version hands off exactly to the next
      chain.sliding(2).foreach {
        case Array(a, b) =>
          assert(!a.isNullAt(a.fieldIndex("valid_to")) &&
            a.getAs[Long]("valid_to") == b.getAs[Long]("valid_from"),
            s"broken chain for key $k")
        case _ => ()
      }
      // at most one open (current) version, and only the LAST can be it
      val open = chain.filter(_.getAs[Boolean]("is_current"))
      assert(open.length <= 1, s"multiple current versions for $k")
      open.foreach(o => assert(o == chain.last, s"non-final current for $k"))
      // is_current ⇔ valid_to null
      chain.foreach(v => assert(
        v.getAs[Boolean]("is_current") == v.isNullAt(v.fieldIndex("valid_to"))))
    }
    // fixture shape: updated keys (<300) have 2 versions; deleted keys
    // (300-399) have a closed single version; the rest one open version
    byKey.foreach { case ((ok, _), vs) =>
      if (ok < 300) assert(vs.length == 2)
      else if (ok < 400)
        assert(vs.length == 1 && !vs.head.getAs[Boolean]("is_current"))
      else assert(vs.forall(_.getAs[Boolean]("is_current")))
    }
  }

  test("lake_distinct_incremental: three groups, coherent extremes") {
    val rows = LakeQueries.lakeDistinctIncremental(spark, dir).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_distinct") >= 1L)
      assert(r.getAs[Double]("min_q") <= r.getAs[Double]("max_q"))
      // the fixture's +5000 inserts dominate every group's max; deletes
      // (300-399) never touch the shifted values, so max ≥ 5000
      assert(r.getAs[Double]("max_q") >= 5000.0)
    }
  }
}
