package graft.queries

import graft.util.Sessions
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class ProfileSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Sessions.local("profile-test", "4")
  val sf = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  test("profile metrics are internally consistent") {
    val rows = Profile.statsProfile(spark, sf).collect()
    assert(rows.length == 7)
    val n = rows.head.getLong(1)
    assert(n > 0)
    // one n_rows for the whole table
    assert(rows.forall(_.getLong(1) == n))
    val byCol = rows.map(r => r.getString(0) -> r).toMap
    // key column: no nulls, all-distinct is impossible (multi-line orders)
    val ok = byCol("l_orderkey")
    assert(ok.getLong(2) == 0)
    assert(ok.getLong(3) > 0 && ok.getLong(3) <= n)
    assert(ok.getDouble(4) >= 0.0 && ok.getDouble(5) > ok.getDouble(4))
    // discount range is a sub-unit fraction
    val disc = byCol("l_discount")
    assert(disc.getDouble(4) >= 0.0 && disc.getDouble(5) <= 1.0)
    // flag columns: tiny cardinality, no numeric axis
    assert(byCol("l_returnflag").getLong(3) <= 3)
    assert(byCol("l_returnflag").isNullAt(4))
    // timestamp profiled on the epoch-micros axis: positive and ordered
    val ship = byCol("l_shipdate")
    assert(ship.getDouble(4) > 0 && ship.getDouble(5) >= ship.getDouble(4))
  }

  test("sketch profile: estimates track exact cardinalities, one scan, no Expand") {
    val exact = Profile.statsProfile(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val sk = Profile.statsProfileSketch(spark, sf).collect()
    assert(sk.length == 7)
    sk.foreach { r =>
      val name = r.getString(0)
      val e = exact(name)
      // exact pieces agree with the exact profiler
      assert(r.getLong(1) == e.getLong(1), s"$name n_rows")
      assert(r.getLong(2) == e.getLong(2), s"$name n_null")
      assert(r.isNullAt(4) == e.isNullAt(4) &&
        (r.isNullAt(4) || r.getDouble(4) == e.getDouble(4)), s"$name min")
      assert(r.isNullAt(5) == e.isNullAt(5) &&
        (r.isNullAt(5) || r.getDouble(5) == e.getDouble(5)), s"$name max")
      // HLL estimate within the m=256 error regime. Raw HLL (no
      // low-range correction, on purpose — ln is not bit-portable)
      // overestimates small cardinalities, so tiny columns (the 2-3
      // value flags, the ~11 distinct discounts) only get a sanity
      // ceiling; genuinely large columns must sit within a few std errs
      // of exact (1.04/√256 ≈ 6.5%).
      val exDist = e.getLong(3).toDouble
      val est = r.getDouble(3)
      if (exDist >= 2560) // n ≫ 2.5m: raw-estimator regime
        assert(math.abs(est - exDist) / exDist < 0.2,
          s"$name est $est vs exact $exDist")
      else assert(est > 0, s"$name est must be positive")
    }
  }

  test("sketch profile is one scan with bounded (col, bucket) shuffle") {
    val df = Profile.statsProfileSketch(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected a single parquet scan, plan:\n$plan")
    assert(!plan.contains("Expand"),
      s"sketch profile must not ride count_distinct's Expand:\n$plan")
    // partial aggregation before the exchange: the shuffle carries
    // (col_name, bucket) partials, not raw rows
    assert("HashAggregate".r.findAllIn(plan).length >= 2, plan)
  }

  test("profile is one scan of the table (no per-column jobs)") {
    val plan = Profile.statsProfile(spark, sf)
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected a single parquet scan, plan:\n$plan")
  }
}
