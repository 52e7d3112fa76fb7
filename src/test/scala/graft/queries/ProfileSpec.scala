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

  test("profile is one scan of the table (no per-column jobs)") {
    val plan = Profile.statsProfile(spark, sf)
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected a single parquet scan, plan:\n$plan")
  }
}
