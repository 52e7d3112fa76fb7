package graft.lake

import graft.util.Sessions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Tables without partition columns (reference supports empty
  * partitionpath — MultiPartKeysValueExtractor with no fields).
  */
class UnpartitionedSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Sessions.local("unpart-test", "4")

  override def afterAll(): Unit = spark.stop()

  def df(rows: (Int, String, Long, Double)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("id", "sub", "ts", "v")
  }

  test("cow upsert/incremental/delete on an unpartitioned composite-key table") {
    val t = LakeTable.create(spark,
      Files.createTempDirectory("unp").toString + "/t",
      TableMeta("u", Seq("id", "sub"), "ts")) // no partition fields
    val c1 = t.upsert(df((1, "a", 10L, 1.0), (2, "b", 10L, 2.0)))
    val c2 = t.upsert(df((2, "b", 20L, 22.0), (3, "c", 20L, 3.0)))
    assert(t.snapshot().count() == 3)
    assert(t.snapshot().filter(col("id") === 2).head().getAs[Double]("v") == 22.0)
    assert(t.incremental(c1, c2).count() == 2)
    t.delete(df((1, "a", 0L, 0.0)))
    assert(t.snapshot().count() == 2)
  }

  test("mor unpartitioned: deltas resolve, compaction works") {
    val t = LakeTable.create(spark,
      Files.createTempDirectory("unp2").toString + "/t",
      TableMeta("u2", Seq("id"), "ts", tableType = "mor"))
    t.insert(df((1, "a", 10L, 1.0)))
    t.upsert(df((1, "a", 20L, 9.0), (2, "b", 20L, 2.0)))
    assert(t.snapshot().count() == 2)
    assert(t.snapshot().filter(col("id") === 1).head().getAs[Double]("v") == 9.0)
    t.compact()
    assert(t.readOptimized().count() == 2)
  }
}
