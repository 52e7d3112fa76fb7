package graft.functions

import graft.util.Sessions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class HilbertSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Sessions.local("hilbert-spec", "4")

  override def afterAll(): Unit = spark.stop()

  /** Every cell of the d-dim grid, with its curve position. */
  private def curve(dims: Int, bits: Int): Map[Long, Seq[Int]] = {
    val side = 1 << bits
    val cells = Seq.fill(dims)(0 until side)
      .foldLeft(Seq(Seq.empty[Int]))((acc, r) =>
        acc.flatMap(p => r.map(p :+ _)))
    cells.map(c => HilbertCurve.encode(c.toArray, bits) -> c).toMap
  }

  test("2-D curve is a bijection onto [0, 4^bits)") {
    val m = curve(2, 4)
    assert(m.size == 256)
    assert(m.keySet == (0L until 256L).toSet)
  }

  test("3-D curve is a bijection onto [0, 8^bits)") {
    val m = curve(3, 3)
    assert(m.size == 512)
    assert(m.keySet == (0L until 512L).toSet)
  }

  test("consecutive curve positions are face-adjacent cells (the Hilbert property)") {
    for ((dims, bits) <- Seq((2, 4), (3, 3), (4, 2))) {
      val m = curve(dims, bits)
      val n = m.size.toLong
      for (h <- 0L until (n - 1)) {
        val a = m(h); val b = m(h + 1)
        val manhattan = a.zip(b).map { case (x, y) => math.abs(x - y) }.sum
        assert(manhattan == 1,
          s"dims=$dims bits=$bits: cells at $h ($a) and ${h + 1} ($b) " +
            s"are not face-adjacent")
      }
    }
  }

  test("bits=1 degenerate case still walks every corner once") {
    val m = curve(2, 1)
    assert(m.keySet == Set(0L, 1L, 2L, 3L))
  }

  test("codegen'd expression matches the static kernel and nulls propagate") {
    val s = spark
    import s.implicits._
    val side = 32
    val grid = (for (i <- 0 until side; j <- 0 until side)
      yield (i, j)).toDF("a", "b")
    val got = grid
      .select(col("a"), col("b"),
        HilbertIndex(Seq(col("a"), col("b")), 5).as("h"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    for (i <- 0 until side; j <- 0 until side)
      assert(got((i, j)) == HilbertCurve.encode(Array(i, j), 5))
    // null axis -> null result (pre-coalesce contract)
    val withNull = Seq((Some(1), Some(2)), (None, Some(3)))
      .toDF("a", "b")
      .select(HilbertIndex(Seq(col("a"), col("b")), 5).as("h"))
      .collect()
    assert(!withNull(0).isNullAt(0) && withNull(1).isNullAt(0))
  }

  test("box locality: hilbert runs cover a box in fewer, longer segments than z-order") {
    // For the 16x16 grid, take the box [4,11]x[4,11] and count the
    // contiguous curve segments that cover it: fewer segments = files
    // whose min/max zone maps stay inside the box = better pruning.
    val bits = 4
    def segments(index: (Int, Int) => Long): Int = {
      val hs = (for (i <- 4 to 11; j <- 4 to 11) yield index(i, j))
        .sorted
      1 + hs.sliding(2).count { case Seq(a, b) => b != a + 1 }
    }
    val hilbertSegs = segments((i, j) => HilbertCurve.encode(Array(i, j), bits))
    def zIndex(i: Int, j: Int): Long =
      (0 until bits).map(b =>
        ((((i >> b) & 1) << (2 * b)) | (((j >> b) & 1) << (2 * b + 1))).toLong)
        .sum
    val zSegs = segments(zIndex)
    assert(hilbertSegs <= zSegs,
      s"hilbert $hilbertSegs segments vs z-order $zSegs")
  }
}
