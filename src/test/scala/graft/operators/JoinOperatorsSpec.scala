package graft.operators

import graft.util.Sessions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

class JoinOperatorsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Sessions.local("join-ops-test", "4")
  import spark.implicits._

  override def afterAll(): Unit = spark.stop()

  // ---- as-of join ----

  test("asOfPrior matches a brute-force inequality join, ties included") {
    val rnd = new Random(7)
    // small ts domain forces plenty of exact-tie collisions
    val left = (1L to 300L).map(i => (i, rnd.nextInt(5).toLong, rnd.nextInt(40).toLong))
      .toDF("lid", "k", "lts")
    val right = (1L to 200L).map(i => (i, rnd.nextInt(5).toLong, rnd.nextInt(40).toLong, s"v$i"))
      .toDF("rid", "k", "rts", "payload")

    val got = AsOfJoin.asOfPrior(left, right, Seq("k"), "lts", "rts",
        rightVals = Seq("rid", "payload"), prefix = "m_")
      .select("lid", "m_rts", "m_rid", "m_payload")
      .collect().map(r => (r.getLong(0), (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))))
      .toMap

    // brute force: all rts <= lts per key, pick max (rts, rid, payload)
    val expect = left.as("l")
      .join(right.as("r"), $"l.k" === $"r.k" && $"r.rts" <= $"l.lts", "left")
      .groupBy($"l.lid")
      .agg(max(struct($"r.rts", $"r.rid", $"r.payload")).as("m"))
      .select($"lid", $"m.rts", $"m.rid", $"m.payload")
      .collect().map(r => (r.getLong(0), (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))))
      .toMap

    assert(got.size == 300)
    assert(got == expect)
    // and some rows must actually exercise the null (no-prior) branch
    assert(got.values.exists(_._1.isEmpty))
  }

  test("asOfPrior: at-or-before semantics and multi-key matching") {
    val left = Seq((1L, "a", 1L, 10L), (2L, "a", 2L, 10L), (3L, "b", 1L, 5L))
      .toDF("lid", "k1", "k2", "lts")
    val right = Seq(("a", 1L, 10L, 100L), ("a", 1L, 9L, 99L), ("a", 2L, 11L, 98L), ("b", 9L, 5L, 97L))
      .toDF("k1", "k2", "rts", "rv")
    val got = AsOfJoin.asOfPrior(left, right, Seq("k1", "k2"), "lts", "rts", Seq("rv"))
      .select("lid", "asof_rts", "asof_rv")
      .collect().map(r => (r.getLong(0), (Option(r.get(1)), Option(r.get(2))))).toMap
    // lid 1: exact-ts right row (rts=10) wins over rts=9 — at-or-before
    assert(got(1L) == (Some(10L), Some(100L)))
    // lid 2: key (a,2) only has rts=11 > lts=10 — no match
    assert(got(2L) == (None, None))
    // lid 3: key (b,1) has no right rows at all ((b,9) must not leak)
    assert(got(3L) == (None, None))
  }

  test("asOfPrior plan: one key shuffle + window, no nested-loop join") {
    val left = (1L to 50L).map(i => (i, i % 3, i)).toDF("lid", "k", "lts")
    val right = (1L to 50L).map(i => (i % 3, i, i * 2)).toDF("k", "rts", "rv")
    val plan = AsOfJoin.asOfPrior(left, right, Seq("k"), "lts", "rts", Seq("rv"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("Window"), plan)
  }

  // ---- range join ----

  test("pointInInterval matches brute force across bin widths and boundaries") {
    val rnd = new Random(11)
    val pts = (1L to 400L).map(i => (i, rnd.nextInt(1000).toLong - 500L)).toDF("pid", "p")
    // lengths 0 (empty), short, and many-bin-spanning; negative coords too
    val ivs = (1L to 120L).map { i =>
      val lo = rnd.nextInt(1000).toLong - 500L
      val len = rnd.nextInt(4) match {
        case 0 => 0L
        case 1 => rnd.nextInt(10).toLong
        case _ => rnd.nextInt(300).toLong
      }
      (i, lo, lo + len)
    }.toDF("iid", "lo", "hi")

    val expect = pts.join(ivs, $"p" >= $"lo" && $"p" < $"hi")
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    for (w <- Seq(1L, 7L, 64L, 100L, 5000L)) {
      val got = RangeJoin.pointInInterval(pts, "p", ivs, "lo", "hi", binWidth = w)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      // exactly-once emission: no dedup hidden in the operator
      assert(got.length == got.toSet.size, s"duplicate pairs at binWidth=$w")
      assert(got.toSet == expect, s"mismatch at binWidth=$w")
    }
    assert(expect.nonEmpty)
  }

  test("pointInInterval boundary semantics: lo inclusive, hi exclusive") {
    val pts = Seq((1L, 10L), (2L, 19L), (3L, 20L)).toDF("pid", "p")
    val ivs = Seq((1L, 10L, 20L)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(pts, "p", ivs, "lo", "hi", 8L)
      .select("pid").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L))
  }

  test("pointInInterval plan: equi join on bin, no nested-loop join") {
    val pts = (1L to 100L).map(i => (i, i * 3)).toDF("pid", "p")
    val ivs = (1L to 30L).map(i => (i, i * 10, i * 10 + 25)).toDF("iid", "lo", "hi")
    val plan = RangeJoin.pointInInterval(pts, "p", ivs, "lo", "hi", 25L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
