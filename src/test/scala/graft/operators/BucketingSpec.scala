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

  test("JoinMaintain delta over bucketed snapshots: no shuffle on the snapshot sides") {
    // The 100 TB claim in JoinMaintain's scaladoc, made checkable: each
    // advance joins a change sliver against ONE side's snapshot — with
    // the snapshots bucketed on the join keys, those joins must plan
    // with the snapshot side read in place (zero shuffle between join
    // and bucketed scan; only the sliver re-distributes).
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec,
      ShuffledHashJoinExec, SortMergeJoinExec}
    import org.apache.spark.sql.SparkSession
    val s = spark
    import s.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val aOldDf = (0 until 2000).map(i => (i.toLong, s"a$i"))
        .toDF("a_key", "a_val")
      val bOldDf = (0 until 500).map(i => (i.toLong, i * 10L))
        .toDF("b_key", "b_val")
      val ct = graft.lake.LakeTable.ChangeTypeCol
      val aChanges = Seq((3L, "a3x", "update_postimage"), (3L, "a3", "update_preimage"),
        (2001L, "new", "insert"), (7L, "a7", "delete"))
        .toDF("a_key", "a_val", ct)
      val bChanges = Seq((4L, 999L, "insert"), (5L, 50L, "delete"))
        .toDF("b_key", "b_val", ct)
      val aNewDf = aOldDf.filter($"a_key" =!= 3L && $"a_key" =!= 7L)
        .union(Seq((3L, "a3x"), (2001L, "new")).toDF("a_key", "a_val"))
      val bNewDf = bOldDf.filter($"b_key" =!= 5L)
        .union(Seq((4L, 999L)).toDF("b_key", "b_val"))
      // the delta's snapshot ingredients ARE the bucketed tables:
      // OLD A, NEW B — exactly the asymmetric-split recipe
      Bucketing.writeBucketed(aOldDf, "jm_a", 8, "a_key")
      Bucketing.writeBucketed(bNewDf, "jm_b", 8, "b_key")
      val d = graft.pipelines.JoinMaintain.delta(
        aChanges, spark.table("jm_a"), spark.table("jm_b"), bChanges,
        "a_key", "b_key", Seq("a_key", "a_val", "b_key", "b_val"))
      val plan = d.queryExecution.executedPlan
      val joins = plan.collect {
        case j: SortMergeJoinExec => j: org.apache.spark.sql.execution.SparkPlan
        case j: ShuffledHashJoinExec => j
        case j: BroadcastHashJoinExec => j
      }
      assert(joins.size == 2, s"expected the two delta joins:\n$plan")
      joins.foreach { j =>
        val snapSides = j.children.filter(
          _.collect { case f: FileSourceScanExec => f }.nonEmpty)
        assert(snapSides.nonEmpty, s"join lost its bucketed scan:\n$j")
        snapSides.foreach { c =>
          assert(c.collect { case e: ShuffleExchangeLike => e }.isEmpty,
            s"bucketed snapshot side re-shuffled:\n$c")
          val scans = c.collect { case f: FileSourceScanExec => f }
          assert(scans.forall(_.bucketedScan),
            s"snapshot scan not reading the bucket layout:\n$c")
        }
      }
      // and the algebra holds with the bucketed tables as ingredients:
      // old state + this delta = the fresh join of the new snapshots
      val outCols = Seq("a_key", "a_val", "b_key", "b_val")
      val applied = graft.pipelines.JoinMaintain.applyDelta(
        graft.pipelines.JoinMaintain.fullState(
          aOldDf, bOldDf, "a_key", "b_key", outCols), d, outCols)
        .collect().map(_.toSeq).toSet
      val expect = graft.pipelines.JoinMaintain.fullState(
        aNewDf, bNewDf, "a_key", "b_key", outCols)
        .collect().map(_.toSeq).toSet
      assert(applied == expect)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.enabled")
      spark.sql("DROP TABLE IF EXISTS jm_a")
      spark.sql("DROP TABLE IF EXISTS jm_b")
    }
  }

  test("DistinctMaintain applyDelta over a bucketed aux: no shuffle on the aux side") {
    // The 100 TB claim in DistinctMaintain's scaladoc, made checkable:
    // the merge is aux×delta keyed on the (group, value) pair — with the
    // aux generation WRITTEN bucketed on exactly that pair, the merge
    // must plan with the aux side read in place (zero shuffle between
    // the join and the bucketed scan; only the delta sliver
    // re-distributes).
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec,
      ShuffledHashJoinExec, SortMergeJoinExec}
    val s = spark
    import s.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val grp = Seq("g")
      val base = (0 until 3000).map(i => (i.toLong, s"g${i % 7}", (i % 40).toLong))
        .toDF("id", "g", "v")
      // bucket count must MATCH the delta's shuffle parallelism: the
      // delta arrives hash-partitioned (g, v) x shuffle.partitions from
      // its own aggregate, and EnsureRequirements re-shuffles the SMALLER
      // side — an 8-bucket aux against a 32-partition delta would lose
      // its in-place read (observed: "Bucketed: false, disabled by query
      // planner"). Same rule at 100 TB: pick the bucket count equal to
      // (or a multiple of) the maintenance job's shuffle parallelism.
      val nb = spark.conf.get("spark.sql.shuffle.partitions").toInt
      val aux0 = graft.pipelines.DistinctMaintain.fullAux(base, grp, $"v")
      graft.operators.Bucketing.writeBucketed(aux0, "dm_aux", nb, Seq("g", "v"))
      val ct = graft.lake.LakeTable.ChangeTypeCol
      val changes = Seq(("g1", 5L, "delete"), ("g1", 99L, "insert"),
        ("g2", 7L, "update_preimage"), ("g2", 41L, "update_postimage"))
        .toDF("g", "v", ct)
      val d = graft.pipelines.DistinctMaintain.delta(changes, grp, $"v")
      val merged = graft.pipelines.DistinctMaintain.applyDelta(
        spark.table("dm_aux"), d, grp)
      val plan = merged.queryExecution.executedPlan
      val joins = plan.collect {
        case j: SortMergeJoinExec => j: org.apache.spark.sql.execution.SparkPlan
        case j: ShuffledHashJoinExec => j
        case j: BroadcastHashJoinExec => j
      }
      assert(joins.size == 1, s"expected the one merge join:\n$plan")
      val auxSide = joins.head.children.filter(
        _.collect { case f: FileSourceScanExec => f }.nonEmpty)
      assert(auxSide.nonEmpty, s"merge lost its bucketed aux scan:\n$plan")
      auxSide.foreach { c =>
        assert(c.collect { case e: ShuffleExchangeLike => e }.isEmpty,
          s"bucketed aux side re-shuffled:\n$c")
        val scans = c.collect { case f: FileSourceScanExec => f }
        assert(scans.forall(_.bucketedScan),
          s"aux scan not reading the bucket layout:\n$c")
      }
      // and the algebra holds with the bucketed aux as ingredient
      val got = graft.pipelines.DistinctMaintain.view(merged, grp)
        .collect().map(_.toSeq).toSet
      // fresh view from scratch over an equivalent multiset: apply the
      // same signed edits to the base multiset imperatively
      val edited = base.select($"g", $"v").collect()
        .map(r => (r.getString(0), r.getLong(1))).toBuffer
      edited -= (("g1", 5L)); edited -= (("g2", 7L))
      edited += (("g1", 99L)); edited += (("g2", 41L))
      val freshView = edited.groupBy(_._1).map { case (g, vs) =>
        Seq(g, vs.map(_._2).distinct.size.toLong, vs.map(_._2).min,
          vs.map(_._2).max)
      }.toSet
      assert(got == freshView)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.enabled")
      spark.sql("DROP TABLE IF EXISTS dm_aux")
    }
  }
}
