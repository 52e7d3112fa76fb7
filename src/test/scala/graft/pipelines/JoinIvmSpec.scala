package graft.pipelines

import graft.lake.{LakeTable, TableMeta, Timeline}
import graft.util.Sessions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The bilateral join-IVM algebra: `state ⊕ delta(a→b) = fresh join` at
  * EVERY advance, including updates that move the join key and deletes
  * on either side.
  */
class JoinIvmSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Sessions.local("join-ivm-test", "4")
  import spark.implicits._

  override def afterAll(): Unit = spark.stop()

  private def mkTable(name: String, keys: Seq[String]): LakeTable = {
    val work = Files.createTempDirectory("graft_jivm").toString
    LakeTable.create(spark, s"$work/t",
      TableMeta(name, keys, "ts", Seq.empty, "cow", keyEncoding = "padded"))
  }

  private val outCols = Seq("id", "k", "av", "bv")

  private def fresh(a: LakeTable, b: LakeTable): Array[(Long, Long, String, String)] =
    JoinMaintain.fullState(a.snapshot(), b.snapshot(), "k", "bk", outCols)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("k"),
        r.getAs[String]("av"), r.getAs[String]("bv")))
      .sorted

  private def asRows(df: DataFrame): Array[(Long, Long, String, String)] = {
    val rows = df.collect()
    rows.foreach(r => assert(r.getAs[Long]("cnt") == 1L))
    rows.map(r => (r.getAs[Long]("id"), r.getAs[Long]("k"),
      r.getAs[String]("av"), r.getAs[String]("bv"))).sorted
  }

  test("maintained state tracks the fresh join across key moves and deletes") {
    val a = mkTable("jivm_a", Seq("id"))
    val b = mkTable("jivm_b", Seq("bk"))
    // commit 1: three A rows over two B keys
    val ca1 = a.upsert(Seq((1L, 10L, "a1", 1L), (2L, 10L, "a2", 1L),
      (3L, 20L, "a3", 1L)).toDF("id", "k", "av", "ts"), combine = false)
    val cb1 = b.upsert(Seq((10L, "b10", 1L), (20L, "b20", 1L), (30L, "b30", 1L))
      .toDF("bk", "bv", "ts"), combine = false)
    var state = JoinMaintain.advance(
      JoinMaintain.emptyState(a.snapshot(), b.snapshot(), "k", "bk", outCols),
      a, b, Timeline.Earliest, ca1, Timeline.Earliest, cb1,
      "k", "bk", outCols).localCheckpoint()
    assert(asRows(state).toSeq == fresh(a, b).toSeq)
    // commit 2: A row 2 MOVES its join key 10→30; A row 3 deleted;
    // B rewrites bv on key 10 and deletes key 20
    val ca2a = a.upsert(Seq((2L, 30L, "a2", 2L)).toDF("id", "k", "av", "ts"),
      combine = false)
    val ca2 = { a.delete(Seq(3L).toDF("id")); a.latestCommit.get }
    val cb2a = b.upsert(Seq((10L, "b10x", 2L)).toDF("bk", "bv", "ts"),
      combine = false)
    b.delete(Seq(20L).toDF("bk"))
    val cb2 = b.latestCommit.get
    state = JoinMaintain.advance(state, a, b, ca1, ca2, cb1, cb2,
      "k", "bk", outCols).localCheckpoint()
    val got = asRows(state)
    assert(got.toSeq == fresh(a, b).toSeq)
    // the moved row joins its NEW key's B row; the deleted rows are gone
    assert(got.toSeq == Seq((1L, 10L, "a1", "b10x"), (2L, 30L, "a2", "b30")))
    // a third no-change advance is a no-op
    val state3 = JoinMaintain.advance(state, a, b, ca2, ca2, cb2, cb2,
      "k", "bk", outCols)
    assert(asRows(state3).toSeq == got.toSeq)
  }

  test("persisted generations: bootstrap, incremental advance, replay no-op") {
    val a = mkTable("jivm_a3", Seq("id"))
    val b = mkTable("jivm_b3", Seq("bk"))
    val stateDir = Files.createTempDirectory("graft_jivm_state").toString + "/st"
    a.upsert(Seq((1L, 10L, "a1", 1L), (2L, 20L, "a2", 1L))
      .toDF("id", "k", "av", "ts"), combine = false)
    b.upsert(Seq((10L, "b10", 1L), (20L, "b20", 1L)).toDF("bk", "bv", "ts"),
      combine = false)
    // bootstrap generation = fresh join
    val w1 = JoinMaintain.advancePersisted(spark, a, b, stateDir,
      "k", "bk", outCols)
    assert(w1.isDefined)
    val (st1, _) = JoinMaintain.current(spark, stateDir).get
    assert(asRows(st1).toSeq == fresh(a, b).toSeq)
    // replay with no new commits: watermarks unchanged, state unchanged
    assert(JoinMaintain.advancePersisted(spark, a, b, stateDir,
      "k", "bk", outCols) == w1)
    assert(asRows(JoinMaintain.current(spark, stateDir).get._1).toSeq ==
      fresh(a, b).toSeq)
    // new commits on both sides fold incrementally into the next gen
    a.upsert(Seq((3L, 20L, "a3", 2L)).toDF("id", "k", "av", "ts"),
      combine = false)
    b.upsert(Seq((10L, "b10x", 2L)).toDF("bk", "bv", "ts"), combine = false)
    val w2 = JoinMaintain.advancePersisted(spark, a, b, stateDir,
      "k", "bk", outCols)
    assert(w2.isDefined && w2 != w1)
    val (st2, _) = JoinMaintain.current(spark, stateDir).get
    assert(asRows(st2).toSeq == fresh(a, b).toSeq)
    assert(asRows(st2).exists(_._3 == "a3"))
  }

  test("randomized op sequences: maintained state equals fresh join after every advance") {
    val rnd = new scala.util.Random(42)
    val a = mkTable("jivm_a4", Seq("id"))
    val b = mkTable("jivm_b4", Seq("bk"))
    val keys = Seq(10L, 20L, 30L, 40L)
    var ts = 0L
    def nextTs(): Long = { ts += 1; ts }
    var aFrom = Timeline.Earliest; var bFrom = Timeline.Earliest
    var state = {
      // seed one row each so emptyState has a schema source
      a.upsert(Seq((100L, 10L, "seed", nextTs()))
        .toDF("id", "k", "av", "ts"), combine = false)
      b.upsert(Seq((10L, "bseed", nextTs())).toDF("bk", "bv", "ts"),
        combine = false)
      JoinMaintain.emptyState(a.snapshot(), b.snapshot(), "k", "bk", outCols)
    }
    def freshMultiset(): Map[(Long, Long, String, String), Long] =
      JoinMaintain.fullState(a.snapshot(), b.snapshot(), "k", "bk", outCols)
        .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("k"),
          r.getAs[String]("av"), r.getAs[String]("bv")) ->
          r.getAs[Long]("cnt")).toMap
    def stateMultiset(df: DataFrame): Map[(Long, Long, String, String), Long] =
      df.collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("k"),
        r.getAs[String]("av"), r.getAs[String]("bv")) ->
        r.getAs[Long]("cnt")).toMap
    for (round <- 1 to 4) {
      // random A batch: upserts (possibly moving keys) + a delete of a live id
      val ups = (0 until 1 + rnd.nextInt(4)).map { _ =>
        (rnd.nextInt(8).toLong, keys(rnd.nextInt(keys.length)),
          s"v${rnd.nextInt(100)}", nextTs())
      }
      a.upsert(ups.toDF("id", "k", "av", "ts"), combine = true)
      if (rnd.nextBoolean()) {
        val live = a.snapshot().select("id").collect().map(_.getLong(0))
        if (live.nonEmpty)
          a.delete(Seq(live(rnd.nextInt(live.length))).toDF("id"))
      }
      val ca = a.latestCommit.get
      // random B batch: rewrite values on random keys + occasional delete
      val bups = (0 until 1 + rnd.nextInt(3)).map { _ =>
        (keys(rnd.nextInt(keys.length)), s"b${rnd.nextInt(100)}", nextTs())
      }
      b.upsert(bups.toDF("bk", "bv", "ts"), combine = true)
      if (rnd.nextInt(3) == 0) {
        val live = b.snapshot().select("bk").collect().map(_.getLong(0))
        if (live.nonEmpty)
          b.delete(Seq(live(rnd.nextInt(live.length))).toDF("bk"))
      }
      val cb = b.latestCommit.get
      state = JoinMaintain.advance(state, a, b, aFrom, ca, bFrom, cb,
        "k", "bk", outCols).localCheckpoint()
      aFrom = ca; bFrom = cb
      assert(stateMultiset(state) == freshMultiset(), s"round $round")
    }
  }

  test("streaming: either side's CDC stream keeps the joined view current") {
    val a = mkTable("jivm_sa", Seq("id"))
    val b = mkTable("jivm_sb", Seq("bk"))
    val base = Files.createTempDirectory("graft_jivm_strm").toString
    val stateDir = s"$base/state"
    a.upsert(Seq((1L, 10L, "a1", 1L), (2L, 20L, "a2", 1L))
      .toDF("id", "k", "av", "ts"), combine = false)
    b.upsert(Seq((10L, "b10", 1L), (20L, "b20", 1L))
      .toDF("bk", "bv", "ts"), combine = false)
    val q = JoinMaintain.runStream(spark, a.path, b.path, stateDir,
      "k", "bk", outCols, s"$base/ckpt")
    try {
      q.processAllAvailable()
      assert(asRows(JoinMaintain.current(spark, stateDir).get._1).toSeq ==
        fresh(a, b).toSeq)
      // a B-side-only change must also trigger an advance
      b.upsert(Seq((20L, "b20x", 2L)).toDF("bk", "bv", "ts"),
        combine = false)
      q.processAllAvailable()
      assert(asRows(JoinMaintain.current(spark, stateDir).get._1).toSeq ==
        fresh(a, b).toSeq)
      // and an A-side key move in the same steady state
      a.upsert(Seq((1L, 20L, "a1", 2L)).toDF("id", "k", "av", "ts"),
        combine = false)
      q.processAllAvailable()
      val got = asRows(JoinMaintain.current(spark, stateDir).get._1)
      assert(got.toSeq == fresh(a, b).toSeq)
      assert(got.toSeq == Seq((1L, 20L, "a1", "b20x"),
        (2L, 20L, "a2", "b20x")))
    } finally q.stop()
  }

  test("duplicate joined rows carry multiplicities, retractions decrement them") {
    val a = mkTable("jivm_a2", Seq("id"))
    val b = mkTable("jivm_b2", Seq("bk"))
    // two identical (k, av) rows under different ids produce cnt tracking
    val outDup = Seq("k", "av", "bv") // project ids away → multiset counts
    val ca1 = a.upsert(Seq((1L, 10L, "same", 1L), (2L, 10L, "same", 1L))
      .toDF("id", "k", "av", "ts"), combine = false)
    val cb1 = b.upsert(Seq((10L, "b10", 1L)).toDF("bk", "bv", "ts"),
      combine = false)
    var state = JoinMaintain.advance(
      JoinMaintain.emptyState(a.snapshot(), b.snapshot(), "k", "bk", outDup),
      a, b, Timeline.Earliest, ca1, Timeline.Earliest, cb1,
      "k", "bk", outDup).localCheckpoint()
    val s1 = state.collect()
    assert(s1.length == 1 && s1.head.getAs[Long]("cnt") == 2L)
    // delete one of the twins → cnt decrements to 1, row survives
    a.delete(Seq(2L).toDF("id"))
    val ca2 = a.latestCommit.get
    state = JoinMaintain.advance(state, a, b, ca1, ca2, cb1, cb1,
      "k", "bk", outDup)
    val s2 = state.collect()
    assert(s2.length == 1 && s2.head.getAs[Long]("cnt") == 1L)
  }
}
