package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Multi-writer optimistic concurrency: in-flight instant reservations,
  * write-set conflict detection, and consumption monotonicity.
  *
  * The model (Hudi multi-writer OCC, re-expressed on the lake timeline):
  *  - an optimistic writer RESERVES its instant up front (marker under
  *    `_lake/timeline/inflight/`), runs its job with no lock held, and
  *    publishes under the lock only if no commit that completed after its
  *    plan-time snapshot overlaps its write-set;
  *  - locked writers number strictly above every live reservation;
  *  - incremental consumers never advance past a live reservation, so a
  *    commit that publishes "out of order" (its instant below an already
  *    published one) is never skipped;
  *  - a crashed writer's reservation goes stale and stops blocking.
  */
class MultiWriterSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val base =
    java.nio.file.Files.createTempDirectory("multiwriter").toString

  lazy val spark: SparkSession = graft.util.Sessions
    .builder("multiwriter-test")
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def newTable(name: String,
      partitionFields: Seq[String] = Seq.empty,
      indexScope: String = "global"): LakeTable =
    LakeTable.create(spark, s"$base/$name",
      TableMeta(name, Seq("id"), "ts", partitionFields = partitionFields,
        tableType = "cow", indexScope = indexScope))

  private def df(rows: (Int, Long, Double)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("id", "ts", "v")
  }

  /** Stage delta rows as a task writer would; returns staged paths. */
  private def stage(t: LakeTable, staging: Path,
      rows: Seq[(Int, Long, Double, String, String)],
      partition: Option[(String, String)] = None): Seq[Path] = {
    val s = spark
    import s.implicits._
    val dir = partition match {
      case Some((c, v)) => new Path(staging, s"$c=$v")
      case None         => staging
    }
    rows.map { case (id, ts, v, key, instant) => (id, ts, v, key, instant, false) }
      .toDF("id", "ts", "v", "_record_key", "_commit_time", "_deleted")
      .coalesce(1).write.parquet(dir.toString)
    val fs = staging.getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(dir).toSeq.map(_.getPath)
      .filter(_.getName.endsWith(".parquet"))
  }

  test("locked writers number strictly above a live reservation") {
    val t = newTable("numbering")
    t.insert(df((1, 10L, 1.0)))
    val reserved = t.rowLevelBegin()
    // a locked upsert while the reservation is live must not collide
    t.upsert(df((2, 10L, 2.0)))
    val all = t.timeline.instants()
    assert(!all.contains(reserved), "reserved instant not yet committed")
    assert(all.last > reserved, "locked writer numbered above the reservation")
    t.rowLevelAbort(reserved, t.rowLevelStaging(reserved))
  }

  test("incremental consumers never advance past a pending writer") {
    val t = newTable("monotonic")
    t.insert(df((1, 10L, 1.0)))
    val base = t.latestCommit.get

    val visible = t.committedInstants()
    val pending = t.rowLevelBegin() // writer A: reserved, job "running"
    val staging = t.rowLevelStaging(pending)
    t.upsert(df((2, 10L, 2.0))) // writer B publishes FIRST (later instant)

    // consumer watermark is capped below A: B's commit is not yet stable
    assert(t.latestCommit.get == base,
      "stable watermark must not advance past the pending writer")
    assert(t.incremental(base).count() == 0)

    // A publishes (disjoint key 3) → everything unblocks, nothing skipped
    val files = stage(t, staging, Seq((3, 10L, 3.0, "3", pending)))
    t.rowLevelCommit(pending, staging, files, "merge", visible)
    val end = t.latestCommit.get
    assert(end > pending, "stable watermark past both commits")
    val got = t.incremental(base, end).select("id").collect()
      .map(_.getInt(0)).toSet
    assert(got == Set(2, 3), s"consumer sees BOTH commits, got $got")
  }

  test("partition-scoped index: writers to different partitions do not conflict") {
    val t = newTable("partscope", partitionFields = Seq("p"),
      indexScope = "partition")
    val s = spark
    import s.implicits._
    def pdf(rows: (Int, Long, Double, String)*) =
      rows.toDF("id", "ts", "v", "p")
    t.insert(pdf((1, 10L, 1.0, "a"), (1, 10L, 1.0, "b")))

    val visible = t.committedInstants()
    val pending = t.rowLevelBegin()
    val staging = t.rowLevelStaging(pending)
    // concurrent writer updates partition b — SAME user key value 1
    t.upsert(pdf((1, 20L, 9.0, "b")))
    // our statement wrote partition a (key embeds the partition prefix)
    val files = stage(t, staging,
      Seq((1, 20L, 5.0, "a|1", pending)), partition = Some(("p", "a")))
    t.rowLevelCommit(pending, staging, files, "merge", visible)
    val got = t.snapshotUser().orderBy("p").collect()
      .map(r => (r.getAs[String]("p"), r.getAs[Double]("v"))).toSeq
    assert(got == Seq(("a", 5.0), ("b", 9.0)))
  }

  test("OCC upsert: overlapping publish aborts, disjoint publishes") {
    val t = newTable("occupsert")
    t.upsert(df((1, 10L, 1.0), (2, 10L, 2.0)))
    // stale plan-time snapshot + a concurrent overlapping commit → the
    // publish-time write-set gate must abort
    val visible = t.committedInstants()
    t.upsert(df((2, 20L, 22.0))) // concurrent writer touches key 2
    val i1 = t.timeline.reserveInstant()
    try intercept[java.util.ConcurrentModificationException] {
      t.upsertReserved(df((2, 30L, 99.0)), Map.empty, combine = true,
        i1, visible)
    } finally t.timeline.releaseReservation(i1)
    // nothing from the aborted attempt is visible
    assert(t.snapshotUser().where("id = 2").head().getAs[Double]("v") == 22.0)
    // a DISJOINT write under the same stale snapshot publishes fine
    val i2 = t.timeline.reserveInstant()
    try t.upsertReserved(df((7, 10L, 7.0)), Map.empty, combine = true,
      i2, visible)
    finally t.timeline.releaseReservation(i2)
    assert(t.snapshotUser().count() == 3)
    // ... and the plain API converges after a caller retry
    t.upsert(df((2, 30L, 99.0)))
    assert(t.snapshotUser().where("id = 2").head().getAs[Double]("v") == 99.0)
  }

  test("concurrent same-key COW upserts with retry converge exactly") {
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    val t = newTable("occrace")
    t.upsert(df((1, 1L, 1.0)))
    val aborts = new java.util.concurrent.atomic.AtomicInteger
    val futures = (1 to 4).map { k =>
      Future {
        val tk = LakeTable.load(spark, s"$base/occrace")
        for (r <- 1 to 3) {
          val ts = (k * 10 + r).toLong
          var done = false
          var attempts = 0
          while (!done) {
            try { tk.upsert(df((1, ts, ts.toDouble))); done = true }
            catch {
              case _: java.util.ConcurrentModificationException =>
                aborts.incrementAndGet()
                attempts += 1
                assert(attempts < 30, "livelock: conflict retries exhausted")
            }
          }
        }
      }
    }
    Await.result(Future.sequence(futures), 180.seconds)
    val t2 = LakeTable.load(spark, s"$base/occrace")
    // every successful upsert committed exactly once; precombine picks
    // the deterministic winner regardless of publication interleaving
    assert(t2.timeline.instants().size == 1 + 12)
    val row = t2.snapshotUser().collect()
    assert(row.length == 1)
    assert(row(0).getAs[Long]("ts") == 43L &&
      row(0).getAs[Double]("v") == 43.0)
  }

  test("restore during an optimistic write aborts its publish") {
    val t = newTable("restore1")
    val c1 = t.upsert(df((1, 10L, 1.0)))
    t.upsert(df((2, 20L, 2.0)))
    val visible = t.committedInstants() // plan sees both commits
    val instant = t.timeline.reserveInstant()
    try {
      t.restore(c1) // admin rolls back mid-operation
      intercept[java.util.ConcurrentModificationException] {
        t.upsertReserved(df((9, 30L, 9.0)), Map.empty, combine = true,
          instant, visible)
      }
    } finally t.timeline.releaseReservation(instant)
    // the rolled-back state is intact, nothing resurrected
    assert(t.snapshotUser().collect().map(_.getAs[Int]("id")).toSeq == Seq(1))
  }

  test("publish aborts when the writer's reservation was swept mid-flight") {
    val t = newTable("sweptpub")
    t.insert(df((1, 10L, 1.0)))
    val visible = t.committedInstants()
    val instant = t.timeline.reserveInstant()
    // a peer sweeps the reservation while this writer is paused (GC pause
    // past the staleness window) — consumers may now advance past it
    val fs = new Path(base).getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new Path(s"$base/sweptpub/_lake/timeline/inflight/" +
      s"$instant${Timeline.InflightSuffix}"), false)
    try intercept[java.util.ConcurrentModificationException] {
      t.upsertReserved(df((2, 20L, 2.0)), Map.empty, combine = true,
        instant, visible)
    } finally t.timeline.releaseReservation(instant)
    // nothing from the aborted attempt is visible; a retry converges
    assert(t.snapshotUser().count() == 1)
    t.upsert(df((2, 20L, 2.0)))
    assert(t.snapshotUser().count() == 2)
  }

  test("renewal recreates the marker but never resurrects a swept one") {
    val t = newTable("renew")
    t.insert(df((1, 10L, 1.0)))
    val instant = t.timeline.reserveInstant()
    val fs = new Path(base).getFileSystem(spark.sessionState.newHadoopConf())
    val marker = new Path(s"$base/renew/_lake/timeline/inflight/" +
      s"$instant${Timeline.InflightSuffix}")
    // live marker: renewal rewrites it (works where setTimes does not)
    t.timeline.renewReservation(instant)
    assert(fs.exists(marker) && t.timeline.reservationLive(instant))
    // swept marker: renewal must NOT bring it back — consumers may have
    // advanced while it was gone — and liveness stays false even if some
    // outside actor recreates the file
    fs.delete(marker, false)
    t.timeline.renewReservation(instant)
    assert(!fs.exists(marker), "swept reservation not resurrected")
    assert(!t.timeline.reservationLive(instant))
    fs.create(marker, true).close()
    assert(!t.timeline.reservationLive(instant),
      "once observed swept, a reservation is dead for good")
    t.timeline.releaseReservation(instant)
  }

  test("commit is fenced: a broken-and-replaced writer lock aborts the publish") {
    val t = newTable("fence")
    t.insert(df((1, 10L, 1.0)))
    val fs = new Path(base).getFileSystem(spark.sessionState.newHadoopConf())
    val lock = new Path(s"$base/fence/_lake/lock")
    // inside our own critical section, a peer breaks the (apparently
    // stale) lock and installs its own token — the lease-fencing race a
    // paused writer hits on wake; the publish must abort, not bypass the
    // replacement's conflict checks
    intercept[java.util.ConcurrentModificationException] {
      t.timeline.withLock() {
        fs.delete(lock, false)
        val out = fs.create(lock, true)
        out.write("intruder-token".getBytes("UTF-8"))
        out.close()
        t.timeline.commit(CommitMeta(t.timeline.nextInstant(), "upsert",
          Seq.empty, Seq.empty))
      }
    }
    // the fenced-out writer's release leaves the intruder's lock alone
    assert(fs.exists(lock))
    fs.delete(lock, false) // free it for the assertions below
    assert(t.snapshotUser().count() == 1, "fenced publish left nothing")
    t.upsert(df((2, 20L, 2.0))) // the table keeps working
    assert(t.snapshotUser().count() == 2)
  }

  test("a reservation that went stale on disk is dead even if its marker survives") {
    val t = newTable("stalepause")
    t.insert(df((1, 10L, 1.0)))
    val visible = t.committedInstants()
    val instant = t.timeline.reserveInstant()
    val fs = new Path(base).getFileSystem(spark.sessionState.newHadoopConf())
    val marker = new Path(s"$base/stalepause/_lake/timeline/inflight/" +
      s"$instant${Timeline.InflightSuffix}")
    // simulate a writer paused past the staleness window: the marker is
    // still on disk but its mtime is ancient — consumers filter pending
    // reservations by MTIME, so they may already have advanced past it;
    // refreshing the mtime after the fact cannot restore safety
    val old = System.currentTimeMillis() - (Timeline.InflightStaleMs + 60000L)
    fs.setTimes(marker, old, -1)
    assert(!t.timeline.reservationLive(instant),
      "a stale-on-disk reservation must not count as live")
    try intercept[java.util.ConcurrentModificationException] {
      t.upsertReserved(df((2, 20L, 2.0)), Map.empty, combine = true,
        instant, visible)
    } finally t.timeline.releaseReservation(instant)
    assert(t.snapshotUser().count() == 1, "aborted publish left nothing")
    // a renewal that finds its marker stale records the sweep and
    // deletes the corpse instead of resurrecting it with a fresh mtime
    val i2 = t.timeline.reserveInstant()
    val m2 = new Path(s"$base/stalepause/_lake/timeline/inflight/" +
      s"$i2${Timeline.InflightSuffix}")
    fs.setTimes(m2, old, -1)
    t.timeline.renewReservation(i2)
    assert(!fs.exists(m2), "stale marker deleted, not refreshed")
    assert(!t.timeline.reservationLive(i2))
    t.timeline.releaseReservation(i2)
  }

  test("stale reservation stops blocking and is swept") {
    val t = newTable("stale")
    t.insert(df((1, 10L, 1.0)))
    val before = Timeline.InflightStaleMs
    try {
      val pending = t.rowLevelBegin()
      assert(t.timeline.pendingInstants() == Seq(pending))
      Timeline.InflightStaleMs = 1L // everything is now stale
      Thread.sleep(5)
      assert(t.timeline.pendingInstants().isEmpty,
        "stale reservation ignored by consumers")
      assert(t.latestCommit.isDefined, "watermark no longer capped")
      // the next reservation sweeps the corpse (still inside the tiny
      // staleness window, so the old marker qualifies for the sweep)
      val next = t.rowLevelBegin()
      Timeline.InflightStaleMs = before
      assert(next > pending)
      assert(t.timeline.pendingInstants() == Seq(next))
      t.rowLevelAbort(next, t.rowLevelStaging(next))
    } finally Timeline.InflightStaleMs = before
  }
}
