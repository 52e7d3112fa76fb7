package graft.lake

import graft.util.Sessions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Path => JPath, Paths}
import java.nio.file.attribute.FileTime

/** Crash injection for the async compaction service: a probe JVM armed
  * with `-Dgraft.lake.crashpoint=...` is HALTED mid-compaction (exit
  * 137, no finally blocks, writer lock still on disk) at each boundary
  * of the stage → rename → commit sequence. The surviving session must
  * see exactly the committed data (the un-committed compaction is
  * invisible either way), break the dead writer's lock as stale, sweep
  * the crash residue via the cleanup_orphans surfaces, and compact
  * successfully afterwards.
  */
class CrashRecoverySpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Sessions.local("crash-recovery-test", "4")

  override def afterAll(): Unit = spark.stop()

  private def df(rows: (Int, Long, String, Double)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("id", "ts", "part", "v")
  }

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar")
    .flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private def runProbe(tableDir: String, crashpoint: Option[String],
      extraArgs: Seq[String] = Seq.empty): (Int, String) = {
    val classDir = new java.io.File("target/scala-2.13/classes").getAbsolutePath
    val cp = s"$classDir:/opt/spark/jars/*"
    val crashProp = crashpoint.map(c => s"-Dgraft.lake.crashpoint=$c").toSeq
    val p = new ProcessBuilder(
      (Seq("java", "-cp", cp, "-Xmx2g", "-Dspark.ui.enabled=false") ++
        crashProp ++ addOpens ++
        Seq("graft.tools.CrashProbe", tableDir, "4", "10") ++
        extraArgs): _*)
      .redirectErrorStream(true).start()
    val out = new String(p.getInputStream.readAllBytes())
    (p.waitFor(), out)
  }

  /** The probe died holding `_lake/lock`; age it past the stale window so
    * the next writer's breakIfStale takes it over (the real recovery
    * path, just without waiting ten minutes of wall clock).
    */
  private def ageLock(tableDir: String): Unit = {
    val lock = Paths.get(tableDir, "_lake", "lock")
    assert(Files.exists(lock), "dead probe should have left the writer lock")
    Files.setLastModifiedTime(lock,
      FileTime.fromMillis(System.currentTimeMillis() - 11 * 60 * 1000L))
  }

  private def stagingDirs(tableDir: String): Seq[JPath] = {
    val root = Paths.get(tableDir, "_lake", "staging")
    if (!Files.exists(root)) Seq.empty
    else {
      val s = Files.list(root)
      try {
        val it = s.iterator()
        val buf = scala.collection.mutable.ArrayBuffer[JPath]()
        while (it.hasNext) buf += it.next()
        buf.toSeq
      } finally s.close()
    }
  }

  private def crashCase(crashpoint: String): Unit = {
    val work = Files.createTempDirectory("crashprobe")
    val tableDir = work.resolve("t").toString
    val t = LakeTable.create(spark, tableDir,
      TableMeta("cr", Seq("id"), "ts", Seq("part"), tableType = "mor",
        inlineCompactMax = 2, asyncCompact = true))
    t.upsert(df((1, 1L, "p0", 0.0))) // capture schema before spawning

    val (code, out) = runProbe(tableDir, Some(crashpoint))
    assert(code == 137,
      s"probe should be halted at $crashpoint, exit=$code, " +
        s"output: ${out.takeRight(2000)}")

    // residue proves the crash landed where it was aimed
    if (crashpoint == "compact.staged")
      assert(stagingDirs(tableDir).nonEmpty,
        "halt before the rename should leave a staging dir")

    // the un-committed compaction is invisible: every committed row is
    // intact and internally consistent (v was written as ts*100 + i), and
    // the timeline carries no compact instant
    val t2 = LakeTable.load(spark, tableDir)
    val rows = t2.snapshot()
      .select("id", "ts", "v").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(rows.size == 1 + 10, s"expected seed + 10 probe keys, got $rows")
    rows.filter(_._1 >= 1000).foreach { case (id, ts, v) =>
      assert(v == ts * 100 + (id - 1000), s"torn row: id=$id ts=$ts v=$v")
    }
    assert(!t2.timeline.instants().map(t2.timeline.read)
      .exists(_.operation == "compact"),
      "the halted compaction must not have committed")

    // recovery: break the dead writer's lock as stale, sweep the residue
    ageLock(tableDir)
    val swept =
      t2.cleanOrphanedStaging(olderThanMs = 0L) + t2.cleanOrphanedData()
    assert(swept >= 1, s"crash residue should be swept, got $swept")
    assert(stagingDirs(tableDir).isEmpty)

    // and the table is fully operational: writes, compaction, reads
    t2.upsert(df((2, 2L, "p0", 9.0)))
    t2.awaitTableServices() // async debt policy may fire; let it finish
    assert(t2.compact().isDefined || // explicit full compact merges deltas
      !t2.timeline.liveFiles().exists(_.isDelta))
    val merged = t2.snapshot().orderBy("id").drop("_commit_time").collect().toSeq
    val ro = t2.readOptimized().orderBy("id").drop("_commit_time").collect().toSeq
    assert(merged == ro, "after compaction read-optimized must equal snapshot")
    ()
  }

  test("JVM halt between compaction staging and rename recovers cleanly") {
    crashCase("compact.staged")
  }

  test("JVM halt between compaction rename and commit recovers cleanly") {
    crashCase("compact.renamed")
  }

  test("JVM halt between upsert rename and commit: reservation caps consumers until swept") {
    val work = Files.createTempDirectory("crashprobe")
    val tableDir = work.resolve("t").toString
    val t = LakeTable.create(spark, tableDir,
      TableMeta("crc", Seq("id"), "ts", Seq("part"))) // COW, no services
    t.upsert(df((1, 1L, "p0", 0.0)))
    val seedInstant = t.latestCommit.get

    val (code, out) = runProbe(tableDir, Some("publish.renamed"))
    assert(code == 137,
      s"probe should be halted mid-publish, exit=$code, " +
        s"output: ${out.takeRight(2000)}")

    // the crashed write renamed its files into place but never committed:
    // invisible to every reader, and its inflight reservation survives
    val t2 = LakeTable.load(spark, tableDir)
    assert(t2.snapshot().count() == 1)
    assert(t2.timeline.instants() == Seq(seedInstant))
    val inflight = Paths.get(tableDir, "_lake", "timeline", "inflight")
    val markers = {
      val s = Files.list(inflight)
      try {
        val it = s.iterator()
        val buf = scala.collection.mutable.ArrayBuffer[JPath]()
        while (it.hasNext) buf += it.next()
        buf.toSeq.filter(_.getFileName.toString.endsWith(".inflight"))
      } finally s.close()
    }
    assert(markers.nonEmpty, "dead writer should have left its reservation")

    // recovery: break the dead writer's lock, sweep the renamed-but-
    // never-committed data files, write again
    ageLock(tableDir)
    assert(t2.cleanOrphanedData() >= 1,
      "the crashed publish left final-named files no commit references")
    t2.upsert(df((2, 2L, "p0", 9.0)))
    assert(t2.snapshot().count() == 2)

    // the dead reservation still caps the consumers' stable watermark
    // below the new commit — exactly the lost-commit protection: until
    // the reservation is known stale, a consumer must not advance past
    // the instant a (possibly alive) writer could still publish at
    assert(t2.timeline.stableInstant().contains(seedInstant),
      "a live-looking reservation must cap the stable watermark")
    // once the marker goes stale (backdate instead of waiting 30 min),
    // consumers advance to the real latest commit
    markers.foreach(m => Files.setLastModifiedTime(m,
      FileTime.fromMillis(System.currentTimeMillis() - 31 * 60 * 1000L)))
    assert(t2.timeline.stableInstant() == t2.latestCommit,
      "stale reservation must stop capping the stable watermark")
  }

  test("JVM halt between archive checkpoint and the moves recovers cleanly") {
    val work = Files.createTempDirectory("crashprobe")
    val tableDir = work.resolve("t").toString
    val t = LakeTable.create(spark, tableDir,
      TableMeta("cra", Seq("id"), "ts", Seq("part"))) // COW, no services
    t.upsert(df((1, 1L, "p0", 0.0)))

    val (code, out) = runProbe(tableDir, Some("archive.checkpointed"),
      extraArgs = Seq("2")) // ingest 4 commits, then archive keep=2
    assert(code == 137,
      s"probe should be halted mid-archive, exit=$code, " +
        s"output: ${out.takeRight(2000)}")

    // the checkpoint published but the originals were never moved:
    // superseded commit files coexist with it in the active dir
    val tlDir = Paths.get(tableDir, "_lake", "timeline")
    def names: Seq[String] = {
      val s = Files.list(tlDir)
      try {
        val it = s.iterator()
        val buf = scala.collection.mutable.ArrayBuffer[String]()
        while (it.hasNext) buf += it.next().getFileName.toString
        buf.toSeq
      } finally s.close()
    }
    val ckpts = names.filter(_.endsWith(".checkpoint.json"))
    assert(ckpts.nonEmpty, "crash happened after the checkpoint published")
    val boundary = ckpts.max.stripSuffix(".checkpoint.json")
    assert(names.exists(n => n.endsWith(".commit.json") &&
      n.stripSuffix(".commit.json") <= boundary),
      "crash left superseded originals in the active dir")

    // the timeline view already ignores the stragglers — reads are
    // consistent with the full committed history
    val t2 = LakeTable.load(spark, tableDir)
    assert(t2.snapshot().count() == 1 + 10)
    assert(t2.timeline.read(boundary).operation == "archive-checkpoint")

    // recovery: break the dead archiver's lock; the next archive run
    // sweeps the stragglers into the cold store without rewriting the
    // checkpoint, and nothing about the table state changes
    ageLock(tableDir)
    t2.archiveTimeline(keepCommits = 2)
    assert(!names.exists(n => n.endsWith(".commit.json") &&
      n.stripSuffix(".commit.json") <= boundary),
      "re-archive sweeps the superseded originals")
    val cold = Paths.get(tableDir, "_lake", "timeline", "archive")
    assert(Files.list(cold).count() >= 3, "originals landed in the cold store")
    assert(t2.snapshot().count() == 1 + 10)
    t2.upsert(df((2, 2L, "p0", 9.0))) // and the table keeps working
    assert(t2.snapshot().count() == 2 + 10)
  }

  test("concurrent writers survive a peer crashing mid-publish with the lock held") {
    val work = Files.createTempDirectory("crashprobe")
    val tableDir = work.resolve("t").toString
    val t = LakeTable.create(spark, tableDir,
      TableMeta("crx", Seq("id"), "ts", Seq("part")))
    t.upsert(df((1, 1L, "p0", 0.0)))
    val classDir = new java.io.File("target/scala-2.13/classes").getAbsolutePath
    val cp = s"$classDir:/opt/spark/jars/*"
    // shrink the lock lease so survivors reclaim the dead holder's lock
    // in seconds instead of the 10-minute production default
    val lockProp = "-Dgraft.lake.lock.staleMs=5000"
    def spawn(main: String, extra: Seq[String], props: Seq[String]): Process =
      new ProcessBuilder(
        (Seq("java", "-cp", cp, "-Xmx2g", "-Dspark.ui.enabled=false",
          lockProp) ++ props ++ addOpens ++ Seq(main, tableDir) ++ extra): _*)
        .redirectErrorStream(true).start()
    // keys: crasher 1000-1009 (contributes NOTHING - it dies on its
    // first publish); survivors 2000-2019 / 3000-3019, 3 rounds each
    val crasher = spawn("graft.tools.CrashProbe", Seq("4", "10"),
      Seq("-Dgraft.lake.crashpoint=publish.renamed"))
    val survivors = Seq(
      spawn("graft.tools.UpsertProbe", Seq("2", "3", "20"), Seq.empty),
      spawn("graft.tools.UpsertProbe", Seq("3", "3", "20"), Seq.empty))
    val crasherOut = new String(crasher.getInputStream.readAllBytes())
    assert(crasher.waitFor() == 137,
      s"crasher should halt mid-publish: ${crasherOut.takeRight(1500)}")
    survivors.foreach { pr =>
      val out = new String(pr.getInputStream.readAllBytes())
      assert(pr.waitFor() == 0,
        s"survivor must complete despite the dead holder's lock: " +
          s"${out.takeRight(3000)}")
    }
    // exact final state: both survivors' full workloads landed, the
    // crashed writer's keys never became visible, commit count exact
    val t2 = LakeTable.load(spark, tableDir)
    val rows = t2.snapshot().select("id", "ts", "v").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(rows.size == 1 + 40, s"got ${rows.size} rows: $rows")
    assert(!rows.exists(r => r._1 >= 1000 && r._1 < 2000),
      "the crashed writer's keys must not be visible")
    rows.filter(_._1 >= 2000).foreach { case (id, ts, v) =>
      assert(ts == 3L && v == 300.0 + id % 1000, s"key $id: ts=$ts v=$v")
    }
    assert(t2.timeline.instants().size == 1 + 6)
    // crash residue (renamed-but-uncommitted files) sweeps; use the
    // shortened lease in this JVM too in case the dead holder's lock
    // was never contended and still sits on disk
    val before = Timeline.LockStaleMs
    Timeline.LockStaleMs = 5000
    try assert(t2.cleanOrphanedData() >= 1)
    finally Timeline.LockStaleMs = before
  }

  test("unarmed probe completes: async compaction commits and exits 0") {
    val work = Files.createTempDirectory("crashprobe")
    val tableDir = work.resolve("t").toString
    val t = LakeTable.create(spark, tableDir,
      TableMeta("cr", Seq("id"), "ts", Seq("part"), tableType = "mor",
        inlineCompactMax = 2, asyncCompact = true))
    t.upsert(df((1, 1L, "p0", 0.0)))
    val (code, out) = runProbe(tableDir, None)
    assert(code == 0, s"probe failed: ${out.takeRight(2000)}")
    val t2 = LakeTable.load(spark, tableDir)
    assert(t2.timeline.instants().map(t2.timeline.read)
      .exists(_.operation == "compact"),
      "unarmed async service should have compacted the debt")
    assert(t2.snapshot().count() == 1 + 10)
  }
}
