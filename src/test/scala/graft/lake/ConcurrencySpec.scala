package graft.lake

import graft.util.Sessions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import scala.concurrent.{Await, Future}
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration._

class ConcurrencySpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Sessions.local("conc-test", "4")

  override def afterAll(): Unit = spark.stop()

  def df(rows: (Int, Long, String, Double)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("id", "ts", "part", "v")
  }

  test("concurrent upserts serialize under the writer lock; no lost commits") {
    val path = Files.createTempDirectory("conc").toString + "/t"
    val t = LakeTable.create(spark, path,
      TableMeta("c", Seq("id"), "ts", Seq("part")))
    t.upsert(df((0, 1L, "p1", 0.0))) // capture schema first
    val futures = (1 to 4).map { k =>
      Future {
        val tk = LakeTable.load(spark, path)
        tk.upsert(df((k, 10L, "p1", k.toDouble)))
      }
    }
    val instants = Await.result(Future.sequence(futures), 120.seconds)
    assert(instants.toSet.size == 4) // four distinct commits
    val t2 = LakeTable.load(spark, path)
    assert(t2.snapshot().count() == 5) // nothing lost
    assert(t2.timeline.instants().size == 5)
  }

  test("writer lock excludes across PROCESSES (separate JVMs)") {
    val work = java.nio.file.Files.createTempDirectory("lockprobe")
    val tableDir = work.resolve("t").toString
    val logFile = work.resolve("events.log").toString
    val classDir = new java.io.File("target/scala-2.13/classes").getAbsolutePath
    val cp = s"$classDir:/opt/spark/jars/*"
    def spawn(): Process = new ProcessBuilder(
      "java", "-cp", cp,
      "--add-opens", "java.base/java.lang=ALL-UNNAMED",
      "--add-opens", "java.base/java.nio=ALL-UNNAMED",
      "--add-opens", "java.base/sun.nio.ch=ALL-UNNAMED",
      "--add-opens", "java.base/java.util=ALL-UNNAMED",
      "graft.tools.LockProbe", tableDir, logFile, "5", "30")
      .redirectErrorStream(true).start()
    val procs = Seq.fill(3)(spawn())
    procs.foreach { p =>
      val out = new String(p.getInputStream.readAllBytes())
      assert(p.waitFor() == 0, s"probe failed: $out")
    }
    // parse "<pid> enter|exit <nanos>" lines; holds must never overlap
    val events = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(logFile)).toArray(Array.empty[String])
      .map(_.split(" ")).map(a => (a(0), a(1), a(2).toLong))
      .sortBy(_._3)
    assert(events.count(_._2 == "enter") == 15)
    assert(events.count(_._2 == "exit") == 15)
    var holder: Option[String] = None
    events.foreach {
      case (pid, "enter", _) =>
        assert(holder.isEmpty, s"$pid entered while $holder held the lock")
        holder = Some(pid)
      case (pid, "exit", _) =>
        assert(holder.contains(pid))
        holder = None
      case _ =>
    }
  }

  test("concurrent FULL upsert workloads across processes converge exactly") {
    val work = java.nio.file.Files.createTempDirectory("upsertprobe")
    val tableDir = work.resolve("t").toString
    val t = LakeTable.create(spark, tableDir,
      TableMeta("up", Seq("id"), "ts", Seq("part")))
    t.upsert(df((1, 1L, "p1", 0.0))) // capture schema before spawning
    val classDir = new java.io.File("target/scala-2.13/classes").getAbsolutePath
    val cp = s"$classDir:/opt/spark/jars/*"
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar")
      .flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    def spawn(procId: Int): Process = new ProcessBuilder(
      (Seq("java", "-cp", cp, "-Xmx2g", "-Dspark.ui.enabled=false") ++
        addOpens ++
        Seq("graft.tools.UpsertProbe", tableDir, procId.toString, "3", "20")): _*)
      .redirectErrorStream(true).start()
    val procs = Seq(spawn(1), spawn(2))
    procs.foreach { p =>
      val out = new String(p.getInputStream.readAllBytes())
      assert(p.waitFor() == 0, s"probe failed: ${out.takeRight(4000)}")
    }
    val t2 = LakeTable.load(spark, tableDir)
    // nothing lost: 2 (create+schema) is 2 commits? schema capture is 1
    // upsert; then 2 procs × 3 rounds
    assert(t2.timeline.instants().size == 1 + 6)
    // exact final state: initial key + 2 × 20 probe keys, each at its
    // LAST round's values — regardless of commit interleaving
    assert(t2.snapshot().count() == 1 + 40)
    val rows = t2.snapshot().filter(col("id") >= 1000)
      .select("id", "ts", "v").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(rows.size == 40)
    rows.foreach { case (id, ts, v) =>
      val i = id % 1000
      assert(ts == 3L, s"key $id ended at round $ts")
      assert(v == 300.0 + i, s"key $id ended with v=$v")
    }
  }

  test("concurrent MOR upsert workloads race inline compaction safely") {
    val work = java.nio.file.Files.createTempDirectory("morprobe")
    val tableDir = work.resolve("t").toString
    val t = LakeTable.create(spark, tableDir,
      TableMeta("upm", Seq("id"), "ts", Seq("part"), tableType = "mor",
        inlineCompactMax = 3))
    t.upsert(df((1, 1L, "p1", 0.0))) // capture schema before spawning
    val classDir = new java.io.File("target/scala-2.13/classes").getAbsolutePath
    val cp = s"$classDir:/opt/spark/jars/*"
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar")
      .flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    def spawn(procId: Int): Process = new ProcessBuilder(
      (Seq("java", "-cp", cp, "-Xmx2g", "-Dspark.ui.enabled=false") ++
        addOpens ++
        Seq("graft.tools.UpsertProbe", tableDir, procId.toString, "3", "20")): _*)
      .redirectErrorStream(true).start()
    val procs = Seq(spawn(1), spawn(2))
    procs.foreach { p =>
      val out = new String(p.getInputStream.readAllBytes())
      assert(p.waitFor() == 0, s"probe failed: ${out.takeRight(4000)}")
    }
    val t2 = LakeTable.load(spark, tableDir)
    // delta appends from both JVMs interleaved with inline compactions —
    // the merged view must still converge exactly
    val ops = t2.timeline.instants().map(t2.timeline.read(_).operation)
    assert(ops.count(_ == "deltacommit") >= 1)
    assert(ops.contains("compact"),
      s"expected inline compaction to fire under contention: $ops")
    assert(t2.snapshot().count() == 1 + 40)
    val rows = t2.snapshot().filter(col("id") >= 1000)
      .select("id", "ts", "v").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(rows.size == 40)
    rows.foreach { case (id, ts, v) =>
      assert(ts == 3L && v == 300.0 + id % 1000, s"key $id ended at ($ts, $v)")
    }
  }

  test("cross-process optimistic writers: disjoint partitions never conflict, contenders converge") {
    val work = java.nio.file.Files.createTempDirectory("occprobe")
    val classDir = new java.io.File("target/scala-2.13/classes").getAbsolutePath
    val cp = s"$classDir:/opt/spark/jars/*"
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar")
      .flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    def run(tableDir: String, mode: String): Seq[String] = {
      def spawn(procId: Int): Process = new ProcessBuilder(
        (Seq("java", "-cp", cp, "-Xmx2g", "-Dspark.ui.enabled=false") ++
          addOpens ++
          Seq("graft.tools.OccProbe", tableDir, procId.toString, "3", "10",
            mode)): _*)
        .redirectErrorStream(true).start()
      Seq(spawn(1), spawn(2)).map { p =>
        val out = new String(p.getInputStream.readAllBytes())
        assert(p.waitFor() == 0, s"occ probe failed: ${out.takeRight(4000)}")
        out
      }
    }

    // DISJOINT: partition-scoped index, each proc owns a partition — all
    // 6 optimistic commits must publish with zero aborts
    val dis = work.resolve("disjoint").toString
    val t1 = LakeTable.create(spark, dis,
      TableMeta("occd", Seq("id"), "ts", Seq("part"), tableType = "mor",
        indexScope = "partition"))
    t1.upsert(df((1, 1L, "p0", 0.0))) // capture schema before spawning
    run(dis, "disjoint").foreach(out =>
      assert(out.contains("aborts=0"), s"false conflict: $out"))
    val td = LakeTable.load(spark, dis)
    assert(td.timeline.instants()
      .map(td.timeline.read(_).operation).count(_ == "merge") == 6)
    val rows = td.snapshot().filter(col("id") >= 1000)
      .select("id", "ts", "v").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(rows.size == 20)
    rows.foreach { case (id, ts, v) =>
      assert(ts == 3L, s"key $id ended at round $ts")
      assert(v == (id / 1000) * 100000 + 300.0 + id % 1000,
        s"key $id ended with v=$v")
    }

    // PUBLIC-API COW contention: the same keys upserted from two JVMs
    // through LakeTable.upsert — the full reserve/merge/stage/
    // conflict-check path races cross-process, retrying aborts; every
    // successful upsert is exactly one commit and the merged state is
    // exact
    val cow = work.resolve("cowcontend").toString
    val t3 = LakeTable.create(spark, cow,
      TableMeta("occw", Seq("id"), "ts", Seq("part")))
    t3.upsert(df((0, 0L, "shared", 0.0)))
    run(cow, "upsert-contend")
    val tw = LakeTable.load(spark, cow)
    val ups = tw.timeline.instants()
      .map(tw.timeline.read(_).operation).count(_ == "upsert")
    assert(ups == 1 + 6, s"expected 7 upsert commits, got $ups")
    val wrows = tw.snapshotUser().collect()
      .map(r => (r.getAs[Int]("id"), r.getAs[Long]("ts"),
        r.getAs[Double]("v"))).toSeq
    assert(wrows.size == 10)
    wrows.foreach { case (id, ts, v) =>
      assert(ts == 3L && v == 3.0, s"key $id ended at ($ts, $v)")
    }

    // CONTEND: same partition, same keys — overlapping publishes abort
    // and retry, and the final state is exact regardless of interleaving
    val con = work.resolve("contend").toString
    val t2 = LakeTable.create(spark, con,
      TableMeta("occc", Seq("id"), "ts", Seq("part"), tableType = "mor",
        indexScope = "partition"))
    t2.upsert(df((1, 1L, "shared", 0.0)))
    run(con, "contend")
    val tc = LakeTable.load(spark, con)
    val got = tc.snapshot().filter(col("id") < 100)
      .select("id", "ts", "v").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.size == 10)
    got.foreach { case (id, ts, v) =>
      assert(ts == 3L && v == 3.0, s"key $id ended at ($ts, $v)")
    }
  }

  test("mixed-service soak: 3 JVMs of upsert + compact + pack + clean hold invariants") {
    // the pairwise specs cover races two-at-a-time; this drives data
    // commits and every content-preserving service together across
    // processes, with per-publish invariants asserted INSIDE each probe
    // (own-keys-latest, time travel, live-file physical integrity)
    val work = java.nio.file.Files.createTempDirectory("mixedprobe")
    val tableDir = work.resolve("t").toString
    val t = LakeTable.create(spark, tableDir,
      TableMeta("mix", Seq("id"), "ts", Seq("part"), tableType = "mor",
        indexScope = "partition"))
    t.upsert(df((1, 1L, "p0", 0.0))) // capture schema before spawning
    val classDir = new java.io.File("target/scala-2.13/classes").getAbsolutePath
    val cp = s"$classDir:/opt/spark/jars/*"
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar")
      .flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    def spawn(procId: Int): Process = new ProcessBuilder(
      (Seq("java", "-cp", cp, "-Xmx2g", "-Dspark.ui.enabled=false") ++
        addOpens ++
        Seq("graft.tools.OccProbe", tableDir, procId.toString, "3", "8",
          "mixed")): _*)
      .redirectErrorStream(true).start()
    val procs = Seq(spawn(1), spawn(2), spawn(3))
    procs.foreach { p =>
      val out = new String(p.getInputStream.readAllBytes())
      assert(p.waitFor() == 0, s"mixed probe failed: ${out.takeRight(4000)}")
      assert(out.contains("services="), s"probe ran no services: $out")
    }
    // converged end state: every proc's keys at its final round, across
    // whatever compact/pack/clean interleaving happened
    val t2 = LakeTable.load(spark, tableDir)
    for (procId <- 1 to 3) {
      val rows = t2.snapshot().filter(col("part") === s"p$procId")
        .select("id", "ts", "v").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
      assert(rows.size == 8, s"proc $procId rows: ${rows.size}")
      rows.zipWithIndex.foreach { case ((id, ts, v), i) =>
        assert(id == procId * 1000 + i && ts == 3L && v == 300.0 + i,
          s"proc $procId key drifted: ($id, $ts, $v)")
      }
    }
    // and the full history still composes: changes from earliest ==
    // the final snapshot as inserts (every service was content-neutral)
    val feed = t2.changes(graft.lake.Timeline.Earliest)
    assert(feed.filter(col("_change_type") === "insert").count() ==
      t2.snapshot().count())
  }

  test("stale lock is broken, not deadlocked") {
    val path = Files.createTempDirectory("conc2").toString + "/t"
    val t = LakeTable.create(spark, path,
      TableMeta("c2", Seq("id"), "ts", Seq("part")))
    // plant a stale lock file
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val lock = new org.apache.hadoop.fs.Path(path, "_lake/lock")
    fs.mkdirs(lock.getParent)
    fs.create(lock, true).close()
    fs.setTimes(lock, System.currentTimeMillis() - 20 * 60 * 1000L, -1)
    t.upsert(df((1, 1L, "p1", 1.0))) // must break the stale lock and proceed
    assert(t.snapshot().count() == 1)
  }

  test("archival keeps snapshots readable and trims the active timeline") {
    val path = Files.createTempDirectory("conc3").toString + "/t"
    val t = LakeTable.create(spark, path,
      TableMeta("c3", Seq("id"), "ts", Seq("part")))
    (1 to 5).foreach(i => t.upsert(df((i, i.toLong, "p1", i.toDouble))))
    val before = t.snapshot().orderBy("id").collect().toSeq
    val archived = t.archiveTimeline(keepCommits = 2)
    assert(archived.size == 3)
    val t2 = LakeTable.load(spark, path)
    assert(t2.timeline.instants().size == 3) // checkpoint + 2 kept
    assert(t2.snapshot().orderBy("id").collect().toSeq == before)
    // upserts continue normally post-archive
    t2.upsert(df((9, 9L, "p1", 9.0)))
    assert(t2.snapshot().count() == 6)
  }
}
