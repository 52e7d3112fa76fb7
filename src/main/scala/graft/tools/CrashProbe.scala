package graft.tools

import graft.lake.LakeTable
import graft.util.Sessions

/** Crash-injection workload: load a MOR table whose metadata enables
  * async compaction, upsert `rounds` deterministic delta batches (enough
  * to trip the debt policy), then wait for the background table service.
  * Spawned with `-Dgraft.lake.crashpoint=compact.staged` (or
  * `compact.renamed`) the JVM is HALTED mid-compaction — between staging
  * and rename, or between rename and the timeline commit — while the
  * service thread holds the writer lock. `CrashRecoverySpec` asserts a
  * surviving reader sees no data loss, breaks the dead writer's lock as
  * stale, sweeps the residue, and compacts successfully afterwards.
  * Unarmed, the compaction completes and the probe exits 0.
  *
  * Usage: CrashProbe <tableDir> <rounds> <rows> [archiveKeep]
  * (with `archiveKeep` the probe additionally archives the timeline
  * after ingesting — the target of the `archive.checkpointed` point)
  */
object CrashProbe {
  def main(args: Array[String]): Unit = {
    val tableDir = args(0)
    val rounds = args(1).toInt
    val rows = args(2).toInt
    val archiveKeep = if (args.length > 3) Some(args(3).toInt) else None
    val spark = Sessions.local("crash-probe", "2")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val t = LakeTable.load(spark, tableDir)
    for (r <- 1 to rounds) {
      val batch = (0 until rows)
        .map(i => (1000 + i, r.toLong, s"p${i % 2}", (r * 100 + i).toDouble))
        .toDF("id", "ts", "part", "v")
      t.upsert(batch)
    }
    // an armed crashpoint halts the JVM inside this wait
    t.awaitTableServices()
    archiveKeep.foreach(k => t.archiveTimeline(k))
    spark.stop()
  }
}
