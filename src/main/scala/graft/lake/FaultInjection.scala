package graft.lake

/** Test-only crash injection: launching a JVM with
  * `-Dgraft.lake.crashpoint=<name>` makes it HALT (exit 137) the moment
  * execution reaches `point(<name>)` — a hard kill with no shutdown
  * hooks, no `finally` blocks, no lock release, exactly like a SIGKILL /
  * OOM-kill mid-write. Unarmed (every production run) a point is one
  * static field read. Crash-recovery specs spawn a probe JVM with the
  * property set and assert the survivors recover: committed data intact,
  * writer lock broken as stale, residue swept by `cleanup_orphans`.
  */
object FaultInjection {
  private val armed: String =
    System.getProperty("graft.lake.crashpoint")

  def point(name: String): Unit =
    if (armed != null && armed == name) {
      System.err.println(s"[graft-lake] crashpoint '$name' reached - halting")
      Runtime.getRuntime.halt(137)
    }
}
