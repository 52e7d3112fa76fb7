package graft.tools

import graft.lake.Timeline
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Multi-PROCESS writer-lock prober (no SparkSession needed — the lock is
  * pure Hadoop FileSystem). Each invocation acquires the table lock
  * `rounds` times; while holding it, it appends `<pid> enter` /
  * `<pid> exit` lines to a shared log via atomic O_APPEND writes. A test
  * spawning several of these JVMs asserts the enter/exit lines are
  * strictly non-overlapping — mutual exclusion across processes, not just
  * threads. Usage: LockProbe <tableDir> <logFile> <rounds> <holdMs>
  */
object LockProbe {
  def main(args: Array[String]): Unit = {
    val Array(tableDir, logFile, roundsS, holdS) = args
    val rounds = roundsS.toInt
    val holdMs = holdS.toLong
    val pid = ProcessHandle.current().pid()
    val tablePath = new Path(tableDir)
    val fs = tablePath.getFileSystem(new Configuration())
    val timeline = new Timeline(fs, tablePath)
    def log(ev: String): Unit =
      Files.write(Paths.get(logFile),
        s"$pid $ev ${System.nanoTime()}\n".getBytes(StandardCharsets.UTF_8),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    for (_ <- 1 to rounds) {
      timeline.withLock() {
        log("enter")
        Thread.sleep(holdMs)
        log("exit")
      }
    }
  }
}
