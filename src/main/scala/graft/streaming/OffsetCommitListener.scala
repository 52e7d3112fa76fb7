package graft.streaming

import graft.util.Json
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap

/** Offset-commit listener — the engine's substitution for the
  * reference's third-party `KafkaOffsetCommitterListener` (SURVEY T5,
  * Log2Hudi.scala:5,47-48 with the `group.id` option): after every
  * completed micro-batch, publish the batch's committed SOURCE END
  * OFFSETS to an external, consumer-visible location. This environment
  * has no Kafka broker, so there is no consumer group to commit to; the
  * commit target is a JSON sidecar per query
  * (`<dir>/<queryName>.offsets.json`) carrying (query, batchId,
  * timestamp, per-source end offsets) — lag monitors read ingest
  * progress from it exactly as Burrow-style tooling reads group
  * offsets. Recovery stays on Spark's checkpoint, the same split the
  * reference has: its listener commits offsets for OBSERVABILITY while
  * `failOnDataLoss=false` + checkpointing own correctness.
  *
  * The sidecar write is temp-file + rename per batch (readers never see
  * a torn file); it is best-effort observability — a failed write logs
  * and never fails the query.
  */
class OffsetCommitListener(spark: SparkSession, dir: String,
    val queryName: String) extends StreamingQueryListener {

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    if (queryName.isEmpty || p.name == queryName) {
      val rec = OffsetCommitListener.CommittedOffsets(
        query = p.name,
        batchId = p.batchId,
        timestampMs = System.currentTimeMillis(),
        sources = p.sources.toSeq.map(s =>
          OffsetCommitListener.SourceOffset(
            Option(s.description).getOrElse(""),
            Option(s.endOffset).getOrElse(""))))
      try {
        val fs = new Path(dir).getFileSystem(
          spark.sessionState.newHadoopConf())
        fs.mkdirs(new Path(dir))
        val tmp = new Path(dir, s".${p.name}.offsets.json.tmp")
        val dst = new Path(dir, s"${p.name}.offsets.json")
        val out = fs.create(tmp, true)
        try out.write(Json.write(rec).getBytes(StandardCharsets.UTF_8))
        finally out.close()
        fs.delete(dst, false)
        if (!fs.rename(tmp, dst)) fs.delete(tmp, false)
        ()
      } catch {
        case e: Exception =>
          OffsetCommitListener.log.warn(
            s"offset commit for ${p.name} batch ${p.batchId} failed: " +
              e.getMessage)
      }
    }
  }

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()
}

object OffsetCommitListener {

  /** The committed-offsets record one batch publishes. `endOffset` is
    * the source's own offset JSON verbatim (for the file source, its
    * log offset; for a Kafka source it would be the per-partition
    * offset map — the consumer-group commit payload).
    */
  case class CommittedOffsets(query: String, batchId: Long,
      timestampMs: Long, sources: Seq[SourceOffset])

  case class SourceOffset(description: String, endOffset: String)

  private val log =
    org.slf4j.LoggerFactory.getLogger(classOf[OffsetCommitListener])

  private val registered =
    new ConcurrentHashMap[(SparkSession, String, String), OffsetCommitListener]()

  /** Idempotently attach (same contract as [[ProgressListener.attach]]). */
  def attach(spark: SparkSession, dir: String,
      queryName: String): OffsetCommitListener =
    registered.computeIfAbsent((spark, dir, queryName), _ => {
      val l = new OffsetCommitListener(spark, dir, queryName)
      spark.streams.addListener(l)
      l
    })

  /** Read a query's last committed offsets (monitoring-side helper). */
  def read(spark: SparkSession, dir: String,
      queryName: String): Option[CommittedOffsets] = {
    val p = new Path(dir, s"$queryName.offsets.json")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
        in.readFully(bytes)
        Some(Json.read(new String(bytes, StandardCharsets.UTF_8),
          classOf[CommittedOffsets]))
      } finally in.close()
    }
  }
}
