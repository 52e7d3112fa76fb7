package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

import java.util.concurrent.ConcurrentHashMap

/** Batch-progress observability for streaming pipelines (SURVEY T4): the
  * reference registers a `StreamingQueryListener` that reports per-batch
  * progress during ingest (Log2Hudi.scala:40-48). This listener logs one
  * line per finished micro-batch (batch id, input rows, trigger duration)
  * and keeps a bounded in-memory window of recent progress snapshots for
  * tests and ops probes.
  */
class ProgressListener(val queryName: String) extends StreamingQueryListener {
  import ProgressListener.BatchProgress

  private val buf =
    new java.util.concurrent.ConcurrentLinkedQueue[BatchProgress]()

  /** Recent per-batch progress, oldest first (bounded window). */
  def batches: Seq[BatchProgress] = {
    import scala.jdk.CollectionConverters._
    buf.asScala.toSeq
  }

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    if (queryName.isEmpty || p.name == queryName) {
      val trigger = Option(p.durationMs.get("triggerExecution"))
        .map(_.longValue()).getOrElse(0L)
      val bp = BatchProgress(p.name, p.batchId, p.numInputRows, trigger)
      buf.add(bp)
      while (buf.size > ProgressListener.Keep) { buf.poll(); () }
      ProgressListener.log.info(
        s"[${bp.name}] batch=${bp.batchId} rows=${bp.numInputRows} " +
          s"durationMs=${bp.durationMs}")
    }
  }

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()
}

object ProgressListener {

  /** One micro-batch's progress: query name, batch id, rows read from the
    * source this trigger, and end-to-end trigger duration.
    */
  case class BatchProgress(name: String, batchId: Long, numInputRows: Long,
      durationMs: Long)

  /** Bound on retained snapshots — observability, not history. */
  val Keep = 256

  private val log =
    org.slf4j.LoggerFactory.getLogger(classOf[ProgressListener])

  private val registered =
    new ConcurrentHashMap[(SparkSession, String), ProgressListener]()

  /** Idempotently attach a listener for `queryName` to the session —
    * repeated pipeline runs against one session reuse the same listener
    * instead of stacking duplicates on the listener bus.
    */
  def attach(spark: SparkSession, queryName: String): ProgressListener =
    registered.computeIfAbsent((spark, queryName), _ => {
      val l = new ProgressListener(queryName)
      spark.streams.addListener(l)
      l
    })
}
