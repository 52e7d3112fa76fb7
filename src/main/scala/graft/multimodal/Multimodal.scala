package graft.multimodal

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

/** Multimodal columns: image/audio/video as opaque binary payloads with
  * typed metadata, processed in partition-local batches.
  *
  * The decode step is a STUB — this container ships no image/audio codecs
  * — but the Spark-side plumbing is real and tested: schema (binary +
  * map metadata), typed Dataset encoders, partition-local batched
  * iteration (the shape a native decoder wants: amortize per-batch init,
  * e.g. model/codec setup, across `batchSize` payloads), and deterministic
  * fake features so downstream operators (similarity search over the
  * feature vectors, dedup by content signature) are exercisable
  * end-to-end.
  */
case class MediaRecord(
    media_id: Long,
    media_type: String, // "image" | "audio" | "video"
    payload: Array[Byte],
    meta: Map[String, String])

case class MediaFeatures(
    media_id: Long,
    media_type: String,
    n_bytes: Int,
    content_sig: Long,
    features: Array[Float])

/** One planned/extracted frame of a video payload: which frame, where it
  * sits in the stream, and the raw slice a decoder would consume.
  */
case class FrameSlice(
    media_id: Long,
    frame_no: Long,
    byte_offset: Long,
    bytes: Array[Byte])

object Multimodal {

  implicit val recordEnc: Encoder[MediaRecord] = Encoders.product[MediaRecord]
  implicit val featEnc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]

  val FeatureDim = 16

  /** STUB decoder: a real implementation would decode the payload
    * (JPEG/WAV/...) and run feature extraction. Here: a deterministic
    * byte-level fingerprint expanded to FeatureDim floats, so tests and
    * downstream plumbing behave like the real thing.
    */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    var h = 1125899906842597L // FNV-ish fold
    var i = 0
    while (i < payload.length) { h = h * 31 + (payload(i) & 0xff); i += 1 }
    Array.tabulate(FeatureDim) { d =>
      val x = h * (d * 2 + 1) + d
      ((Math.floorMod(x, 2000001L)) / 1000000.0f) - 1.0f
    }
  }

  private def contentSig(payload: Array[Byte]): Long = {
    var h = 17L
    var i = 0
    while (i < payload.length) { h = h * 131 + (payload(i) & 0xff); i += 1 }
    h
  }

  /** Decode/extract in partition-local batches of `batchSize` — the
    * mapPartitions shape that keeps per-batch decoder initialization off
    * the per-record path and needs no shuffle.
    */
  def extractFeatures(ds: Dataset[MediaRecord],
      batchSize: Int = 64): Dataset[MediaFeatures] =
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // real decoder: init codec once per batch here
        batch.iterator.map { r =>
          MediaFeatures(r.media_id, r.media_type, r.payload.length,
            contentSig(r.payload), decodeStub(r.payload))
        }
      }
    }

  implicit val frameEnc: Encoder[FrameSlice] = Encoders.product[FrameSlice]

  /** Evenly sample up to `k` frames per video: slice the payload into
    * fixed-size frame records (`frame_bytes` from metadata — a real
    * container would read its index instead) and emit one [[FrameSlice]]
    * per distinct sampled frame. Per-row, no shuffle; at 100 TB the
    * slices (not the whole videos) flow to the decode stage, so a
    * downstream repartition balances decoder work by frame, not by
    * video length. The byte slicing is real; decoding a slice stays the
    * [[decodeStub]] contract.
    */
  def sampleFrames(ds: Dataset[MediaRecord], k: Int = 8): Dataset[FrameSlice] =
    ds.flatMap { r =>
      val fb = r.meta.getOrElse("frame_bytes", "1").toInt
      val n = math.max(1L, r.payload.length.toLong / fb)
      (0 until k).map(i => i.toLong * n / k).distinct.map { f =>
        val off = f * fb
        FrameSlice(r.media_id, f, off,
          r.payload.slice(off.toInt, (off + fb).toInt))
      }
    }
}
