package graft.lake

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile

import java.nio.charset.StandardCharsets

/** Per-file write statistics read from parquet FOOTERS instead of
  * re-scanning the written data.
  *
  * The write path needs (rows, min/max `_record_key`, min/max
  * `_commit_time`, tombstone count) per published file for the commit
  * metadata that drives file pruning. Computing that with a Spark
  * aggregate re-reads the entire staged output — at 100 TB that doubles
  * write I/O. The parquet footer already carries exact row counts and
  * column min/max per row group, so this reads O(files) footers (a few KB
  * each) instead.
  *
  * Soundness: parquet row-group statistics are exact or conservatively
  * WIDENED bounds (binary stats may be truncated to a lower-bound min /
  * incremented upper-bound max, or omitted entirely for very long
  * values). Widened key/commit bounds only ever ENLARGE the candidate
  * set of the consumers (`matchedFiles` re-verifies by semi-join;
  * incremental's maxCommit skip fires only when the upper bound proves
  * no row qualifies) — never drop data. Whenever a needed statistic is
  * absent or ambiguous, [[read]] returns None and the caller falls back
  * to the exact scan for the whole batch.
  */
object FooterStats {

  /** One file's stats; mirror of the [[FileStat]] fields derived at write. */
  case class Parts(rows: Long, minKey: String, maxKey: String,
      minCommit: String, maxCommit: String, tombstones: Long)

  def read(conf: Configuration, file: Path): Option[Parts] = {
    import scala.jdk.CollectionConverters._
    val reader =
      try ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
      catch { case _: Exception => return None }
    try {
      val blocks = reader.getFooter.getBlocks.asScala.toSeq
      val rows = blocks.map(_.getRowCount).sum
      if (rows == 0) return Some(Parts(0, null, null, null, null, 0))

      def colStats(b: org.apache.parquet.hadoop.metadata.BlockMetaData,
          name: String) =
        b.getColumns.asScala.find(_.getPath.toDotString == name)
          .map(_.getStatistics).filter(s => s != null && !s.isEmpty)

      // string column (binary/UTF8) min/max across row groups; None when
      // any row group lacks usable values (e.g. truncated-away stats)
      def strRange(name: String): Option[(String, String)] = {
        val per = blocks.map(b => colStats(b, name).filter(_.hasNonNullValue)
          .map(s => (new String(s.getMinBytes, StandardCharsets.UTF_8),
            new String(s.getMaxBytes, StandardCharsets.UTF_8))))
        if (per.exists(_.isEmpty)) None
        else {
          val vs = per.flatten
          Some((vs.map(_._1).min, vs.map(_._2).max))
        }
      }

      // tombstone count from `_deleted` boolean stats. Files are written
      // homogeneous (pure tombstone deltas vs. pure data), so the stats
      // decide exactly; anything mixed or unknowable → None → exact scan.
      def tombs: Option[Long] = {
        val per = blocks.map { b =>
          colStats(b, LakeTable.DeletedCol) match {
            case None => None // column chunk metadata missing → can't know
            case Some(s) if !s.hasNonNullValue => Some(0L) // all null = live
            case Some(s) =>
              val mn = s.genericGetMin.asInstanceOf[java.lang.Boolean]
              val mx = s.genericGetMax.asInstanceOf[java.lang.Boolean]
              if (!mx) Some(0L) // max false: no tombstone rows
              else if (mn && s.isNumNullsSet && s.getNumNulls == 0)
                Some(b.getRowCount) // min true, no nulls: all tombstones
              else None // mixed true/false(/null) → ambiguous
          }
        }
        if (per.exists(_.isEmpty)) None else Some(per.flatten.sum)
      }

      for {
        (mnK, mxK) <- strRange(LakeTable.RecordKeyCol)
        (mnC, mxC) <- strRange(LakeTable.CommitTimeCol)
        tb <- tombs
      } yield Parts(rows, mnK, mxK, mnC, mxC, tb)
    } catch {
      case _: Exception => None
    } finally reader.close()
  }
}
