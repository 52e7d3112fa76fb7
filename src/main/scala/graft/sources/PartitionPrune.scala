package graft.sources

import graft.lake.LakeFileIndex
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Exact evaluation of v1 [[Filter]] trees against a file's PARTITION
  * VALUES (the hive-style `p1=v1/p2=v2` dir recorded per
  * [[graft.lake.FileStat]]).
  *
  * Two jobs, both strict:
  *
  *  1. [[supported]] decides which filters [[LakeV2ScanBuilder]] may
  *     claim as FULLY pushed (so Catalyst drops its own re-evaluation
  *     and — when no residual remains — attempts aggregate pushdown on
  *     the scan). Claiming is only sound when the delegated scan
  *     applies the translated predicate with semantics identical to
  *     Catalyst's, so the allowlist is deliberately narrow: leaf
  *     predicates on partition columns whose literal type matches the
  *     column type exactly, over integral, date, and string types.
  *  2. [[eval]] replays a supported filter on one file's parsed
  *     partition row with Catalyst's THREE-VALUED null logic (a NULL
  *     comparison is unknown, not false — `NOT (p = 'a')` must not
  *     match the null partition). A file survives pruning only when
  *     the whole tree evaluates to `Some(true)`.
  *
  * Dir decoding delegates to [[LakeFileIndex.partitionValues]] — the
  * SAME parser the scan's partition rows use (positional fields,
  * unescape-then-sentinel, exact integer widths), so the metadata
  * answer and the real scan cannot drift. Values are then normalized
  * to `Long` (integrals verbatim, dates as epoch days) or
  * [[UTF8String]]; string comparison and `startsWith` run in the
  * UTF8String domain, i.e. byte-wise — bit-identical to Catalyst's
  * evaluation, including the surrogate-pair edge cases where
  * `java.lang.String` code-unit order diverges.
  */
private[sources] object PartitionPrune {

  private def integral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _                                             => false
  }

  /** Literal → normalized value, `None` when the literal's runtime type
    * does not exactly match the column type (never coerce — a lossy or
    * widening compare is where exactness dies).
    */
  private def normLit(dt: DataType, v: Any): Option[Any] = (dt, v) match {
    case (ByteType, b: java.lang.Byte)       => Some(b.longValue)
    case (ShortType, s: java.lang.Short)     => Some(s.longValue)
    case (IntegerType, i: java.lang.Integer) => Some(i.longValue)
    case (LongType, l: java.lang.Long)       => Some(l.longValue)
    case (DateType, d: java.sql.Date)        => Some(d.toLocalDate.toEpochDay)
    case (DateType, d: java.time.LocalDate)  => Some(d.toEpochDay)
    case (StringType, s: String)             => Some(UTF8String.fromString(s))
    case _                                   => None
  }

  /** Scan-parsed partition value ([[LakeFileIndex.castValue]] domain) →
    * normalized value. `None` = the TYPE is outside the supported set
    * (the caller must decline), `Some(None)` = the null partition.
    */
  private def normParsed(dt: DataType, v: Any): Option[Option[Any]] =
    (dt, v) match {
      case (_, null)                            => Some(None)
      case (ByteType, b: java.lang.Byte)        => Some(Some(b.longValue))
      case (ShortType, s: java.lang.Short)      => Some(Some(s.longValue))
      case (IntegerType, i: java.lang.Integer)  => Some(Some(i.longValue))
      case (LongType, l: java.lang.Long)        => Some(Some(l.longValue))
      case (DateType, d: java.lang.Integer)     => Some(Some(d.longValue))
      case (StringType, u: UTF8String)          => Some(Some(u))
      case _                                    => None
    }

  private def leafOk(a: String, v: Any, fields: Map[String, DataType]): Boolean =
    fields.get(a).exists(dt => normLit(dt, v).isDefined)

  /** Is `f` exactly claimable AND metadata-evaluable over `fields`
    * (partition column name → declared type)?
    */
  def supported(f: Filter, fields: Map[String, DataType]): Boolean = f match {
    case EqualTo(a, v) => v != null && leafOk(a, v, fields)
    case EqualNullSafe(a, v) =>
      fields.contains(a) && (v == null || leafOk(a, v, fields))
    case In(a, vs) =>
      vs.nonEmpty && vs.forall(v => v != null && leafOk(a, v, fields))
    case GreaterThan(a, v)        => v != null && leafOk(a, v, fields)
    case GreaterThanOrEqual(a, v) => v != null && leafOk(a, v, fields)
    case LessThan(a, v)           => v != null && leafOk(a, v, fields)
    case LessThanOrEqual(a, v)    => v != null && leafOk(a, v, fields)
    case IsNull(a)                => fields.contains(a)
    case IsNotNull(a)             => fields.contains(a)
    case StringStartsWith(a, v) =>
      v != null && fields.get(a).contains(StringType)
    case And(l, r)      => supported(l, fields) && supported(r, fields)
    case Or(l, r)       => supported(l, fields) && supported(r, fields)
    case Not(c)         => supported(c, fields)
    case _: AlwaysTrue  => true
    case _: AlwaysFalse => true
    case _              => false
  }

  /** Parse a `FileStat.partition` dir string into name → normalized
    * value (`None` inner = the hive null partition), via the scan's own
    * parser. Outer `None` = could not decode, or a partition type
    * outside the supported set — the caller must decline the metadata
    * answer rather than guess.
    */
  def parse(partition: String,
      schema: StructType): Option[Map[String, Option[Any]]] =
    LakeFileIndex.partitionValues(partition, schema).flatMap { vals =>
      val out = schema.fields.toSeq.zip(vals).map { case (f, v) =>
        normParsed(f.dataType, v).map(f.name -> _)
      }
      if (out.exists(_.isEmpty)) None else Some(out.flatten.toMap)
    }

  /** `Some(cmp)` when both sides are present and same-representation;
    * `None` = null comparison (unknown).
    */
  private def cmp(colVal: Option[Any], dt: DataType, lit: Any): Option[Int] =
    for {
      c <- colVal
      l <- normLit(dt, lit)
    } yield (c, l) match {
      case (a: Long, b: Long)             => java.lang.Long.compare(a, b)
      case (a: UTF8String, b: UTF8String) => a.compareTo(b) // byte-wise
      case _ => throw new IllegalStateException(s"mixed compare: $c vs $l")
    }

  /** Kleene three-valued evaluation; only call on [[supported]] filters
    * (anything else throws, and the caller declines the whole answer).
    */
  def eval(f: Filter, row: Map[String, Option[Any]],
      fields: Map[String, DataType]): Option[Boolean] = {
    def dtOf(a: String): DataType = fields(a)
    f match {
      case EqualTo(a, v)            => cmp(row(a), dtOf(a), v).map(_ == 0)
      case EqualNullSafe(a, v) =>
        if (v == null) Some(row(a).isEmpty)
        else Some(cmp(row(a), dtOf(a), v).contains(0))
      case GreaterThan(a, v)        => cmp(row(a), dtOf(a), v).map(_ > 0)
      case GreaterThanOrEqual(a, v) => cmp(row(a), dtOf(a), v).map(_ >= 0)
      case LessThan(a, v)           => cmp(row(a), dtOf(a), v).map(_ < 0)
      case LessThanOrEqual(a, v)    => cmp(row(a), dtOf(a), v).map(_ <= 0)
      case In(a, vs) =>
        row(a) match {
          case None => None // null IN (non-null list) is unknown
          case some => Some(vs.exists(v => cmp(some, dtOf(a), v).contains(0)))
        }
      case IsNull(a)    => Some(row(a).isEmpty)
      case IsNotNull(a) => Some(row(a).nonEmpty)
      case StringStartsWith(a, v) =>
        // UTF8String.startsWith = Catalyst's own byte-wise prefix test
        row(a).map(_.asInstanceOf[UTF8String]
          .startsWith(UTF8String.fromString(v)))
      case And(l, r) =>
        (eval(l, row, fields), eval(r, row, fields)) match {
          case (Some(false), _) | (_, Some(false)) => Some(false)
          case (Some(true), Some(true))            => Some(true)
          case _                                   => None
        }
      case Or(l, r) =>
        (eval(l, row, fields), eval(r, row, fields)) match {
          case (Some(true), _) | (_, Some(true)) => Some(true)
          case (Some(false), Some(false))        => Some(false)
          case _                                 => None
        }
      case Not(c)         => eval(c, row, fields).map(!_)
      case _: AlwaysTrue  => Some(true)
      case _: AlwaysFalse => Some(false)
      case other =>
        throw new IllegalStateException(s"eval on unsupported filter: $other")
    }
  }
}
