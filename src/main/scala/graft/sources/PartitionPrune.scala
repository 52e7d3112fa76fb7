package graft.sources

import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

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
  *     column type exactly, over types with unambiguous orderings
  *     (integrals, dates) or equality-only string tests. String RANGE
  *     comparisons are rejected — `java.lang.String` orders by UTF-16
  *     code unit while Spark's `UTF8String` orders by UTF-8 byte, and
  *     the two disagree on supplementary characters, so a metadata
  *     answer could diverge from the scan.
  *  2. [[eval]] replays a supported filter on one file's parsed
  *     partition row with Catalyst's THREE-VALUED null logic (a NULL
  *     comparison is unknown, not false — `NOT (p = 'a')` must not
  *     match the null partition). A file survives pruning only when
  *     the whole tree evaluates to `Some(true)`.
  *
  * Values are normalized to `Long` (integrals verbatim, dates as epoch
  * days) or `String`, on both the path side and the literal side, so
  * comparison is a plain compare on one of the two representations.
  */
private[sources] object PartitionPrune {

  private val NullDir = ExternalCatalogUtils.DEFAULT_PARTITION_NAME

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
    case (StringType, s: String)             => Some(s)
    case _                                   => None
  }

  /** Unescaped path fragment → normalized value (`None` = unparseable,
    * which the CALLER must treat as "cannot prove", never as a value).
    */
  private def normPath(dt: DataType, raw: String): Option[Any] = dt match {
    case _ if integral(dt) =>
      try Some(raw.toLong) catch { case _: NumberFormatException => None }
    case DateType =>
      try Some(java.time.LocalDate.parse(raw).toEpochDay)
      catch { case _: java.time.format.DateTimeParseException => None }
    case StringType => Some(raw)
    case _          => None
  }

  private def leafOk(a: String, v: Any, fields: Map[String, DataType],
      range: Boolean): Boolean =
    fields.get(a).exists { dt =>
      // string ordering is ambiguous across the two engines (scaladoc)
      (!range || dt != StringType) && normLit(dt, v).isDefined
    }

  /** Is `f` exactly claimable AND metadata-evaluable over `fields`
    * (partition column name → declared type)?
    */
  def supported(f: Filter, fields: Map[String, DataType]): Boolean = f match {
    case EqualTo(a, v) => v != null && leafOk(a, v, fields, range = false)
    case EqualNullSafe(a, v) =>
      fields.contains(a) && (v == null || leafOk(a, v, fields, range = false))
    case In(a, vs) =>
      vs.nonEmpty && vs.forall(v => v != null && leafOk(a, v, fields, range = false))
    case GreaterThan(a, v)        => v != null && leafOk(a, v, fields, range = true)
    case GreaterThanOrEqual(a, v) => v != null && leafOk(a, v, fields, range = true)
    case LessThan(a, v)           => v != null && leafOk(a, v, fields, range = true)
    case LessThanOrEqual(a, v)    => v != null && leafOk(a, v, fields, range = true)
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
    * value (`None` inner = the hive null sentinel). Outer `None` =
    * could not parse EVERY declared field — the caller must decline the
    * metadata answer rather than guess.
    */
  def parse(partition: String,
      fields: Map[String, DataType]): Option[Map[String, Option[Any]]] = {
    val segs: Map[String, String] =
      if (partition.isEmpty) Map.empty
      else partition.split("/").iterator.flatMap { seg =>
        val i = seg.indexOf('=')
        if (i <= 0) Iterator.empty
        else Iterator(
          ExternalCatalogUtils.unescapePathName(seg.substring(0, i)) ->
            seg.substring(i + 1))
      }.toMap
    val out = fields.toSeq.map { case (name, dt) =>
      segs.get(name) match {
        case None          => None // field missing from the dir: unprovable
        case Some("")      => None // Spark never writes `p=`; a foreign
                                   // dir's empty value reads back as null
                                   // on the scan path — not provable here
        case Some(NullDir) => Some(name -> (None: Option[Any]))
        case Some(raw) =>
          normPath(dt, ExternalCatalogUtils.unescapePathName(raw))
            .map(v => name -> (Some(v): Option[Any]))
      }
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
      case (a: Long, b: Long)     => java.lang.Long.compare(a, b)
      case (a: String, b: String) => a.compareTo(b)
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
        row(a).map(_.asInstanceOf[String].startsWith(v))
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
