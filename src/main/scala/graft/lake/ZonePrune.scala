package graft.lake

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** File-skipping against the zone maps in [[FileStat.cols]] (+ the
  * record-key range): decides whether a pushed-down data filter COULD
  * match any row of a file, from commit metadata alone — no file open.
  *
  * Safety model: this is a may-contain test. Every uncertain case — no
  * stored range, unsupported expression shape, unparseable bound, NaN —
  * answers true (keep the file). Null semantics need no null counts:
  * a comparison predicate is never satisfied by a null row value, so
  * bounds over the non-null values decide; IsNull/IsNotNull are left
  * as could-match.
  *
  * Scale rationale: at 100 TB a snapshot scan's file list is the index.
  * Partition pruning handles the partition dimension and key-range
  * pruning the key dimension; zone maps extend that to arbitrary
  * predicate columns (the role of parquet row-group stats, but decided
  * at PLAN time from the timeline — files never opened, tasks never
  * scheduled). Catalyst only hands a scan filters that are valid row
  * predicates for that scan, so evaluating them per-file is sound.
  */
object ZonePrune {

  /** Comparable bound domain per Catalyst type: numerics (incl. date /
    * micros-timestamps) as BigDecimal, strings bytewise, booleans.
    */
  private sealed trait Dom
  private case class NumD(lo: BigDecimal, hi: BigDecimal) extends Dom
  private case class StrD(lo: UTF8String, hi: UTF8String) extends Dom
  private case class BoolD(lo: Boolean, hi: Boolean) extends Dom

  private def numType(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
         DoubleType | DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  private def parseDom(dt: DataType, lo: String, hi: String): Option[Dom] =
    try {
      dt match {
        case StringType =>
          Some(StrD(UTF8String.fromString(lo), UTF8String.fromString(hi)))
        case BooleanType => Some(BoolD(lo.toBoolean, hi.toBoolean))
        case d if numType(d) => Some(NumD(BigDecimal(lo), BigDecimal(hi)))
        case _ => None
      }
    } catch { case _: Exception => None }

  private def litNum(v: Any): Option[BigDecimal] = v match {
    case x: Byte   => Some(BigDecimal(x.toInt))
    case x: Short  => Some(BigDecimal(x.toInt))
    case x: Int    => Some(BigDecimal(x))
    case x: Long   => Some(BigDecimal(x))
    case x: Float  => if (x.isNaN) None else Some(BigDecimal(x.toDouble))
    case x: Double => if (x.isNaN) None else Some(BigDecimal(x))
    case _         => None
  }

  /** The file's stored range for this attribute, in the comparison
    * domain; None = unknown = never prune.
    */
  private def domOf(st: FileStat, a: AttributeReference): Option[Dom] = {
    val raw =
      if (a.name == LakeTable.RecordKeyCol)
        Option(st.minKey).zip(Option(st.maxKey)).map(t => Seq(t._1, t._2))
      else st.colRanges.get(a.name)
    raw.filter(_.length == 2).filter(r => r(0) != null && r(1) != null)
      .flatMap(r => parseDom(a.dataType, r(0), r(1)))
  }

  /** -1/0/1 comparison of a literal value against one stored bound;
    * None when the pair is incomparable (type surprise, NaN).
    */
  private def cmpLit(dom: Dom, v: Any, useLo: Boolean): Option[Int] =
    (dom, v) match {
      case (NumD(lo, hi), _) =>
        litNum(v).map(_.compare(if (useLo) lo else hi))
      case (StrD(lo, hi), s: UTF8String) =>
        Some(s.compareTo(if (useLo) lo else hi))
      case (BoolD(lo, hi), b: Boolean) =>
        Some(b.compareTo(if (useLo) lo else hi))
      case _ => None
    }

  private def litOf(e: Expression): Option[Any] = e match {
    case Literal(v, _) if v != null => Some(v)
    case _                          => None
  }

  /** Could `attr op value` hold for some row of the file? */
  private def test(st: FileStat, a: AttributeReference, value: Any,
      op: String): Boolean =
    domOf(st, a) match {
      case None => true
      case Some(dom) =>
        val vsLo = cmpLit(dom, value, useLo = true)
        val vsHi = cmpLit(dom, value, useLo = false)
        (vsLo, vsHi) match {
          case (Some(cl), Some(ch)) =>
            op match {
              case "eq" => cl >= 0 && ch <= 0 // lo <= v <= hi
              case "lt" => cl > 0             // some row < v ⇔ lo < v
              case "le" => cl >= 0            // lo <= v
              case "gt" => ch < 0             // some row > v ⇔ hi > v
              case "ge" => ch <= 0            // hi >= v
              case _    => true
            }
          case _ => true
        }
    }

  def couldMatch(st: FileStat, e: Expression): Boolean = e match {
    case And(l, r) => couldMatch(st, l) && couldMatch(st, r)
    case Or(l, r)  => couldMatch(st, l) || couldMatch(st, r)

    case EqualTo(a: AttributeReference, v) if litOf(v).isDefined =>
      test(st, a, litOf(v).get, "eq")
    case EqualTo(v, a: AttributeReference) if litOf(v).isDefined =>
      test(st, a, litOf(v).get, "eq")
    case EqualNullSafe(a: AttributeReference, v) if litOf(v).isDefined =>
      test(st, a, litOf(v).get, "eq")
    case EqualNullSafe(v, a: AttributeReference) if litOf(v).isDefined =>
      test(st, a, litOf(v).get, "eq")

    case LessThan(a: AttributeReference, v) if litOf(v).isDefined =>
      test(st, a, litOf(v).get, "lt")
    case LessThan(v, a: AttributeReference) if litOf(v).isDefined =>
      test(st, a, litOf(v).get, "gt") // v < attr ⇔ some row > v
    case LessThanOrEqual(a: AttributeReference, v) if litOf(v).isDefined =>
      test(st, a, litOf(v).get, "le")
    case LessThanOrEqual(v, a: AttributeReference) if litOf(v).isDefined =>
      test(st, a, litOf(v).get, "ge")
    case GreaterThan(a: AttributeReference, v) if litOf(v).isDefined =>
      test(st, a, litOf(v).get, "gt")
    case GreaterThan(v, a: AttributeReference) if litOf(v).isDefined =>
      test(st, a, litOf(v).get, "lt")
    case GreaterThanOrEqual(a: AttributeReference, v) if litOf(v).isDefined =>
      test(st, a, litOf(v).get, "ge")
    case GreaterThanOrEqual(v, a: AttributeReference) if litOf(v).isDefined =>
      test(st, a, litOf(v).get, "le")

    case In(a: AttributeReference, vs) if vs.forall(litOf(_).isDefined) =>
      vs.exists(v => test(st, a, litOf(v).get, "eq"))
    case InSet(a: AttributeReference, vs) =>
      vs.exists(v => v != null && test(st, a, v, "eq"))

    case _ => true // IsNull/IsNotNull/StartsWith/UDF/... — keep the file
  }
}
