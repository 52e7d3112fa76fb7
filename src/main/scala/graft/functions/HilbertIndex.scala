package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{AbstractDataType, DataType, IntegerType, LongType}

/** d-dimensional Hilbert curve distance of a cell — the clustering sort
  * key with strictly better box-query locality than the Z-order bit
  * interleave: consecutive curve positions are always FACE-adjacent
  * cells (Manhattan distance 1), so a run of the curve stays inside a
  * compact blob instead of Z's long diagonal jumps, and per-file zone
  * maps come out tighter on every participating column for the same
  * file count.
  *
  * Inputs are the per-column equi-depth bucket ids (from
  * [[EquiDepthBucket]]), each in `[0, 2^bits)`; output is the curve
  * position in `[0, 2^(d*bits))` as a long. The coordinate→index map is
  * Skilling's transpose algorithm ("Programming the Hilbert curve", AIP
  * Conf. Proc. 707, 2004 — public domain): undo the excess-work
  * transform MSB→LSB, Gray-encode across dimensions, then interleave
  * the transposed bits MSB-first. O(d·bits) integer ops per row, all
  * inside whole-stage codegen via one static call.
  */
case class HilbertIndex(children: Seq[Expression], bits: Int)
    extends Expression {

  require(children.size >= 2, "HilbertIndex needs at least 2 axes")
  require(bits >= 1 && children.size * bits <= 62,
    s"axes*bits must fit a long, got ${children.size * bits} bits")

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (children.forall(_.dataType == IntegerType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"HilbertIndex axes must all be INT, got " +
        children.map(_.dataType.simpleString).mkString(", "))
  }

  override def eval(input: InternalRow): Any = {
    val axes = new Array[Int](children.size)
    var i = 0
    while (i < axes.length) {
      val v = children(i).eval(input)
      if (v == null) return null
      axes(i) = v.asInstanceOf[Int]
      i += 1
    }
    HilbertCurve.encode(axes, bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val axes = ctx.freshName("hAxes")
    val isNull = ctx.freshName("hIsNull")
    val evals = children.map(_.genCode(ctx))
    val loadAxes = evals.zipWithIndex.map { case (e, i) =>
      val nullCheck =
        if (children(i).nullable)
          s"if (${e.isNull}) { $isNull = true; break; }"
        else ""
      s"""
         |${e.code.toString}
         |$nullCheck
         |$axes[$i] = ${e.value};
       """.stripMargin
    }.mkString("\n")
    val body =
      s"""
         |boolean $isNull = false;
         |int[] $axes = new int[${children.size}];
         |long ${ev.value} = -1L;
         |do {
         |$loadAxes
         |} while (false);
         |if (!$isNull) {
         |  ${ev.value} = graft.functions.HilbertCurve.encode($axes, $bits);
         |}
       """.stripMargin
    if (nullable)
      ev.copy(code = code"$body",
        isNull = org.apache.spark.sql.catalyst.expressions.codegen
          .JavaCode.isNullVariable(isNull))
    else ev.copy(code = code"$body", isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HilbertIndex =
    copy(children = newChildren)
}

object HilbertIndex {
  /** Column entry: Hilbert curve position of the given bucket-id
    * columns (each INT in `[0, 2^bits)`). Null axis → null (callers
    * `coalesce` bucket ids to 0 upstream, matching "nulls sort first").
    */
  def apply(axes: Seq[Column], bits: Int): Column =
    ColumnBridge.column(
      HilbertIndex(axes.map(ColumnBridge.expression), bits))
}

/** Static Hilbert coordinate→index kernel (called from generated code —
  * a plain object so the forwarder class carries a true static method).
  */
object HilbertCurve {
  /** Skilling AxesToTranspose + MSB-first bit interleave. `axes` values
    * must be in `[0, 2^bits)`; the array is not mutated.
    */
  def encode(axes: Array[Int], bits: Int): Long = {
    val n = axes.length
    val x = java.util.Arrays.copyOf(axes, n)
    val m = 1 << (bits - 1)
    // inverse undo: fold the reflection/rotation state top bit down
    var q = m
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < n) {
        if ((x(i) & q) != 0) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    // Gray encode across dimensions
    var i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0
    q = m
    while (q > 1) { if ((x(n - 1) & q) != 0) t ^= q - 1; q >>= 1 }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
    // transposed form → scalar: bit j of axis i lands at output bit
    // (j*n + (n-1-i)) counting from the LSB of each level group
    var h = 0L
    var j = bits - 1
    while (j >= 0) {
      var k = 0
      while (k < n) {
        h = (h << 1) | ((x(k) >>> j) & 1).toLong
        k += 1
      }
      j -= 1
    }
    h
  }
}
