package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Native equi-depth bucket rank: for a strictly-sorted boundary array
  * (computed once on the driver via `approxQuantile` and baked into the
  * plan as a reference object), returns the number of boundaries `<=`
  * the input value — i.e. the 0-based equi-depth bucket id in
  * `[0, bounds.length]`.
  *
  * This replaces a 255-literal higher-order `aggregate` fold, which ran
  * interpreted AND was re-inlined into every downstream reference by
  * projection collapse (the z-order bit-interleave reads the bucket 8
  * times → ~2k interpreted lambda steps per row per column). Here each
  * evaluation is one `Arrays.binarySearch` (≤ log2(256) = 8 compiled
  * comparisons) inside whole-stage codegen, so even the collapsed 8×
  * re-evaluation is ~64 branch-predictable compares per column.
  *
  * Comparison semantics match Spark SQL `>=` on doubles: NaN sorts
  * greatest (both `Double.compare` and Spark agree), and -0.0 is
  * normalized to +0.0 before the search so a ±0.0 boundary counts it.
  */
case class EquiDepthBucket(child: Expression, bounds: Array[Double])
    extends UnaryExpression {

  require(bounds.nonEmpty, "EquiDepthBucket needs at least one boundary")

  override def dataType: DataType = IntegerType

  override def nullSafeEval(input: Any): Any = {
    var d = input.asInstanceOf[Double]
    if (d == 0.0) d = 0.0 // fold -0.0 into +0.0 (Spark SQL equality)
    val i = java.util.Arrays.binarySearch(bounds, d)
    if (i >= 0) i + 1 else -(i + 1)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val ref = ctx.addReferenceObj("edBounds", bounds, "double[]")
      val d = ctx.freshName("edVal")
      val i = ctx.freshName("edIdx")
      s"""
         |double $d = $v;
         |if ($d == 0.0) $d = 0.0;
         |int $i = java.util.Arrays.binarySearch($ref, $d);
         |${ev.value} = ($i >= 0) ? $i + 1 : -($i + 1);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): EquiDepthBucket =
    copy(child = newChild)
}

object EquiDepthBucket {
  /** Column-level entry: bucket id of `value` (cast to double upstream)
    * against strictly-sorted `bounds`. Null input → null (callers
    * `coalesce` to bucket 0, matching "nulls sort first").
    */
  def apply(value: Column, bounds: Array[Double]): Column =
    ColumnBridge.column(
      EquiDepthBucket(ColumnBridge.expression(value), bounds))
}
