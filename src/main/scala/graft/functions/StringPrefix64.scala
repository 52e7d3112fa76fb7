package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Order-preserving 64-bit proxy of a string: the first 8 bytes of its
  * UTF-8 encoding as a big-endian integer (zero-padded), sign-flipped so
  * SIGNED long order equals unsigned byte order. Weakly monotone w.r.t.
  * Spark's default UTF8_BINARY comparison — `a <= b` implies
  * `proxy(a) <= proxy(b)`, with ties exactly when the two strings share
  * their first 8 bytes — which is all equi-depth bucketing needs: curve
  * clustering over string columns buckets the PROXY domain, while
  * zone-map pruning keeps using the exact per-file string min/max, so
  * proxy collisions only cost layout quality, never correctness.
  *
  * One branch-free shift/or loop per row inside whole-stage codegen (the
  * [[EquiDepthBucket]] performance contract).
  */
case class StringPrefix64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"StringPrefix64 needs a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val n = math.min(8, s.numBytes)
    var v = 0L
    var i = 0
    while (i < n) {
      v = (v << 8) | (s.getByte(i) & 0xffL)
      i += 1
    }
    (v << (8 * (8 - n))) ^ java.lang.Long.MIN_VALUE
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val v = ctx.freshName("spVal")
      val n = ctx.freshName("spLen")
      val i = ctx.freshName("spIdx")
      s"""
         |long $v = 0L;
         |int $n = $in.numBytes() < 8 ? $in.numBytes() : 8;
         |for (int $i = 0; $i < $n; $i++) {
         |  $v = ($v << 8) | ($in.getByte($i) & 0xffL);
         |}
         |${ev.value} = ($v << (8 * (8 - $n))) ^ 0x8000000000000000L;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): StringPrefix64 = copy(child = newChild)
}

object StringPrefix64 {
  def apply(value: Column): Column =
    ColumnBridge.column(StringPrefix64(ColumnBridge.expression(value)))
}
