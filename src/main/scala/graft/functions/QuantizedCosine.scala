package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native codegen'd QUANTIZED cosine over two `array<float>` columns: each
  * side is int8-quantized on the fly with the oracle-proven `emb_quantize`
  * recipe (symmetric per-vector scale 127/max|x|, round-half-up), then
  * scored as exact integer code dot / code norms. This is the candidate
  * scorer of the quantized ANN path ([[graft.queries.Similarity
  * .quantizedTopK]]) as one tight primitive loop inside whole-stage
  * codegen — the composed HOF formulation (three transform/aggregate
  * lambdas per side) runs interpreted and pays lambda dispatch per
  * element.
  *
  * Semantics are bit-for-bit the HOF/DuckDB formulation: quantization in
  * double, integer dot/norm accumulation (order-free: exact), then ONE
  * double division of exactly-representable values. A zero vector (scale
  * pinned to 0, all-zero codes) scores -1.0 — below every real score —
  * rather than NaN, mirroring the oracle's CASE guard. Assumes non-null
  * elements; extra elements of a longer array are ignored in the dot,
  * like zip_with's null-padding would drop them.
  */
case class QuantizedCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var mx = 0.0; var my = 0.0
    var i = 0
    while (i < nx) { val v = math.abs(x.getFloat(i).toDouble); if (v > mx) mx = v; i += 1 }
    i = 0
    while (i < ny) { val v = math.abs(y.getFloat(i).toDouble); if (v > my) my = v; i += 1 }
    val sx = if (mx > 0) 127.0 / mx else 0.0
    val sy = if (my > 0) 127.0 / my else 0.0
    var dot = 0L; var na = 0L; var nb = 0L
    val n = math.min(nx, ny)
    i = 0
    while (i < n) {
      val qa = math.floor(x.getFloat(i).toDouble * sx + 0.5).toLong
      val qb = math.floor(y.getFloat(i).toDouble * sy + 0.5).toLong
      dot += qa * qb; i += 1
    }
    i = 0
    while (i < nx) { val q = math.floor(x.getFloat(i).toDouble * sx + 0.5).toLong; na += q * q; i += 1 }
    i = 0
    while (i < ny) { val q = math.floor(y.getFloat(i).toDouble * sy + 0.5).toLong; nb += q * q; i += 1 }
    if (na == 0L || nb == 0L) -1.0
    else dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val mx = ctx.freshName("mx"); val my = ctx.freshName("my")
      val sx = ctx.freshName("sx"); val sy = ctx.freshName("sy")
      val v = ctx.freshName("v"); val q = ctx.freshName("q")
      val qa = ctx.freshName("qa"); val qb = ctx.freshName("qb")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      s"""
         |int $nx = $a.numElements(), $ny = $b.numElements();
         |int $n = java.lang.Math.min($nx, $ny);
         |double $mx = 0.0, $my = 0.0;
         |for (int $i = 0; $i < $nx; $i++) {
         |  double $v = java.lang.Math.abs((double) $a.getFloat($i));
         |  if ($v > $mx) $mx = $v;
         |}
         |for (int $i = 0; $i < $ny; $i++) {
         |  double $v = java.lang.Math.abs((double) $b.getFloat($i));
         |  if ($v > $my) $my = $v;
         |}
         |double $sx = $mx > 0 ? 127.0 / $mx : 0.0;
         |double $sy = $my > 0 ? 127.0 / $my : 0.0;
         |long $dot = 0L, $na = 0L, $nb = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $qa = (long) java.lang.Math.floor((double) $a.getFloat($i) * $sx + 0.5);
         |  long $qb = (long) java.lang.Math.floor((double) $b.getFloat($i) * $sy + 0.5);
         |  $dot += $qa * $qb;
         |}
         |for (int $i = 0; $i < $nx; $i++) {
         |  long $q = (long) java.lang.Math.floor((double) $a.getFloat($i) * $sx + 0.5);
         |  $na += $q * $q;
         |}
         |for (int $i = 0; $i < $ny; $i++) {
         |  long $q = (long) java.lang.Math.floor((double) $b.getFloat($i) * $sy + 0.5);
         |  $nb += $q * $q;
         |}
         |${ev.value} = ($na == 0L || $nb == 0L) ? -1.0
         |  : (double) $dot / (java.lang.Math.sqrt((double) $na) * java.lang.Math.sqrt((double) $nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantizedCosine =
    copy(left = newLeft, right = newRight)
}

object QuantizedCosine {
  /** Column-level entry point: `quantized_cosine(a, b)`. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(QuantizedCosine(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
