package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Native product-quantization encoder: maps an `array<float>` vector to
  * its `m` nearest-code ids, one per subspace, against a trained codebook
  * (flattened `[(mm*k + kk)*sd + j]`, baked into the plan as a reference
  * object). One tight primitive loop inside whole-stage codegen — the
  * HOF formulation (nested transform/aggregate over m×k×sd) runs
  * interpreted and pays lambda dispatch per multiply, which matters
  * because encode touches EVERY corpus vector (ties break toward the
  * lower code id, matching `array_position(d, array_min(d))`).
  */
case class PqEncode(child: Expression, cb: Array[Float],
    m: Int, k: Int, sd: Int) extends UnaryExpression {

  require(cb.length == m * k * sd, s"codebook length ${cb.length} != $m*$k*$sd")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    // contract: at least m*sd elements — indexing past numElements() on
    // an unsafe array reads garbage bytes (wrong codes, no error), so
    // the length contract must fail as loudly as the null contract
    if (a.numElements() < m * sd) throw new IllegalArgumentException(
      s"PqEncode: input vector has ${a.numElements()} elements, need ${m * sd}")
    // contract: no null ELEMENTS — getFloat on an unsafe array would
    // silently read 0.0 for one (wrong codes, no error), so fail loudly
    // up front instead; one pass of m*sd checks vs the m*k*sd encode loop
    var e = 0
    while (e < m * sd) {
      if (a.isNullAt(e)) throw new IllegalArgumentException(
        s"PqEncode: null element at index $e — input vectors must be null-free")
      e += 1
    }
    val codes = new Array[Int](m)
    var mm = 0
    while (mm < m) {
      var best = 0
      var bestD = Double.MaxValue
      var kk = 0
      while (kk < k) {
        var dist = 0.0
        val base = (mm * k + kk) * sd
        var j = 0
        while (j < sd) {
          val d = a.getFloat(mm * sd + j).toDouble - cb(base + j).toDouble
          dist += d * d
          j += 1
        }
        if (dist < bestD) { bestD = dist; best = kk }
        kk += 1
      }
      codes(mm) = best
      mm += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cbRef = ctx.addReferenceObj("pqCodebook", cb, "float[]")
      val codes = ctx.freshName("codes")
      val mm = ctx.freshName("mm"); val kk = ctx.freshName("kk")
      val j = ctx.freshName("j"); val base = ctx.freshName("base")
      val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
      val dist = ctx.freshName("dist"); val d = ctx.freshName("d")
      val e = ctx.freshName("e")
      s"""
         |if ($a.numElements() < ${m * sd}) throw new IllegalArgumentException(
         |  "PqEncode: input vector has " + $a.numElements() +
         |  " elements, need ${m * sd}");
         |for (int $e = 0; $e < ${m * sd}; $e++) {
         |  if ($a.isNullAt($e)) throw new IllegalArgumentException(
         |    "PqEncode: null element at index " + $e +
         |    " — input vectors must be null-free");
         |}
         |int[] $codes = new int[$m];
         |for (int $mm = 0; $mm < $m; $mm++) {
         |  int $best = 0;
         |  double $bestD = Double.MAX_VALUE;
         |  for (int $kk = 0; $kk < $k; $kk++) {
         |    double $dist = 0.0;
         |    int $base = ($mm * $k + $kk) * $sd;
         |    for (int $j = 0; $j < $sd; $j++) {
         |      double $d = (double) $a.getFloat($mm * $sd + $j)
         |        - (double) $cbRef[$base + $j];
         |      $dist += $d * $d;
         |    }
         |    if ($dist < $bestD) { $bestD = $dist; $best = $kk; }
         |  }
         |  $codes[$mm] = $best;
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

object PqEncode {
  /** Column-level entry: encode `vec` with the (m×k×sd) codebook.
    * Contract: `vec`'s elements must be non-null (a null element raises
    * IllegalArgumentException rather than silently encoding as 0.0) and
    * the vector must carry at least m·sd values.
    */
  def apply(vec: Column, cb: Array[Array[Array[Float]]]): Column = {
    val m = cb.length; val k = cb(0).length; val sd = cb(0)(0).length
    ColumnBridge.column(
      PqEncode(ColumnBridge.expression(vec), cb.flatten.flatten, m, k, sd))
  }
}
