package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Index of the LOWEST all-zero band of a ≤64-bit fingerprint xor —
  * the "first shared band" of a banded-Hamming candidate pair
  * ([[graft.ext.Dedup.fingerprintHammingPairs]]): band j is bits
  * [j·bandWidth, (j+1)·bandWidth). Returns −1 when no band is zero.
  *
  * Exists so the first-shared-band emission filter costs ONE xor plus
  * a short loop per candidate row: the declarative AND-chain form
  * (`(band <= j || (xor >> bw·j) & mask != 0) && ...`) re-evaluates
  * the xor subtree once per term, because join conditions and pushed
  * filters get no common-subexpression elimination (measured r20:
  * +0.8 s on q103's 16-band join; see OPTIMIZATION_r20.md).
  */
case class FirstZeroBand(child: Expression, bandWidth: Int, nBands: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"first_zero_band expects bigint, got ${t.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "first_zero_band"

  override def nullSafeEval(v: Any): Any =
    FirstZeroBand.firstZeroBand(v.asInstanceOf[Long], bandWidth, nBands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.FirstZeroBand.firstZeroBand($c, $bandWidth, $nBands)")

  override protected def withNewChildInternal(c: Expression): FirstZeroBand =
    copy(child = c)
}

object FirstZeroBand {
  /** Called from both interpreted eval and generated code. */
  def firstZeroBand(xor: Long, bandWidth: Int, nBands: Int): Int = {
    val mask = (1L << bandWidth) - 1
    var j = 0
    while (j < nBands) {
      if (((xor >>> (bandWidth * j)) & mask) == 0L) return j
      j += 1
    }
    -1
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "first_zero_band",
      exprs => FirstZeroBand(exprs.head,
        exprs(1).eval(org.apache.spark.sql.catalyst.InternalRow.empty)
          .asInstanceOf[Int],
        exprs(2).eval(org.apache.spark.sql.catalyst.InternalRow.empty)
          .asInstanceOf[Int]),
      "scala_udf")
}
