package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All sign-bit LSH hyperplane tests of one vector fused into ONE
  * codegen'd expression returning a 64-bit mask: bit i = (q · planeᵢ ≥ 0).
  *
  * The composed form — one `long_dot(q, <64-element literal array>) >= 0`
  * column per plane — embeds every plane as an inline literal in the
  * generated code: for 32 planes the projection method is enormous
  * (hundreds of KB of source; ~1 s of janino compilation per execution
  * at fixture scale, and a whole-stage-codegen method-size hazard at any
  * scale). This expression instead references the plane matrix as a
  * runtime object (`ctx.addReferenceObj`) and loops — compact generated
  * code, same tight primitive arithmetic.
  *
  * The matrix rides in the expression as a constructor parameter, so at
  * most 64 planes fit one mask (asserted).
  */
case class SignMask64(child: Expression, planes: Array[Array[Long]])
    extends UnaryExpression {
  require(planes.length <= 64, s"at most 64 planes per mask, got ${planes.length}")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sign_mask64 expects array<bigint>, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "sign_mask64"

  override def nullSafeEval(v: Any): Any =
    SignMask64.mask(v.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", planes, "long[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.SignMask64.mask($c, $ref)")
  }

  override protected def withNewChildInternal(c: Expression): SignMask64 =
    copy(child = c)
}

object SignMask64 {
  /** Called from both interpreted eval and generated code. */
  def mask(q: ArrayData, planes: Array[Array[Long]]): Long = {
    var m = 0L
    var i = 0
    while (i < planes.length) {
      val p = planes(i)
      // a dim mismatch must fail loudly: a truncated dot product would
      // silently degrade LSH recall (candidate pairs quietly lost)
      if (q.numElements() != p.length)
        throw new IllegalArgumentException(
          s"sign_mask64: embedding dim ${q.numElements()} != plane dim ${p.length}")
      val n = p.length
      var s = 0L
      var j = 0
      while (j < n) { s += q.getLong(j) * p(j); j += 1 }
      if (s >= 0) m |= 1L << i
      i += 1
    }
    m
  }

  /** Column builder: registers a per-matrix function name so
    * `call_function` (the public Column-from-Expression path in Spark 4)
    * can resolve it. The name is derived from the matrix identity params
    * so different plane families coexist. */
  def signMask(spark: SparkSession, name: String,
               planes: Array[Array[Long]])(c: Column): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      s"sign_mask64_$name", exprs => SignMask64(exprs.head, planes), "scala_udf")
    org.apache.spark.sql.functions.call_function(s"sign_mask64_$name", c)
  }
}
