package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, LongType}

/** Exact integer dot product of two `array<tinyint>` columns (int8
  * embedding codes) — the scoring kernel of the quantized ANN shortlist
  * ([[graft.ext.Similarity.int8TopK]]).
  *
  * Same rationale as [[LongDot]] (HOF chains are interpreted and
  * allocate per row); additionally the int8 representation is the point:
  * 8× smaller vectors than the int-thousandths `array<bigint>` form, so
  * the shortlist scan streams an eighth of the bytes at 100 TB. The
  * product accumulates in long (max |a·b| = 127² · dim — overflow-free
  * for any real dimension).
  *
  * Null semantics: null if either side is null; extra elements on the
  * longer side are ignored (embedding columns are fixed-dimension).
  */
case class ByteDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(ByteType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"byte_dot expects (array<tinyint>, array<tinyint>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "byte_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0
    var sum = 0L
    while (i < n) { sum += x.getByte(i).toLong * y.getByte(i).toLong; i += 1 }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $sum = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += (long) $a.getByte($i) * (long) $b.getByte($i);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ByteDot =
    copy(left = l, right = r)
}

object ByteDot {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "byte_dot", exprs => ByteDot(exprs.head, exprs(1)), "scala_udf")

  def byteDot(spark: SparkSession)(a: Column, b: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("byte_dot", a, b)
  }
}
