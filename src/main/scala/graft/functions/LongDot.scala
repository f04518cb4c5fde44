package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Exact integer dot product of two `array<bigint>` columns, as a native
  * Catalyst expression with whole-stage codegen.
  *
  * The built-in way to express this — `aggregate(zip_with(a, b, _*_), 0L,
  * _+_)` — is a higher-order function chain that falls back to
  * interpreted evaluation and allocates an intermediate array per row;
  * on an all-pairs similarity join that is the entire runtime. This
  * expression compiles to a tight primitive loop (no allocation, no
  * boxing) inside the generated code, which is exactly the case the
  * custom-Expression escape hatch exists for (SURVEY §7.4: prefer
  * built-ins, drop to an Expression only where they can't express the
  * semantics *efficiently*).
  *
  * Null semantics: null if either side is null (BinaryExpression
  * default); array lengths are expected equal (embedding columns are
  * fixed-dimension) — extra elements on the longer side are ignored.
  */
case class LongDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"long_dot expects (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "long_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0
    var sum = 0L
    while (i < n) { sum += x.getLong(i) * y.getLong(i); i += 1 }
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
         |  $sum += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): LongDot =
    copy(left = l, right = r)
}

object LongDot {
  /** Idempotently register `long_dot` so `call_function` can resolve it
    * (Column-from-Expression construction is session-internal in Spark 4;
    * the function registry is the stable public path). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "long_dot", exprs => LongDot(exprs.head, exprs(1)), "scala_udf")

  def longDot(spark: SparkSession)(a: Column, b: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("long_dot", a, b)
  }
}
