package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Length (in CHARACTERS) of the longest common prefix of two strings —
  * the match-extension kernel of the exact-substring dedup pass
  * ([[graft.ext.TextAnalysis.exactSubstringPairs]]): one byte-wise scan,
  * advancing a whole UTF-8 codepoint at a time so a multi-byte
  * character either matches entirely or not at all (the returned count
  * therefore agrees with the oracle's per-character `substr` compare on
  * any input, not just ASCII). No string allocation, no per-character
  * substring calls.
  */
case class CommonPrefixChars(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"common_prefix_chars expects (string, string), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "common_prefix_chars"

  override def nullSafeEval(l: Any, r: Any): Any =
    CommonPrefixChars.len(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (l, r) => s"graft.functions.CommonPrefixChars.len($l, $r)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): CommonPrefixChars = copy(l, r)
}

object CommonPrefixChars {

  /** Called from both interpreted eval and generated code. */
  def len(a: UTF8String, b: UTF8String): Long = {
    val ab = a.getBytes
    val bb = b.getBytes
    val n = math.min(ab.length, bb.length)
    var i = 0
    var chars = 0L
    while (i < n) {
      val w = UTF8String.numBytesForFirstByte(ab(i))
      if (i + w > n) return chars
      var j = 0
      while (j < w) {
        if (ab(i + j) != bb(i + j)) return chars
        j += 1
      }
      chars += 1
      i += w
    }
    chars
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "common_prefix_chars",
      exprs => CommonPrefixChars(exprs.head, exprs(1)), "scala_udf")
}
