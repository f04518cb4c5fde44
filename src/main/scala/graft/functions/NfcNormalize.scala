package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as ONE codegen'd expression — the missing
  * half of multilingual dedup keys: `é` arrives from crawls both
  * composed (U+00E9) and decomposed (`e` + U+0301) and hashes
  * differently raw, so every hash-keyed dedup silently treats the two
  * spellings as distinct documents. Canonical composition (NFC) folds
  * them before hashing; the DuckDB oracle twin is `nfc_normalize()`
  * (both implement Unicode canonical composition, so outputs agree
  * codepoint-for-codepoint).
  *
  * ASCII fast path: NFC is the identity on ASCII (the overwhelming
  * majority of crawl bytes), and `Normalizer.isNormalized` is a cheap
  * scan that avoids the String round-trip entirely for already-
  * composed input — the expression costs one byte-scan per row until
  * it actually meets combining marks.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects string, got ${t.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(v: Any): Any =
    NfcNormalize.nfc(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(c: Expression): NfcNormalize = copy(c)
}

object NfcNormalize {

  /** Called from both interpreted eval and generated code. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_nfc", exprs => NfcNormalize(exprs.head), "scala_udf")

  def nfcCol(spark: SparkSession)(c: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_nfc", c)
  }
}
