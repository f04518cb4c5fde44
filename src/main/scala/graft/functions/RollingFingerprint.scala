package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling-hash document fingerprint as ONE codegen'd
  * expression: `struct(fp_min, n_grams)` where, over 1-based codepoint
  * positions i of the text, `h(i) = sum_j cp(text[i+j]) * Base^j mod
  * Mod` for j < Gram, `fp_min = min h` (winnowing-style) and `n_grams =
  * count distinct h`.
  *
  * Semantically identical to the declarative form
  * `explode(sequence(1, len-Gram+1))` → per-position hash → `groupBy
  * (doc).agg(min, countDistinct)`, but that plan materializes one row
  * PER CHARACTER POSITION each carrying the full text (O(len²) bytes)
  * and pays a hash-aggregate exchange; this expression is a single
  * O(len·Gram) pass per document with no shuffle at all. Null for texts
  * shorter than Gram codepoints — callers filter those out, matching
  * the declarative form where such documents produce no gram rows and
  * so vanish from the grouped output.
  *
  * `cp` is the Unicode codepoint, matching `ascii(substr(text, k, 1))`
  * — both `substr` (UTF8String counts codepoints) and `ascii` (first
  * codepoint of the slice) are codepoint-based.
  */
case class RollingFingerprint(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"rolling_fp expects string, got ${t.simpleString}")
  }
  override def dataType: DataType = RollingFingerprint.Schema
  override def nullable: Boolean = true
  override def prettyName: String = "rolling_fp"

  override def nullSafeEval(v: Any): Any =
    RollingFingerprint.fingerprint(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the helper returns null for short texts, so null-ness must be
    // re-checked after the call (nullSafeCodeGen assumes non-null out)
    val c = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code =
      code"""
        ${c.code}
        $javaType ${ev.value} = null;
        boolean ${ev.isNull} = true;
        if (!${c.isNull}) {
          ${ev.value} = graft.functions.RollingFingerprint.fingerprint(${c.value});
          ${ev.isNull} = ${ev.value} == null;
        }
      """)
  }

  override protected def withNewChildInternal(c: Expression): RollingFingerprint =
    copy(c)
}

object RollingFingerprint {
  // single source of truth for the hash constants; TextAnalysis and the
  // generated DuckDB oracle SQL both read these
  val Base = 131L
  val Mod = 1000000007L
  val Gram = 8
  /** Base^j mod Mod for j < Gram — literal powers shared with SQL. */
  val Powers: Array[Long] =
    Iterator.iterate(1L)(p => p * Base % Mod).take(Gram).toArray

  val Schema: StructType = StructType(Seq(
    StructField("fp_min", LongType, nullable = false),
    StructField("n_grams", LongType, nullable = false)))

  /** Called from both interpreted eval and generated code. One pass:
    * decode codepoints, slide the Gram window, min + exact-distinct the
    * hashes. Returns null when the text has fewer than Gram codepoints. */
  def fingerprint(s: UTF8String): InternalRow = {
    val str = s.toString
    val n = str.codePointCount(0, str.length)
    if (n < Gram) return null
    val cps = new Array[Long](n)
    var ci = 0
    var k = 0
    while (ci < str.length) {
      val cp = str.codePointAt(ci)
      cps(k) = cp.toLong
      k += 1
      ci += Character.charCount(cp)
    }
    val seen = new java.util.HashSet[java.lang.Long]()
    var minH = Long.MaxValue
    var i = 0
    val last = n - Gram
    while (i <= last) {
      var h = 0L
      var j = 0
      while (j < Gram) { h += cps(i + j) * Powers(j); j += 1 }
      h %= Mod
      if (h < minH) minH = h
      seen.add(h)
      i += 1
    }
    InternalRow(minH, seen.size.toLong)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_fp", exprs => RollingFingerprint(exprs.head), "scala_udf")

  def rollingFp(spark: SparkSession)(c: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("rolling_fp", c)
  }
}
