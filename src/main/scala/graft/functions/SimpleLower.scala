package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode SIMPLE-MAPPING lowercase as ONE codegen'd expression — the
  * casefold that closes the round-10 locale descope by construction.
  *
  * The problem it solves: Spark's `lower()` is Java's
  * `String.toLowerCase(Locale.ROOT)`, which applies the FULL
  * SpecialCasing expansions — `İ` (U+0130) → `i` + combining dot
  * (U+0307), position-aware Greek final sigma — while DuckDB's
  * `lower()` is utf8proc's per-codepoint SIMPLE map — `İ` → `i`,
  * `Σ` → `σ` everywhere. A multilingual dedup key built on `lower()`
  * therefore hashes differently in engine and oracle the moment a
  * crawl delivers Turkish or Greek capitals (q193's documented
  * descope).
  *
  * This expression applies `Character.toLowerCase(int)` per codepoint
  * — Java's access to the same UnicodeData.txt simple mapping utf8proc
  * implements — so engine and oracle agree EXACTLY on every simple-map
  * codepoint: `İ`→`i`, `Σ`→`σ` (also word-finally), `ß`→`ß`
  * (unchanged in both; the ẞ capital → ß), Cyrillic/Greek/accented
  * Latin throughout. Residual contract: codepoints whose case mapping
  * was added to Unicode after the older of the two engines' tables
  * (Java 17 ≈ Unicode 13) may differ — no such codepoint appears in
  * any registered injection, and locale-TAILORED folding (Turkish
  * dotless-i for tr corpora) is a deliberate non-goal of a
  * locale-independent dedup key.
  *
  * Identity fast path: the scan allocates only when some codepoint
  * actually lowers (ASCII-lowercase crawl text returns the input
  * UTF8String untouched).
  */
case class SimpleLower(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simple_lower expects string, got ${t.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "simple_lower"

  override def nullSafeEval(v: Any): Any =
    SimpleLower.lower(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimpleLower.lower($c)")

  override protected def withNewChildInternal(c: Expression): SimpleLower =
    copy(c)
}

object SimpleLower {

  /** Called from both interpreted eval and generated code. */
  def lower(s: UTF8String): UTF8String = {
    val str = s.toString
    var i = 0
    var changed = false
    val sb = new java.lang.StringBuilder(str.length)
    while (i < str.length) {
      val cp = str.codePointAt(i)
      val lc = Character.toLowerCase(cp)
      if (lc != cp) changed = true
      sb.appendCodePoint(lc)
      i += Character.charCount(cp)
    }
    if (!changed) s else UTF8String.fromString(sb.toString)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simple_lower", exprs => SimpleLower(exprs.head), "scala_udf")
}
