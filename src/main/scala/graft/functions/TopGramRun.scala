package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Max multiplicity of any word `n`-gram of a token array, as ONE
  * codegen'd expression — semantically identical to the declarative
  * form used by `TextAnalysis.repetitionScore` / `cleanSignals` before
  * round 20:
  *
  * {{{
  *   aggregate(sort_array(transform(sequence(0, size(toks) - n),
  *       i => array_join(slice(toks, i + 1, n), " "))),
  *     (prev, run, best), ...longest equal-run fold...)
  * }}}
  *
  * (the longest run of equal elements in the SORTED gram array IS the
  * multiplicity of the most frequent gram), but computed in one pass
  * with a hash map instead of materializing + sorting an array of gram
  * strings and folding over it interpreted — Spark's higher-order
  * functions are CodegenFallback, so that chain ran row-at-a-time on
  * boxed values and dominated the cleaning-tier scan stage (measured
  * r20: repetitionScore 0.42 s over the sf0.1 corpus scan, see
  * OPTIMIZATION_r20.md).
  *
  * Gram identity matches `array_join(slice(...), " ")` exactly: the
  * gram key is the space-joined token window, compared bytewise
  * (UTF8String equality == string equality of the joined gram). Size
  * < n yields 0 (the fold over an empty gram array); null input yields
  * null (callers wrap with the same `when` guard the original used).
  */
case class TopGramRun(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"top_gram_run expects array<string>, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "top_gram_run"

  override def nullSafeEval(v: Any): Any =
    TopGramRun.maxMultiplicity(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TopGramRun.maxMultiplicity($c, $n)")

  override protected def withNewChildInternal(c: Expression): TopGramRun = copy(child = c)
}

object TopGramRun {
  private val Space = UTF8String.fromString(" ")

  /** Called from both interpreted eval and generated code. */
  def maxMultiplicity(toks: ArrayData, n: Int): Long = {
    val sz = toks.numElements()
    if (sz < n) return 0L
    val counts = new java.util.HashMap[UTF8String, Int](sz * 2)
    var best = 0
    var i = 0
    val parts = new Array[UTF8String](n)
    while (i <= sz - n) {
      var j = 0
      while (j < n) { parts(j) = toks.getUTF8String(i + j); j += 1 }
      // array_join skips null elements; split() never yields them, but
      // match the declarative semantics exactly anyway
      val gram = UTF8String.concatWs(Space, parts: _*)
      val c = counts.merge(gram, 1, (a, b) => a + b)
      if (c > best) best = c
      i += 1
    }
    best.toLong
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "top_gram_run",
      exprs => TopGramRun(exprs.head, exprs(1) match {
        case Literal(v: Int, _) => v
        case other => other.eval(InternalRow.empty).asInstanceOf[Int]
      }),
      "scala_udf")

  def topGramRun(spark: SparkSession)(toks: Column, n: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("top_gram_run", toks,
      org.apache.spark.sql.functions.lit(n))
  }
}
