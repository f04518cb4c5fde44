package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** RFC 3986 dot-segment removal as ONE codegen'd expression — the
  * shared normalizer behind both URL entry points
  * (`TextAnalysis.canonicalUrlCol` and `resolveUrlCol`).
  *
  * Semantics are EXACTLY the declarative chain the oracle replays:
  * [[DotSegmentFold.Folds]] (five java-regex (pattern, replacement)
  * pairs — the single source of truth the DuckDB oracle chain is also
  * generated from) applied in order, [[DotSegmentFold.Depth]] rounds,
  * each `replaceAll` over the full string. java.util.regex is the same
  * engine Spark's own `regexp_replace` uses, so kernel output is
  * bit-identical to 40 chained `regexp_replace` calls — the kernel
  * exists because 40 chained regex scans per URL is a measured 2×
  * slowdown on the URL query family, while almost no real URL contains
  * a dot-segment at all.
  *
  * Fast paths, both semantics-preserving:
  *  - every fold pattern requires the substring `/.` — one `indexOf`
  *    over the bytes skips ALL regex work for the dot-free majority
  *    (and re-checks after each round, since folds only ever remove
  *    `/.` occurrences);
  *  - a round in which all five `replaceAll`s change nothing is a
  *    fixpoint — later rounds are the identity, so the loop exits
  *    early instead of always paying all Depth rounds.
  */
case class DotSegmentFold(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"dot_segment_fold expects string, got ${t.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "dot_segment_fold"

  override def nullSafeEval(v: Any): Any =
    DotSegmentFold.fold(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DotSegmentFold.fold($c)")

  override protected def withNewChildInternal(c: Expression): DotSegmentFold =
    copy(c)
}

object DotSegmentFold {

  /** RFC-exact poppable segment: any segment that is neither `.` nor
    * `..` (so `...` IS poppable). */
  private val Seg = "[^/.?#][^/?#]*|\\.[^/.?#][^/?#]*|\\.\\.[^/?#]+"

  /** The five-fold chain, in application order (see
    * `TextAnalysis.DotSegmentFolds` scaladoc for why the order
    * matters: `/./` collapse first so a revealed leading `/../` is
    * clamped within the same round; trailing pops before the interior
    * pop so an authority-ending `/..` waits for the next round's
    * clamp). Replacement syntax is java's `$n` — the oracle generator
    * translates to RE2's `\n`. */
  val Folds: Seq[(String, String)] = Seq(
    ("(/\\.)+/", "/"),
    ("^([a-z][a-z0-9+.-]*://[^/?#]*)(/\\.\\.)+(/|$)", "$1$3"),
    (s"/($Seg)/\\.\\.$$", "/"),
    ("(/\\.)+$", "/"),
    (s"/($Seg)/\\.\\./", "/"))

  /** Rounds per application: resolves any nesting a real crawl emits;
    * deeper residue survives visibly rather than corrupting. */
  val Depth = 8

  private val compiled: Array[(Pattern, String)] =
    Folds.map { case (p, r) => (Pattern.compile(p), r) }.toArray

  /** Called from both interpreted eval and generated code. */
  def fold(s: UTF8String): UTF8String = {
    var cur = s.toString
    // every pattern needs a literal "/." — dot-free URLs (the vast
    // majority) exit before any regex allocation
    if (!cur.contains("/.")) return s
    var round = 0
    var changed = true
    while (round < Depth && changed) {
      changed = false
      var i = 0
      while (i < compiled.length) {
        val (p, r) = compiled(i)
        val nxt = p.matcher(cur).replaceAll(r)
        if (nxt != cur) { cur = nxt; changed = true }
        i += 1
      }
      round += 1
      if (changed && !cur.contains("/.")) changed = false
    }
    UTF8String.fromString(cur)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_segment_fold", exprs => DotSegmentFold(exprs.head), "scala_udf")
}
