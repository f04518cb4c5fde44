package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** IDN host fold: rewrite an internationalized (non-ASCII) URL host to
  * its punycode ASCII form (RFC 3490 ToASCII, via `java.net.IDN`) —
  * the last URL-canonicalization residue, closing the crawl-dedup gap
  * where `https://bücher.example/x` and its punycode twin
  * `https://xn--bcher-kva.example/x` (both of which real crawls
  * deliver for the SAME page) hash apart.
  *
  * Host parsing is RFC 3986 positional, not regex: authority starts
  * after `://`, userinfo ends at the last `@` before the first
  * `/?#`, host ends at the port `:` or the authority end. Only the
  * host substring is rewritten; scheme, userinfo, port, path, query
  * survive byte-for-byte.
  *
  * Contracts:
  *  - ASCII hosts take a scan-only fast path (no allocation, no IDN
  *    call) — the overwhelming majority of crawl URLs;
  *  - a host `java.net.IDN` rejects (bad label length, stray dots)
  *    passes through UNCHANGED — crawl garbage must surface visibly
  *    in the key, never throw;
  *  - ORACLE STATUS: DuckDB has no punycode function, so this fold is
  *    verified TABLE-DRIVEN — q210 injects hosts from a fixed
  *    constant table and its oracle replays the EXPECTED punycode
  *    literals; the driver hash gate thus proves `java.net.IDN`
  *    produces exactly the recorded form for every injected host
  *    (the q195 structural-oracle discipline). Apply BEFORE
  *    [[graft.ext.TextAnalysis.canonicalUrlCol]].
  */
case class IdnHostAscii(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"idn_host_ascii expects string, got ${t.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "idn_host_ascii"

  override def nullSafeEval(v: Any): Any =
    IdnHostAscii.fold(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.IdnHostAscii.fold($c)")

  override protected def withNewChildInternal(c: Expression): IdnHostAscii =
    copy(c)
}

object IdnHostAscii {

  /** Called from both interpreted eval and generated code. */
  def fold(u: UTF8String): UTF8String = {
    val s = u.toString
    val schemeEnd = s.indexOf("://")
    if (schemeEnd < 0) return u
    var hostStart = schemeEnd + 3
    var authEnd = s.length
    var i = hostStart
    while (i < s.length && authEnd == s.length) {
      val c = s.charAt(i)
      if (c == '/' || c == '?' || c == '#') authEnd = i
      i += 1
    }
    val at = s.lastIndexOf('@', authEnd - 1)
    if (at >= hostStart) hostStart = at + 1
    val colon = s.indexOf(':', hostStart)
    val hostEnd = if (colon >= 0 && colon < authEnd) colon else authEnd
    // ASCII fast path: scan the host bytes only
    var j = hostStart
    var ascii = true
    while (j < hostEnd && ascii) {
      if (s.charAt(j) >= 0x80) ascii = false
      j += 1
    }
    if (ascii || hostEnd <= hostStart) return u
    val folded =
      try java.net.IDN.toASCII(s.substring(hostStart, hostEnd))
      catch { case _: IllegalArgumentException => return u }
    UTF8String.fromString(
      s.substring(0, hostStart) + folded + s.substring(hostEnd))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "idn_host_ascii", exprs => IdnHostAscii(exprs.head), "scala_udf")
}
