package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** RFC 3986 §2.3 percent-decode of UNRESERVED octets only, fused with
  * the canonicalization casefold — one codegen'd byte scan per URL.
  *
  * `%41`→`a` (letters fold to lowercase — the operator runs inside
  * [[graft.ext.TextAnalysis.canonicalUrlCol]], whose keys are
  * lowercase), `%7e`→`~`, `%2e`→`.`, digits likewise; RESERVED escapes
  * (`%2f`, `%3f`, `%23`, `%25`, …) are left encoded — decoding them
  * would change which slashes/queries the URL has, the over-merge this
  * fold exists to avoid. A `%` not followed by two hex digits passes
  * through untouched. Single left-to-right scan, no rescan of decoded
  * output: `%2541` yields `%2541` (the `%25` stays), so the decode
  * never cascades WITHIN one application.
  *
  * Idempotence holds only for inputs without self-referential `%`
  * assembly: a scan output can contain a NEW unreserved escape
  * assembled from a passed-through `%` plus decoded digits (e.g.
  * `%%341` → `%41`, which a second application would take to `a`), so
  * decode∘decode ≠ decode on such adversarial inputs. Real crawl URLs
  * never percent-encode the hex digits of another escape; the
  * canonical key is defined as ONE application of this scan, applied
  * exactly once per URL inside canonicalUrlCol — the single-pass
  * definition is the contract, not a fixpoint.
  *
  * The DuckDB oracle twin is a per-code `replace()` chain generated
  * from the same constant table
  * ([[graft.ext.TextAnalysis.UnreservedDecodes]]); its pass-per-code
  * shape matches the single scan except on self-referential encodings
  * (a decoded octet completing ANOTHER `%` sequence — `%6%311`, or the
  * `%%341` assembly above) — outside the parity contract and absent
  * from the query injections.
  */
case class PctDecodeUnreserved(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pct_decode_unreserved expects string, got ${t.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "pct_decode_unreserved"

  override def nullSafeEval(v: Any): Any =
    PctDecodeUnreserved.decode(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PctDecodeUnreserved.decode($c)")

  override protected def withNewChildInternal(c: Expression): PctDecodeUnreserved =
    copy(c)
}

object PctDecodeUnreserved {

  private def hexVal(b: Byte): Int = b match {
    case d if d >= '0' && d <= '9' => d - '0'
    case l if l >= 'a' && l <= 'f' => l - 'a' + 10
    case u if u >= 'A' && u <= 'F' => u - 'A' + 10
    case _ => -1
  }

  private def isUnreserved(v: Int): Boolean =
    (v >= 'A' && v <= 'Z') || (v >= 'a' && v <= 'z') ||
      (v >= '0' && v <= '9') || v == '-' || v == '.' || v == '_' || v == '~'

  /** Called from both interpreted eval and generated code. */
  def decode(s: UTF8String): UTF8String = {
    val b = s.getBytes
    val out = new Array[Byte](b.length)
    var i = 0
    var o = 0
    var changed = false
    while (i < b.length) {
      if (b(i) == '%' && i + 2 < b.length
          && hexVal(b(i + 1)) >= 0 && hexVal(b(i + 2)) >= 0
          && isUnreserved(hexVal(b(i + 1)) * 16 + hexVal(b(i + 2)))) {
        val v = hexVal(b(i + 1)) * 16 + hexVal(b(i + 2))
        out(o) = (if (v >= 'A' && v <= 'Z') v + 32 else v).toByte
        o += 1
        i += 3
        changed = true
      } else {
        out(o) = b(i)
        o += 1
        i += 1
      }
    }
    if (!changed) s else UTF8String.fromBytes(java.util.Arrays.copyOf(out, o))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_pct_decode", exprs => PctDecodeUnreserved(exprs.head), "scala_udf")
}
