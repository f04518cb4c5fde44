package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint selection (Schleimer et al. 2003) as ONE
  * codegen'd O(n) pass per document: `winnow_fingerprints(text, k, w)`
  * returns `array<struct<pos int, h long>>` — the 1-based codepoint
  * position and hash of every `k`-gram that is the RIGHTMOST MINIMUM of
  * at least one window of `w` consecutive k-gram hashes. Expected
  * density 2/(w+1) of the k-gram positions.
  *
  * The declarative formulation (per-window `slice` + fold over a hash
  * array) is O(n·w) with three allocations per window — measured 4×
  * slower than the full unsampled pass it was meant to undercut. This
  * kernel is the classic O(n) shape: one rolling polynomial hash over
  * codepoints (wrapping 64-bit, finalized with a murmur fmix so window
  * minima spread), one monotonic-deque sliding minimum, no allocation
  * beyond the output.
  *
  * Determinism is the only hash property correctness needs: selection
  * depends on content alone, so two documents sharing a window-sized
  * region select the same aligned position in it (the winnowing
  * guarantee); collisions at the join are verified away by byte
  * extension downstream. Ties inside a window break to the RIGHTMOST
  * position on both sides of any shared region — the deque pops equal
  * hashes, so the latest equal index wins.
  */
case class WinnowFingerprints(str: Expression, kExpr: Expression,
    wExpr: Expression) extends TernaryExpression {

  override def first: Expression = str
  override def second: Expression = kExpr
  override def third: Expression = wExpr

  override def checkInputDataTypes(): TypeCheckResult =
    (str.dataType, kExpr.dataType, wExpr.dataType) match {
      case (StringType, IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"winnow_fingerprints expects (string, int, int), got " +
          s"(${a.simpleString}, ${b.simpleString}, ${c.simpleString})")
    }
  override def dataType: DataType = WinnowFingerprints.Schema
  override def prettyName: String = "winnow_fingerprints"

  override def nullSafeEval(s: Any, k: Any, w: Any): Any =
    WinnowFingerprints.select(s.asInstanceOf[UTF8String],
      k.asInstanceOf[Int], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, k, w) =>
      s"graft.functions.WinnowFingerprints.select($s, $k, $w)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): WinnowFingerprints =
    copy(f, s, t)
}

object WinnowFingerprints {

  val Schema: DataType = ArrayType(StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("h", LongType, nullable = false))), containsNull = false)

  // odd multiplier (golden-ratio constant) for the wrapping polynomial;
  // fmix64 finalizer spreads the weak low bits before comparisons
  private val Base = 0x9E3779B97F4A7C15L

  private def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xFF51AFD7ED558CCDL
    x ^= x >>> 33; x *= 0xC4CEB9FE1A85EC53L
    x ^= x >>> 33
    x
  }

  /** Called from both interpreted eval and generated code. */
  def select(s: UTF8String, k: Int, w: Int): ArrayData = {
    require(k >= 1 && w >= 1, s"winnow_fingerprints: need k,w >= 1, got ($k, $w)")
    val str = s.toString
    val nChars = str.codePointCount(0, str.length)
    val nk = nChars - k + 1
    if (nk <= 0) return new GenericArrayData(Array.empty[Any])
    val cps = new Array[Long](nChars)
    var ci = 0
    var n = 0
    while (ci < str.length) {
      val cp = str.codePointAt(ci)
      cps(n) = cp.toLong
      n += 1
      ci += Character.charCount(cp)
    }
    // rolling hash: raw(i) = sum_j cps(i+j) * Base^(k-1-j)  (wrapping),
    // h(i) = fmix64(raw(i))
    var pow = 1L // Base^(k-1)
    var j = 1
    while (j < k) { pow *= Base; j += 1 }
    val hs = new Array[Long](nk)
    var raw = 0L
    j = 0
    while (j < k) { raw = raw * Base + cps(j); j += 1 }
    hs(0) = fmix64(raw)
    var i = 1
    while (i < nk) {
      raw = (raw - cps(i - 1) * pow) * Base + cps(i + k - 1)
      hs(i) = fmix64(raw)
      i += 1
    }
    // monotonic-deque sliding rightmost-min over windows of ws hashes
    val ws = math.min(w, nk)
    val dq = new Array[Int](nk)
    var head = 0
    var tail = 0 // exclusive
    val out = new java.util.ArrayList[Any]()
    var lastSel = -1
    i = 0
    while (i < nk) {
      while (tail > head && hs(dq(tail - 1)) >= hs(i)) tail -= 1
      dq(tail) = i
      tail += 1
      if (i >= ws - 1) {
        while (dq(head) < i - ws + 1) head += 1
        val sel = dq(head)
        if (sel != lastSel) {
          out.add(InternalRow(sel + 1, hs(sel)))
          lastSel = sel
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "winnow_fingerprints",
      exprs => WinnowFingerprints(exprs.head, exprs(1), exprs(2)), "scala_udf")
}
