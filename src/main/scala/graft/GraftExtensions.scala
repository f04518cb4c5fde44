package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{ByteDot, DotSegmentFold, IdnHostAscii, LongDot, Md5Prefix64, NfcNormalize, PctDecodeUnreserved, RollingFingerprint, SimpleLower}

/** Library entry point for the SQL surface: the custom codegen
  * expressions as SQL-callable functions.
  *
  * Two ways in:
  *  - config: `spark.sql.extensions=graft.GraftExtensions` — the
  *    standard library packaging; functions exist in every session of
  *    the application, usable from `spark.sql("SELECT long_dot(a, b)")`.
  *  - programmatic: `GraftExtensions.registerAll(spark)` on an existing
  *    session (what the query registry does internally per function).
  *
  * `sign_mask64` is deliberately absent: its hyperplane matrix is a
  * constructor parameter (not a child expression), so it has no
  * argument-only SQL form — use `Similarity.cosineLshCandidates`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def info(name: String, clazz: Class[_]): ExpressionInfo =
    new ExpressionInfo(clazz.getName, name)

  /** Wraps a builder with an arity check so `SELECT long_dot(a)` fails
    * analysis with a readable wrong-number-of-arguments error instead of
    * an IndexOutOfBoundsException from inside the builder. */
  private def arity(name: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    exprs => {
      if (exprs.length != n)
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> name, "expectedNum" -> n.toString,
            "actualNum" -> exprs.length.toString,
            "docroot" -> "https://spark.apache.org/docs/latest"))
      build(exprs)
    }

  private[graft] val descriptions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("long_dot"), info("long_dot", classOf[LongDot]),
      arity("long_dot", 2)(exprs => LongDot(exprs.head, exprs(1)))),
    (FunctionIdentifier("byte_dot"), info("byte_dot", classOf[ByteDot]),
      arity("byte_dot", 2)(exprs => ByteDot(exprs.head, exprs(1)))),
    (FunctionIdentifier("md5_prefix64"), info("md5_prefix64", classOf[Md5Prefix64]),
      arity("md5_prefix64", 1)(exprs => Md5Prefix64(exprs.head))),
    (FunctionIdentifier("rolling_fp"), info("rolling_fp", classOf[RollingFingerprint]),
      arity("rolling_fp", 1)(exprs => RollingFingerprint(exprs.head))),
    (FunctionIdentifier("graft_nfc"), info("graft_nfc", classOf[NfcNormalize]),
      arity("graft_nfc", 1)(exprs => NfcNormalize(exprs.head))),
    (FunctionIdentifier("graft_pct_decode"),
      info("graft_pct_decode", classOf[PctDecodeUnreserved]),
      arity("graft_pct_decode", 1)(exprs => PctDecodeUnreserved(exprs.head))),
    (FunctionIdentifier("dot_segment_fold"),
      info("dot_segment_fold", classOf[DotSegmentFold]),
      arity("dot_segment_fold", 1)(exprs => DotSegmentFold(exprs.head))),
    (FunctionIdentifier("simple_lower"),
      info("simple_lower", classOf[SimpleLower]),
      arity("simple_lower", 1)(exprs => SimpleLower(exprs.head))),
    (FunctionIdentifier("idn_host_ascii"),
      info("idn_host_ascii", classOf[IdnHostAscii]),
      arity("idn_host_ascii", 1)(exprs => IdnHostAscii(exprs.head))))

  /** Register every function on an existing session (temp-function
    * registry — same names the extension path injects). */
  def registerAll(spark: SparkSession): Unit =
    descriptions.foreach { case (id, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(id.funcName, builder, "scala_udf")
    }
}
