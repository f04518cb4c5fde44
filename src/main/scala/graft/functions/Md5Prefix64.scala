package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 60-bit md5-prefix hash of a string as ONE codegen'd expression —
  * semantically identical to `conv(substring(md5(s), 1, 15), 16, 10)
  * .cast(long)` (the cross-engine hash convention shared with the DuckDB
  * oracle, see Dedup.hash64) but computed directly from the first 8
  * digest bytes: no 32-char hex string materialization, no base-16
  * string parse. The MinHash path evaluates this k times per shingle, so
  * the fused form removes the dominant allocation in that family.
  *
  * First 15 hex chars = first 7.5 bytes = (first 8 bytes as big-endian
  * u64) >>> 4.
  */
case class Md5Prefix64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"md5_prefix64 expects string, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix64"

  override def nullSafeEval(v: Any): Any =
    Md5Prefix64.hash(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Prefix64.hash($c)")

  override protected def withNewChildInternal(c: Expression): Md5Prefix64 = copy(c)
}

object Md5Prefix64 {
  private val digest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Called from both interpreted eval and generated code. */
  def hash(s: UTF8String): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "md5_prefix64", exprs => Md5Prefix64(exprs.head), "scala_udf")

  def md5Prefix64(spark: SparkSession)(c: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("md5_prefix64", c)
  }
}
