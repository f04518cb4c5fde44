package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType}

/** N-dimensional z-order (Morton) interleave as ONE compact codegen
  * expression — the hot-loop form of [[graft.util.ZOrder.zValueSpec]].
  *
  * The composed form — a `reduce(_ + _)` over one
  * `shiftleft(shiftright(dim, j) & 1, p)` term per interleaved bit — is
  * semantically right but a codegen hazard: a 2×16-bit layout is 32
  * nested terms, and a plan that both FILTERS on z and PROJECTS z (the
  * q79/q95 box-query shape) inlines that tree twice into one generated
  * method. The method still compiles (janino is fine) but crosses
  * HotSpot's 8000-bytecode `DontCompileHugeMethods` ceiling, so the
  * whole stage — scan, filter, project, partial aggregate — runs in the
  * BYTECODE INTERPRETER with no warning anywhere: measured ~4.3 s for a
  * 600k-row scan whose compiled form runs in ~0.4 s (same hazard class
  * as [[SignMask64]]'s inline-literal planes, and the reason that
  * expression exists). At 100 TB the same ceiling would put every
  * z-layout write ([[graft.util.ZOrder.writeZOrderedN]]) in the
  * interpreter.
  *
  * This expression instead carries the (dim, srcBit, dstPos) layout
  * table as a runtime object (`ctx.addReferenceObj`) and loops in a
  * static helper: constant-size generated code regardless of bit
  * budgets, JIT-compiled, identical values (ZOrderSpec pins equality
  * against the driver-side [[graft.util.ZOrder.zOfN]] which the DuckDB
  * oracles also replay).
  *
  * Null semantics: null if ANY dimension is null — identical to the
  * `+`-tree it replaces.
  */
case class ZValue(dims: Seq[Expression], layout: Array[Int])
    extends Expression {

  override def children: Seq[Expression] = dims

  override def checkInputDataTypes(): TypeCheckResult = {
    val bad = dims.filterNot(_.dataType == LongType)
    if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_zvalue expects bigint dims, got " +
        bad.map(_.dataType.simpleString).mkString(", "))
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = dims.exists(_.nullable)
  override def prettyName: String = "graft_zvalue"

  override def eval(input: InternalRow): Any = {
    val vals = new Array[Long](dims.length)
    var k = 0
    while (k < dims.length) {
      val v = dims(k).eval(input)
      if (v == null) return null
      vals(k) = v.asInstanceOf[Long]
      k += 1
    }
    ZValue.interleave(layout, vals)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("layout", layout, "int[]")
    val evs = dims.map(_.genCode(ctx))
    val arr = ctx.freshName("zvals")
    val nullCheck =
      if (nullable) evs.map(_.isNull.toString).mkString(" || ") else "false"
    ev.copy(code =
      code"""
        ${evs.map(_.code).reduce(_ + _)}
        boolean ${ev.isNull} = $nullCheck;
        long ${ev.value} = -1L;
        if (!${ev.isNull}) {
          long[] $arr = new long[]{${evs.map(_.value).mkString(", ")}};
          ${ev.value} = graft.functions.ZValue.interleave($ref, $arr);
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZValue = copy(dims = newChildren)
}

object ZValue {
  /** Shared by interpreted eval and generated code: layout is flattened
    * (dim, srcBit, dstPos) triples. */
  def interleave(layout: Array[Int], vals: Array[Long]): Long = {
    var z = 0L
    var i = 0
    while (i < layout.length) {
      z |= ((vals(layout(i)) >>> layout(i + 1)) & 1L) << layout(i + 2)
      i += 3
    }
    z
  }

  /** Column constructor. Registration goes through the function registry
    * (Column-from-Expression is session-internal in Spark 4); the layout
    * table rides in a registry closure keyed by a 128-bit MD5 of its
    * content — a lossless-for-all-practical-purposes key, unlike 32-bit
    * String.hashCode where two distinct layouts could collide and
    * createOrReplaceTempFunction would silently rebind the name. */
  def zCol(spark: SparkSession, dims: Seq[Column], layout: Array[Int]): Column = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(layout.mkString("_").getBytes("UTF-8"))
    val name = s"graft_zvalue_${md.map("%02x".format(_)).mkString}"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => ZValue(exprs, layout), "scala_udf")
    org.apache.spark.sql.functions.call_function(name, dims: _*)
  }
}
