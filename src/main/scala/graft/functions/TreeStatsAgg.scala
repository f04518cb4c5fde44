package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import graft.stats.{TreeInput, TreeStats, TreeStatsRow}

/** Whole-conversation tree statistics as a TypedImperativeAggregate:
  * `groupBy(group_id).agg(tree_stats_agg(cols...))` → array of 41-field
  * stat structs, exploded downstream.
  *
  * Why an aggregate instead of `groupByKey.flatMapGroups` (the previous
  * path, kept as [[graft.stats.TreeStats.computeViaFlatMapGroups]]):
  * update() reads 9 primitive columns straight off the UnsafeRow — no
  * per-row Encoder roundtrip, no object churn on the shuffle path — and
  * rows PACK map-side into one compact buffer per group (72 bytes/node),
  * so the exchange moves packed longs, not wide rows. The forest build +
  * post-order DFS ([[TreeStats.processGroup]]) runs once per group at
  * eval. Row order within a group is irrelevant: processGroup sorts
  * children-before-parents itself, keeping MAD float summation order
  * deterministic regardless of partial-aggregation merge order.
  *
  * Reference: the per-conversation loop of
  * `3_create_tweet_stats_i.py:353-361`, same semantics as
  * [[TreeStats.processGroup]] (parity-tested against NaiveTreeStats).
  */
case class TreeStatsAgg(
    children: Seq[Expression],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[Array[Long]]] {

  private val NullSentinel = Long.MinValue

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.size != 9)
      TypeCheckResult.TypeCheckFailure(
        s"tree_stats_agg expects 9 arguments, got ${children.size}")
    else if (!children.forall(_.dataType == LongType))
      TypeCheckResult.TypeCheckFailure(
        s"tree_stats_agg expects bigint arguments, got " +
          children.map(_.dataType.simpleString).mkString(", "))
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType =
    ArrayType(TreeStatsAgg.rowSchema, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "tree_stats_agg"

  override def createAggregationBuffer(): mutable.ArrayBuffer[Array[Long]] =
    new mutable.ArrayBuffer[Array[Long]]

  override def update(buffer: mutable.ArrayBuffer[Array[Long]],
                      input: InternalRow): mutable.ArrayBuffer[Array[Long]] = {
    val packed = new Array[Long](9)
    var i = 0
    while (i < 9) {
      val v = children(i).eval(input)
      packed(i) = if (v == null) NullSentinel else v.asInstanceOf[Long]
      i += 1
    }
    buffer += packed
    buffer
  }

  override def merge(b1: mutable.ArrayBuffer[Array[Long]],
                     b2: mutable.ArrayBuffer[Array[Long]]): mutable.ArrayBuffer[Array[Long]] = {
    b1 ++= b2
    b1
  }

  override def eval(buffer: mutable.ArrayBuffer[Array[Long]]): Any = {
    def opt(v: Long): Option[Long] = if (v == NullSentinel) None else Some(v)
    val inputs = buffer.iterator.map(a => TreeInput(
      tweet_id = a(0), author_id = a(1),
      in_reply_to = opt(a(2)), retweet_of = opt(a(3)), quotes = opt(a(4)),
      reply_count = a(5), quote_count = a(6), like_count = a(7),
      retweet_count = a(8), group_id = 0L))
    val out = TreeStats.processGroup(inputs)
      .map(r => new GenericInternalRow(r.productIterator.toArray))
      .toArray[Any]
    new GenericArrayData(out)
  }

  override def serialize(buffer: mutable.ArrayBuffer[Array[Long]]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buffer.length * 9 * 8)
    bb.putInt(buffer.length)
    buffer.foreach { a =>
      var i = 0
      while (i < 9) { bb.putLong(a(i)); i += 1 }
    }
    bb.array()
  }

  override def deserialize(storage: Array[Byte]): mutable.ArrayBuffer[Array[Long]] = {
    val bb = ByteBuffer.wrap(storage)
    val n = bb.getInt
    val buf = new mutable.ArrayBuffer[Array[Long]](n)
    var r = 0
    while (r < n) {
      val a = new Array[Long](9)
      var i = 0
      while (i < 9) { a(i) = bb.getLong; i += 1 }
      buf += a
      r += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TreeStatsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TreeStatsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TreeStatsAgg =
    copy(children = newChildren)
}

object TreeStatsAgg {

  /** Schema of one emitted stat struct — derived from the same case
    * class the rest of the engine uses, so the two cannot drift. */
  val rowSchema: StructType =
    org.apache.spark.sql.Encoders.product[TreeStatsRow].schema

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "tree_stats_agg", exprs => TreeStatsAgg(exprs), "scala_udf")
}
