package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}

/** Join adjudication probe: executes a registered query under the bench
  * harness config (local[32], shuffle.partitions=32, full-eval row-hash
  * action) and prints every join in the FINAL adaptive plan together
  * with the runtime `dataSize` of the exchanges feeding it. The number
  * that matters is each broadcast/shuffle side's dataSize versus
  * spark.sql.adaptive.autoBroadcastJoinThreshold — a side hovering at
  * that boundary is a join whose strategy AQE may flip run-to-run
  * (the q108 plan_delta in bench_history/diff-0013-0014.json).
  *
  * Usage: runMain graft.tools.JoinAudit <sfDir> <queryPrefix> [passes]
  */
object JoinAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val prefix = if (args.length > 1) args(1) else "q108"
    val passes = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val name = graft.SparkEntry.queries.keys.toSeq.sorted
      .find(_.startsWith(prefix))
      .getOrElse(sys.error(s"no query starting with $prefix"))
    println(s"== $name @ $sfDir ==")
    println(s"autoBroadcastJoinThreshold = " +
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold") +
      ", adaptive.autoBroadcastJoinThreshold = " +
      spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
        .getOrElse("(follows non-adaptive)"))

    def finalPlan(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    def describe(p: SparkPlan, depth: Int): Unit = {
      val pad = "  " * depth
      // walk through AQE wrappers (QueryStageExec is a LEAF node holding
      // the materialized exchange in `plan`) to the first exchange and
      // report its measured dataSize
      def exch(c: SparkPlan): String = c match {
        case s: org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec =>
          val bytes = s.mapStats.map(_.bytesByPartitionId.sum).getOrElse(-1L)
          f"shuffle-stage mapOutputBytes=$bytes%,d B, " + exch(s.plan)
        case b: org.apache.spark.sql.execution.adaptive.BroadcastQueryStageExec =>
          "broadcast-stage: " + exch(b.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          "reused: " + exch(r.child)
        case b: BroadcastExchangeExec =>
          f"broadcast dataSize=${b.metrics.get("dataSize").map(_.value).getOrElse(-1L)}%,d B rows=${b.metrics.get("numOutputRows").map(_.value).getOrElse(-1L)}%,d"
        case s: ShuffleExchangeExec =>
          f"shuffle dataSize=${s.metrics.get("dataSize").map(_.value).getOrElse(-1L)}%,d B"
        case other if other.children.size == 1 => exch(other.children.head)
        case other => s"no-exchange(${other.nodeName})"
      }
      p match {
        case j: BroadcastHashJoinExec =>
          println(s"${pad}BHJ keys=${j.leftKeys.map(_.sql).mkString(",")} type=${j.joinType} buildSide=${j.buildSide}")
          println(s"$pad  L: ${exch(j.left)}")
          println(s"$pad  R: ${exch(j.right)}")
        case j: SortMergeJoinExec =>
          println(s"${pad}SMJ keys=${j.leftKeys.map(_.sql).mkString(",")} type=${j.joinType}")
          println(s"$pad  L: ${exch(j.left)}")
          println(s"$pad  R: ${exch(j.right)}")
        case j: ShuffledHashJoinExec =>
          println(s"${pad}SHJ keys=${j.leftKeys.map(_.sql).mkString(",")} type=${j.joinType} buildSide=${j.buildSide}")
          println(s"$pad  L: ${exch(j.left)}")
          println(s"$pad  R: ${exch(j.right)}")
        case _ =>
      }
      p.children.foreach(describe(_, depth))
      p match {
        case a: AdaptiveSparkPlanExec => describe(a.executedPlan, depth + 1)
        // materialized stages are leaves — the joins live inside them
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          describe(q.plan, depth)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          println(s"${"  " * depth}(reused exchange subtree skipped)")
        case _ =>
      }
      p.subqueries.foreach(describe(_, depth + 1))
    }

    for (pass <- 1 to passes) {
      println(s"-- pass $pass --")
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      // the dataset we EXECUTE is the one whose AQE-final plan matters —
      // inspecting the unexecuted `df` would show the initial plan
      // (SMJ-by-stats, before runtime broadcast conversion)
      val hashed = df.select(org.apache.spark.sql.functions.xxhash64(
          df.columns.toIndexedSeq.map(df.col): _*).as("_row_hash"))
        .agg(org.apache.spark.sql.functions.expr("bit_xor(_row_hash)"))
      // collect() (NOT head(): head plans a separate limit query and
      // leaves this instance's AQE un-finalized) — 1 row either way
      hashed.collect()
      describe(finalPlan(hashed.queryExecution.executedPlan), 0)
    }
    spark.stop()
  }
}
