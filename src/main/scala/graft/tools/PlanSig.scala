package graft.tools

import java.security.MessageDigest

import scala.collection.mutable

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Executed-plan fingerprints: a stable structural signature for every
  * SQL action a query runs, so a bench diff can distinguish "the PLAN
  * changed" from "the same plan moved bytes" without manual forensics.
  *
  * Motivation (round-16): run-to-run diffs showed q05/q126 shuffle-byte
  * drift (1-9%) with no code change. Byte telemetry alone cannot say
  * whether that is a flapping AQE decision (broadcast conversion, skew
  * split — a real plan change worth adjudicating) or ambient
  * compressed-size drift under an IDENTICAL plan. The fingerprint
  * answers it: equal signatures across runs pin plan identity exactly;
  * the byte drift is then ambient by construction.
  *
  * Signature design: a DFS walk of the EXECUTED plan (descending into
  * the final adaptive plan of every [[AdaptiveSparkPlanExec]] and into
  * executed subqueries) emitting each node's `nodeName` — which carries
  * the physical strategy (BroadcastHashJoin vs SortMergeJoin,
  * AQEShuffleRead presence, aggregate implementation) but NOT runtime
  * tuning values (coalesced partition counts, exprIds, statistics), so
  * the signature is stable under ambient noise and moves exactly when
  * the strategy moves. A query that runs k actions (iterative loops)
  * folds k per-action signatures into one MD5 in execution order; the
  * action count rides beside the hash.
  */
object PlanSig {

  /** Signature-algorithm version, carried in every fingerprint: two
    * sigs are comparable ONLY at equal versions (bench_diff falls back
    * to byte classification otherwise). Bump when the normalization
    * rules change. v2 = wiring nodes + ReusedExchange resolution +
    * BroadcastExchange + leftover ensure-requirements shuffles under
    * broadcast joins. v3 = `funcName == "rdd"` events excluded from
    * the fold: `Dataset.rdd` is pure lineage construction (zero jobs —
    * any real work reports through the downstream action that consumes
    * the RDD), yet it fires a listener event whose async arrival races
    * the measurement window — the round-17 sig_flap find (Scale.widen's
    * partition probe made the same query fold 1 or 2 actions by bus
    * timing). The source was also fixed (widen reads toRdd, which is
    * listener-silent); the fold-side exclusion makes fingerprints
    * robust to any future lineage access. v4 = ensure-requirements
    * shuffles are normalized away entirely (skipped, descended
    * through — the BroadcastExchange treatment). Evidence trail
    * (round 19, VERDICT r18 item 5): the jaccard_pairs flap
    * (SCALEPROBE_r17/r18 sig_flap=true) did NOT reproduce on registry
    * q31 in a 12-iteration VarianceProbe
    * (bench_history/q31-varianceprobe-r19.txt), ruling out the
    * SIG_CLASSES route; a first v4 draft normalized only the
    * exchanges' POSITION (count suffix kept), and the re-probe
    * flapped AGAIN with byte-identical trees and counts 11 vs 10
    * (bench_history/jaccard-flap-v4count-r19.txt) — proving the r16b
    * "empty-hot-tier leftover exchange" class is a PRESENCE race
    * (AQE's empty-relation join rewrite leaves an already-
    * materialized exchange feeding the replacement projection, or
    * not, by stage timing), which no position rule can pin. So v4
    * erases these exchanges from plan identity altogether, on the
    * BroadcastExchange argument: an ensure-requirements shuffle is
    * IMPLIED by the strategy nodes the sig does carry (SMJ keeps its
    * Sorts, aggregates keep their two phases), and a real added/lost
    * shuffle announces itself in shuffle bytes — which bench_diff
    * reads beside the sig and escalates as same_plan_work_delta (the
    * >5% rule). The node HISTOGRAM still counts exchanges, so the
    * adjudication artifact keeps the signal the identity drops. User
    * repartitions (REPARTITION_BY_* origins) remain tree nodes. */
  val version = 4

  /** Final physical plan beneath any adaptive wrapper. Query-stage
    * wrappers are CHILDLESS (their subtree lives in `.plan`), so a walk
    * that doesn't unwrap them sees only the root stage and every
    * signature degenerates to the same string — unwrap both. */
  def finalPlan(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => finalPlan(a.executedPlan)
    case q: QueryStageExec => finalPlan(q.plan)
    // ReusedExchangeExec is a LEAF (the referenced exchange is a field,
    // not a child, so tree walks don't double-count it) — resolve to
    // the referenced subtree so reuse-vs-rebuild wiring is invisible.
    case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
      finalPlan(r.child)
    case other => other
  }

  /** Wiring/tactic nodes that legitimately differ between two runs of
    * the SAME strategy, measured (round-16 q126 probe, 6 iterations = 6
    * raw sigs, node histogram constant at bhj=24/shj=1):
    *  - WholeStageCodegen carries a stage id assigned in AQE
    *    re-planning order, which races across parallel stage
    *    materialization ("WholeStageCodegen (11)" vs "(5)" run-to-run);
    *  - AQEShuffleRead (coalesce / local-read tactics) appears or
    *    vanishes with materialization timing;
    *  - ReusedExchange vs a rebuilt exchange is a DEDUP tactic: whether
    *    AQE reuses an already-materialized exchange depends on which
    *    stage won the race. Reuse is content-identical by definition,
    *    so the walk descends into the referenced subtree instead —
    *    both wirings then emit the same string.
    * These are skipped (descended through, not emitted), making the
    * signature a LOGICAL-STRATEGY identity. The trade-off is explicit:
    * a lost reuse (computing one exchange twice) does not move the sig
    * — bytes/jobs telemetry carries that class, the sig carries
    * strategy. */
  /** BroadcastExchange is wiring too: which CHILD of a broadcast join
    * carries the wrapper is AQE's runtime build-side tie-break (q126
    * probe: the wrapper moved left↔right between iterations on
    * near-equal stage sizes). The join node name already states the
    * broadcast strategy, so the wrapper adds no identity — and a
    * deliberate build-side regression (broadcasting the big side)
    * announces itself in bytes/jobs, which the diff carries beside the
    * sig. */
  private def isWiring(name: String): Boolean =
    name.startsWith("WholeStageCodegen") || name == "InputAdapter" ||
      name == "AQEShuffleRead" || name.startsWith("BroadcastExchange")
  // ReusedExchange is resolved in finalPlan

  /** Pre-v4 history, kept for the record: v2 skipped
    * ensure-requirements exchanges only under broadcast joins (no
    * child of one can REQUIRE a shuffle, so such an exchange is a
    * leftover of AQE's join conversion — measured on q214: the same
    * read flapped Exchange-present/absent across 4 iterations with
    * the node histogram constant). v4 showed the same
    * presence/position race exists AWAY from broadcast joins too
    * (the jaccard empty-hot-tier leftover class) and subsumed the
    * special case — every ENSURE_REQUIREMENTS exchange is now
    * normalized; user repartitions keep their own shuffleOrigin
    * (REPARTITION_BY_*) and are never skipped. */
  private def isEnsureShuffle(p: SparkPlan): Boolean = p match {
    case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
      s.shuffleOrigin == org.apache.spark.sql.execution.exchange.ENSURE_REQUIREMENTS
    case _ => false
  }

  /** DFS structural signature: node names with tree shape, adaptive
    * wrappers resolved to their final plans, wiring/tactic nodes
    * normalized away, subqueries appended. Since v4 EVERY
    * ensure-requirements shuffle is normalized away (skipped,
    * descended through) — see the version scaladoc for the evidence
    * that both their position AND presence race AQE re-planning; the
    * pre-v4 `underBcastJoin` special case is subsumed. User
    * repartitions (REPARTITION_BY_* origins) stay tree nodes. */
  def signature(plan: SparkPlan): String = {
    val sb = new StringBuilder
    def walk(p: SparkPlan): Unit = {
      val n = finalPlan(p)
      if (isWiring(n.nodeName) || isEnsureShuffle(n)) {
        (n.children ++ n.subqueries).foreach(walk)
      } else {
        sb.append(n.nodeName)
        val subs = n.subqueries
        if (n.children.nonEmpty || subs.nonEmpty) {
          sb.append('(')
          var first = true
          (n.children ++ subs).foreach { c =>
            if (!first) sb.append(',')
            first = false
            walk(c)
          }
          sb.append(')')
        }
      }
    }
    walk(plan)
    sb.toString
  }

  /** Histogram of strategy-relevant node classes in one plan tree
    * (adaptive wrappers resolved). Keys are a fixed vocabulary so the
    * artifact stays compact and diffs stay aligned. */
  def nodeHistogram(plan: SparkPlan): Map[String, Long] = {
    val counts = mutable.Map.empty[String, Long].withDefaultValue(0L)
    def walk(p: SparkPlan): Unit = {
      val n = finalPlan(p)
      val key = n.nodeName match {
        case s if s.startsWith("BroadcastHashJoin") => "bhj"
        case s if s.startsWith("SortMergeJoin") => "smj"
        case s if s.startsWith("ShuffledHashJoin") => "shj"
        case s if s.startsWith("BroadcastNestedLoopJoin") => "bnlj"
        case s if s.startsWith("CartesianProduct") => "cartesian"
        case s if s.startsWith("Exchange") || s.startsWith("ShuffleExchange") => "exchange"
        case s if s.startsWith("BroadcastExchange") => "bcast_exchange"
        case s if s.startsWith("AQEShuffleRead") => "aqe_read"
        case s if s.startsWith("HashAggregate") => "hash_agg"
        case s if s.startsWith("ObjectHashAggregate") => "obj_agg"
        case s if s.startsWith("SortAggregate") => "sort_agg"
        case _ => null
      }
      if (key != null) counts(key) += 1
      (n.children ++ n.subqueries).foreach(walk)
    }
    walk(plan)
    counts.toMap
  }

  def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** One measured query's folded fingerprint. `actionSigs` are the
    * exact per-action signature strings the folded sig was computed
    * from (in fold order) — returned WITH the fingerprint so probes
    * that dump per-action plans can never disagree with the sig they
    * key the dump by (a pre-drain snapshot raced the async bus:
    * actions landing between snapshot and fold were in the sig but
    * missing from the dump — ADVICE r16). Not serialized in json. */
  case class Fingerprint(sig: String, nPlans: Int, hist: Map[String, Long],
                         actionSigs: Seq[String] = Nil) {
    def json: String = {
      val h = hist.toSeq.sortBy(_._1)
        .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
      s"""{"sig":"$sig","v":$version,"n_plans":$nPlans,"nodes":$h}"""
    }
  }

  /** Listener collecting per-action signatures. The execution-listener
    * bus is ASYNCHRONOUS (same caveat as [[ExecStats]]): callers run one
    * query at a time and drain with [[takeFingerprint]], which polls for
    * a stable action count before folding. Signatures fold in execution
    * order; full per-action signature strings are retained until the
    * next drain so probes can diff WHICH action's plan moved. */
  final class Collector extends QueryExecutionListener {
    private val sigs = mutable.ArrayBuffer.empty[String]
    private val hists = mutable.ArrayBuffer.empty[Map[String, Long]]

    override def onSuccess(funcName: String, qe: QueryExecution,
                           durationNs: Long): Unit = synchronized {
      // `rdd` events are lineage construction, not execution (v3 —
      // see the version scaladoc): no job ran, and whatever later
      // consumes the RDD reports as its own action. Folding them made
      // the fingerprint race the bus.
      if (funcName != "rdd") {
        // executedPlan is final here: onSuccess fires after the action
        // completed, so every adaptive wrapper holds its last re-plan.
        sigs += signature(qe.executedPlan)
        hists += nodeHistogram(qe.executedPlan)
      }
      ()
    }
    override def onFailure(funcName: String, qe: QueryExecution,
                           exception: Exception): Unit = ()

    private def size: Int = synchronized(sigs.length)

    /** Drain (bounded poll for bus quiescence), fold, and reset.
      * `expectPlans = true` (the measurement path: the caller just ran
      * an action) treats an EMPTY-but-stable window as a bus race, not
      * quiescence — the async ExecutionListenerBus can deliver the
      * first onSuccess well past one 25 ms poll, and an empty
      * fingerprint (sig = md5("")) comparing equal to another empty
      * fingerprint would mask a real plan change (ADVICE r16). The
      * extended wait for the first sig is bounded at 2 s; consumers
      * additionally gate on n_plans > 0 (bench_diff). */
    def takeFingerprint(expectPlans: Boolean = true): Fingerprint = {
      var last = -1
      var waited = 0
      var done = false
      while (!done && waited < 200) {
        val s = size
        val stable = s == last
        last = s
        if (stable && (s > 0 || !expectPlans || waited >= 80)) done = true
        else { Thread.sleep(25); waited += 1 }
      }
      synchronized {
        val folded = md5Hex(sigs.mkString("\n"))
        val hist = hists.foldLeft(Map.empty[String, Long]) { (acc, h) =>
          (acc.keySet ++ h.keySet).map(k =>
            k -> (acc.getOrElse(k, 0L) + h.getOrElse(k, 0L))).toMap
        }
        val fp = Fingerprint(folded, sigs.length, hist, sigs.toVector)
        sigs.clear(); hists.clear()
        // a measurement drain that folded ZERO plans is lost coverage,
        // not quiescence (ADVICE r17): either the bus outran the 2 s
        // bound, or the measured path materialized via RDD-level
        // actions (df.rdd.collect fires no QueryExecutionListener
        // event — the v3 rdd-event exclusion's blind spot). Consumers
        // already gate on n_plans > 0, which prevents a false sig
        // match, but the degradation to byte-class comparison must be
        // VISIBLE, not silent.
        if (expectPlans && fp.nPlans == 0)
          System.err.println(
            "[graft] WARN PlanSig.takeFingerprint(expectPlans=true) " +
              "drained 0 plans — the measured query's plan coverage is " +
              "lost for this sample (listener-bus overrun, or an " +
              "RDD-level materialization that fires no listener event); " +
              "its row degrades to byte-class comparison")
        fp
      }
    }

    /** Per-action signatures of the CURRENT window (probe use; does not
      * reset). */
    def currentSignatures: Seq[String] = synchronized(sigs.toVector)

    /** Open a fresh measurement window: drain the bus to stability and
      * discard everything seen so far. The drain matters — the listener
      * bus is async, so a bare clear() would let the PREVIOUS query's
      * in-flight onSuccess land inside the new window (observed in
      * PlanSigSpec: nPlans over-counted by the prior action). An empty
      * window here IS quiescence (nothing may have run since the last
      * drain), so the discard path does not extend the empty-window
      * poll. */
    def reset(): Unit = { takeFingerprint(expectPlans = false); () }
  }
}
