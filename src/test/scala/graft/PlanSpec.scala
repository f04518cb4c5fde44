package graft

/** Plan-shape assertions: the PLANS.md claims, enforced. These are the
  * properties that must survive a 100 TB scale-up — column pruning into
  * the scan, broadcast dims, rank-limit pushdown — so a regression here
  * is a performance bug even while results stay correct.
  */
class PlanSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q01: lineitem scan prunes to the 4 referenced columns") {
    val plan = planOf("q01_conv_rollup")
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_suppkey:bigint,l_quantity:double,l_extendedprice:double>"),
      s"column pruning regressed:\n$plan")
  }

  test("q21: all three dimension joins broadcast (fact table never shuffles for joins)") {
    val plan = planOf("q21_broadcast_dims")
    assert("BroadcastHashJoin".r.findAllIn(plan).size == 3, plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("q06: window dedup uses rank-limit pushdown") {
    assert(planOf("q06_dedup_firstwins").contains("WindowGroupLimit"))
  }

  test("q35: top-k uses rank-limit pushdown, queries broadcast") {
    val plan = planOf("q35_ann_bruteforce")
    assert(plan.contains("WindowGroupLimit"), plan)
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"), plan)
  }

  test("q13: embeddings scan prunes the vector payload when only its size is needed") {
    // size(embedding) still needs the column, but label+vec_id+embedding
    // is all that may be read — no stray columns
    val plan = planOf("q13_array_size")
    assert(plan.contains("ReadSchema: struct<vec_id:bigint,embedding:array<float>,label:int>"), plan)
  }

  test("q46: LSH-pruned cosine pairs plan is pure equi-join — no cartesian anywhere") {
    val plan = planOf("q46_embed_cosine_lsh")
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q94: bucketed co-located join shuffles NEITHER side (only the final agg exchanges)") {
    // pin SMJ so the co-location claim is actually exercised (at this
    // fixture scale AQE would broadcast the small side and prove nothing)
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      val plan = planOf("q94_bucketed_join")
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning(okey"), plan)
      assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
    } finally spark.conf.set(key, prev)
  }

  test("q31/q45: capped jaccard plans carry no cartesian join") {
    Seq("q31_dedup_ngram_jaccard", "q45_dedup_clusters").foreach { q =>
      val plan = planOf(q)
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"$q:\n$plan")
      assert(!plan.contains("CartesianProduct"), s"$q:\n$plan")
    }
  }

  test("q232: chunk-df-capped paragraph dedup — df split is equi-join only, cut stays LeftAnti") {
    // the capped branch adds the bucket-df aggregate + cold/hot split
    // joins + the star join: every one must be a keyed equi-join
    // (never a cartesian/BNLJ — the cap exists to PREVENT a blowup,
    // it must not plan one), and the downstream first-wins cut keeps
    // q130's LeftAnti shape
    val plan = planOf("q232_paragraph_dedup_capped")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("LeftAnti"), plan)
  }

  test("q02: filter is pushed into the events scan") {
    val plan = planOf("q02_filter_agg")
    assert(plan.contains("PushedFilters: [IsNotNull(value), GreaterThan(value,10.0)]"), plan)
  }

  test("q40: fingerprint is a pure projection — zero exchanges, zero aggregates") {
    val plan = planOf("q40_fingerprint")
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("HashAggregate") && !plan.contains("SortAggregate"), plan)
  }

  test("q51/q52/q55: sampling and repetition plans are pure narrow scans — zero exchanges") {
    Seq("q51_hash_split", "q52_stratified_sample", "q55_repetition").foreach { q =>
      val plan = planOf(q)
      assert(!plan.contains("Exchange"), s"$q:\n$plan")
    }
  }

  test("q54: decontamination probes a BROADCAST eval-shingle dictionary") {
    val plan = planOf("q54_decontaminate")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q49: kmeans assignment aggregates under the broadcast — the n×k scored rows never shuffle") {
    // final assignment plan: the only exchange above the vector scan is
    // the one hash exchange of the PARTIAL min aggregate (one row per
    // vector), and the centroid side joins via broadcast
    val plan = planOf("q49_kmeans")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // the partial min must sit BELOW the shuffle: in the plan tree string
    // children print after parents, so the partial_min aggregate has to
    // appear after the hash exchange that carries its (per-vector) output
    val exchangeAt = plan.indexOf("Exchange hashpartitioning")
    val partialAt = plan.indexOf("partial_min")
    assert(partialAt >= 0, s"no partial_min aggregate in plan:\n$plan")
    assert(exchangeAt >= 0 && exchangeAt < partialAt,
      s"partial_min is not below the hash exchange — the n×k join output would shuffle:\n$plan")
  }

  test("q60: as-of join plan has NO join operator at all — union + one keyed window") {
    val plan = planOf("q60_asof_join")
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
    assert(plan.contains("Window"), plan)
    assert(plan.contains("Union"), plan)
  }

  test("q59: int8 shortlist prunes via rank-limit pushdown; queries broadcast; ByteDot kernel in use") {
    val plan = planOf("q59_ann_int8")
    assert(plan.contains("WindowGroupLimit"), plan)
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("byte_dot"), s"shortlist must score with the ByteDot kernel:\n$plan")
  }

  test("q61: bloom prefilter reaches the corpus side as a plain Filter; confirm join is shuffled, no cartesian") {
    val plan = planOf("q61_decontaminate_bloom")
    assert(plan.contains("might_contain"), s"bloom filter absent from the corpus scan side:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q62: range join is a bucketed EQUI-join — the containment predicate never drives a cartesian") {
    val plan = planOf("q62_range_join")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q64/q68: pii scrub and chunking are pure narrow projections — zero exchanges") {
    Seq("q64_pii_scrub", "q68_doc_chunks").foreach { q =>
      val plan = planOf(q)
      assert(!plan.contains("Exchange"), s"$q:\n$plan")
    }
  }

  test("q96/q98: BM25 and RRF fusion cut top-k via TakeOrdered, never a global sort") {
    Seq("q96_bm25_search", "q98_rrf_fusion").foreach { q =>
      val plan = planOf(q)
      assert(plan.contains("TakeOrderedAndProject"), s"$q:\n$plan")
    }
  }

  test("q100: PQ plan is equi-joins with a broadcast LUT — no cartesian anywhere") {
    val plan = planOf("q100_ann_pq")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("q101: IVFPQ plan is equi-joins with broadcast probes/LUT — no cartesian anywhere") {
    val plan = planOf("q101_ann_ivfpq")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("q102: image dHash is a pure narrow pipeline — zero exchanges to the fingerprints") {
    val plan = planOf("q102_image_dhash")
    assert(!plan.contains("Exchange"), plan)
  }

  test("q106/q107/q108: round-5 relational ops stay equi-join-only") {
    // q106: exactly the one hash exchange the rank window needs
    val capPlan = planOf("q106_group_cap")
    assert("Exchange hashpartitioning".r.findAllIn(capPlan).size == 1, capPlan)
    // q107: the gram join is an equi-join, never a cartesian
    val spanPlan = planOf("q107_shared_spans")
    assert(!spanPlan.contains("CartesianProduct")
      && !spanPlan.contains("BroadcastNestedLoopJoin"), spanPlan)
    // q108: the full prep chain composes without a cartesian; the
    // decontamination dictionary arrives as a broadcast
    val prepPlan = planOf("q108_prep_pipeline")
    assert(!prepPlan.contains("CartesianProduct"), prepPlan)
    assert(prepPlan.contains("BroadcastHashJoin"), prepPlan)
  }

  test("q63/q66: ranked search and vocabulary cut top-k via TakeOrdered, never a global sort") {
    Seq("q63_ranked_search", "q66_vocabulary").foreach { q =>
      val plan = planOf(q)
      assert(plan.contains("TakeOrderedAndProject"), s"$q:\n$plan")
    }
  }

  test("q65: pagerank iterations are equi-joins only — no cartesian, no nested loop") {
    val plan = planOf("q65_pagerank")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q71: substring search confirms on a semi-joined candidate set, no cartesian") {
    val plan = planOf("q71_substring_search")
    assert(plan.contains("LeftSemi"), s"confirm must semi-join candidates:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q73: incremental dedup is anti-joins over hash/band keys, no cartesian") {
    val plan = planOf("q73_dedup_incremental")
    assert(plan.contains("LeftAnti"), plan)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q77: simhash hamming pairs stay on the banded equi-join — no cartesian") {
    val plan = planOf("q77_simhash_hamming")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q78: per-group top-k uses rank-limit pushdown") {
    assert(planOf("q78_group_topk").contains("WindowGroupLimit"))
  }

  test("q75: mean pooling partial-aggregates map-side below its exchange") {
    val plan = planOf("q75_embedding_pool")
    val exchangeAt = plan.indexOf("Exchange hashpartitioning")
    val partialAt = plan.indexOf("partial_count")
    assert(partialAt >= 0 && exchangeAt >= 0 && exchangeAt < partialAt,
      s"exploded rows must partial-aggregate before shuffling:\n$plan")
  }

  test("q120: fuzzy-dedup composite stays equi-join-only end to end") {
    val plan = planOf("q120_fuzzy_dedup_corpus")
    assert(!plan.contains("CartesianProduct")
      && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q121: encode-to-ids is a ZERO-EXCHANGE narrow projection (vocab rides as a map literal)") {
    // the explode → broadcast-join → groupBy/array_sort formulation
    // paid two aggregation exchanges for a pure per-row lookup; the
    // metadata-sized vocab belongs in the plan as a literal
    val plan = planOf("q121_bpe_encode_ids")
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Join"), plan)
  }

  test("q122: incremental prep is keyed anti/semi joins + one budget window; no cartesian") {
    val plan = planOf("q122_incremental_prep")
    assert(plan.contains("LeftAnti"), plan)
    assert(!plan.contains("CartesianProduct")
      && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q123/q125: proportional mix has no cartesian; contamination report probes a broadcast") {
    val mixPlan = planOf("q123_mix_proportions")
    assert(!mixPlan.contains("CartesianProduct")
      && !mixPlan.contains("BroadcastNestedLoopJoin"), mixPlan)
    val repPlan = planOf("q125_contamination_report")
    assert(repPlan.contains("BroadcastHashJoin"), repPlan)
    assert(!repPlan.contains("CartesianProduct"), repPlan)
  }

  test("q124: shuffle-shard plans exactly the one window exchange the layout needs") {
    val plan = planOf("q124_shuffle_shards")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
  }

  test("q128: layout probe pushes the z-range into the parquet scan (row-group min/max pruning)") {
    val plan = planOf("q128_zorder_layout")
    assert(plan.contains("GreaterThanOrEqual(z,"),
      s"z-range must push down to the layout scan:\n$plan")
  }

  test("q126: cross-modal dedup union stays equi-join-only") {
    val plan = planOf("q126_multimodal_dedup")
    assert(!plan.contains("CartesianProduct")
      && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q79/q95: z-order box plans carry the COMPACT graft_zvalue node, not the inlined shift tree") {
    // the composed 32+-term tree inlined into filter+projection crosses
    // HotSpot's huge-method JIT ceiling and runs the stage interpreted
    // (round-7 root cause); the compact expression must stay in the plan
    Seq("q79_zorder_box", "q95_zorder_box3").foreach { q =>
      val plan = planOf(q)
      assert(plan.contains("graft_zvalue"), s"$q lost the compact z expression:\n$plan")
      assert(!plan.contains("shiftleft(shiftright"), s"$q reverted to the inline tree:\n$plan")
    }
  }

  test("q129: export probe prunes to its shard partition; the layout write plans ONE exchange") {
    import org.apache.spark.sql.functions.{col, size, split}
    // probe side: the shard=0 filter must hit the hive-partition listing,
    // not the row scan — the trainer reads one shard's directory only
    val plan = planOf("q129_training_export")
    assert(plan.contains("PartitionFilters: [") &&
      "shard#\\d+ = 0".r.findFirstIn(plan).nonEmpty,
      s"shard filter must prune partitions:\n$plan")
    // write side: the window's hash exchange on shard IS the write
    // partitioning — no extra repartition may sneak in between
    // (Sampling.writeTrainingShards writes exactly this DataFrame)
    val docs = graft.util.Tables.documents(spark, dir).select(col("doc_id"),
      col("lang"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val wplan = graft.ext.Sampling.shuffleShards(docs, "doc_id", 8)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(wplan).size == 1, wplan)
  }

  test("q130: paragraph dedup stays on banded equi-joins + a keyed anti-join") {
    val plan = planOf("q130_paragraph_dedup")
    assert(plan.contains("LeftAnti"), plan)
    assert(!plan.contains("CartesianProduct")
      && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q131: linear quality scoring is a zero-exchange narrow projection (model rides as a literal)") {
    val plan = planOf("q131_linear_quality")
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Join"), plan)
  }

  test("q132: exact paragraph dedup uses rank-limit pushdown on the content-hash window") {
    val plan = planOf("q132_paragraph_dedup_exact")
    assert(plan.contains("WindowGroupLimit"), plan)
    assert(!plan.contains("CartesianProduct")
      && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q134: indexed dedup probes the persisted artifacts — the corpus never appears in the plan") {
    val plan = planOf("q134_dedup_indexed")
    assert(plan.contains("LeftAnti"), plan)
    assert(!plan.contains("CartesianProduct")
      && !plan.contains("BroadcastNestedLoopJoin"), plan)
    // the probe plan scans documents only for the BATCH lineage (twice:
    // exact tier + band probe); the corpus side reads the two persisted
    // index directories instead of re-scanning documents — q73's direct
    // form scans documents for batch AND corpus
    val q134Scans = "documents\\.parquet".r.findAllIn(plan).size
    val q73Scans = "documents\\.parquet".r
      .findAllIn(planOf("q73_dedup_incremental")).size
    assert(q134Scans == 2, s"expected the 2 batch-side scans only:\n$plan")
    assert(q73Scans > q134Scans, s"q73=$q73Scans q134=$q134Scans")
  }

  test("q135/q136: leak-free split stays equi-join-only; dataset card is one rollup + metadata window") {
    val splitPlan = planOf("q135_leakfree_split")
    assert(!splitPlan.contains("CartesianProduct")
      && !splitPlan.contains("BroadcastNestedLoopJoin"), splitPlan)
    val cardPlan = planOf("q136_dataset_card")
    assert(!cardPlan.contains("Join"), cardPlan)
    // the global-total window runs over the |lang × split|-row rollup
    // (metadata-sized), not the corpus — partial aggregation must sit
    // below the first exchange
    val exchangeAt = cardPlan.indexOf("Exchange")
    val partialAt = cardPlan.indexOf("partial_count")
    assert(partialAt >= 0 && exchangeAt >= 0 && exchangeAt < partialAt, cardPlan)
  }

  test("q137: semantic dedup pairs ride an equi-join on the cluster id — no cartesian anywhere") {
    val plan = planOf("q137_semantic_dedup")
    assert(!plan.contains("CartesianProduct")
      && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q133: grand export probe prunes to its shard partition, chain stays equi-join-only") {
    val plan = planOf("q133_pipeline_export")
    assert(plan.contains("PartitionFilters: [") &&
      "shard#\\d+ = 0".r.findFirstIn(plan).nonEmpty,
      s"shard filter must prune partitions:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q138: bloom probe gates the anti-join — definitely-new rows take no join at all") {
    val plan = planOf("q138_bloom_dedup")
    // the bloom literal is evaluated as a row-level filter on BOTH
    // branches (negated on the join-free one)
    assert(plan.contains("might_contain"), plan)
    // only ONE anti join remains (the confirm tier); the definitely-new
    // branch reaches the union scan-only
    assert("LeftAnti".r.findAllIn(plan).size == 1, plan)
  }

  test("q139: centroid classify is broadcast-prototypes + one partial aggregate; no shuffle join") {
    val plan = planOf("q139_centroid_classify")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      plan)
    // the label rides the min-encoding aggregate — no corpus-sized
    // join-back after classification
    assert(plan.contains("partial_min") || plan.contains("partial min"), plan)
  }

  test("q140: boilerplate grams shuffle as 64-bit hashes, never gram strings") {
    val plan = planOf("q140_boilerplate_score")
    assert(!"Exchange hashpartitioning\\(g#".r.findFirstIn(plan).nonEmpty, plan)
    assert("Exchange hashpartitioning\\(gh#".r.findFirstIn(plan).nonEmpty, plan)
  }

  test("q146: corpus top n-grams uses partial top-k (TakeOrderedAndProject), never a global sort") {
    val plan = planOf("q146_top_ngrams")
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("q143/q144: quality mix and cosine histogram stay equi-join-only") {
    assert(!planOf("q143_quality_mix").contains("CartesianProduct"))
    val h = planOf("q144_cosine_histogram")
    assert(!h.contains("CartesianProduct")
      && !h.contains("BroadcastNestedLoopJoin"), h)
  }

  test("q147: dedup cascade stays equi-join-only across all three tier chains") {
    val plan = planOf("q147_dedup_cascade")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q148: OOV scoring joins the vocabulary as a BROADCAST (metadata-sized by construction)") {
    val plan = planOf("q148_oov_rate")
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("q142: filter funnel is ONE corpus scan + one metadata-sized rollup exchange") {
    val plan = planOf("q142_filter_funnel")
    // one documents scan (the fused cleanSignals+PII projection), one
    // aggregate exchange on (lang, reason)
    assert("FileScan parquet".r.findAllIn(plan).size == 1, plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
  }

  test("q157: temperature mix is one scan + the single budget-cut window exchange") {
    val plan = planOf("q157_temperature_mix")
    // the |domains|-row avail aggregate is collected at CONSTRUCTION
    // time (metadata); the returned plan is the prefix cut only: one
    // documents scan, one window exchange on the domain key, no joins
    assert("FileScan parquet".r.findAllIn(plan).size == 1, plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
    assert(!plan.contains("Join"), plan)
  }

  test("q158/q159: url canonicalization dedup is one groupBy exchange; html extract is zero-exchange") {
    val urlPlan = planOf("q158_url_dedup")
    assert("Exchange hashpartitioning".r.findAllIn(urlPlan).size == 1, urlPlan)
    assert(!urlPlan.contains("Join"), urlPlan)
    val htmlPlan = planOf("q159_html_extract")
    assert(!htmlPlan.contains("Exchange"), htmlPlan)
    assert(!htmlPlan.contains("Join"), htmlPlan)
  }

  test("q162: within-doc dedup keeps rank-limit pushdown on the (doc, hash) window") {
    val plan = planOf("q162_within_doc_dedup")
    assert(plan.contains("WindowGroupLimit"), plan)
    assert(!plan.contains("CartesianProduct")
      && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q163: curriculum shards = zero-exchange scoring + the one shard window exchange") {
    val plan = planOf("q163_curriculum_shards")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
    assert(!plan.contains("Join"), plan)
  }

  test("q165/q166: manifest is window+rollup with no join; blocklist is a broadcast ANTI join") {
    val mPlan = planOf("q165_shard_manifest")
    assert(!mPlan.contains("Join"), mPlan)
    val bPlan = planOf("q166_blocklist_filter")
    assert(bPlan.contains("BroadcastHashJoin") && bPlan.contains("LeftAnti"), bPlan)
    assert(!bPlan.contains("SortMergeJoin"), bPlan)
  }

  test("q167/q168: novelty is hash-keyed equi-joins; keywords keep rank-limit pushdown") {
    val nPlan = planOf("q167_ngram_novelty")
    assert(!nPlan.contains("CartesianProduct")
      && !nPlan.contains("BroadcastNestedLoopJoin"), nPlan)
    val kPlan = planOf("q168_tfidf_keywords")
    assert(kPlan.contains("WindowGroupLimit"), kPlan)
  }

  test("q169/q170/q172: report queries are ONE corpus scan + one rollup exchange") {
    for (q <- Seq("q169_lang_confusion", "q170_pii_report", "q172_length_histogram")) {
      val plan = planOf(q)
      assert("FileScan parquet".r.findAllIn(plan).size == 1, s"$q:\n$plan")
      assert(!plan.contains("Join"), s"$q:\n$plan")
    }
  }

  test("q173/q174: balanced shards = one bounded-cell window, band histogram = pure rollups") {
    val bPlan = planOf("q173_balanced_shards")
    assert("Exchange hashpartitioning".r.findAllIn(bPlan).size == 1, bPlan)
    assert(!bPlan.contains("Join"), bPlan)
    val hPlan = planOf("q174_band_load_histogram")
    assert(!hPlan.contains("Join"), hPlan)
  }

  test("new text reports prune the documents scan to the referenced columns") {
    // a scan reading all 5 columns for a 2-column computation would
    // drag n_chars/source through every exchange at 100 TB
    for ((q, cols) <- Seq(
        "q167_ngram_novelty" -> "struct<doc_id:bigint,text:string>",
        "q168_tfidf_keywords" -> "struct<doc_id:bigint,text:string>",
        "q157_temperature_mix" -> "struct<doc_id:bigint,text:string,lang:string>")) {
      val plan = planOf(q)
      assert(plan.contains(s"ReadSchema: $cols"), s"$q:\n$plan")
    }
  }

  test("q176: percentile gate joins the one-row threshold as a broadcast, never a shuffle join") {
    val plan = planOf("q176_quantile_gate")
    assert(plan.contains("BroadcastNestedLoopJoin")
      || plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("q161: minhash calibration stays equi-join-only, candidate-volume-sized") {
    val plan = planOf("q161_minhash_calibration")
    assert(!plan.contains("CartesianProduct")
      && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q178/q179: trained router broadcasts the weight relation; no corpus-sized window") {
    for (q <- Seq("q178_trained_langid", "q179_trained_confusion")) {
      val plan = planOf(q)
      // the ≤ |langs|·256-row weight relation rides a broadcast join
      assert(plan.contains("BroadcastHashJoin"), s"$q:\n$plan")
      assert(!plan.contains("CartesianProduct"), s"$q:\n$plan")
      // argmax is the encoding AGGREGATE, not a per-doc rank window
      assert(!plan.contains("WindowGroupLimit"), s"$q:\n$plan")
    }
  }

  test("q180/q181: incremental graph maintenance stays equi-join-only") {
    for (q <- Seq("q180_closure_add", "q181_cc_add")) {
      val plan = planOf(q)
      assert(!plan.contains("CartesianProduct")
        && !plan.contains("BroadcastNestedLoopJoin"), s"$q:\n$plan")
    }
  }

  test("q191: delta closure scans the settled parquet exactly twice, batch joins broadcast-only") {
    val plan = planOf("q191_closure_delta")
    // probe join + union pass-through — never re-resolved, never shuffled
    assert("/settled".r.findAllIn(plan).size == 2, plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct")
      && !plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }

  test("q192: delta CC probes the persisted labeling (≤2 scans), batch joins broadcast-only") {
    val plan = planOf("q192_cc_delta")
    assert("/labels".r.findAllIn(plan).size <= 2, plan)
    assert(!plan.contains("CartesianProduct")
      && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q196: exact-substring anchors SHUFFLE — never a corpus-character broadcast") {
    // the anchor relation is one row per corpus character — Catalyst's
    // undershooting size estimate must not be allowed to broadcast it
    val plan = planOf("q196_exact_substring")
    assert(plan.contains("ShuffledHashJoin"), plan)
    assert(!plan.contains("CartesianProduct")
      && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q197: winnowed fingerprints SHUFFLE into the self-join; selection adds no exchange") {
    val plan = planOf("q197_winnow_substring")
    assert(plan.contains("ShuffledHashJoin"), plan)
    assert(!plan.contains("CartesianProduct")
      && !plan.contains("BroadcastNestedLoopJoin"), plan)
    // the winnow selection is in-row HOF work: no Window operator, no
    // exchange between the documents scan and the fingerprint join
    assert(!plan.contains("Window"), plan)
  }

  test("q213: the hot-anchor cap keeps the banded shape — df split + star, no all-pairs") {
    val plan = planOf("q213_substring_anchor_cap")
    // cold side stays the shuffled-hash self-join; the hot star adds
    // only grouped/joined exchanges — never a cartesian fallback
    assert(plan.contains("ShuffledHashJoin"), plan)
    assert(!plan.contains("CartesianProduct")
      && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q214: the maintained decision log reads stores — no winnow kernel, no gate recompute") {
    val plan = planOf("q214_release_decisions_maintained")
    assert(plan.contains("Scan parquet"), plan)
    assert(!plan.contains("winnow_fingerprints"), plan)
    assert(!plan.contains("CartesianProduct")
      && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q215: the IVFPQ recall gate joins two bounded rankings — no cartesian") {
    val plan = planOf("q215_ann_ivfpq_recall")
    // the brute-force truth side is q35's intentional shape: the 8-row
    // query relation BROADCASTS into a nested-loop scan (bounded build
    // side by contract) with rank-limit pushdown; the probe side reads
    // the session index. Only an unbounded cartesian would be a bug.
    assert(plan.contains("WindowGroupLimit"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q218: the recall sweep's three probe arms stay bucket-pruned — no cartesian") {
    val plan = planOf("q218_ann_ivfpq_recall_sweep")
    // same contract as q215 per arm; the ceiling-mode shortlist changes
    // only a rank-filter constant, never the join shapes
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q219: the incremental-index probe partition-prunes the codes scan — no cartesian") {
    val plan = planOf("q219_ann_ivfpq_index_add")
    // the probed buckets land as literals on the bucket-partitioned
    // codes relation, so the scan reads nprobe/nCoarse of the index
    assert(plan.contains("bucket"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q216/q217: maintained substring reads fold STORES — no corpus re-fingerprint in the pair log") {
    // q216 (round-13): a PURE fold of the counts sidecar — distinct,
    // sum per passage, top-k. No winnow kernel, no corpus text scan,
    // no join of ANY kind may appear; the read cost is store-fold-
    // sized, which is the whole amortization argument
    val passages = planOf("q216_top_passages_maintained")
    assert(passages.contains("Scan parquet"), passages)
    assert(!passages.contains("winnow_fingerprints"), passages)
    assert(!passages.contains("Join"), passages)
    assert(!passages.contains("CartesianProduct")
      && !passages.contains("BroadcastNestedLoopJoin"), passages)
    val pairs = planOf("q217_substring_stream_pairs")
    assert(pairs.contains("Scan parquet"), pairs)
    assert(!pairs.contains("winnow_fingerprints"), pairs)
    assert(!pairs.contains("CartesianProduct")
      && !pairs.contains("BroadcastNestedLoopJoin"), pairs)
  }

  test("q198: span cut is the winnowed join + one groupBy, never all-pairs") {
    val plan = planOf("q198_substring_cut")
    assert(plan.contains("ShuffledHashJoin"), plan)
    assert(!plan.contains("CartesianProduct")
      && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q202/q203: release edit and leak check stay on the winnowed equi-join, never all-pairs") {
    // q202's winnowed pass runs ONCE at construction (localCheckpoint'd,
    // match-sized), so the registered plan derives both branches from
    // the materialized pair RDD — and must never fall back to all-pairs
    val rPlan = planOf("q202_substring_release")
    assert(rPlan.contains("Scan ExistingRDD"), rPlan)
    assert(!rPlan.contains("CartesianProduct")
      && !rPlan.contains("BroadcastNestedLoopJoin"), rPlan)
    val lPlan = planOf("q203_substring_leak")
    assert(lPlan.contains("ShuffledHashJoin"), lPlan)
    assert(!lPlan.contains("CartesianProduct")
      && !lPlan.contains("BroadcastNestedLoopJoin"), lPlan)
    // the leak check's splits are inline hash expressions of doc_id —
    // no corpus-sized split table is ever joined, so the plan has no
    // SortMergeJoin anywhere
    assert(!lPlan.contains("SortMergeJoin"), lPlan)
  }

  test("q204: drift report scans the corpus ONCE; the dense lattice is post-aggregate") {
    val plan = planOf("q204_quality_drift")
    assert("FileScan parquet".r.findAllIn(plan).size == 1, plan)
    assert(!plan.contains("Join"), plan) // windows + map explode, no self-join
    // one corpus-sized exchange (the partial-agg groupBy); the
    // SinglePartition exchange moves only the metadata-sized aggregate
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
  }

  test("q205: the index probe winnows ONLY the batch — the corpus is never re-fingerprinted") {
    val plan = planOf("q205_substring_indexed")
    assert(plan.contains("ShuffledHashJoin"), plan)
    assert(!plan.contains("CartesianProduct")
      && !plan.contains("BroadcastNestedLoopJoin"), plan)
    // exactly ONE winnow kernel evaluation in the plan: the batch side;
    // the corpus side arrives as the persisted index parquet
    assert("winnow_fingerprints".r.findAllIn(plan).size == 1, plan)
  }

  test("q206: the capstone's substring stage derives from ONE materialized winnow pass") {
    // round-12: the gate/dedup/substring-edit chain rides the session
    // RELEASE SPINE — the registered plan reads the spine PARQUET
    // (fingerprint-keyed store, built once per session) and must
    // contain NO winnow kernel and NO trained-gate recompute at all;
    // the mix/shard/manifest tail may never fall back to all-pairs
    val plan = planOf("q206_release_substring")
    assert(plan.contains("Scan parquet"), plan)
    assert(!plan.contains("winnow_fingerprints"), plan)
    assert(!plan.contains("md5("), plan) // no in-plan gate/dedup recompute
    assert(!plan.contains("CartesianProduct")
      && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q207: match-length profile rides the q196 shuffle pin; the rollup adds one exchange") {
    val plan = planOf("q207_match_length_profile")
    assert(plan.contains("ShuffledHashJoin"), plan)
    assert(!plan.contains("CartesianProduct")
      && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q208: log-ratio DSIR weights BROADCAST — the corpus never shuffles for a 256-row relation") {
    val plan = planOf("q208_dsir_log")
    // the corpus-sized scoring join builds on the broadcast ≤256-row
    // weight relation; the weights' own full-outer merge (256×256,
    // metadata-sized) may sort-merge — that one is free at any scale
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct")
      && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q209: casefold parity dedup is projection + one rollup exchange — no join") {
    val plan = planOf("q209_unicode_casefold")
    assert(!plan.contains("Join"), plan)
    // the simple_lower kernel appears (lower() would silently revert
    // to the engine-divergent Java full casefold)
    assert(plan.contains("simple_lower"), plan)
  }

  test("q211: passage rollup shuffles HASHES; text re-groups only the duplicated subset") {
    val plan = planOf("q211_top_passages")
    // the window relation is generate-exploded (one row per corpus
    // character) — the semi join must never broadcast it on Catalyst's
    // undershot estimate, and no all-pairs shape may appear
    assert(plan.contains("ShuffledHashJoin"), plan)
    assert(plan.contains("LeftSemi"), plan)
    assert(!plan.contains("CartesianProduct")
      && !plan.contains("BroadcastNestedLoopJoin"), plan)
    // deterministic top-k compiles to TakeOrdered, not a global sort
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("q212: the decision log rides materialized boundaries — no winnow kernel, no all-pairs") {
    // round-12: every stage relation reads the session RELEASE SPINE
    // parquet; the registered plan is the verdict's target shape —
    // id-sized left joins over spine scans plus the id-sized mix
    // replay, no winnow kernel, no gate recompute, no all-pairs
    val plan = planOf("q212_release_decisions")
    assert(plan.contains("Scan parquet"), plan)
    assert(!plan.contains("winnow_fingerprints"), plan)
    assert(!plan.contains("md5("), plan) // no in-plan gate/dedup recompute
    assert(!plan.contains("CartesianProduct")
      && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q199: link resolution is a pure projection plus one rollup — no join") {
    val plan = planOf("q199_link_resolve")
    assert(!plan.contains("Join"), plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
  }

  test("q187/q188: DSIR weights broadcast; edit-distance verify is blocked, never all-pairs") {
    val dPlan = planOf("q187_dsir_importance")
    assert(dPlan.contains("BroadcastHashJoin"), dPlan)
    assert(!dPlan.contains("CartesianProduct"), dPlan)
    val ePlan = planOf("q188_edit_distance_verify")
    // Levenshtein only runs under the prefix-equality equi-join
    assert(!ePlan.contains("CartesianProduct")
      && !ePlan.contains("BroadcastNestedLoopJoin"), ePlan)
  }

  test("q190: the release capstone stays equi-join-only end to end") {
    val plan = planOf("q190_release_pipeline")
    assert(!plan.contains("CartesianProduct")
      && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q183/q185: per-lang gate broadcasts its threshold; overlap matrix stays equi-join-only") {
    val gPlan = planOf("q183_lang_quantile_gate")
    assert(gPlan.contains("BroadcastHashJoin"), gPlan)
    assert(!gPlan.contains("SortMergeJoin"), gPlan)
    val oPlan = planOf("q185_source_overlap")
    assert(!oPlan.contains("CartesianProduct")
      && !oPlan.contains("BroadcastNestedLoopJoin"), oPlan)
  }
}
