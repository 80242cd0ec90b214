package graft

/** Physical-plan assertions: the optimizations we rely on at scale must
  * actually appear in the executed plan, not just in intent.
  */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.executedPlan.toString
  }

  test("q02 pushes filters and prunes columns at the parquet scan") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity)"))
    assert(p.contains("GreaterThanOrEqual(l_quanti")) // toString truncates the list
    // scan must not read the unused columns
    assert(!p.contains("l_returnflag"))
  }

  test("dim joins broadcast instead of shuffling both sides") {
    val p3 = plan("q03_segment_revenue")
    assert(p3.contains("BroadcastHashJoin"))
    assert(!p3.contains("SortMergeJoin"))
    val p4 = plan("q04_nation_revenue")
    assert(p4.contains("BroadcastHashJoin"))
  }

  test("top-k plans as TakeOrderedAndProject, not a global sort") {
    val p = plan("q08_topk_orders")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("anti and semi joins use the dedicated join types") {
    assert(plan("q06_antijoin").contains("LeftAnti"))
    assert(plan("q07_semijoin").contains("LeftSemi"))
  }

  test("scalar-subquery threshold broadcasts the one-row side") {
    val p = plan("q17_above_p90")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("aggregations keep whole-stage codegen on the hot path") {
    // AQE only shows codegen spans in the final plan — execute first.
    val df = SparkEntry.queries("q01_pricing_summary")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*(")) // '*(n)' prefixes mark WholeStageCodegen spans
    assert(p.contains("HashAggregate"))
  }

  test("partial aggregation precedes the shuffle in groupBys") {
    // two HashAggregate stages (partial + final) around one exchange
    val p = plan("q19_multikey_group")
    assert("HashAggregate".r.findAllIn(p).size >= 2)
    assert(p.contains("Exchange hashpartitioning"))
  }

  test("shard packing windows are partitioned, never a single global sort") {
    // the q73 running-offset window must carry a PARTITION BY (lang):
    // an unpartitioned ORDER BY window serializes the corpus through
    // one task — the single worst scale failure a window can have
    val p = plan("q73_pack_shards")
    assert(p.contains("windowspecdefinition(lang"), p.take(1500))
  }

  test("hash sampling is a pure per-row filter — no shuffle before the sort") {
    val df = SparkEntry.queries("q72_hash_sample")(spark, sf)
    val upToSort = df.queryExecution.executedPlan.toString
      .split("\n").dropWhile(l => !l.contains("Filter")).mkString("\n")
    // below the filter: scan only, no exchange (the final ORDER BY is
    // the query's presentation sort, not part of the sampling operator)
    assert(!upToSort.contains("Exchange"), upToSort.take(1200))
  }

  test("balanced mixture windows are partitioned by lang, target is broadcast") {
    // q83's rank runs inside per-lang partitions (never a global sort)
    // and the min-count scalar joins as a broadcast, not a shuffle
    val p = plan("q83_balanced_mixture")
    assert(p.contains("windowspecdefinition(lang"), p.take(1500))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p.take(1500))
    assert(!p.contains("CartesianProduct"))
  }

  test("curation v2 plan: checkpoint-leaf components, semi join, partitioned window") {
    // the component labels must enter as a constant-size materialized
    // leaf (per-round lineage cut), never as the iterative join tree;
    // survivors come via a semi join; packing is ONE window
    // partitioned by (lang, split) — no global sort, no cartesian
    val df = SparkEntry.queries("q75_curation_v2")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("Scan ExistingRDD"), p.take(1200))
    assert(p.contains("LeftSemi"), p.take(1200))
    assert(p.contains("windowspecdefinition(lang"), p.take(1500))
    assert(!p.contains("CartesianProduct"))
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("chunking is a pure per-row explode — no shuffle below the presentation sort") {
    // q85 at 100 TB is a map-only pass: scan → project → generate.
    // Everything below the Generate must be shuffle-free (the final
    // ORDER BY's range exchange sits above it and is presentation only)
    val p = plan("q85_chunk_overlap")
    assert(p.contains("Generate explode"), p.take(1200))
    val belowGenerate = p.split("\n").dropWhile(l => !l.contains("Generate")).mkString("\n")
    assert(!belowGenerate.contains("Exchange"), belowGenerate.take(1200))
  }

  test("boilerplate detection joins grams on 8-byte hashes, no cartesian") {
    // q86's gram→df join must key on xxhash64 (fixed-width shuffle
    // keys, the dedup-family convention), aggregate partially before
    // the shuffle, and never degenerate to a cartesian product
    val p = plan("q86_boilerplate_ngrams")
    assert(p.contains("xxhash64"), p.take(1200))
    assert("HashAggregate".r.findAllIn(p).size >= 2)
    assert(!p.contains("CartesianProduct"))
  }

  test("temperature mixture broadcasts the per-lang rate table") {
    // q87: 5-row rate table → BroadcastHashJoin against the map-only
    // corpus filter; a SortMergeJoin here would shuffle 100 TB to meet
    // 5 rows
    val p = plan("q87_temperature_mixture")
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("SortMergeJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("vocab top-k is TakeOrderedAndProject over a partial-agg groupBy") {
    // q89 must not globally sort the vocabulary: per-partition heaps
    // (TakeOrderedAndProject) above a two-phase aggregate
    val p = plan("q89_ngram_vocab")
    assert(p.contains("TakeOrderedAndProject"), p.take(1200))
    assert("HashAggregate".r.findAllIn(p).size >= 2)
  }

  test("scd2 history runs all three window/agg stages on one key exchange") {
    // q91: change-flag window, per-version agg, interval lead — the
    // custkey hashpartitioning must be planned once and reused; a
    // second exchange would re-shuffle the fact table per stage
    val p = plan("q91_scd2_history")
    val keyExchanges = "Exchange hashpartitioning\\(o_custkey".r.findAllIn(p).size
    assert(keyExchanges === 1, p.take(2000))
  }

  test("bloom decontamination probes per-row below the verify join") {
    // q92: the might_contain predicate must sit in a Filter on the
    // train-shingle side (pre-shuffle prune), with the exact verify as
    // a broadcast join above it — the corpus never shuffles on shingle
    val p = plan("q92_bloom_decontaminate")
    assert(p.contains("might_contain"), p.take(1500))
    assert(p.contains("BroadcastHashJoin"))
    val probeIdx  = p.indexOf("might_contain")
    val verifyIdx = p.indexOf("BroadcastHashJoin")
    assert(verifyIdx < probeIdx, "verify join must be above (printed before) the bloom filter")
  }

  test("column profile is one aggregation pass with map-side unpivot") {
    // q93: a single Expand-based aggregate computes every column's
    // metrics — one scan, one exchange (plus the 5-row final sort);
    // per-column scans would read the table once per metric column
    val p = plan("q93_column_profile")
    assert(p.contains("Expand"), p.take(1200))
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1, p.take(2000))
    assert("FileScan parquet".r.findAllIn(p).size === 1, "profile must scan the table once")
  }

  test("dup-span detection explodes windows once; membership join broadcasts the dup set") {
    // q95: the span table is persisted, so its window explode runs
    // once and both consumers (dup-set aggregate, membership join)
    // read the cache; the aggregated dup set is orders smaller than
    // the span table and must broadcast, leaving the probe side
    // shuffle-free below the per-doc rollup
    val df = SparkEntry.queries("q95_dup_spans")(spark, sf)
    df.collect() // AQE: the final join strategy only shows post-run
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("InMemoryTableScan"), p.take(1500))
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("CartesianProduct"))
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("range join is an equi-join on (key, bin), never a nested loop") {
    // q97: an inequality-only condition would plan as
    // BroadcastNestedLoopJoin — quadratic per key at scale; the binned
    // rewrite must keep it a hash join
    val p = plan("q97_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(1500))
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("__bin"))
  }

  test("pivot with declared values is one two-phase aggregate, no distinct-values scan") {
    val p = plan("q98_pivot_revenue")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(1500))
    // exactly two scans: orders + customer (a value-discovery pass
    // would add a third)
    assert("FileScan parquet".r.findAllIn(p).size === 2, p.take(2000))
  }

  test("source quota pre-filters candidates before the partitioned window") {
    val p = plan("q100_source_quota")
    assert(p.contains("hashpartitioning(source"), p.take(1500))
    assert(!p.contains("hashpartitioning(1)") && !p.contains("SinglePartition"),
      "per-source ranking must not serialize onto one partition")
    // the md5-threshold candidate filter (broadcast rate join) must sit
    // BELOW the window — that's what keeps a megasite's 10⁹ rows out of
    // one reducer; only ~4·cap rows per source may reach the sort
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    val joinIdx = p.indexOf("BroadcastHashJoin")
    val winIdx = p.indexOf("Window")
    assert(winIdx >= 0 && winIdx < joinIdx,
      "window must be above (printed before) the candidate pre-filter join")
  }

  test("salted skew join keys the join on (k, __salt), no cartesian") {
    val p = plan("q68_salted_skew_join")
    assert(p.contains("__salt"))
    assert(!p.contains("CartesianProduct"))
    // with broadcast off (the at-scale shape where salting matters) the
    // shuffle must partition on BOTH key and salt — that's what spreads
    // the hot key across reducers
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val p2 = SparkEntry.queries("q68_salted_skew_join")(s, sf)
      .queryExecution.executedPlan.toString
    val shufflesOnSalt = "hashpartitioning\\(k[^)]*__salt".r.findAllIn(p2).size
    assert(shufflesOnSalt >= 1, p2.take(1500))
  }

  test("tf-idf broadcasts the vocab and doc-count sides, never a cartesian") {
    val p = plan("q108_tfidf_keywords")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("weighted sample is TakeOrderedAndProject, not a global sort") {
    val p = plan("q110_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("source overlap joins on the shingle key with no cartesian") {
    val p = plan("q114_source_overlap")
    assert(!p.contains("CartesianProduct"))
    // keyed on shingle either way: broadcast at toy SF, hash-shuffle at scale
    assert(p.contains("BroadcastHashJoin [shingle")
      || p.contains("Exchange hashpartitioning(shingle"), p.take(1200))
  }

  test("CMS counter panel join broadcasts the finished sketch") {
    val p = plan("q112_cms_heavy_hitters")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("DSIR resample: bounded λ table broadcasts, sample is TakeOrderedAndProject") {
    val p = plan("q134_dsir_resample")
    assert(p.contains("TakeOrderedAndProject"), p.take(1200))
    // the per-doc weight join must meet the bounded vocab broadcast-side
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(!p.contains("CartesianProduct"))
  }

  test("hist-quantile state: windows partition by the group key, never one reducer") {
    val p = plan("q135_hist_quantile_state")
    assert(p.contains("hashpartitioning(event_type"), p.take(1500))
    // two delta builds + merge = partial aggregation everywhere
    assert("HashAggregate".r.findAllIn(p).size >= 4, p.take(1500))
  }

  test("bootstrap CI: the replicate explode feeds a partial aggregate") {
    val p = plan("q138_bootstrap_ci")
    assert(p.contains("Generate explode"), p.take(1500))
    // partial agg on (b) before the exchange: the ×100 rows never shuffle raw
    val gen = p.indexOf("Generate explode")
    val aggs = "HashAggregate".r.findAllIn(p).size
    assert(aggs >= 2, s"expected partial+final aggregate, got $aggs")
    assert(p.contains("hashpartitioning(b"), p.take(1500))
  }

  test("last-touch attribution windows partition by user, never one reducer") {
    val p = plan("q139_last_touch_attribution")
    assert(p.contains("hashpartitioning(user_id"), p.take(1500))
    assert(!p.contains("SinglePartition, Window")
      && !p.contains("Window.*SinglePartition"), "attribution window must be per-user")
  }

  test("tf-idf cosine pairs join on the token key with no cartesian") {
    val p = plan("q140_tfidf_cosine_pairs")
    // (the 1-row doc-count scalar broadcast is the accepted BNLJ form)
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("TakeOrderedAndProject"), p.take(1200))
  }

  test("bm25 broadcasts the query-term df table; top-k is TakeOrderedAndProject") {
    val p = plan("q145_bm25_search")
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(p.contains("TakeOrderedAndProject"), p.take(1200))
    assert(!p.contains("CartesianProduct"))
  }

  test("sequence packing windows partition by source; expansion is a per-row explode") {
    val p = plan("q153_sequence_pack")
    assert(p.contains("hashpartitioning(source"), p.take(1200))
    assert(p.contains("Generate explode"), p.take(1200))
    assert(!p.contains("CartesianProduct"))
  }

  test("full-outer reconciliation keeps a keyed shuffle join, no nested loop") {
    val p = plan("q154_full_outer_recon")
    assert(p.contains("FullOuter"), p.take(1200))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("quantile normalization windows run over histograms keyed by source") {
    val p = plan("q155_quantile_normalize")
    assert(p.contains("hashpartitioning(source"), p.take(1200))
    assert(!p.contains("CartesianProduct"))
  }

  test("ewma smoothing reduces to the daily aggregate before any window state") {
    val p = plan("q156_ewma")
    // partial + final aggregate below the window sort
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(1200))
    assert(!p.contains("CartesianProduct"))
  }

  test("hits iterations reuse the persisted edge list via keyed joins only") {
    val p = plan("q157_hits")
    assert(p.contains("InMemoryTableScan"), p.take(1200))
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("TakeOrderedAndProject"), p.take(1200))
  }

  test("curation funnel scans the corpus once and unpivots via stack") {
    val p = plan("q158_curation_funnel")
    assert(p.contains("Generate stack"), p.take(1200))
    assert(!p.contains("CartesianProduct"))
  }

  test("integrity audit probes FKs with anti joins, reduces to scalars before the union") {
    val p = plan("q159_integrity_audit")
    assert(p.contains("LeftAnti"), p.take(1200))
    assert(!p.contains("CartesianProduct"))
  }

  test("gdpr cascade levels are left-semi joins, never collected deletion lists") {
    val p = plan("q160_gdpr_erasure")
    assert(p.contains("LeftSemi"), p.take(1200))
    assert(!p.contains("CartesianProduct"))
  }

  test("semantic decontamination joins on the block key, no all-pairs cross") {
    val p = plan("q161_semantic_decontaminate")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("zipf slope bounds the regression input with a top-k, not a vocab sort") {
    val p = plan("q162_zipf_slope")
    assert(p.contains("TakeOrderedAndProject"), p.take(1200))
    assert(!p.contains("CartesianProduct"))
  }

  test("ivm delta terms re-aggregate partials — keyed joins only") {
    val p = plan("q163_ivm_join_delta")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert("HashAggregate".r.findAllIn(p).size >= 4, p.take(1200))
  }

  test("negative sampling meets candidates in md5 buckets; window partitions by anchor") {
    val p = plan("q164_negative_sampling")
    assert(p.contains("hashpartitioning(anchor_id"), p.take(1200))
    assert(!p.contains("CartesianProduct"))
  }

  test("context-length profile is one keyed aggregate per source") {
    val p = plan("q165_context_length")
    assert(p.contains("hashpartitioning(source"), p.take(1200))
    assert(!p.contains("CartesianProduct"))
  }

  test("frequent pairs joins on the basket key after support pruning, top-k bounded") {
    val p = plan("q166_frequent_pairs")
    assert(p.contains("TakeOrderedAndProject"), p.take(1200))
    assert(!p.contains("CartesianProduct"))
  }

  test("label noise candidates are (table,bucket) joins; ranking windows by vector") {
    val p = plan("q167_label_noise")
    assert(p.contains("hashpartitioning(id_a"), p.take(1200))
    assert(!p.contains("CartesianProduct"))
  }

  test("seasonal spike joins calendar-sized aggregates, no corpus-wide window") {
    val p = plan("q168_seasonal_spike")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("Window"), p.take(1200)) // aggregate-join only
  }

  test("mixture allocation touches the corpus in exactly one keyed aggregate") {
    val p = plan("q169_mixture_allocation")
    assert(!p.contains("CartesianProduct"))
    // every consumer past the first reads the persisted languages-sized
    // aggregate, not the corpus (the cached-relation description still
    // embeds the scan text, so count cache reads, not scan strings)
    assert(p.contains("InMemoryTableScan"), p.take(1500))
  }

  test("stickiness is a bounded explode + keyed count-distinct, no per-day rescan") {
    val p = plan("q170_stickiness")
    assert(p.contains("Generate explode"), p.take(1200))
    assert(!p.contains("CartesianProduct"))
  }

  test("containment pairs join on the 8-byte shingle hash, no cartesian") {
    val p = plan("q171_containment_pairs")
    // keyed on the hashed shingle (broadcast at toy scale, shuffled at size)
    assert(p.contains("sh_h"), p.take(1200))
    assert(!p.contains("CartesianProduct"))
  }

  test("peak concurrency sweeps boundaries in day-keyed windows") {
    val p = plan("q172_peak_concurrency")
    assert(p.contains("hashpartitioning(day"), p.take(1500))
    assert(!p.contains("CartesianProduct"))
  }

  test("table diff is one full-outer keyed join reduced to a 4-row report") {
    val p = plan("q173_table_diff")
    assert(p.contains("FullOuter"), p.take(1200))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("column stats windows run over value histograms, scalars broadcast") {
    val p = plan("q174_column_stats")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("InMemoryTableScan"), p.take(1200)) // persisted histograms
  }

  test("dim correlation pairs join keyed on vec_id over the persisted slice") {
    val p = plan("q175_dim_correlation")
    assert(p.contains("InMemoryTableScan"), p.take(1200))
    assert(!p.contains("CartesianProduct"))
  }

  test("funnel latency stages are keyed min-aggregates, percentiles at the end") {
    val p = plan("q176_funnel_latency")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("hashpartitioning(user_id"), p.take(1500))
  }

  test("linear attribution matches touches on the user key, credits re-aggregate") {
    val p = plan("q177_linear_attribution")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("InMemoryTableScan"), p.take(1200)) // persisted touch matches
  }

  test("percent-of-parent broadcasts dims and parent rollups over the persisted leaf") {
    val p = plan("q178_pct_of_parent")
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(!p.contains("CartesianProduct"))
  }

  test("key-skew gini windows run over frequency histograms, never per-key rows") {
    val p = plan("q179_key_skew_gini")
    assert(p.contains("hashpartitioning(x"), p.take(1500))
    assert(!p.contains("CartesianProduct"))
  }

  test("log compaction is a composite-key window, no global sort before rank") {
    val p = plan("q180_log_compaction")
    assert(p.contains("hashpartitioning(user_id"), p.take(1200))
    assert(!p.contains("CartesianProduct"))
  }

  test("benford audit is one aggregate + scalar broadcast, digits are integer math") {
    val p = plan("q181_benford")
    assert(!p.contains("CartesianProduct"))
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(1200))
  }

  test("rfm scores ride one persisted customer aggregate + a 1-row cut broadcast") {
    val p = plan("q182_rfm_segmentation")
    assert(p.contains("InMemoryTableScan"), p.take(1200))
    assert(!p.contains("CartesianProduct"))
  }

  test("sla compliance is a keyed fact join + one aggregate") {
    val p = plan("q183_sla_compliance")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin"), p.take(1200))
  }

  test("order reconciliation tops-k worst diffs without a global sort") {
    val p = plan("q184_order_reconciliation")
    assert(p.contains("TakeOrderedAndProject"), p.take(1200))
    assert(!p.contains("CartesianProduct"))
  }

  test("bounce rate reuses user-keyed session windows then day-keyed aggregates") {
    val p = plan("q185_bounce_rate")
    assert(p.contains("hashpartitioning(user_id"), p.take(1500))
    assert(!p.contains("CartesianProduct"))
  }

  test("revenue forecast fits on a calendar-sized aggregate, forecast is a 7-row explode") {
    val p = plan("q186_revenue_forecast")
    assert(p.contains("Generate explode"), p.take(1200))
    assert(!p.contains("CartesianProduct"))
  }

  test("lead-time trend is one fact join + keyed month aggregate") {
    val p = plan("q187_leadtime_trend")
    assert(p.contains("hashpartitioning(month"), p.take(1500))
    assert(!p.contains("CartesianProduct"))
  }

  test("fk discovery probes distinct value sets with semi joins, never row joins") {
    val p = plan("q188_fk_discovery")
    assert(p.contains("LeftSemi"), p.take(1200))
    assert(!p.contains("CartesianProduct"))
  }

  test("wow growth windows over the weekly aggregate only") {
    val p = plan("q189_wow_growth")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(1200))
    assert(!p.contains("CartesianProduct"))
  }

  test("dup-cluster sizes reduce components with keyed aggregates") {
    val p = plan("q190_dup_cluster_sizes")
    assert(p.contains("hashpartitioning(cluster_id"), p.take(1500))
    assert(!p.contains("CartesianProduct"))
  }

  test("char entropy is a pure per-row codegen pass — no explode, no aggregate") {
    val p = plan("q191_char_entropy")
    // the CharEntropy expression keeps the per-character work inside
    // the row: nothing may shuffle except the final total-order sort
    assert(p.contains("char_entropy"), p.take(1500))
    assert(!p.contains("Generate"), p.take(1500))
    assert(!p.contains("HashAggregate"), p.take(1500))
    assert("Exchange".r.findAllIn(p).size <= 1, p.take(1500)) // the sort's range exchange
  }

  test("skip-gram pairs join on (doc, position) equi-keys, never a theta join") {
    val p = plan("q194_skipgram_pairs")
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(1500))
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"))
    // bounded output: top-50 via TakeOrderedAndProject, no global sort
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("heaps growth joins the 7-row checkpoint broadcast, no cartesian product") {
    val p = plan("q192_heaps_growth")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    // the <= theta-joins must put the 7 checkpoints on the broadcast side
    assert(p.contains("BroadcastNestedLoopJoin"))
  }

  test("vocab KL drift keeps the vocab broadcast and the token aggregate partial") {
    val p = plan("q196_vocab_kl_drift")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"))
    assert("HashAggregate".r.findAllIn(p).size >= 2)
  }

  test("scorer agreement ranks via bounded distinct-score tables joined back broadcast") {
    val p = plan("q198_scorer_agreement")
    // rank tables (bounded by 4-dp quantization) broadcast back to docs
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("CartesianProduct"))
  }

  // post-run AQE toString appends the initial plan; shape assertions
  // must read only the final one
  private def finalPlan(p: String): String = p.split("== Initial Plan ==").head

  test("quality survival curve scans the corpus once into a bounded bucket table") {
    // the threshold curve must come from the ≤11-row bucket aggregate,
    // never a per-threshold rescan or a thresholds×docs cartesian
    // blowup before aggregation: the final plan reads ONLY the cached
    // bucket table (zero parquet scans)
    val df = SparkEntry.queries("q207_quality_survival")(spark, sf)
    df.collect() // populate the persisted bucket table under AQE
    val p = finalPlan(df.queryExecution.executedPlan.toString)
    // every parquet scan in the final plan belongs to the cached bucket
    // relation's stored build plan — no direct rescan
    assert("FileScan parquet".r.findAllIn(p).size
      <= "InMemoryRelation".r.findAllIn(p).size, p.take(1500))
    assert(p.contains("InMemoryTableScan"), p.take(1500))
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("vocab coverage windows run over the distinct-frequency table, not the vocab") {
    val df = SparkEntry.queries("q212_vocab_coverage")(spark, sf)
    df.collect()
    val p = finalPlan(df.queryExecution.executedPlan.toString)
    // the curve reads only the cached distinct-frequency table (scans
    // in the final plan are the cached relation's stored build plan)
    assert("FileScan parquet".r.findAllIn(p).size
      <= "InMemoryRelation".r.findAllIn(p).size, p.take(1500))
    assert(p.contains("InMemoryTableScan"))
    assert(!p.contains("CartesianProduct"))
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("minhash calibration candidate join is keyed on band values, never cartesian") {
    val df = SparkEntry.queries("q206_minhash_calibration")(spark, sf)
    df.collect() // the self-join strategy only shows post-run under AQE
    val p = finalPlan(df.queryExecution.executedPlan.toString)
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    // the capped band table must be persisted for its two join sides
    assert(p.contains("InMemoryTableScan"), p.take(1500))
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("burstiness top-20 is TakeOrderedAndProject, never a vocab-wide sort") {
    val df = SparkEntry.queries("q229_token_burstiness")(spark, sf)
    val p = finalPlan(df.queryExecution.executedPlan.toString)
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
    // the 20 survivors broadcast back into the (token, doc) aggregate
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("q219 serves a driver-materialized rating table as a local relation") {
    // corpus work happens once inside fn (the bounded W/L collect); the
    // RETURNED plan must be local-only — re-running the served result
    // must never rescan the corpus
    val df = SparkEntry.queries("q219_bradley_terry")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("LocalTableScan"), p.take(1200))
    assert(!p.contains("Scan parquet"), p.take(1200))
  }

  test("logreg training aggregate is map-side partial before one-row reduce") {
    // the per-iteration gradient must partial-aggregate per partition —
    // only d+2 scalars may cross the exchange
    val f = Tables.documents(spark, sf).select(
      (org.apache.spark.sql.functions.col("n_chars") / 400.0).as("x1"),
      org.apache.spark.sql.functions.lit(1.0).as("y"))
    import org.apache.spark.sql.functions._
    val g = f.agg(graft.queries.dsum(round(col("x1"), 9), 9).as("g"))
    val p = g.queryExecution.executedPlan.toString
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(1200))
  }

  test("q235 serves the MMR ranking as a local relation (q219 rule)") {
    // candidate generation scans the corpus once inside fn; the
    // RETURNED 15-row ranking must never rescan it
    val df = SparkEntry.queries("q235_mmr_rerank")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("LocalTableScan"), p.take(1200))
    assert(!p.contains("Scan parquet"), p.take(1200))
  }

  test("q239 top-20 is TakeOrderedAndProject over the persisted explode") {
    // the exploded (vec, dim) table is read twice (stats, distances)
    // from cache, and the outlier cut is a distributed top-k — a
    // global sort of per-vec distances would not survive 100 TB
    val df = SparkEntry.queries("q239_mahalanobis_ood")(spark, sf)
    df.collect()
    val p = finalPlan(df.queryExecution.executedPlan.toString)
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
    assert(p.contains("InMemoryTableScan"), p.take(1500))
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("q231 novelty joins stay keyed on the shingle, never cartesian") {
    // the only row-multiplying operators allowed are the window
    // explode and the 1-row doc-count broadcast; batch assignment and
    // both aggregates must be hash-keyed
    val df = SparkEntry.queries("q231_batch_novelty")(spark, sf)
    df.collect()
    val p = finalPlan(df.queryExecution.executedPlan.toString)
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(p.contains("Exchange hashpartitioning"), p.take(1500))
  }

  test("q236 candidate ranks come from one keyed scan plus a 50-row window") {
    // the exponential mechanism must never join candidates against the
    // fact table: one bucketized aggregate, a bounded cumulative
    // window, and a top-1 TakeOrderedAndProject
    val df = SparkEntry.queries("q236_dp_median")(spark, sf)
    df.collect()
    val p = finalPlan(df.queryExecution.executedPlan.toString)
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
    // exactly one aggregation over orders rows per scan purpose: the
    // bucket counts and the scalar count — nothing candidate-multiplied
    assert("Scan parquet".r.findAllIn(p).size <= 2, p.take(2000))
  }

  test("winnowing selects per-row: one explode, keyed fingerprint joins only") {
    val df = SparkEntry.queries("q246_winnowing")(spark, sf)
    df.collect()
    val p = finalPlan(df.queryExecution.executedPlan.toString)
    // the window-min selection is array arithmetic inside the scan
    // project; only the winnowed fingerprints explode (cached, so the
    // Generate appears once across its two consumers)
    assert("Generate explode".r.findAllIn(p).size <= 1, p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("watermark detection is scan-shaped: no joins, partial aggregation") {
    val p = plan("q255_watermark_detect")
    assert(!p.contains("Join"), p.take(1500))
    // map-side combine before the per-doc shuffle
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(1500))
  }

  test("CUSUM windows partition by event_type, never one reducer") {
    val p = plan("q251_cusum_drift")
    assert(p.contains("hashpartitioning(event_type"), p.take(1500))
    assert(!p.contains("SinglePartition"), p.take(1500))
  }

  test("source minhash: shingle joins are keyed; only the k-row signature pair join nests") {
    val df = SparkEntry.queries("q249_source_minhash")(spark, sf)
    df.collect()
    val p = finalPlan(df.queryExecution.executedPlan.toString)
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // the non-equi (src_a < src_b) pair join is legal ONLY because its
    // inputs are sources-bounded; it must broadcast, never shuffle
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(bnlj <= 1, s"only the signature pair join may nest ($bnlj): ${p.take(2000)}")
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("Kneser-Ney joins stay keyed on the vocab tables") {
    val df = SparkEntry.queries("q254_kn_bigram_lm")(spark, sf)
    df.collect()
    val p = finalPlan(df.queryExecution.executedPlan.toString)
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // the single 1-row types factor broadcasts; everything else equi-joins
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, p.take(2000))
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("LZ78 fold is scan-shaped: no explode, no join, sort is the only exchange") {
    val p = plan("q269_lz_compressibility")
    assert(!p.contains("Generate"), p.take(1500))   // no explode
    assert(!p.contains("Join"), p.take(1500))
    // one range-partitioning exchange for the final ORDER BY, nothing else
    assert("Exchange".r.findAllIn(p).size === 1, p.take(1500))
  }

  test("JS divergence pair tables stay vocabulary-bounded and keyed") {
    val df = SparkEntry.queries("q284_js_divergence")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // pair generation is an equi-join on tok, never a nested loop over docs
    assert(p.contains("tok"), p.take(2000))
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("signal correlation is one pass: a single global aggregate, no self-join") {
    val df = SparkEntry.queries("q301_signal_correlation")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), p.take(2000))
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("q303 global substring dedup keeps the dedup work under every action") {
    // the cut/uncut emission is INNER ∪ ANTI: a count-only consumer
    // (the bench action) must still execute the window/canonical
    // machinery — the first version's left-outer tail was eliminated
    // by Catalyst and benched a bare doc scan (COVERAGE.md note)
    val df = SparkEntry.queries("q303_substring_dedup")(spark, sf)
    val counted = df.groupBy().count()
    val p = counted.queryExecution.optimizedPlan.toString
    assert(p.contains("xxhash64"), "count plan must keep the window-hash dedup work:\n" + p.take(2000))
    df.collect()
    val exec = df.queryExecution.executedPlan.toString
    assert(!exec.contains("CartesianProduct"))
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("q304 hard negatives broadcast the anchor panel; no corpus self-join") {
    val df = SparkEntry.queries("q304_hard_negatives")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      p.take(2000))
    assert(!p.contains("SortMergeJoin"), "corpus must never shuffle against itself:\n"
      + p.take(2000))
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("q305/q306 assignment is map-only against literal centroids") {
    for (name <- Seq("q305_centroid_silhouette", "q306_cluster_label_nmi")) {
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      // the corpus side reads once and assigns per-row (k sq_dist
      // folds); no crossJoin against a centroid table, no per-row window
      assert(!p.contains("CartesianProduct"), s"$name:\n" + p.take(2000))
      assert("FileScan parquet".r.findAllIn(finalPlan(p)).size === 1,
        s"$name must scan embeddings exactly once:\n" + p.take(2000))
    }
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("q307 threshold sweep builds the pair table once for all thresholds") {
    val df = SparkEntry.queries("q307_dedup_threshold_sweep")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the persisted 0.3-threshold pair table feeds both per-threshold
    // aggregates through the cache — the shingle self-join runs once
    assert(p.contains("InMemoryTableScan"), p.take(2000))
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("q317 dup attribution joins group profiles, never doc-level copies") {
    // sf0.001 is dup-free and AQE's empty-relation propagation would
    // optimize the whole pair computation away — pin the plan on a
    // corpus that actually HAS duplicate groups
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_plan_dupsrc").toString
    Seq((1L, "t one", "A"), (2L, "t one", "B"), (3L, "t one", "B"), (4L, "x", "A"))
      .toDF("doc_id", "text", "source")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("n_chars", org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("text")))
      .write.parquet(s"$dir/documents.parquet")
    val df = SparkEntry.queries("q317_dup_source_matrix")(spark, dir)
    df.collect()
    val p = finalPlan(df.queryExecution.executedPlan.toString)
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // the persisted (group, source, c) profile feeds both the cross
    // and within arms through the cache
    assert(p.contains("InMemoryTableScan"), p.take(2000))
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("q318 budget cut scans the corpus once; windows run on the histogram") {
    val df = SparkEntry.queries("q318_budget_quality_cut")(spark, sf)
    df.collect()
    val p = finalPlan(df.queryExecution.executedPlan.toString)
    // one parquet scan builds the persisted score histogram; the
    // report consumer in the final plan reads the cache (the window/
    // threshold branches render as broadcast-stage references)
    assert(p.contains("InMemoryTableScan"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("q319 shard-mixing windows partition by lang, never one reducer") {
    val p = plan("q319_shard_mixing")
    assert(p.contains("hashpartitioning(lang"), p.take(1500))
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("q322 ANOVA reads the persisted score table for both moment passes") {
    val df = SparkEntry.queries("q322_anova_sources")(spark, sf)
    df.collect()
    val p = finalPlan(df.queryExecution.executedPlan.toString)
    // both the per-source and the global moment aggregates read the
    // cached score table, never a second parquet scan
    assert("InMemoryTableScan".r.findAllIn(p).size >= 2, p.take(2000))
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("q323 probe planner ranks per-vector (8 rows) and reuses one ranked table") {
    val df = SparkEntry.queries("q323_ivf_probe_planner")(spark, sf)
    df.collect()
    val p = finalPlan(df.queryExecution.executedPlan.toString)
    assert(p.contains("hashpartitioning(vec_id"), p.take(2000))
    assert(p.contains("InMemoryTableScan"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("q324 watermark audit windows partition by event_type") {
    val p = plan("q324_late_arrival_audit")
    assert(p.contains("hashpartitioning(event_type"), p.take(1500))
    assert(!p.contains("Join"), p.take(1500))
  }

  test("q351 CMS probes the bounded cell table via broadcast, never a shuffle join") {
    val p = plan("q351_cms_heavy_hitters")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // candidate list is a bounded top-k, not a global sort
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("q353 quantile sketch: one corpus aggregate, no corpus sort, no join") {
    val p = plan("q353_logbin_quantiles")
    // the only corpus-touching op is the (lang, bin) hash aggregate —
    // partial+final; windows and the ×3 explode run on the bounded
    // histogram AFTER it
    assert(p.contains("HashAggregate"), p.take(2000))
    assert(p.contains("Window"), p.take(2000))
    assert(!p.contains("Join") && !p.contains("CartesianProduct"), p.take(2000))
    // corpus path is sort-free: the plan prints top-down, so the text
    // from the LAST (partial, scan-adjacent) HashAggregate to the
    // parquet scan is the corpus path — no Sort may appear there;
    // every Sort above it operates on the bounded histogram
    val corpusPath = p.substring(p.lastIndexOf("HashAggregate"))
    assert(corpusPath.contains("Scan parquet"), corpusPath.take(800))
    assert(!corpusPath.contains("Sort"), corpusPath.take(800))
  }

  test("q352 linkage pairs: blocked equi join, executed ONCE via the persisted pattern table") {
    val df = SparkEntry.queries("q352_fellegi_sunter")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    // r11 verdict #3: the output plan must READ the persisted ≤8-row
    // sufficient-statistic table (already materialized by the EM fit),
    // not re-run the blocking join a second time
    assert(p.contains("InMemoryTableScan"), p.take(2000))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(2000))
    // the join shape lives inside the cached relation: an equi hash
    // join on the block keys, never all-pairs, partial-aggregated
    // before its exchange
    // collect from the OPTIMIZED LOGICAL plan: under AQE the executed
    // plan is an AdaptiveSparkPlanExec whose tree collect() does not
    // descend into the staged inner plan
    val cached = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
        r.cachedPlan.toString
    }.mkString
    assert(cached.contains("HashJoin"), cached.take(2000))
    assert(!cached.contains("CartesianProduct") && !cached.contains("BroadcastNestedLoopJoin"),
      cached.take(2000))
    assert("HashAggregate".r.findAllIn(cached).size >= 2, cached.take(2000))
    graft.dedup.Dedup.clearCaches(spark)
  }
}
