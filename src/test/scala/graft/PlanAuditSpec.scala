package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SimpleMode

/** Plan-regression guards: the physical-plan properties the engine's
  * scale story depends on, asserted so a future edit can't silently
  * trade them away. These are the properties a plan AUDIT checks by
  * hand (`graft.Explain`); here the load-bearing ones are pinned.
  */
class PlanAuditSpec extends SparkTestBase {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf001)
      .queryExecution.explainString(SimpleMode)

  private def physical(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sf001)

  test("s2_json_extract is a single narrow stage: no shuffle, no Jackson") {
    val p = plan("s2_json_extract")
    assert(!p.contains("Exchange"), s"s2 must not shuffle:\n$p")
    assert(p.contains("jsongetlong"), s"s2 must use the native scanner:\n$p")
    assert(!p.contains("from_json"), s"s2 must not Jackson-parse:\n$p")
  }

  test("filter queries push predicates into the parquet scan") {
    for (q <- Seq("p7_period_filter", "j9_range_join", "st4_interval_join")) {
      val p = plan(q)
      assert(p.contains("PushedFilters: [") &&
        !p.replaceAll("PushedFilters: \\[[^\\]]+\\]", "").contains(
          "PushedFilters"),
        s"$q must push at least one filter to every scan:\n$p")
    }
  }

  test("projection queries prune the scan to the referenced columns") {
    val p = plan("m1_multimodal_meta")
    // documents has (doc_id, text, ...); only those two may be read
    val reads = "ReadSchema: [^\\n]+".r.findAllIn(p).toList
    assert(reads.nonEmpty && reads.forall(r =>
      r.contains("doc_id") && r.contains("text") && !r.contains("url")),
      s"m1 must scan only doc_id+text:\n$p")
  }

  test("dimension joins broadcast the small side") {
    for (q <- Seq("j2_revenue_topn", "j5_multiway_join", "sub2_in_subquery"))
      assert(plan(q).contains("BroadcastHashJoin"),
        s"$q must broadcast its dimension side")
  }

  test("anti-join dedup resolves to a broadcast/shuffled hash anti join") {
    assert(plan("j1_anti_join_dedup").contains("LeftAnti"))
    assert(plan("sub3_not_exists").contains("LeftAnti"),
      "NOT EXISTS must decorrelate to an anti join")
  }

  test("global top-k plans a bounded take, not a full sort") {
    assert(plan("t1_topk_global").contains("TakeOrderedAndProject"))
  }

  test("rank-filter per-group top-k gets the map-side WindowGroupLimit") {
    // Catalyst's InferWindowGroupLimit rewrites row_number-window +
    // rank<=k filter into a per-partition group-limit BEFORE the
    // window's shuffle (plus a final one after): the shuffle carries
    // O(groups·k) rows per partition instead of O(n). This is the
    // engine's hottest pattern (topKPerGroup backs w1/x8/x10/v1...),
    // and the optimization is FREE only while the plan shape stays
    // eligible — a rank function the rule doesn't know, or a filter it
    // can't read, silently reverts to full-input windows. Pin it.
    for (q <- Seq("w1_topk_per_group", "x8_tfidf_topk", "v1_cosine_topk",
      "st7_watermark_dedup")) {
      val p = plan(q)
      assert(p.contains("WindowGroupLimit"),
        s"$q lost the map-side window group limit:\n$p")
    }
  }

  test("candidate generators keep their frequency caps in the plan") {
    // the cap filters sit on size(collect_list(...)) aggregate outputs
    for (q <- Seq("d5_simhash_pairs", "v5_neardup_lsh"))
      assert(plan(q).contains("size("),
        s"$q must retain its posting-size cap filter")
    // d2's pair chain is dedup-first and memo-checkpointed (its query
    // plan is a LogicalRDD scan by design), so the cap is audited on
    // the cache BUILD plan: the weighted-df gate must survive
    // optimization as a real filter below the pair expansion
    import org.apache.spark.sql.functions.{col => fcol, lit => flit}
    val buildPlan = graft.operators.DedupOps.weightedCappedIndex(
      spark.read.parquet(s"$sf001/documents.parquet")
        .select(fcol("doc_id"),
          graft.operators.DedupOps.shingleHashes(
            graft.operators.TextOps.tokens(fcol("text")), 3).as("sh"),
          flit(1L).as("w")),
      "doc_id", "sh", "w", 1000L)
      .queryExecution.optimizedPlan.toString
    assert(buildPlan.contains("<= 1000"),
      s"keeper index must retain its weighted-df cap:\n$buildPlan")
    // x16's cap is a sort+slice of the distinct-token array BEFORE the
    // double explode — dropping it re-opens the only uncapped quadratic
    // stage the repo ever had (one long document → O(u²) pairs)
    assert(plan("x16_cooccur_topk").contains("slice("),
      "x16 must retain its per-document token cap (sort+slice)")
    // d10's cap (same shape, on the per-key member list) sits BELOW the
    // triangle stage's lineage cuts, so it is pinned at operator level
    // on coOccurrenceWeights' optimized plan in GraphOpsSpec instead.
  }

  test("mv5 delta-probes the band index: filter below an equi-join") {
    val p = plan("mv5_lsh_delta")
    // the delta restriction must sit on the probe side BEFORE the band
    // equi-join — losing it re-runs d3's full candidate join per batch
    // (O(corpus) probe instead of O(delta))
    assert(p.contains("% 100) >= 90"),
      s"mv5 must keep the seeded delta filter in the plan:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"mv5's band join must stay an equi-join:\n$p")
  }

  test("the rank machinery buckets via the native search, never the HOF fold") {
    // The sampled range-bucket id must be the codegen'd binary search
    // (SortedLowerBoundCount), not an ArrayAggregate fold — the fold
    // is a CodegenFallback whose interpreted per-row scan cost ~2 s
    // on g11 at sf0.1 and broke the whole-stage span around it.
    // e11/e14 now read the shared checkpointed rank frame, so the
    // bucketing property lives in that frame's BUILD plan
    val rankedBuild = QueriesEvents.rfmRankedPlan(spark, sf001)
      .queryExecution.explainString(SimpleMode)
    for ((q, p) <- Seq("g11_pareto", "d18_sorted_neighborhood")
        .map(q => (q, plan(q))) :+ (("events.rfm_ranked", rankedBuild))) {
      assert(p.toLowerCase.contains("sortedlowerboundcount"),
        s"$q must assign range buckets through the native search:\n$p")
      assert(!p.contains("aggregate(lambda"),
        s"$q must not fall back to the interpreted HOF fold:\n$p")
    }
    // stor4 (bounded 24-bit keys → `k >> 16`) and dq11 (dense ids →
    // `event_id div B`) bucket by explicit arithmetic: NO search and
    // NO sampling subtree at all
    for (q <- Seq("stor4_zorder_skip", "dq11_sequence_gaps")) {
      val p = plan(q)
      assert(!p.toLowerCase.contains("sortedlowerboundcount"),
        s"$q should bucket by explicit arithmetic:\n$p")
    }
  }

  test("d18 pairs only through the rank window, never a cross join") {
    val p = plan("d18_sorted_neighborhood")
    assert(p.contains("Window"),
      s"d18 must rank through a window:\n$p")
    // the ONE allowed nested-loop join is the 1-row boundary broadcast
    // (withRangeBuckets' sampled-boundary frame); candidate pairs must
    // still come from lead(), so no CartesianProduct and at most one
    // BNLJ (against the single-row bounds aggregate) may appear
    assert(!p.contains("CartesianProduct"),
      s"d18's candidates must come from lead(), not a theta join:\n$p")
    // both lineage branches (inner windows, seam) read the bounds
    // broadcast, so up to two BNLJ nodes appear — each 1-row
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 2,
      s"d18 may broadcast only the 1-row boundary frame:\n$p")
  }

  test("dq11/d18 range-partition their ranks: no global window over data") {
    // The r11 verdict's scale-killer list: a Window.orderBy with no
    // partitionBy over an O(data) frame moves ALL rows to one task.
    // dq11 and d18 now bucket/range-partition the lag and bridge the
    // seams off a bounded summary frame; this guard pins that an
    // UNPARTITIONED logical Window only ever sits above (a) an
    // Aggregate (dq11's O(n/B) bucket summary) or (b) a Filter over an
    // already-partitioned Window (d18's first/last-W seam rows,
    // <= 2W·P rows) — never directly over the raw scan.
    import org.apache.spark.sql.catalyst.plans.logical.{
      Aggregate, Filter, Window => LWindow}
    val auditees: Seq[(String, org.apache.spark.sql.DataFrame)] =
      Seq("dq11_sequence_gaps", "d18_sorted_neighborhood",
        "g11_pareto", "sql13_pareto", "stor4_zorder_skip")
        .map(q => (q, SparkEntry.queries(q)(spark, sf001))) :+
        // e11/e14's window pipeline lives in the shared frame's build
        (("events.rfm_ranked", QueriesEvents.rfmRankedPlan(spark, sf001)))
    for ((q, df) <- auditees) {
      val lp = df.queryExecution.optimizedPlan
      val wins = lp.collect { case w: LWindow => w }
      assert(wins.exists(_.partitionSpec.nonEmpty),
        s"$q must run its data-frame lag per range bucket:\n$lp")
      // A query may have NO unpartitioned window at all (e11's
      // grouped-prefix form partitions even its offset frame by the
      // metric tag) — the guard only demands that any unpartitioned
      // window that DOES exist sits above a bounded frame.
      val globals = wins.filter(_.partitionSpec.isEmpty)
      for (g <- globals) {
        val bounded = g.child.collectFirst {
          case a: Aggregate => a
          case f: Filter if f.collectFirst {
            case w: LWindow if w.partitionSpec.nonEmpty => w
          }.isDefined => f
        }.isDefined
        assert(bounded,
          s"$q has a global window directly over O(data) rows:\n$lp")
      }
    }
  }

  test("histogram selections never window the raw fact scan") {
    // The de-skewed percentile family (g5/w9/w11/g8/dq12/dq14) reads
    // exact selections off a per-group VALUE HISTOGRAM: the only
    // windows in these plans must sit above an Aggregate (the
    // histogram or a derived summary), never directly over the
    // lineitem scan — a window whose subtree reaches the scan without
    // passing an Aggregate re-introduces the ~n/3-rows-per-task sort
    // the rewrite removed.
    import org.apache.spark.sql.catalyst.plans.logical.{
      Aggregate, Window => LWindow}
    for (q <- Seq("g5_median_quantity", "w9_percentiles",
        "w11_percentile_cont", "g8_weighted_median", "dq12_outlier_iqr",
        "dq14_mad_outliers", "w12_unbounded_median")) {
      val lp = SparkEntry.queries(q)(spark, sf001)
        .queryExecution.optimizedPlan
      val wins = lp.collect { case w: LWindow => w }
      assert(wins.nonEmpty, s"$q lost its histogram window:\n$lp")
      for (w <- wins) {
        assert(w.child.collectFirst { case a: Aggregate => a }.isDefined,
          s"$q has a window directly over the fact scan:\n$lp")
      }
    }
  }

  test("x24 broadcasts the 1-row corpus stats, never shuffles docs") {
    val p = plan("x24_bm25")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"x24's corpus stats must broadcast to the doc scan:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"x24's top-20 must be a bounded take:\n$p")
  }

  test("j14 expands months in-row and prunes both scans") {
    val p = plan("j14_temporal_allocate")
    assert(p.contains("Generate"),
      s"j14 must explode the month sequence in-row:\n$p")
    val reads = "ReadSchema: [^\\n]+".r.findAllIn(p).toList
    assert(reads.nonEmpty && reads.forall(r =>
      !r.contains("l_returnflag") && !r.contains("o_orderpriority")),
      s"j14 must prune unreferenced columns from both scans:\n$p")
  }

  test("j10 blocks on a composite equi-key, not the bare prefix") {
    val p = plan("j10_fuzzy_join")
    assert(p.contains("BroadcastHashJoin"),
      s"j10's blocked join must be a hash join:\n$p")
    // the length bucket must be part of the JOIN KEY (the equi-key
    // cardinality story at scale), not a post-join filter: the hash-join
    // line itself carries the FLOOR(length/3) expression
    val joinLine = p.linesIterator
      .find(_.contains("BroadcastHashJoin")).getOrElse("")
    assert(joinLine.toUpperCase.contains("FLOOR"),
      s"j10 must join on (prefix, length bucket), got:\n$joinLine")
  }

  test("headline queries stay inside whole-stage codegen") {
    // every headline plan must contain at least one codegen stage — a
    // fully interpreted plan is a 10-40x regression waiting to happen.
    // AQE initial plans carry no codegen markers until executed (a
    // previous form of this guard accepted any "AdaptiveSparkPlan",
    // which every plan has — it could never fire), so the assertion
    // runs with AQE off: CollapseCodegenStages then applies at planning
    // time and marks codegen stages with the "*(n)" prefix.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // object-serde operators (mapPartitions / flatMapGroupsWithState
      // cores) have no codegen stages by design
      val objectSerde = Set("m2_decode_features", "m3_header_decode",
        "m4_thumbnail", "m5_wav_decode", "m6_video_decode",
        "st5_custom_state", "st10_quota")
      // metadata-plane queries: stor25 is a driver-side O(log) history
      // scan (LocalTableScan by design — no data plan to codegen)
      val metadataPlane = Set("stor25_history")
      // j13 runs on its own FORKED session with AQE force-enabled (the
      // whole point of the query is runtime skew-splitting), so its
      // initial plan is an unexecuted AdaptiveSparkPlan with no codegen
      // markers here; its dedicated skew-guard test below executes it
      // and audits the FINAL plan instead.
      val aqeForked = Set("j13_skew_aqe")
      // plans whose ROOT is the shared verified-pairs cache scan have
      // their codegen inside the cached relation's build plan — reading
      // materialized rows is fine. Explicit allowlist: ONLY the dedup
      // consumers of that cache may be cache-rooted; any other query
      // regressing to a codegen-free cache-rooted plan must fail here.
      val cacheRooted = Set("d2_jaccard_pairs", "d7_dedup_clusters",
        "d9_pagerank")
      for (q <- Bench.headline.filterNot(objectSerde)
          .filterNot(aqeForked).filterNot(metadataPlane)) {
        val p = plan(q)
        assert(p.contains("*(") ||
          (cacheRooted(q) &&
            p.linesIterator.drop(1).next().startsWith("InMemoryTableScan")),
          s"$q lost whole-stage codegen:\n$p")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("hll registers collapse map-side: partial_max before the exchange") {
    // the sketch's scale property: each partition reduces to <= 4096
    // register rows BEFORE the shuffle (partial aggregation), so the
    // exchange is O(m), not O(rows)
    val p = plan("sk1_hll_distinct")
    assert(p.contains("partial_max"),
      s"sk1 must partial-aggregate registers map-side:\n$p")
  }

  test("curation window queries are single-shuffle plans") {
    // one exchange on the partition key, a window, nothing else — the
    // shape that scales linearly; a second exchange would mean the
    // window or gate recomputed the input
    for (q <- Seq("x14_quality_filter", "x15_source_cap")) {
      val p = plan(q)
      val exchanges = "Exchange".r.findAllIn(p).size
      assert(exchanges == 1, s"$q must shuffle exactly once:\n$p")
    }
  }

  test("sketch probes broadcast the sketch, never shuffle the probe side") {
    // CMS estimate is a broadcast join: the sketch is O(d*w) rows by
    // construction
    assert(plan("sk3_cms_topk").contains("BroadcastHashJoin"),
      "sk3's probe must broadcast the counter table")
    // the bloom bit table collapses to ONE broadcast map row; both
    // hash lookups are scalar element_at probes — no join operator at
    // all on the probe path, and the probe side never exchanges before
    // the might projection (the r16 shape paid two broadcast joins)
    val bloom = plan("sk4_bloom_filter")
    assert("BroadcastExchange".r.findAllIn(bloom).size >= 1 &&
      bloom.contains("element_at(__bfmap"),
      s"sk4 must probe the broadcast bit map, not join word rows:\n$bloom")
    // exactly one broadcast of the bit map feeds the might projection;
    // the word-row form would show two hash-join broadcasts here
    assert("element_at\\(__bfmap".r.findAllIn(bloom).size >= 2,
      s"both hash lookups must read the one broadcast map:\n$bloom")
  }

  test("native hll aggregate plans partial buffers, no register shuffle") {
    val p = plan("sk6_hll_native_agg")
    // TypedImperativeAggregate plans as ObjectHashAggregate with a
    // partial_ mode below the exchange: each partition reduces to one
    // 4 KB buffer before anything moves
    assert(p.contains("ObjectHashAggregate"),
      s"sk6 must use the object-buffer aggregate path:\n$p")
    assert(p.contains("partial_hllsketchagg"),
      s"sk6 must partial-aggregate the sketch map-side:\n$p")
    // the GROUPED form must keep the same property per group: one
    // exchange of O(groups x 4 KB) buffers — a second exchange means a
    // distinct-aggregate (per-(group,user) expand+shuffle) crept back
    // into the plan, the exact shape the sketch exists to avoid
    val pg = plan("sk7_hll_grouped")
    assert(pg.contains("partial_hllsketchagg"),
      s"sk7 must partial-aggregate per (group, partition):\n$pg")
    assert("Exchange".r.findAllIn(pg).size == 1,
      s"sk7 must shuffle exactly once (sketch buffers only):\n$pg")
  }

  test("gram matrix and heap top-k aggregate map-side, constant state") {
    // v10: the whole X'X pass must be ONE object-buffer aggregation —
    // the exchange moves one ~16 KB triangle per partition, never d^2
    // exploded products per row
    val pg = plan("v10_gram")
    assert(pg.contains("ObjectHashAggregate"),
      s"v10 must use the object-buffer aggregate path:\n$pg")
    assert(pg.contains("partial_grammatrixagg"),
      s"v10 must partial-aggregate the triangle map-side:\n$pg")
    assert(!pg.contains("Generate explode") ||
      pg.indexOf("Generate explode") < pg.indexOf("ObjectHashAggregate") ||
      "Exchange".r.findAllIn(pg).size <= 1,
      s"v10's explode must be the 2080-row output unpack, not a " +
        s"pre-aggregation blowup:\n$pg")
    // w8: per-group top-k with NO Sort and NO Window anywhere — the
    // heap replaces the window's full sort-shuffle
    val pw = plan("w8_topk_native")
    assert(pw.contains("partial_topkagg"),
      s"w8 must partial-aggregate the heap map-side:\n$pw")
    assert(!pw.contains("Window") && !pw.contains("Sort"),
      s"w8 must not sort or window — the heap IS the top-k:\n$pw")
    assert("Exchange".r.findAllIn(pw).size == 1,
      s"w8 must shuffle exactly once (k doubles per group-partial):\n$pw")
  }

  test("v11 broadcasts the probes — the quantized corpus never shuffles") {
    val p = plan("v11_quantized_topk")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"v11's all-pairs stage must be a broadcast of the 5 probes:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"v11 must never plan an unbroadcast cartesian:\n$p")
    // v13: the augmented band join must be a broadcast HASH join on
    // (band, bucket) — the corpus is banded once and never shuffles
    val p13 = plan("v13_mips_lsh")
    assert(p13.contains("BroadcastHashJoin"),
      s"v13's band join must broadcast the probes:\n$p13")
    assert(!p13.contains("Exchange hashpartitioning(id_n"),
      s"v13 must not shuffle the banded corpus:\n$p13")
  }

  test("mv3's delta terms stay equi-joins; d15 is one window argmax") {
    val pm = plan("mv3_delta_join")
    assert(!pm.contains("CartesianProduct") &&
      !pm.contains("BroadcastNestedLoopJoin"),
      s"mv3's four decomposition terms must all be equi-joins:\n$pm")
    val pd = plan("d15_canonical")
    // exactly one Window EXEC node (`Window [`) — WindowGroupLimit
    // pre-filter nodes are the rn=1 pushdown and are expected
    assert("Window \\[".r.findAllIn(pd).size == 1,
      s"d15 must elect canonicals with exactly ONE window argmax:\n$pd")
    assert(!pd.contains("CartesianProduct"),
      s"d15 must never compare documents pairwise:\n$pd")
  }

  test("g9 melts in ONE scan via Expand; f8's z-map never shuffles") {
    val pg = plan("g9_unpivot")
    assert("Scan parquet".r.findAllIn(pg).size == 1,
      s"unpivot must read the table once, not once per measure:\n$pg")
    assert(pg.contains("Expand"),
      s"unpivot must fan out rows in the operator:\n$pg")
    val pf = plan("f8_zorder")
    assert(!pf.contains("Exchange"),
      s"the z-value projection must stay narrow:\n$pf")
  }

  test("dq1 profiles every column in one scan, one exchange, no Expand") {
    val p = plan("dq1_profile")
    // all five columns' stats ride ONE ObjectHashAggregate pass: a
    // second Scan means per-column jobs crept in; an Expand means an
    // exact count-distinct multiplied the scanned rows column-fold; a
    // second Exchange means the array-of-struct explode moved below
    // the aggregate
    assert("Scan parquet".r.findAllIn(p).size == 1,
      s"dq1 must scan orders exactly once:\n$p")
    assert("Exchange".r.findAllIn(p).size == 1,
      s"dq1 must shuffle exactly once (sketch buffers + scalars):\n$p")
    assert(!p.contains("Expand"),
      s"dq1 must not plan a count-distinct Expand:\n$p")
    assert(p.contains("partial_kmvsketchagg"),
      s"dq1 must partial-aggregate the KMV buffers map-side:\n$p")
  }

  test("ts2 rides ts1's spine: one raw-stream aggregate, windows after") {
    val p = plan("ts2_interpolate")
    // the raw events aggregate once into hourly cells; both
    // interpolation windows then run ON THE SPINE (time-window × groups
    // rows), partitioned by the series key. A second events aggregate
    // or a window BELOW the spine join means the regularization
    // re-reads the stream.
    assert("Scan parquet".r.findAllIn(p).size <= 3, // hourly + bounds + groups
      s"ts2 must not re-scan events per stage:\n$p")
    assert(p.contains("Window"), s"ts2 interpolates via windows:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"ts2's spine build must stay a broadcast cross of 1-row bounds:\n$p")
  }

  test("j17 broadcasts the derived salt; the fact side never replicates") {
    val p = plan("j17_adaptive_salt")
    // the 1-row skew pre-pass enters both sides via broadcast — a
    // shuffled nested-loop would move the fact table for a scalar
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"),
      s"j17 must broadcast the derived salt factor:\n$p")
    // replication (explode of sequence(0, salt-1)) belongs on the
    // DIMENSION side only: exactly one Generate, fed by orders' scan,
    // never lineitem's
    val gens = "(?m)^.*Generate .*$".r.findAllIn(p).toList
    assert(gens.size == 1,
      s"j17 must have exactly ONE salt-explode Generate, got $gens\n$p")
  }

  test("kmeans broadcasts centroids and partial-aggregates the update") {
    val p = plan("v7_kmeans")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"),
      s"v7 must broadcast the K centroids, never shuffle the corpus:\n$p")
    assert(p.contains("partial_sum"),
      s"v7's centroid means must collapse map-side before the exchange:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"v7 must never plan a cartesian product:\n$p")
    // the assign step is array_min over a broadcast centroid array — a
    // narrow projection; a Window here means the argmin regressed to a
    // per-round shuffle of the whole corpus
    assert(!p.contains("Window"),
      s"v7's assign must be a narrow argmin, not a window shuffle:\n$p")
  }

  test("decontamination is an equi-join on the shingle hash, no pairs") {
    val p = plan("d8_decontaminate")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"d8 must stay an equi-join — a non-equi plan explodes at scale:\n$p")
  }

  test("x8 tokenizes and aggregates once: both term-join branches read " +
    "the persisted tf frame") {
    val df = physical("x8_tfidf_topk")
    df.write.format("noop").mode("overwrite").save()
    val p = df.queryExecution.executedPlan.toString
    // tf rows and the df aggregate over them must BOTH come from the
    // cache — two InMemoryTableScans; a plan that re-derives either
    // branch from parquet re-runs tokenize+explode+agg per branch
    val scans = "InMemoryTableScan".r.findAllIn(p).size
    assert(scans >= 2,
      s"x8 must read the tf cache on both join branches (got $scans):\n$p")
  }

  test("v14's ADC scan broadcasts the probe tables — codes never shuffle") {
    // the PQ promise: the encoded corpus is scanned in place (the
    // whole point of the 8-byte representation); probes ride in as a
    // broadcast of 8×16 distance tables. A CartesianProduct or an
    // exchange of the corpus side means the scan format degraded to a
    // shuffle of the thing PQ exists to avoid moving.
    val p = plan("v14_pq_adc")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"v14 must broadcast the probe distance tables:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"v14 must never plan an unbroadcast cartesian:\n$p")
  }

  test("x21 reads the persisted tf frame on both term-join branches") {
    // same structural-reuse property as x8: the tf rows AND the cf
    // aggregate over them must both come from the cache — otherwise
    // tokenize+explode+count runs once per branch.
    val df = physical("x21_unigram_lm")
    df.write.format("noop").mode("overwrite").save()
    val p = df.queryExecution.executedPlan.toString
    val scans = "InMemoryTableScan".r.findAllIn(p).size
    assert(scans >= 2,
      s"x21 must read the tf cache on both join branches (got $scans):\n$p")
  }

  test("stor1's bucketed join is exchange-free below the join") {
    // The property the query exists for: both fact sides read CO-LOCATED
    // buckets (written bucketBy the join key), so the sort-merge join has
    // NO exchange under it — the only shuffle in the whole plan is the
    // final 5-group aggregate. A second Exchange here means the bucketed
    // layout stopped being recognized (bucketing disabled, bucket spec
    // mismatch, or the merge hint lost) and the join silently re-pays
    // the full fact-fact shuffle at every run — the exact cost the
    // write-time bucketing paid once to remove.
    val p = plan("stor1_bucketed_join")
    assert(p.contains("SortMergeJoin"),
      s"stor1 must sort-merge join the bucketed tables:\n$p")
    assert("Exchange".r.findAllIn(p).size == 1,
      s"stor1 must shuffle exactly once (the final agg):\n$p")
    assert(p.contains("Bucketed: true"),
      s"stor1's scans must report the bucketed layout:\n$p")
  }

  test("stor6's as-of reader prunes partitions at planning time") {
    // The property the versioned read exists for: liveness + the
    // zone-map month window are PARTITION-COLUMN predicates, so the
    // scan plans PartitionFilters (no manifest collect, no full-table
    // read). Every file_month scan in the plan must carry partition
    // filters, and the v1/v2 window reads must also push the exact
    // ship predicate into the surviving files' row groups.
    val p = plan("stor6_time_travel")
    val scans = "PartitionFilters: \\[[^\\]]*\\]".r.findAllIn(p).toList
    assert(scans.nonEmpty && scans.forall(_.contains("file_month")),
      s"stor6's scans must partition-prune on file_month:\n$p")
    assert(p.contains("PushedFilters: [") && p.contains("ship"),
      s"stor6's window read must push the ship predicate:\n$p")
  }

  test("j18's cost-guarded strategy flips the physical join with the estimates") {
    import graft.operators.RelationalOps
    import org.apache.spark.sql.functions.{col => fcol, lit => flit}
    // the registry decision on this data: customer is far under the
    // broadcast budget → the executed join must be a broadcast hash
    val p = plan("j18_cost_guarded_join")
    assert(p.contains("BroadcastHashJoin"),
      s"j18 must broadcast the small dim:\n$p")
    val ord = spark.read.parquet(s"$sf001/orders.parquet")
      .select(fcol("o_custkey"), fcol("o_totalprice"))
    val cust = spark.read.parquet(s"$sf001/customer.parquet")
      .select(fcol("c_custkey").as("o_custkey"), fcol("c_mktsegment"))
    // same join, broadcast budget forced to zero → shuffle arm, and
    // the plan must NOT broadcast the right side
    val (s2, df2) = RelationalOps.costGuardedJoin(ord, cust,
      Seq("o_custkey"), broadcastMaxRows = 0L)
    val p2 = df2.queryExecution.explainString(SimpleMode)
    assert(s2 == "shuffle" && p2.contains("SortMergeJoin") &&
      !p2.contains("BroadcastHashJoin"),
      s"zero budget must force the shuffle arm:\n$p2")
    // skewed left + zero budget → salted arm: the salt spread (hash
    // pmod + the replicated-side Generate) must be in the plan
    import spark.implicits._
    val hot = ((1 to 900).map(_ => 1L) ++ (2L to 101L)).zipWithIndex
      .map { case (k, i) => (k, i.toLong) }.toDF("k", "v")
    val right = (1L to 101L).map(k => (k, s"r$k")).toDF("k", "tag")
    val (s3, df3) = RelationalOps.costGuardedJoin(hot, right, Seq("k"),
      broadcastMaxRows = 0L, skewThreshold = 2L)
    val p3 = df3.queryExecution.explainString(SimpleMode)
    // (xxhash64 itself constant-folds into the LocalTableScan on
    // in-memory fixtures — assert the salt column and the replicated-
    // side Generate, the structural salt machinery)
    assert(s3 == "salted" && p3.contains("__graft_salt") &&
      p3.contains("Generate"),
      s"skewed left must force the salted arm:\n$p3")
  }

  test("e6 sessionizes in ONE shuffle: both windows and the agg share it") {
    // lag + running-sum ride one user_id exchange, and the (user_id,
    // session_idx) aggregate is satisfied by the same partitioning
    // (subset rule) — a second exchange means the window chain or the
    // aggregate stopped sharing the partitioning and the linear
    // per-user-stream shape broke.
    val p = plan("e6_sessionize")
    assert("Exchange".r.findAllIn(p).size == 1,
      s"e6 must shuffle exactly once:\n$p")
  }

  test("j13's hot key is actually split by AQE's skew-join at runtime") {
    // The demonstration the query exists for (VERDICT r10 #7): after
    // execution, the FINAL adaptive plan must carry a skew-split merge
    // join — otherwise the query silently degraded into an ordinary
    // sort-merge join and proves nothing. sf0.01 (not sf0.001): the hot
    // partition must exceed the forked session's 128 KB skew threshold,
    // which ~20k hot rows do and ~2k don't. collect(), not a noop
    // write: df.write plans a SEPARATE queryExecution, leaving this
    // one's adaptive plan unexecuted (isFinalPlan=false, no skew
    // marks). Output is 8 grouped rows, so collect is safe.
    val df = physical("j13_skew_aqe")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("skew=true"),
      s"j13 must execute with a skew-split SortMergeJoin:\n$p")
  }

  test("ml1 is one exact-moment pass: partial aggregation, no window") {
    // The closed-form regression's whole scale story is "ten Long
    // sums per group, map-side combined, solve in the projection" —
    // a window or a second fact exchange would mean the solve stopped
    // being a pure aggregation shape.
    val p = plan("ml1_ols")
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      s"ml1 must partial-aggregate map-side:\n$p")
    assert(!p.contains("Window"), s"ml1 must not window:\n$p")
    assert("Exchange".r.findAllIn(p).size == 1,
      s"ml1 is one shuffle of 10 longs per group:\n$p")
  }

  test("x37 broadcasts the trained vocab — the corpus never shuffles " +
    "for the encode join") {
    // Heaps-law vocabulary vs corpus-scale words: the encode lookup
    // must be a broadcast hash join; a shuffled join would move the
    // exploded corpus for a bounded dictionary.
    val p = plan("x37_bpe_encode")
    assert(p.contains("BroadcastHashJoin"),
      s"x37's encode join must broadcast the vocab:\n$p")
  }
}
