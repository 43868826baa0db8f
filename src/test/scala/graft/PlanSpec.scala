package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}

/**
 * Physical-plan quality gate (the 100 TB design contract): these tests
 * pin the plan properties that make the queries survive a 1000-executor
 * scale-up — filters and projections reaching the parquet scan, dimension
 * joins broadcasting instead of shuffling the fact side, and shuffle
 * counts staying at the algorithmic minimum. A regression here (e.g. a
 * lost broadcast hint turning q5 into five sort-merge joins) would pass
 * every correctness test and still be a scale disaster.
 */
class PlanSpec extends SparkTestBase {

  private def flatten(p: SparkPlan): Seq[SparkPlan] = flattenPlan(p)

  private def executedNodes(df: DataFrame): Seq[SparkPlan] = {
    df.collect() // materialize the AQE final plan
    flatten(df.queryExecution.executedPlan)
  }

  private def q(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sf("sf0.001"))

  test("q1: filter and column pruning reach the parquet scan") {
    val explained = q("q1_pricing_summary").queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(explained.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThanOrEqual(l_quantity"))
    // projection pruning: none of the unused lineitem columns is read
    assert(!explained.contains("l_comment") && !explained.contains("l_shipmode"))
  }

  test("q3/q5: dimension joins broadcast — no shuffle on the fact side for dims") {
    for (name <- Seq("q3_top_orders", "q5_nation_revenue")) {
      val nodes = executedNodes(q(name))
      val bhj = nodes.collect { case j: BroadcastHashJoinExec => j }
      val smj = nodes.collect { case j: SortMergeJoinExec => j }
      assert(bhj.nonEmpty, s"$name should broadcast its dimension joins")
      // the only allowed shuffle join is lineitem⋈orders (both large)
      assert(smj.size <= 1, s"$name has ${smj.size} sort-merge joins, expected <=1")
    }
  }

  test("q1: shuffles = agg exchange + deterministic final sort, nothing else") {
    val shuffles = executedNodes(q("q1_pricing_summary"))
      .collect { case s: ShuffleExchangeLike => s }
    assert(shuffles.size <= 2,
      s"scan-agg query must shuffle at most twice (agg + order), got ${shuffles.size}")
  }

  test("whole-stage codegen covers the q1 aggregation pipeline") {
    val codegen = executedNodes(q("q1_pricing_summary"))
      .collect { case w: WholeStageCodegenExec => w }
    assert(codegen.nonEmpty, "q1 must run inside WholeStageCodegen spans")
  }

  test("ann brute-force: bounded shuffles (fanout, window, output order)") {
    val shuffles = executedNodes(q("ann_topk_brute"))
      .collect { case s: ShuffleExchangeLike => s }
    assert(shuffles.size <= 3,
      s"ann_topk_brute should shuffle at most 3 times, got ${shuffles.size}")
  }

  test("CollapseTruncation rule folds stacked width limits into one substring") {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ graft.plans.CollapseTruncation
    try {
      val df = spark.range(3).selectExpr(
        "substring(substring(concat(cast(id AS string), 'abcdefghij'), 1, 8), 1, 5) AS s")
      val substrings = df.queryExecution.optimizedPlan.expressions
        .flatMap(_.collect { case s: org.apache.spark.sql.catalyst.expressions.Substring => s })
      assert(substrings.size == 1, s"stacked substrings not collapsed: $substrings")
      assert(df.collect().map(_.getString(0)).toSeq == Seq("0abcd", "1abcd", "2abcd"))
    } finally spark.experimental.extraOptimizations = prev
  }

  test("dmv_hash_join broadcasts the sampled DMV side") {
    val nodes = executedNodes(q("dmv_hash_join"))
    assert(nodes.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      "the small DMV sample must broadcast, never shuffle the event side")
  }

  test("documents scan prunes to the columns the text queries read") {
    val explained = q("text_token_stats").queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val readSchemaLines = explained.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(readSchemaLines.nonEmpty)
    // only doc_id and text should be read — never the unused columns
    readSchemaLines.foreach { l =>
      assert(!l.contains("lang") && !l.contains("source") && !l.contains("n_chars"),
        s"unpruned scan: $l")
    }
  }

  test("dedup_simhash: pigeonhole equi-join — no cartesian/nested-loop join") {
    val nodes = executedNodes(q("dedup_simhash"))
    val bad = nodes.filter(n =>
      n.nodeName.contains("CartesianProduct") ||
        n.nodeName.contains("BroadcastNestedLoopJoin"))
    assert(bad.isEmpty,
      s"simhash pair scan must be an equi-join on (segment, bits), found: ${bad.map(_.nodeName)}")
  }

  test("dedup exact: map-side partial aggregation before the digest shuffle") {
    val nodes = executedNodes(q("dedup_exact"))
    val hashAggs = nodes.filter(_.nodeName.contains("HashAggregate"))
    assert(hashAggs.size >= 2, "expect partial + final aggregate pair")
  }

  test("ann_topk_sq8: the only join is the broadcast query-side probe") {
    val nodes = executedNodes(q("ann_topk_sq8"))
    // intentional broadcast nested-loop on the tiny query side; a SHUFFLED
    // cartesian of the corpus would be the scale-killer variant
    assert(!nodes.exists(_.nodeName.contains("CartesianProduct")),
      "sq8 probe must broadcast the query side, not cross-product the corpus")
    assert(nodes.exists(_.nodeName.contains("BroadcastNestedLoopJoin")) ||
      nodes.exists(_.nodeName.contains("BroadcastHashJoin")))
  }

  test("text_bpe_tokens / text_repetition scans prune to doc_id + text") {
    Seq("text_bpe_tokens", "text_repetition").foreach { name =>
      val explained = q(name).queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val readSchemaLines = explained.linesIterator.filter(_.contains("ReadSchema")).toSeq
      assert(readSchemaLines.nonEmpty)
      readSchemaLines.foreach { l =>
        assert(!l.contains("lang") && !l.contains("source") && !l.contains("n_chars"),
          s"$name unpruned scan: $l")
      }
    }
  }

  test("dedup_keep: the survivor anti-join broadcasts the drop list") {
    val nodes = executedNodes(q("dedup_keep"))
    assert(nodes.exists(n => n.nodeName.contains("BroadcastHashJoin") &&
      n.toString.contains("LeftAnti")),
      "kept-corpus filter must be a broadcast anti-join, not a shuffled one")
  }

  test("events_funnel: three chained stage windows share one user-keyed exchange") {
    val nodes = executedNodes(q("events_funnel"))
    val shuffles = nodes.collect { case s: ShuffleExchangeLike => s }
    // one hash exchange on user_id feeds all three Window operators and
    // the per-user aggregate; the only other exchange is the global agg
    assert(shuffles.size <= 2,
      s"funnel should shuffle once by user (+final agg), got ${shuffles.size}")
    assert(nodes.count(_.nodeName.contains("Window")) >= 3,
      "expected the three chained stage windows")
  }

  test("runtime bloom filter prunes the fact side of a selective shuffle join") {
    // The 100 TB lever this gate pins: when a selective dimension filter
    // feeds a shuffle join, Catalyst injects a bloom filter built from
    // the filtered side into the fact scan, so non-joining fact rows die
    // before the exchange instead of shuffling 100 TB to discard most of
    // it. Thresholds here only scale the trigger down to fixture size —
    // at real scale the defaults fire on their own.
    import org.apache.spark.sql.functions._
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> (try Some(conf.get(k)) catch { case _: Exception => None }))
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force a shuffle join at fixture size
      val li = spark.read.parquet(sf("sf0.001") + "/lineitem.parquet")
      val ord = spark.read.parquet(sf("sf0.001") + "/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(sum(col("l_quantity").cast("long")).as("qty"))
      assert(joined.queryExecution.optimizedPlan.toString.contains("might_contain"),
        "expected an injected bloom runtime filter on the fact side")
      assert(joined.collect().nonEmpty)
    } finally saved.foreach { case (k, v) => v.fold(conf.unset(k))(conf.set(k, _)) }
  }

  test("grouping_sets_orders: one Expand + one agg exchange, not N scans") {
    val nodes = executedNodes(q("grouping_sets_orders"))
    val expands = nodes.filter(_.getClass.getSimpleName.contains("Expand"))
    assert(expands.size == 1,
      s"grouping sets should compile to a single Expand, got ${expands.size}")
    val scans = nodes.filter(_.getClass.getSimpleName.contains("FileSourceScan"))
    assert(scans.size == 1, s"expected one orders scan, got ${scans.size}")
    val shuffles = nodes.collect { case s: ShuffleExchangeLike => s }
    assert(shuffles.size <= 2, // agg exchange + final deterministic sort
      s"expected <=2 shuffles, got ${shuffles.size}")
  }

  test("pivot_revenue: explicit values → single scan, single agg pass") {
    val nodes = executedNodes(q("pivot_revenue"))
    val scans = nodes.filter(_.getClass.getSimpleName.contains("FileSourceScan"))
    assert(scans.size == 1,
      s"pivot with explicit values must not pre-scan for distinct values, got ${scans.size} scans")
  }

  test("text_bigram_rarity: count join broadcasts (small counts) or reuses the bigram exchange") {
    // at fixture size AQE broadcasts the distinct-bigram counts (the
    // occurrence side is then never shuffled for the join); at corpus
    // scale the same plan degrades gracefully to SMJ with the bigram
    // exchange built once and reused. Either shape is the right one —
    // what must NEVER appear is a nested-loop/cartesian join.
    val nodes = executedNodes(q("text_bigram_rarity"))
    val reused = nodes.filter(_.getClass.getSimpleName.contains("ReusedExchange"))
    val bhj = nodes.collect { case j: BroadcastHashJoinExec => j }
    assert(reused.nonEmpty || bhj.nonEmpty,
      "expected broadcast count join or a reused bigram exchange")
    val bnlj = nodes.filter(_.getClass.getSimpleName.contains("BroadcastNestedLoopJoin"))
    val cart = nodes.filter(_.getClass.getSimpleName.contains("CartesianProduct"))
    assert(bnlj.isEmpty && cart.isEmpty)
  }

  test("search_postings: both postings exchanges carry aggregated rows") {
    // (token, doc_id) tf exchange, token summary exchange (map-side
    // combined partials since the top-doc is a struct-min inside the
    // aggregate, not a window), + at most a final sort exchange. A
    // row_number window here would add a full tf sort and break the
    // partial aggregation.
    val nodes = executedNodes(q("search_postings"))
    val shuffles = nodes.collect { case s: ShuffleExchangeLike => s }
    assert(shuffles.size <= 3,
      s"expected tf + token-agg (+sort) exchanges, got ${shuffles.size}")
    assert(!nodes.exists(_.getClass.getSimpleName.contains("Window")),
      "top-doc must ride the aggregate, not a window sort")
  }

  test("mm_near_dup: candidate generation is an equi-join, never a cartesian") {
    val nodes = executedNodes(q("mm_near_dup"))
    val bnlj = nodes.filter(_.getClass.getSimpleName.contains("BroadcastNestedLoopJoin"))
    val cart = nodes.filter(_.getClass.getSimpleName.contains("CartesianProduct"))
    assert(bnlj.isEmpty && cart.isEmpty,
      s"prefix-filter postings must stay an equi-join, got ${bnlj ++ cart}")
  }

  test("mm_near_dup: postings self-join branches reuse one signature exchange") {
    // the repartition barrier below the posting fan-out must be computed
    // once and ReusedExchange'd into the second branch — otherwise the
    // corpus is scanned and the 16-counter signature built twice
    val nodes = executedNodes(q("mm_near_dup"))
    val reused = nodes.filter(_.getClass.getSimpleName.contains("ReusedExchange"))
    assert(reused.nonEmpty,
      s"expected a ReusedExchange for the shared signature frame, got node kinds: " +
        nodes.map(_.getClass.getSimpleName).distinct.mkString(", "))
  }

  test("dedup_repeated_spans: linear span shuffles, no self-join/cartesian") {
    val nodes = executedNodes(q("dedup_repeated_spans"))
    assert(!nodes.exists(n =>
      n.getClass.getSimpleName.contains("CartesianProduct") ||
        n.getClass.getSimpleName.contains("BroadcastNestedLoopJoin")),
      "span stats must stay equi-join shaped")
    // fanout round-robin + ONE span-keyed exchange (shared by the
    // occurrence agg and the stats join via ReuseExchange) + doc agg +
    // output order — a postings SELF-join here would be the occ²
    // shuffle bomb, and a second span exchange would mean the corpus
    // gets tokenized + exploded twice
    val shuffles = nodes.collect { case s: ShuffleExchangeLike => s }
    assert(shuffles.size <= 4,
      s"span stats should shuffle at most 4 times, got ${shuffles.size}")
    val reused = nodes.filter(_.getClass.getSimpleName.contains("ReusedExchange"))
    assert(reused.nonEmpty,
      "expected the span-keyed exchange to be computed once and reused")
  }

  test("events_coverage: windows and island rollup share one user exchange") {
    val nodes = executedNodes(q("events_coverage"))
    val shuffles = nodes.collect { case s: ShuffleExchangeLike => s }
    // user-keyed exchange + final orderBy range exchange
    assert(shuffles.size <= 2,
      s"expected the sweep to reuse one user-keyed exchange, got ${shuffles.size}")
  }

  test("events_value_deciles: two-pass rank — no single-partition sort/window") {
    // the global-window formulation (`Window.orderBy` with no partitionBy)
    // funnels every user through ONE task; the two-pass rank must leave no
    // SinglePartition exchange anywhere in the plan
    val nodes = executedNodes(q("events_value_deciles"))
    val single = nodes.filter(n =>
      n.toString.linesIterator.next().contains("SinglePartition"))
    // the one SinglePartition shape that is fine: the exchange under a
    // GLOBAL scalar aggregate (grouping keys=[]) — here the ≤ nPart
    // partition-count rows collapsing to the 1-row total. Any other
    // single-partition node (a global sort, a window over everything, a
    // data funnel) is the O(n)-through-one-task shape this gate exists
    // to forbid.
    val funnels = single.filterNot { n =>
      n.nodeName.contains("Exchange") &&
        n.children.exists(c => c.toString.linesIterator.next().contains("keys=[]"))
    }
    assert(funnels.isEmpty,
      s"found single-partition data funnels: ${funnels.map(_.nodeName)}")
    val windows = nodes.filter(_.nodeName.contains("Window"))
    assert(windows.forall(!_.toString.linesIterator.next().contains("windowspecdefinition()")),
      "no window may run with an empty partition spec")
  }

  test("events_value_deciles: one shared range exchange, nothing pinned") {
    // round 6 kept counts and ranks consistent by persisting the ranged
    // frame — and never unpersisted it (a block-store leak per invocation
    // in a long-lived session). The one-job form must instead share the
    // range exchange via ReuseExchange (boundary sampling runs once, pid
    // agrees across branches) and leave NOTHING in the block store.
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val df = q("events_value_deciles")
    val nodes = executedNodes(df)
    assert(nodes.exists(_.getClass.getSimpleName.contains("ReusedExchange")),
      s"counts and rank branches must share one range exchange, got: " +
        nodes.map(_.getClass.getSimpleName).distinct.mkString(", "))
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"query left persistent RDDs behind: $leaked")
  }

  test("dedup_semantic: cluster-scoped equi-join, broadcast drop list, no cartesian") {
    val nodes = executedNodes(q("dedup_semantic"))
    val bad = nodes.filter(n =>
      n.getClass.getSimpleName.contains("CartesianProduct") ||
        n.getClass.getSimpleName.contains("BroadcastNestedLoopJoin"))
    assert(bad.isEmpty,
      s"within-cluster pruning must stay an equi-join on the cluster id, got $bad")
    // the survivor anti-join's drop list is near-dup-sized — it must broadcast
    def anti(kind: String) = nodes.filter(n =>
      n.getClass.getSimpleName.contains(kind) &&
        n.toString.linesIterator.next().contains("LeftAnti"))
    assert(anti("BroadcastHashJoin").nonEmpty,
      "survivor anti-join must be a broadcast hash join")
    assert(anti("SortMergeJoin").isEmpty,
      "drop list must never be big enough to sort-merge")
  }

  test("text_lm_score: scans prune to doc_id + text") {
    val explained = q("text_lm_score").queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val schemas = explained.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(schemas.nonEmpty)
    assert(schemas.forall(s => !s.contains("lang") && !s.contains("source")),
      s"LM scoring reads only doc_id/text, got: ${schemas.mkString("; ")}")
  }

  test("events_sessionize family: one key exchange + output sort at most") {
    for (name <- Seq("events_ohlc", "events_latest_state")) {
      val nodes = executedNodes(q(name))
      val shuffles = nodes.collect { case s: ShuffleExchangeLike => s }
      assert(shuffles.size <= 2,
        s"$name: expected agg/window exchange + sort, got ${shuffles.size}")
    }
  }

  test("dedup_ngram_jaccard/containment: every join equi, never a cartesian") {
    // prefix-filtered candidate generation + pair-bounded verify are all
    // key-equi-joins (shingle; d1; (d2, shingle)); a cartesian or
    // nested-loop node would mean the AllPairs shape regressed to
    // all-pairs
    for (name <- Seq("dedup_ngram_jaccard", "dedup_containment")) {
      val nodes = executedNodes(q(name))
      val bad = nodes.filter(n =>
        n.getClass.getSimpleName.contains("CartesianProduct") ||
          n.getClass.getSimpleName.contains("BroadcastNestedLoopJoin"))
      assert(bad.isEmpty, s"$name must stay equi-join-only, got $bad")
    }
  }

  test("dedup_incremental: store×batch stays a shingle equi-join, no cartesian") {
    val nodes = executedNodes(q("dedup_incremental"))
    val bad = nodes.filter(n =>
      n.getClass.getSimpleName.contains("CartesianProduct") ||
        n.getClass.getSimpleName.contains("BroadcastNestedLoopJoin"))
    assert(bad.isEmpty,
      s"incremental dedup must meet docs only through shared shingles, got $bad")
  }

  test("corpus_card: one corpus pass — distinct-agg exchanges + sort only") {
    // count(DISTINCT nd) plans as the standard two-phase distinct agg:
    // partial keyed (source, nd) → final keyed source, then the output
    // sort — 3 exchanges, all source-keyed, ONE pass over the corpus.
    // More would mean the datasheet re-scanned or re-keyed the data.
    val nodes = executedNodes(q("corpus_card"))
    val shuffles = nodes.collect { case s: ShuffleExchangeLike => s }
    assert(shuffles.size <= 3,
      s"expected distinct-agg pair + sort, got ${shuffles.size}")
  }

  test("events_salted_agg: exactly the two-stage exchange shape") {
    // stage 1 keyed by (type, salt), stage 2 by type, plus the output
    // sort — more exchanges would mean the salting re-shuffled rows it
    // already spread
    val nodes = executedNodes(q("events_salted_agg"))
    val shuffles = nodes.collect { case s: ShuffleExchangeLike => s }
    assert(shuffles.size <= 3,
      s"expected salted partial + recombine + sort, got ${shuffles.size}")
  }

  test("corpus_importance: scans prune to doc_id + source + text") {
    val explained = q("corpus_importance").queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val schemas = explained.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(schemas.nonEmpty)
    assert(schemas.forall(s => !s.contains("lang") && !s.contains("n_chars")),
      s"importance scoring reads only doc_id/source/text, got: ${schemas.mkString("; ")}")
  }

  test("corpus_topics: one token pass — stats + tf scans only, 1-row K broadcast") {
    val nodes = executedNodes(q("corpus_topics"))
    // the token explode must feed ONE (label, token) aggregation chain;
    // a df/K consumer re-running the explode shows up as a third
    // documents-text scan
    val docScans = nodes.filter(n =>
      n.getClass.getSimpleName.contains("FileSourceScan") &&
        n.toString.contains("documents.parquet"))
    assert(docScans.size <= 2,
      s"stats pass + token pass only, got ${docScans.size} documents scans")
    assert(nodes.forall(n => !n.getClass.getSimpleName.contains("CartesianProduct")))
    // the only nested-loop join allowed is the 1-row K broadcast
    val bnlj = nodes.filter(_.getClass.getSimpleName.contains("BroadcastNestedLoopJoin"))
    assert(bnlj.size <= 1, s"only the scalar K broadcast may nest-loop, got ${bnlj.size}")
  }

  test("vocab_bpe_pairs: pair explode runs over the word dictionary, not the corpus") {
    val nodes = executedNodes(q("vocab_bpe_pairs"))
    val docScans = nodes.filter(n =>
      n.getClass.getSimpleName.contains("FileSourceScan") &&
        n.toString.contains("documents.parquet"))
    assert(docScans.size == 1, s"one corpus scan, got ${docScans.size}")
    // fanout respread + word agg + pair agg; the top-20 cut must be
    // TakeOrdered heaps, never a global sort of the pair table
    val shuffles = nodes.collect { case s: ShuffleExchangeLike => s }
    assert(shuffles.size <= 3,
      s"fanout + word-freq + pair-agg exchanges only, got ${shuffles.size}")
    assert(nodes.exists(_.getClass.getSimpleName.contains("TakeOrderedAndProject")),
      "top-20 cut must be TakeOrderedAndProject")
    assert(!nodes.exists(_.getClass.getSimpleName == "SortExec"),
      "no global sort for a limit-20 result")
  }

  test("text_tfidf_topterms: one explode feeds tf AND df; native top-k prunes pre-shuffle") {
    val nodes = executedNodes(q("text_tfidf_topterms"))
    val docScans = nodes.filter(n =>
      n.getClass.getSimpleName.contains("FileSourceScan") &&
        n.toString.contains("documents.parquet"))
    // nDocs count + ONE token pipeline; a df branch re-running the
    // explode shows up as a third scan
    assert(docScans.size <= 2,
      s"count branch + one token pipeline, got ${docScans.size} documents scans")
    assert(nodes.exists(_.getClass.getSimpleName.contains("TopKPerKey")),
      "per-doc top-3 must prune through TopKPerKeyExec before the rank window")
  }

  test("corpus_drift: two histogram aggs + bucket join, no cartesian") {
    val nodes = executedNodes(q("corpus_drift"))
    assert(nodes.forall(n =>
      !n.getClass.getSimpleName.contains("CartesianProduct") &&
        !n.getClass.getSimpleName.contains("BroadcastNestedLoopJoin")))
    val shuffles = nodes.collect { case s: ShuffleExchangeLike => s }
    // fanout per side + (source,qb) agg per side + join alignment +
    // final source agg + sort
    assert(shuffles.size <= 8, s"bounded exchange count, got ${shuffles.size}")
  }

  test("sketch_hll_distinct: register math stays in codegen, no cartesian") {
    val nodes = executedNodes(q("sketch_hll_distinct"))
    assert(nodes.forall(n =>
      !n.getClass.getSimpleName.contains("CartesianProduct") &&
        !n.getClass.getSimpleName.contains("BroadcastNestedLoopJoin")))
    assert(nodes.exists(_.isInstanceOf[WholeStageCodegenExec]),
      "register/rho projection must run inside WholeStageCodegen")
  }

  test("ANN top-k tails prune through partial/final heaps, never a candidate-grain sort") {
    // the r15 rankTopK architecture: the queries×candidates grain is
    // heap-pruned (≤ queries·k rows per partition reach the exchange)
    // and only the bounded survivor set is rank-windowed — a SortExec
    // over the candidate grain is the regression this pins against
    for (name <- Seq("ann_topk_brute", "ann_topk_sq8", "ann_topk_pq")) {
      val nodes = executedNodes(q(name))
      val topk = nodes.collect { case t: graft.plans.TopKPerKeyExec => t }
      assert(topk.exists(_.partial) && topk.exists(!_.partial),
        s"$name: expected partial+final TopKPerKeyExec, got ${topk.size}")
    }
  }

  test("corpus_domain_cap: the cap runs through the native partial/final top-k heaps") {
    val nodes = executedNodes(q("corpus_domain_cap"))
    // partial heap before the exchange + final heap after: at most N
    // rows per domain per partition reach the shuffle, nothing sorts
    val topk = nodes.collect { case t: graft.plans.TopKPerKeyExec => t }
    assert(topk.exists(_.partial) && topk.exists(!_.partial),
      s"expected partial+final TopKPerKeyExec, got ${topk.size} heap nodes")
    assert(!nodes.exists(_.getClass.getSimpleName.startsWith("Window")),
      "the cap itself must not fall back to a windowed rank")
  }

  test("corpus_split: cluster join broadcasts; split assignment adds no extra shuffle") {
    val nodes = executedNodes(q("corpus_split"))
    assert(nodes.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      "the near-dup-sized cluster artifact must broadcast against docs")
    assert(nodes.forall(n =>
      !n.getClass.getSimpleName.contains("CartesianProduct")))
    // every shuffle belongs to the REPORT aggregations, not the split:
    // two distinct-aggregates (source×split groups + the leak census,
    // 2 exchanges each for the distinct expand), the leak global agg,
    // and the output sort. The canonical-keyed assignment itself is a
    // pure projection over the broadcast join — a key-partitioned
    // assignment would add a docs-volume exchange and push this past 7.
    val shuffles = nodes.collect { case s: ShuffleExchangeLike => s }
    assert(shuffles.size <= 7,
      s"split must stay projection-shaped, got ${shuffles.size} shuffles")
  }

  test("fuzzy_match_names: block key makes the candidate join an equi-join") {
    val nodes = executedNodes(q("fuzzy_match_names"))
    assert(nodes.forall(n => {
      val c = n.getClass.getSimpleName
      !c.contains("CartesianProduct") && !c.contains("BroadcastNestedLoop")
    }), "blocked fuzzy join must never degrade to an all-pairs join")
  }

  test("corpus_winnow: one doc-keyed exchange feeds the window, no self-join") {
    val nodes = executedNodes(q("corpus_winnow"))
    assert(nodes.forall(n =>
      !n.getClass.getSimpleName.contains("CartesianProduct")))
    // gram explode → ONE doc_id exchange (count + frame-min windows share
    // it) → distinct (partial+final) → per-doc agg → left join back to
    // the doc spine → output sort. Anything above 6 means the two window
    // specs stopped sharing their exchange or distinct lost its partial.
    val shuffles = nodes.collect { case s: ShuffleExchangeLike => s }
    assert(shuffles.size <= 6,
      s"winnowing is linear window work, got ${shuffles.size} shuffles")
  }

  test("corpus_winnow_overlap: fp-keyed equi-joins only, df census reuses the exchange") {
    val nodes = executedNodes(q("corpus_winnow_overlap"))
    assert(nodes.forall(n =>
      !n.getClass.getSimpleName.contains("CartesianProduct")))
    assert(nodes.exists(_.getClass.getSimpleName.contains("ReusedExchange")),
      "the explicit fp repartition must be shared by the df census and the join")
  }

  test("mm_frame_sample: pure projection + explode — only the output sort shuffles") {
    val nodes = executedNodes(q("mm_frame_sample"))
    val shuffles = nodes.collect { case s: ShuffleExchangeLike => s }
    assert(shuffles.size <= 1,
      s"frame sampling must be embarrassingly parallel, got ${shuffles.size} shuffles")
  }

  test("events_top_paths: one user exchange + path agg, top-k via TakeOrdered") {
    val nodes = executedNodes(q("events_top_paths"))
    // sessionize + both leads share the user-keyed exchange; the path
    // census adds its agg exchange; the final cut must be a TakeOrdered
    // (per-partition heaps), never a global sort
    val shuffles = nodes.collect { case s: ShuffleExchangeLike => s }
    assert(shuffles.size <= 2,
      s"path mining is two exchanges of work, got ${shuffles.size}")
    assert(nodes.exists(_.getClass.getSimpleName.contains("TakeOrdered")),
      "top-k cut must go through TakeOrderedAndProject")
  }

  test("er_resolve_clusters: edge generation stays a block-keyed equi-join") {
    val nodes = executedNodes(q("er_resolve_clusters"))
    assert(nodes.forall(n => {
      val c = n.getClass.getSimpleName
      !c.contains("CartesianProduct") && !c.contains("BroadcastNestedLoop")
    }), "fuzzy edge generation must never degrade to an all-pairs join")
  }

  test("corpus_quality_floor: one Window operator, text pruned before the sort") {
    val nodes = executedNodes(q("corpus_quality_floor"))
    // both window functions share (partition, order, frame) → one
    // WindowExec = one source-keyed sort. Two specs split this into two
    // full sorts and cost 5x at the 500k-doc probe.
    val windows = nodes.filter(_.getClass.getSimpleName == "WindowExec")
    assert(windows.size == 1, s"expected one shared WindowExec, got ${windows.size}")
    // the wide text column must not ride through the window sort
    assert(windows.forall(w => !w.output.exists(_.name == "text")),
      "text column must be pruned before the window exchange")
  }

  test("corpus_ppx_buckets: one shared source window; LM term join never cartesian") {
    val nodes = executedNodes(q("corpus_ppx_buckets"))
    val windows = nodes.filter(_.getClass.getSimpleName == "WindowExec")
    assert(windows.size == 1, s"expected one shared WindowExec, got ${windows.size}")
    // the only cartesian-shaped node allowed is the broadcast of the
    // 1-row vocab-size aggregate onto the dictionary
    val cart = nodes.filter(n =>
      n.getClass.getSimpleName.contains("CartesianProduct"))
    assert(cart.isEmpty, "LM scoring must never cartesian")
  }

  test("events_salted_join: join runs on (key, salt), dim side replicated") {
    val nodes = executedNodes(q("events_salted_join"))
    assert(nodes.forall(n =>
      !n.getClass.getSimpleName.contains("CartesianProduct")))
    // the salt expansion must appear under the join (explode of the
    // 0..buckets-1 sequence on the small side)
    assert(nodes.exists(_.getClass.getSimpleName.contains("Generate")),
      "expected the salt-replication explode on the dim side")
  }

  test("knn_graph: bucket equi-joins + native heaps, never an all-pairs scan") {
    val nodes = executedNodes(q("knn_graph"))
    assert(nodes.forall(n => {
      val c = n.getClass.getSimpleName
      !c.contains("CartesianProduct") && !c.contains("BroadcastNestedLoop")
    }), "candidate generation must stay a (table, bucket) equi-join")
    // per-node top-k must run through the partial/final heaps (at most
    // k rows per node per partition reach the exchange) — the trailing
    // rank window then sorts only the ≤k survivors
    val topk = nodes.collect { case t: graft.plans.TopKPerKeyExec => t }
    assert(topk.exists(_.partial) && topk.exists(!_.partial),
      s"expected partial+final TopKPerKeyExec, got ${topk.size} heap nodes")
  }

  test("mm_ahash_neardup / mm_phash_neardup: pair scans stay segment equi-joins") {
    for (name <- Seq("mm_ahash_neardup", "mm_phash_neardup")) {
      val nodes = executedNodes(q(name))
      assert(nodes.forall(n => {
        val c = n.getClass.getSimpleName
        !c.contains("CartesianProduct") && !c.contains("BroadcastNestedLoop")
      }), s"$name: the Hamming pair scan must stay a segment equi-join")
    }
  }

  test("text_classifier_score: one doc-keyed aggregation, no join on the score path") {
    val nodes = executedNodes(q("text_classifier_score"))
    assert(nodes.forall(n =>
      !n.getClass.getSimpleName.contains("CartesianProduct")))
    // the weight attach is a codegen projection (md5 per occurrence),
    // NOT a vocabulary join: exactly the per-doc agg exchanges + the
    // left-join re-attach + the output sort
    val shuffles = nodes.collect { case s: ShuffleExchangeLike => s }
    assert(shuffles.size <= 4,
      s"classifier scoring must stay explode→agg-shaped, got ${shuffles.size} shuffles")
  }

  test("scd2_customers: both window passes ride ONE key exchange") {
    val nodes = executedNodes(q("scd2_customers"))
    val windows = nodes.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.size === 2,
      s"expected the change-filter + interval-chain window pair, got ${windows.size}")
    // the no-op filter preserves the key partitioning AND the sort, so
    // the second window adds no exchange: one key shuffle + output sort
    val shuffles = nodes.collect { case s: ShuffleExchangeLike => s }
    assert(shuffles.size <= 2,
      s"SCD2 must shuffle once by key (+ output sort), got ${shuffles.size}")
  }

  test("events_incr_refresh: partial aggregation everywhere, state-sized merge") {
    val nodes = executedNodes(q("events_incr_refresh"))
    // two partials legs + the merge + the output sort; raw events never
    // shuffle unaggregated (each leg's exchange carries ≤|groups| rows
    // per input partition thanks to map-side combine)
    val shuffles = nodes.collect { case s: ShuffleExchangeLike => s }
    assert(shuffles.size <= 4,
      s"refresh must shuffle only partial-agg rows, got ${shuffles.size}")
    assert(nodes.exists(n => n.getClass.getSimpleName.contains("HashAggregate")),
      "expected hash aggregation on the partials legs")
  }

  test("contamination_semantic: rollup fused into the scan — no join, no agg exchange") {
    val nodes = executedNodes(q("contamination_semantic"))
    // the eval matrix rides as a codegen reference object; the per-vector
    // hit count + max land in the scan projection itself — a join or an
    // aggregation here means the 10⁸-join-row regression came back
    assert(nodes.forall(n => {
      val c = n.getClass.getSimpleName
      !c.contains("Join") && !c.contains("HashAggregate") &&
        !c.contains("SortAggregate")
    }), "contamination must stay a fused scan projection")
    // the fanout round-robin (no-op at real file counts) + output sort
    val shuffles = nodes.collect { case s: ShuffleExchangeLike => s }
    assert(shuffles.size <= 2,
      s"only fanout + the output sort may shuffle, got ${shuffles.size}")
  }

  test("search_similar_doc: shingle equi-join + native heaps, no cartesian") {
    val nodes = executedNodes(q("search_similar_doc"))
    assert(nodes.forall(n => {
      val c = n.getClass.getSimpleName
      !c.contains("CartesianProduct") && !c.contains("BroadcastNestedLoop")
    }), "candidates must meet only through the shingle equi-join")
    val topk = nodes.collect { case t: graft.plans.TopKPerKeyExec => t }
    assert(topk.exists(_.partial) && topk.exists(!_.partial),
      s"expected partial+final TopKPerKeyExec, got ${topk.size} heap nodes")
  }

  test("events_value_ntiles / gap_islands: one key exchange each, no joins") {
    for (name <- Seq("events_value_ntiles", "events_gap_islands")) {
      val nodes = executedNodes(q(name))
      assert(!nodes.exists(_.getClass.getSimpleName.contains("Join")),
        s"$name must not join")
      // key window exchange (+ distinct/rollup agg reusing it) + output
      // sort — never a corpus-wide repartition beyond those
      val shuffles = nodes.collect { case s: ShuffleExchangeLike => s }
      assert(shuffles.size <= 3,
        s"$name: expected window/agg/sort exchanges only, got ${shuffles.size}")
    }
  }

  test("corpus_orc_roundtrip: predicate and pruning reach the ORC scan") {
    val df = q("corpus_orc_roundtrip")
    val explained = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(explained.contains("Scan orc"), "expected an ORC scan")
    assert(explained.contains("PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]"),
      "lang predicate must push into the ORC reader")
    assert(!explained.contains("text"),
      "column pruning must drop the text column from the ORC read")
  }

  test("events_type_lift: pair join session-keyed; count tables broadcast back") {
    val nodes = executedNodes(q("events_type_lift"))
    // the t1<t2 pair scan must ride the (user, session) equi-join —
    // a CartesianProduct here is the vocab²·sessions² disaster; the
    // only nested-loop allowed is the broadcast 1-row session total
    assert(!nodes.exists(_.getClass.getSimpleName.contains("CartesianProduct")),
      "pair generation must stay a session-keyed equi-join")
    val bnl = nodes.filter(_.getClass.getSimpleName.contains("BroadcastNestedLoop"))
    assert(bnl.size <= 1, "only the 1-row total may nested-loop")
  }

  test("q4_late_orders: EXISTS runs as a semi join with the date filter pushed") {
    val df = q("q4_late_orders")
    val explained = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // the quarter predicate must reach the orders scan, not evaluate post-join
    assert(explained.contains("GreaterThanOrEqual(o_orderdate"),
      "order-date window must push into the orders scan")
    val nodes = executedNodes(df)
    val semi = nodes.filter(n => n.toString.contains("LeftSemi"))
    assert(semi.nonEmpty, "EXISTS must plan as a LeftSemi join (one row per order)")
    assert(!nodes.exists(_.getClass.getSimpleName.contains("CartesianProduct")),
      "the late-line residual must ride the orderkey equi-join")
  }

  test("q14_promo_share: part dimension broadcasts — lineitem never shuffles for the join") {
    val nodes = executedNodes(q("q14_promo_share"))
    val bhj = nodes.collect { case j: BroadcastHashJoinExec => j }
    assert(bhj.nonEmpty, "part must broadcast against lineitem")
    val smj = nodes.collect { case j: SortMergeJoinExec => j }
    assert(smj.isEmpty, "no sort-merge join — the only join is fact x broadcast dim")
  }

  test("events_attribution_linear: user-keyed pair join, one conv-keyed window, no cartesian") {
    val nodes = executedNodes(q("events_attribution_linear"))
    assert(!nodes.exists(_.getClass.getSimpleName.contains("CartesianProduct")),
      "touch-conversion pairing must stay a user-keyed equi-join")
    assert(!nodes.exists(_.getClass.getSimpleName.contains("BroadcastNestedLoop")),
      "the lookback residual must ride the equi-join, not a nested loop")
    // pair join + conv window + final agg + sort — nothing beyond those
    val shuffles = nodes.collect { case s: ShuffleExchangeLike => s }
    assert(shuffles.size <= 4,
      s"expected join/window/agg/sort exchanges only, got ${shuffles.size}")
  }

  test("corpus_dup_by_source: artifact broadcasts onto docs; text column pruned") {
    val df = q("corpus_dup_by_source")
    val nodes = executedNodes(df)
    val bhj = nodes.collect { case j: BroadcastHashJoinExec => j }
    assert(bhj.nonEmpty, "the near-dup-sized artifact must broadcast against docs")
    val smj = nodes.collect { case j: SortMergeJoinExec => j }
    assert(smj.isEmpty, "docs must never shuffle for the artifact join")
  }

  test("text_readability / mm_audio_chunks: single source-keyed agg, no joins") {
    for (name <- Seq("text_readability", "mm_audio_chunks")) {
      val nodes = executedNodes(q(name))
      assert(!nodes.exists(_.toString.contains("Join")),
        s"$name is projection + agg — no join belongs in the plan")
      val shuffles = nodes.collect { case s: ShuffleExchangeLike => s }
      assert(shuffles.size <= 3,
        s"$name: expected agg (+distinct) + sort exchanges only, got ${shuffles.size}")
    }
  }

  test("q10_returned_items: dims broadcast, top-20 runs as TakeOrdered") {
    val df = q("q10_returned_items")
    val nodes = executedNodes(df)
    val bhj = nodes.collect { case j: BroadcastHashJoinExec => j }
    assert(bhj.size >= 2, "customer and nation must broadcast")
    assert(nodes.exists(_.getClass.getSimpleName.contains("TakeOrderedAndProject")),
      "the top-20 must be per-partition heaps + driver merge, not a global sort")
  }

  test("q19_disjunctive: broadcast part join, no cartesian under the OR predicate") {
    val nodes = executedNodes(q("q19_disjunctive"))
    val bhj = nodes.collect { case j: BroadcastHashJoinExec => j }
    assert(bhj.nonEmpty, "part must broadcast against lineitem")
    assert(!nodes.exists(_.getClass.getSimpleName.contains("CartesianProduct")),
      "the disjunction must evaluate as a join residual, never a cross product")
  }

  test("events_forecast_baseline: domain expansion broadcasts, cells join stays keyed") {
    val nodes = executedNodes(q("events_forecast_baseline"))
    assert(!nodes.exists(_.getClass.getSimpleName.contains("CartesianProduct")),
      "the type x day x hour domain must come from broadcasts")
  }

  test("q6_band_revenue: every predicate reaches the parquet scan; one codegen span") {
    val df = q("q6_band_revenue")
    val explained = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    for (p <- Seq("GreaterThanOrEqual(l_shipdate", "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount", "LessThanOrEqual(l_discount",
        "LessThan(l_quantity"))
      assert(explained.contains(p), s"predicate $p must push into the scan")
    val nodes = executedNodes(df)
    assert(!nodes.exists(_.toString.contains("Join")),
      "Q6 is scan-filter-agg — no join belongs in the plan")
  }

  test("events_forget: deletion list broadcasts for both the semi and anti pass") {
    val nodes = executedNodes(q("events_forget"))
    val bcast = nodes.filter(n =>
      n.getClass.getSimpleName.contains("BroadcastHashJoin") &&
        (n.toString.contains("LeftSemi") || n.toString.contains("LeftAnti")))
    assert(bcast.size >= 2,
      s"semi (purged) and anti (kept) passes must both broadcast the list, got ${bcast.size}")
  }

  test("corpus_filter_ablation: CUBE rides one aggregation pipeline (expand, no 8-way scan)") {
    val nodes = executedNodes(q("corpus_filter_ablation"))
    assert(nodes.exists(_.getClass.getSimpleName.contains("Expand")),
      "CUBE must plan as Expand + single agg, not separate scans per grouping set")
  }

  test("q21_sole_late_supplier: decorrelated rollups — no nested-loop quantifiers") {
    val nodes = executedNodes(q("q21_sole_late_supplier"))
    assert(!nodes.exists(_.getClass.getSimpleName.contains("CartesianProduct")),
      "both quantifiers must come from rollup joins, not correlated loops")
    assert(!nodes.exists(_.getClass.getSimpleName.contains("BroadcastNestedLoop")),
      "no nested-loop join anywhere in the decorrelated plan")
    assert(nodes.exists(_.getClass.getSimpleName.contains("TakeOrderedAndProject")),
      "top-20 must be per-partition heaps + driver merge")
  }

  test("corpus_source_overlap / dedup_method_agreement: equi-join pair scans only") {
    for (name <- Seq("corpus_source_overlap", "dedup_method_agreement")) {
      val nodes = executedNodes(q(name))
      assert(!nodes.exists(_.getClass.getSimpleName.contains("CartesianProduct")),
        s"$name: pair generation must ride shingle/key equi-joins")
    }
  }

  test("ann_maxsim_topk: joinless projection + TakeOrdered, never a global sort") {
    val nodes = executedNodes(q("ann_maxsim_topk"))
    assert(!nodes.exists(_.toString.contains("Join")),
      "maxsim scoring must be a pure projection (query segments are literals)")
    assert(nodes.exists(_.getClass.getSimpleName.contains("TakeOrderedAndProject")),
      "top-10 must run as per-partition heaps, not a global sort")
  }

  test("events_gap_fill / events_audience_overlap: no cartesian beyond broadcast domains") {
    for (name <- Seq("events_gap_fill", "events_audience_overlap")) {
      val nodes = executedNodes(q(name))
      assert(!nodes.exists(_.getClass.getSimpleName.contains("CartesianProduct")),
        s"$name: grid/pair expansion must broadcast or ride equi-joins")
    }
  }

  test("emb_kmeans: assignment is a joinless codegen projection over the corpus") {
    val nodes = executedNodes(q("emb_kmeans"))
    // centroids ride into the plan as literals — the corpus never joins
    assert(!nodes.exists(_.toString.contains("Join")),
      "kmeans assignment must be a pure projection, never a centroid join")
    val codegen = nodes.collect { case w: WholeStageCodegenExec => w }
    assert(codegen.nonEmpty, "distance+argmin must run inside WholeStageCodegen")
  }

  test("privacy_t_closeness: value and total frames broadcast onto the group domain") {
    val nodes = executedNodes(q("privacy_t_closeness"))
    // the (group x value) domain expansion must come from broadcasts of the
    // two bounded-cardinality frames, never a shuffled cross
    assert(!nodes.exists(_.getClass.getSimpleName.contains("CartesianProduct")),
      "domain expansion must broadcast, not cartesian-shuffle")
  }

  test("text_chi2_terms: count frames broadcast onto the dictionary — no cartesian") {
    // the presence explode is the only occurrence-scale stage; the source
    // row counts and the corpus total must ride in as broadcasts, and the
    // dictionary-grain scoring must never cross-shuffle
    val nodes = executedNodes(q("text_chi2_terms"))
    assert(!nodes.exists(_.getClass.getSimpleName.contains("CartesianProduct")),
      "chi2 contingency assembly must broadcast the bounded count frames")
  }

  test("events_autocorr / emb_matryoshka_eval: pair scans equi-join or broadcast, never cartesian") {
    // autocorr's lag pairs ride a type-keyed join over the AGGREGATE-grain
    // day grid; each matryoshka brute leg broadcasts its strided query side
    for (name <- Seq("events_autocorr", "emb_matryoshka_eval")) {
      val nodes = executedNodes(q(name))
      assert(!nodes.exists(_.getClass.getSimpleName.contains("CartesianProduct")),
        s"$name: pair expansion must broadcast or ride equi-joins")
    }
  }

  test("quality_calibration: score deciles are source-partitioned — no single-partition funnel") {
    // ntile over a global window would funnel the corpus through one task;
    // the per-source windows must leave no SinglePartition node beyond the
    // keys=[] scalar-aggregate shape
    val nodes = executedNodes(q("quality_calibration"))
    val single = nodes.filter(n =>
      n.toString.linesIterator.next().contains("SinglePartition"))
    val funnels = single.filterNot { n =>
      n.nodeName.contains("Exchange") &&
        n.children.exists(c => c.toString.linesIterator.next().contains("keys=[]"))
    }
    assert(funnels.isEmpty,
      s"found single-partition data funnels: ${funnels.map(_.nodeName)}")
    val windows = nodes.filter(_.nodeName.contains("Window"))
    assert(windows.forall(!_.toString.linesIterator.next().contains("windowspecdefinition()")),
      "no window may run with an empty partition spec")
  }

  test("q2/q15/q8: dimension chains broadcast — at most the one big-big shuffle join") {
    // q2: part slice + supplier⋈nation⋈region all broadcast, lineitem
    // shuffles only for its rollup; q15: the scalar max rides back as a
    // 1-row broadcast; q8: the only shuffle join is lineitem⋈orders
    for (name <- Seq("q2_cheapest_supplier", "q15_top_supplier", "q8_market_share")) {
      val nodes = executedNodes(q(name))
      val smj = nodes.collect { case j: SortMergeJoinExec => j }
      assert(smj.size <= 1, s"$name has ${smj.size} sort-merge joins, expected <=1")
      assert(!nodes.exists(_.getClass.getSimpleName.contains("CartesianProduct")),
        s"$name: scalar frames must broadcast, never cartesian-shuffle")
    }
  }

  test("emb_triangles: closure check rides id-ordered equi-joins, never all-pairs") {
    val nodes = executedNodes(q("emb_triangles"))
    assert(!nodes.exists(_.getClass.getSimpleName.contains("CartesianProduct")),
      "triangle two-hop + closure must be equi-joins on node ids")
  }

  test("emb_communities / emb_modularity: every graph pass is an id equi-join — no cartesian") {
    for (name <- Seq("emb_communities", "emb_modularity")) {
      val nodes = executedNodes(q(name))
      assert(!nodes.exists(_.getClass.getSimpleName.contains("CartesianProduct")),
        s"$name: labels/degrees must join edges on node ids")
    }
  }

  test("q13_custdist: zero-order customers survive the outer join; both rollups partial-agg") {
    val nodes = executedNodes(q("q13_custdist"))
    val hashAggs = nodes.filter(_.nodeName.contains("HashAggregate"))
    assert(hashAggs.size >= 2, "both aggregation levels must combine map-side")
    // the synthetic fixture gives every customer an order, so assert
    // the JOIN TYPE, not the zero bucket: an inner-join regression
    // would silently drop order-less customers in production
    assert(nodes.exists(n => n.toString.linesIterator.next().contains("LeftOuter")),
      "the customer-orders join must stay LEFT OUTER")
  }

  test("text_burstiness / events_burstiness: one rollup, top-k heaps, no cartesian") {
    for (name <- Seq("text_burstiness", "events_burstiness")) {
      val nodes = executedNodes(q(name))
      assert(!nodes.exists(_.getClass.getSimpleName.contains("CartesianProduct")), name)
    }
    val nodes = executedNodes(q("text_burstiness"))
    assert(nodes.exists(_.getClass.getSimpleName.contains("TakeOrderedAndProject")),
      "burstiness top-k must be per-partition heaps")
  }

  test("emb_kcore: every peel round is a degree rollup + id equi-joins — no cartesian") {
    val nodes = executedNodes(q("emb_kcore"))
    assert(!nodes.exists(_.getClass.getSimpleName.contains("CartesianProduct")),
      "k-core peeling must join survivors on node ids")
  }

  test("events_whales: top-k runs as per-partition heaps, never a global user sort") {
    val nodes = executedNodes(q("events_whales"))
    assert(nodes.exists(_.getClass.getSimpleName.contains("TakeOrderedAndProject")),
      "the whale pick must be a TakeOrdered over per-user totals")
    assert(!nodes.exists(_.getClass.getSimpleName.contains("CartesianProduct")),
      "the 1-row grand total must broadcast")
  }

  test("events_cohort_ltv: cumulative ride is cohort-grid grain — no cartesian") {
    val nodes = executedNodes(q("events_cohort_ltv"))
    assert(!nodes.exists(_.getClass.getSimpleName.contains("CartesianProduct")),
      "cohort sizes must broadcast onto the aggregate grid")
  }

  test("events_ab_outcomes: aggregate grain — 1-row arm frames broadcast, no shuffled cross") {
    val nodes = executedNodes(q("events_ab_outcomes"))
    assert(!nodes.exists(_.getClass.getSimpleName.contains("CartesianProduct")),
      "the A/B pivot must broadcast its 1-row frames")
  }

  test("text_textrank_terms: no cartesian; top-k never global-sorts") {
    // at fixture scale the PR iteration runs behind PageRank's driver
    // gate, so the returned plan is the rank table -> TakeOrdered; the
    // edge rollup's plan properties are pinned by PageRankSpec's
    // distributed-path equivalence instead
    val nodes = executedNodes(q("text_textrank_terms"))
    assert(!nodes.exists(_.getClass.getSimpleName.contains("CartesianProduct")),
      "co-occurrence edges and PR contributions must ride equi-joins")
    assert(nodes.exists(_.getClass.getSimpleName.contains("TakeOrderedAndProject")),
      "top-k terms must run as per-partition heaps")
  }

  test("text_zipf_bands: map-side partial aggregation before the token shuffle") {
    // the one occurrence-scale stage is the token rollup; it must combine
    // map-side so the exchange carries (term, partial-count), not tokens
    val nodes = executedNodes(q("text_zipf_bands"))
    val hashAggs = nodes.filter(_.nodeName.contains("HashAggregate"))
    assert(hashAggs.size >= 2, "expect partial + final aggregate pair on the token rollup")
  }

  test("corpus_epochs: per-source rollup + broadcast total — bounded shuffles, no cartesian") {
    val nodes = executedNodes(q("corpus_epochs"))
    assert(!nodes.exists(_.getClass.getSimpleName.contains("CartesianProduct")),
      "the 1-row total must broadcast onto the per-source plan")
    val shuffles = nodes.collect { case s: ShuffleExchangeLike => s }
    assert(shuffles.size <= 4,
      s"epoch plan is aggregate-grain: source agg + scalar total + order, got ${shuffles.size}")
  }
}
