package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape assertions — the properties that decide whether a
  * query survives a 100 TB scale-up, pinned so a refactor can't silently
  * regress them:
  *   - filters/projections reach the parquet scan (PushedFilters /
  *     narrow ReadSchema),
  *   - small dimension tables broadcast (no shuffle of the fact side),
  *   - no CartesianProduct / BroadcastNestedLoopJoin outside the queries
  *     that are intentionally all-pairs,
  *   - the banded dedup join is a ShuffledHashJoin on its blocking keys.
  */
class PlanSpec extends AnyFunSuite {
  import SparkFixture.{spark, sfDir}

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    // collect() runs df's OWN QueryExecution (count() would wrap a new
    // one), so AQE finalizes the join strategies we assert on
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("q_scan_project pushes filter and prunes columns at the scan") {
    val p = plan("q_scan_project")
    assert(p.contains("PushedFilters: ["), p)
    assert(!p.contains("PushedFilters: []"), "no filters pushed:\n" + p)
    // projection reaches the reader: only the selected+filter columns
    val read = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!read.contains("l_comment") && !read.contains("l_partkey"),
      "scan reads columns the query never uses: " + read)
  }

  test("q6_forecast pushes every predicate to the parquet scan") {
    val p = plan("q6_forecast")
    assert(p.contains("PushedFilters: ["), p)
    assert(!p.contains("PushedFilters: []"), "no filters pushed:\n" + p)
    // pure scan+agg: no join, no pre-agg shuffle beyond the 1-row fold
    assert(!p.contains("Join"), "q6 grew a join:\n" + p)
  }

  test("q19_brackets keeps the disjunction a residual over one equi-join") {
    // the OR-of-ANDs must NOT break the p_partkey equi-join into a
    // nested-loop — Catalyst factors the common conjunct out
    val p = plan("q19_brackets")
    assert(p.contains("BroadcastHashJoin") || p.contains("ShuffledHashJoin")
      || p.contains("SortMergeJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q5_join broadcasts the dimension tables") {
    val p = plan("q5_join")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_broadcast_join has no shuffle on the dimension side") {
    val p = plan("q_broadcast_join")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("only intentionally-all-pairs queries use nested-loop/cartesian") {
    val allPairs = Set("q_cross_join", "q_theta_join", "q_sim_pairs",
      "q_sim_topk", "q_knn_label", "q_range_join", "q_asof_join",
      "q_dedup_embed")
    // spot-check a representative non-all-pairs subset (full corpus scan
    // per plan costs minutes; these are the join-shaped queries)
    val mustBeKeyed = Seq("q3_join", "q_left_outer", "q_right_outer",
      "q_full_outer", "q_semi_join", "q_anti_join", "q_self_join",
      "q_dedup_ngram", "q_dedup_jaccard", "q_dedup_minhash",
      // q_dsir / q_hard_negatives are excluded: their only cross joins
      // are the accepted broadcast-scalar/centroid pattern (1-row totals,
      // nlist-row centroid table)
      "q_dedup_contain", "q_contain_keep", "q_novelty", "q_dedup_incr",
      // r10: the audience pair expansion must ride the user key and the
      // matryoshka pair sample must stay an id+1 equi-join
      "q_audience_overlap", "q_matryoshka")
    assert(mustBeKeyed.forall(q => !allPairs.contains(q)),
      "a query is listed as both keyed and all-pairs")
    for (q <- mustBeKeyed) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"),
        s"$q degenerated to a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"$q degenerated to a nested-loop join")
    }
  }

  test("q_dedup_ngram joins hashed on its banded blocking keys") {
    val p = plan("q_dedup_ngram")
    assert(p.contains("ShuffledHashJoin"), p)
  }

  test("q_token_budget computes its prefix sum pid-keyed, not in one task") {
    // the cumulative sum must ride Dist.globalPrefixSum's pid-keyed
    // window — a global ORDER BY window would show an empty partition
    // spec (single-partition execution at any scale)
    val p = plan("q_token_budget")
    val windowLines = p.linesIterator.filter(_.contains("Window ")).toSeq
    assert(windowLines.nonEmpty, "expected a running-sum window")
    assert(windowLines.forall(_.contains("pid")),
      s"un-keyed window in plan:\n${windowLines.mkString("\n")}")
  }

  test("q_bloom_join injects a runtime bloom filter under production thresholds") {
    // at test scale the application side sits below the 10 GB
    // applicationSideScanSizeThreshold, so injection is gated off; with
    // the threshold dropped (what a 100 TB fact side clears naturally)
    // the selective orders predicate must materialize as a bloom filter
    // applied to the lineitem side before its shuffle
    // ALSO disable auto-broadcast: InjectRuntimeFilter skips joins whose
    // creation side could broadcast by size (a broadcast join needs no
    // bloom) — at 100 TB neither fact side broadcasts, which is the
    // production condition being simulated here
    val key = "spark.sql.optimizer.runtime.bloomFilter." +
      "applicationSideScanSizeThreshold"
    val enabledKey = "spark.sql.optimizer.runtime.bloomFilter.enabled"
    val bcastKey = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    val oldEnabled = spark.conf.get(enabledKey)
    val oldBcast = spark.conf.get(bcastKey)
    try {
      spark.conf.set(key, "0")
      spark.conf.set(enabledKey, "true")
      spark.conf.set(bcastKey, "-1")
      val df = SparkEntry.queries("q_bloom_join")(spark, sfDir)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("might_contain") ||
        p.toLowerCase.contains("bloomfilter"),
        s"no bloom filter in plan:\n$p")
    } finally {
      spark.conf.set(key, old)
      spark.conf.set(enabledKey, oldEnabled)
      spark.conf.set(bcastKey, oldBcast)
    }
  }

  test("q_skyline keeps its dominance prefix-min pid-keyed") {
    // rides Dist.globalPrefixAgg — the running min must execute as a
    // pid-partitioned window, never a single-partition global window.
    // (q_drift_ks/q_drift_psi run the same machinery but assemble their
    // bounded finals eagerly, so their RETURNED plans are local frames —
    // the prefix shape there is covered by DriftAndSelectionSpec's
    // brute-force equality plus this q_skyline plan pin.)
    val p = plan("q_skyline")
    val windowLines = p.linesIterator.filter(_.contains("Window ")).toSeq
    assert(windowLines.nonEmpty, "expected a prefix-agg window")
    assert(windowLines.forall(_.contains("pid")),
      s"un-keyed window in plan:\n${windowLines.mkString("\n")}")
  }

  test("q_udtf_gen runs the custom generator through GenerateExec") {
    val p = plan("q_udtf_gen")
    // the hand-written Generator plans as a real Generate node (the
    // UDTF SPI), not an explode over a materialized array value
    assert(p.contains("Generate graft_sentences"), p)
    assert(!p.toLowerCase.contains("explode"), p)
  }

  test("q_parquet_roundtrip pushes its filter into the re-read scan") {
    val p = plan("q_parquet_roundtrip")
    assert(p.contains("PushedFilters: [IsNotNull(o_totalprice), " +
      "GreaterThan(o_totalprice"), p)
  }

  test("q_orc_roundtrip pushes its filter into the ORC scan") {
    val p = plan("q_orc_roundtrip")
    assert(p.contains("PushedFilters: [IsNotNull(c_acctbal), " +
      "GreaterThan(c_acctbal"), p)
  }

  test("q_dpp_join prunes fact partitions dynamically from the dim filter") {
    val p = plan("q_dpp_join")
    // the dim-side filter must reach the partitioned fact scan as a
    // runtime filter on the partition column, not a per-row data filter
    assert(p.contains("dynamicpruningexpression"), p)
  }

  test("q_sorted_layout pushes the date filter into the re-read scan") {
    val p = plan("q_sorted_layout")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), " +
      "GreaterThanOrEqual(l_shipdate"), p)
  }

  test("q_partitioned_write prunes partitions at planning time") {
    val p = plan("q_partitioned_write")
    // the partition-column filter must be metadata pruning
    // (PartitionFilters), not a data filter the scan evaluates per row
    assert(p.contains("PartitionFilters: [isnotnull(o_orderpriority"), p)
    assert(p.contains("1-URGENT"), p)
  }

  test("native dot product stays inside whole-stage codegen in q_sim_pairs") {
    val p = plan("q_sim_pairs")
    assert(p.contains("graft_dot"), p)
    // the pair loop (BNLJ condition/projection) must not show an
    // interpreted HOF
    assert(!p.contains("aggregate(zip_with"), p)
  }

  test("whole-stage codegen covers the aggregation pipeline of q1_agg") {
    val p = plan("q1_agg")
    // codegen'd operators render with a "*(stageId)" prefix
    assert(p.contains("*(") && p.contains("HashAggregate"), p)
  }

  test("q_bucketed_join joins and aggregates with no hash exchange") {
    val p = plan("q_bucketed_join")
    assert(p.contains("SortMergeJoin"), p)
    // both scan sides are bucketed on the join key and the groupBy leads
    // with it, so the only exchange left is the final orderBy's range
    // partitioning
    assert(!p.contains("Exchange hashpartitioning"),
      "bucketed join still shuffled:\n" + p)
  }

  test("q_decontaminate semi-joins against a broadcast eval set") {
    val p = plan("q_decontaminate")
    // the 100 TB side must stream through a broadcast semi-join — an
    // exchange-both-sides plan would shuffle the whole corpus on shingle
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p)
  }

  test("q_rebalance keeps both window phases keyed (no cartesian, no NLJ)") {
    val p = plan("q_rebalance")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    // two Window operators: the salted phase and the residual phase
    assert("Window \\[".r.findAllIn(p).size >= 2, p)
  }

  test("analyzed catalog tables drive CBO decisions with AQE off") {
    // registerAnalyzed = catalog tables + ANALYZE TABLE + cbo.enabled:
    // the optimizer must (a) know exact row counts and (b) pick a
    // broadcast join from statistics alone — no hints, no AQE runtime
    // re-planning. This is the q5 shape: fact join dim join dim.
    // registerAnalyzed flips CBO confs session-wide; capture first so the
    // shared fixture session is restored for later plan-shape tests
    val prevCbo = spark.conf.getOption("spark.sql.cbo.enabled")
    val prevReorder = spark.conf.getOption("spark.sql.cbo.joinReorder.enabled")
    graft.engine.Tables.registerAnalyzed(spark, sfDir)
    val stats = spark.table("g_orders")
      .queryExecution.optimizedPlan.stats
    assert(stats.rowCount.isDefined && stats.rowCount.get.toLong > 0,
      s"ANALYZE did not produce a row count: $stats")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = spark.sql(
        """SELECT n.n_name, count(*) AS cnt
          |FROM g_orders o
          |JOIN g_customer c ON o.o_custkey = c.c_custkey
          |JOIN g_nation n ON c.c_nationkey = n.n_nationkey
          |GROUP BY n.n_name""".stripMargin)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("BroadcastHashJoin"),
        "stats did not drive a broadcast join:\n" + p)
      assert(!p.contains("CartesianProduct"), p)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      def restore(k: String, v: Option[String]): Unit = v match {
        case Some(x) => spark.conf.set(k, x)
        case None    => spark.conf.unset(k)
      }
      restore("spark.sql.cbo.enabled", prevCbo)
      restore("spark.sql.cbo.joinReorder.enabled", prevReorder)
    }
  }

  test("q_skew_join joins on (key, salt) through the shuffle path") {
    val p = plan("q_skew_join")
    assert(p.contains("ShuffledHashJoin"),
      "salting demo must take the shuffle path:\n" + p)
    // both join key columns present: the salt is part of the exchange,
    // so a hot flag's rows spread over many reducers
    val joinLine = p.linesIterator
      .find(_.contains("ShuffledHashJoin")).get
    assert(joinLine.contains("flag") && joinLine.contains("salt"),
      "salt is not a join key: " + joinLine)
  }

  test("q_bloom_decontaminate prefilters with might_contain before the exact join") {
    val p = plan("q_bloom_decontaminate")
    assert(p.contains("might_contain"), "bloom prefilter missing:\n" + p)
    assert(p.contains("bloom_filter_agg"), "sketch aggregate missing:\n" + p)
    // the exact verify is the non-broadcast shuffle join over survivors
    assert(p.contains("ShuffledHashJoin") || p.contains("SortMergeJoin"),
      "exact verify join is not shuffle-shaped:\n" + p)
    // might_contain must sit BELOW the exact semi-join (prefilter, not
    // post-filter): the filter line appears before the join's stream side
    val idx = p.indexOf("might_contain")
    val joinIdx = math.max(p.indexOf("ShuffledHashJoin"),
      p.indexOf("SortMergeJoin"))
    assert(idx > joinIdx, "prefilter not below the verify join:\n" + p)
  }

  test("optimizer injects a runtime bloom filter into a selective shuffle join") {
    // The engine-level scale feature behind q_bloom_decontaminate's
    // hand-built sketch: when a shuffle join's build side carries a
    // selective filter, InjectRuntimeFilter plants a bloom-filter
    // semi-filter on the probe side so the fact scan drops non-joining
    // rows BEFORE the exchange. Size thresholds (10 MB creation / 10 GB
    // probe-scan defaults) are sized for clusters, so they are lowered
    // to fire at fixture scale; broadcast is disabled because a BHJ
    // already prunes at the join and gets no runtime filter.
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val prev = keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // creation threshold is a MAX (build side must be smaller);
      // probe-scan threshold is a MIN (scan must be larger)
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        "100MB")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter" +
        ".applicationSideScanSizeThreshold", "0")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val part = graft.engine.Tables.part(spark, sfDir)
        .filter(org.apache.spark.sql.functions.col("p_size") === 1)
      val li = graft.engine.Tables.lineitem(spark, sfDir)
      val df = li.join(part,
        org.apache.spark.sql.functions.col("l_partkey") ===
          org.apache.spark.sql.functions.col("p_partkey"))
        .groupBy("p_brand")
        .count()
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("bloom_filter_might_contain") ||
        p.contains("might_contain"),
        "no runtime bloom filter on the probe side:\n" + p)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("q_kmeans keeps the integer L2 kernel in codegen and broadcasts centroids") {
    val p = plan("q_kmeans")
    assert(p.contains("graft_sqdist_long"), p)
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"),
      "centroids are not broadcast:\n" + p)
    // the update aggregates on (cid, dim) — never a corpus-wide exchange
    // of raw vectors back to one partition
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_pagerank reuses the persisted adjacency across iterations") {
    val p = plan("q_pagerank")
    assert(p.contains("InMemoryTableScan"),
      "adjacency not served from the persisted relation:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_sessionize stacks both windows on one shuffle and one sort") {
    // the lag marker and the running session sum share the identical
    // (user_id / ts, event_id) window spec, so the plan must contain
    // exactly one hash exchange (the final orderBy adds a range one) and
    // exactly one sort below the windows — a second sort or hash
    // exchange means the stacking reuse regressed and a 100 TB events
    // table pays the shuffle twice
    // AQE's toString appends the pre-adaptive "Initial Plan" — count
    // nodes only in the final section or every exchange doubles
    val p = plan("q_sessionize").split("== Initial Plan ==")(0)
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx == 1, s"expected 1 hash exchange, got $hashEx:\n" + p)
    assert("Window \\[".r.findAllIn(p).size == 2, "expected 2 windows:\n" + p)
    val sorts = "\\bSort \\[".r.findAllIn(p).size
    assert(sorts <= 2, s"windows re-sorting (got $sorts sorts):\n" + p)
  }

  test("q_recursive_cte executes through UnionLoop (native recursion)") {
    // WITH RECURSIVE must lower to Spark 4's UnionLoopExec — an iterative
    // frontier join scheduled by the engine — not to an unrolled or
    // driver-materialized shape; the frontier join stays keyed
    val p = plan("q_recursive_cte")
    assert(p.contains("UnionLoop"), "recursion not via UnionLoopExec:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_knn_triangles keeps the triangle phase keyed") {
    // the kNN build is the documented brute-force baseline (broadcast
    // NLJ); the triangle joins themselves must be equi-joins on vertex
    // ids — a cartesian wedge join would be quadratic in edges at scale
    val p = plan("q_knn_triangles")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("HashJoin"), "triangle joins not hash-keyed:\n" + p)
  }

  test("q_bm25 fuses the top-20 into TakeOrderedAndProject") {
    // the scored corpus must never be globally sorted — only
    // per-partition top-20 heaps reach the driver
    val p = plan("q_bm25")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_cms_sketch broadcasts the 1024-cell sketch") {
    // the probe side joins against the sketch without shuffling itself;
    // a shuffled join here would move the key universe the sketch
    // exists to avoid shuffling
    val p = plan("q_cms_sketch")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_semdedup keeps the in-cluster pair join keyed on cid") {
    // centroid assignment is an intended broadcast NLJ (nlist-row
    // centroid table); the pair mining itself must be an equi-join on
    // the cell id or the operator degenerates to all-pairs
    val p = plan("q_semdedup")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      "pair join not keyed:\n" + p)
  }

  test("q_ab_test computes both arms in one scan and one shuffle") {
    // the conditional aggregate must not degenerate back into a per-arm
    // groupBy + self-join (two scans + three exchanges of the stream)
    val p = plan("q_ab_test").split("== Initial Plan ==")(0)
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx == 1, s"expected 1 hash exchange, got $hashEx:\n" + p)
    assert(!p.contains("Join"), "arms joined instead of conditionally aggregated:\n" + p)
  }

  test("q_doc_chunk stays shuffle-free up to the output sort") {
    // tokenize → sequence-explode → slice are all narrow; the only
    // exchange allowed is the final orderBy's range partitioning
    val p = plan("q_doc_chunk").split("== Initial Plan ==")(0)
    assert(!p.contains("Exchange hashpartitioning"),
      "chunking introduced a hash shuffle:\n" + p)
  }

  test("q_concurrency runs every window keyed (sweep line, no global sort task)") {
    // sessionize windows key on user_id; the prefix-sum and global-lead
    // windows key on the Dist range pid — an empty partition spec would
    // mean the sweep line collapsed to one task
    val p = plan("q_concurrency")
    val windowLines = p.linesIterator.filter(_.contains("Window ")).toSeq
    assert(windowLines.nonEmpty, "expected sweep-line windows")
    assert(windowLines.forall(l => l.contains("pid") || l.contains("user_id")),
      s"un-keyed window in plan:\n${windowLines.mkString("\n")}")
  }

  test("q_rrf_fusion fuses two TakeOrdered rankings, never a corpus sort") {
    // both rankings must reach the fusion as TakeOrderedAndProject
    // top-20 frames; a global Sort of the scored corpus would mean a
    // ranking escaped its limit
    val p = plan("q_rrf_fusion")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q_bootstrap_ci combines rep weights map-side before the shuffle") {
    // the B=100 explode must partially aggregate per task (shuffle rows
    // bounded at groups × reps), and the rank window keys on event_type
    val p = plan("q_bootstrap_ci")
    assert(p.contains("HashAggregate"), p)
    val partials = p.linesIterator
      .count(l => l.contains("HashAggregate") && l.contains("partial_"))
    assert(partials >= 1, "no map-side partial aggregation:\n" + p)
    val windowLines = p.linesIterator.filter(_.contains("Window ")).toSeq
    assert(windowLines.forall(_.contains("event_type")),
      s"un-keyed window:\n${windowLines.mkString("\n")}")
  }

  test("q_pca_power reduces to a LocalTableScan (bounded driver output)") {
    // the data-sized pass happens inside gramMoments; the returned plan
    // must be the 64-row local frame, never a distributed recompute
    val p = plan("q_pca_power")
    assert(p.contains("LocalTableScan"), p)
    assert(!p.contains("Exchange hashpartitioning"),
      "PCA output plan re-shuffles:\n" + p)
  }

  test("q_cdc_apply shares one user_id shuffle between window and agg") {
    val p = plan("q_cdc_apply").split("== Initial Plan ==")(0)
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx == 1, s"expected 1 hash exchange, got $hashEx:\n" + p)
  }

  test("the r10 graph/eval/linkage batch stays keyed (no all-pairs)") {
    // q_rank_ndcg is excluded: it shares q_sim_topk's intentional
    // broadcast-NLJ query×corpus shape. Everything else in the batch
    // must stay equi-join-keyed — the wedge joins in particular
    // (q_triangle_count, q_link_predict) would melt as cartesians.
    for (q <- Seq("q_triangle_count", "q_link_predict", "q_item_recs",
        "q_kcore", "q_auc_roc", "q_entity_match", "q_weighted_median",
        "q_asof_tolerance", "q_hazard_curve", "q_churn_label")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"),
        s"$q degenerated to a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"$q degenerated to a nested-loop join")
    }
  }

  test("q_epoch_shuffle epoch heads fuse into TakeOrderedAndProject") {
    // the seeded permutation must never materialize a full corpus sort:
    // each epoch's top-10 is the parallel top-K operator
    val p = plan("q_epoch_shuffle")
    assert(p.contains("TakeOrderedAndProject"), p)
  }
}
