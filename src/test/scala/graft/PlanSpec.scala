package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression tests: the properties that make these queries
  * scale are asserted, not assumed. If a refactor un-pushes a filter or
  * turns a broadcast join into a shuffle join, these fail.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def executedPlan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  private def formatted(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
  }

  test("q02: predicate and projection pushed into the parquet scan") {
    val plan = formatted("q02_filter_project")
    assert(plan.contains("PushedFilters"), plan)
    assert(plan.contains("GreaterThan(o_totalprice,150000.0)"), plan)
    // pruned read schema: only the 3 selected columns
    assert(plan.contains("ReadSchema: struct<o_orderkey:bigint,o_custkey:bigint,o_totalprice:double>"), plan)
  }

  test("q01: date filter pushed; no unnecessary columns read") {
    val plan = formatted("q01_pricing_summary")
    assert(plan.contains("LessThanOrEqual(l_shipdate"), plan)
    assert(!plan.contains("l_orderkey"), "q01 must not read l_orderkey\n" + plan)
  }

  test("q04: all four dimension joins broadcast") {
    val plan = executedPlan("q04_revenue_by_nation")
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(broadcasts >= 4, s"expected >=4 broadcast joins, got $broadcasts\n$plan")
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("q05: top-k plans as TakeOrderedAndProject, not a global sort") {
    val plan = executedPlan("q05_topk_orders")
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("q25/q26: sketch computation has no shuffle before banding") {
    // signature/sketch stage must be a pure projection over the scan — the
    // queries themselves now carry banded-oracle verification joins, so the
    // zero-shuffle property is asserted on the OPERATORS they run
    val docs = Tables.documents(spark, sf)
    Seq(
      graft.ops.Dedup.simhash(docs, "doc_id", "text"),
      graft.ops.Dedup.minhashSignatures(docs, "doc_id", "text", 32, 3)
    ).foreach { sketch =>
      val plan = sketch.queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(exchanges == 0, s"sketch stage must not hash-shuffle\n$plan")
    }
  }

  test("q54/q55: correlated (NOT) EXISTS planned as semi/anti joins") {
    // Catalyst's RewritePredicateSubquery must decorrelate — a scale killer
    // would be a nested-loop re-execution per outer row
    val existsPlan = executedPlan("q54_exists")
    assert(existsPlan.contains("LeftSemi"), existsPlan)
    val notExistsPlan = executedPlan("q55_not_exists")
    assert(notExistsPlan.contains("LeftAnti"), notExistsPlan)
  }

  test("q51: orders pre-aggregated BEFORE the outer join") {
    // the aggregate must sit below the join in the executed plan: joining
    // raw orders first would shuffle 100x the rows at scale
    val plan = executedPlan("q51_left_outer_join")
    val joinIdx = plan.indexOf("Join")
    val aggBelow = plan.indexOf("HashAggregate", joinIdx)
    assert(joinIdx >= 0 && aggBelow > joinIdx,
      s"expected HashAggregate below the join\n$plan")
  }

  test("q57: explicit pivot values avoid the distinct-discovery job") {
    // pivot WITHOUT values runs an eager collect to discover them; with an
    // explicit list the plan is a single aggregate over one scan
    val plan = executedPlan("q57_pivot")
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"pivot must read orders exactly once\n$plan")
  }

  test("q58: unpivot plans as Expand over one scan, no join/shuffle melt") {
    val plan = executedPlan("q58_unpivot")
    assert(plan.contains("Expand"), plan)
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"unpivot must read lineitem exactly once (not UNION-of-scans)\n$plan")
  }

  test("q59: lateral explode plans as Generate, aggregation map-side combined") {
    val plan = executedPlan("q59_lateral_explode")
    assert(plan.contains("Generate explode"), plan)
    // partial aggregation must run below the exchange (map-side combine)
    val exchangeIdx = plan.indexOf("Exchange hashpartitioning")
    val partialAggIdx = plan.indexOf("HashAggregate", exchangeIdx)
    assert(exchangeIdx >= 0 && partialAggIdx > exchangeIdx,
      s"expected partial HashAggregate below the exchange\n$plan")
  }

  test("q64: split assignment is a pure projection — one agg shuffle only") {
    val plan = executedPlan("q64_split_assign")
    // md5-bucket labeling must not shuffle; the only exchanges are the
    // (source, split) aggregation and the presentation sort
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashEx <= 1, s"expected <=1 hash exchange, got $hashEx\n$plan")
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("q66: decontamination joins against a broadcast eval shingle set") {
    val plan = executedPlan("q66_decontaminate")
    assert(plan.contains("BroadcastHashJoin"),
      s"eval shingle set must broadcast\n$plan")
  }

  test("q67: tf-idf corpus size joins as broadcast, top-k window is partitioned") {
    val plan = executedPlan("q67_tfidf_top_terms")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"1-row corpus count must broadcast\n$plan")
    // the window must be partitioned by doc (never a global empty-partition
    // sort), and Spark's rank-limit pushdown must kick in so each partition
    // keeps only k rows before the full window evaluates
    assert(plan.contains("windowspecdefinition(doc_id"), plan)
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("q69: upsert anti-join broadcasts the update batch; base never shuffles for the merge") {
    val plan = executedPlan("q69_merge_upsert")
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected broadcast left-anti join\n$plan")
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("q70: incremental dedup — corpus fingerprints broadcast for the exact stage") {
    val plan = executedPlan("q70_incremental_dedup")
    assert(plan.contains("LeftAnti"), plan)
    assert(plan.contains("BroadcastHashJoin"), s"fingerprint anti-join should broadcast\n$plan")
  }

  test("q73: frequent set broadcasts; exactly one shuffle (the df groupBy)") {
    val plan = executedPlan("q73_prune_boilerplate")
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"one-row frequent array should cross-join as broadcast\n$plan")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles <= 1, s"boilerplate prune needs only the df-count shuffle, got $shuffles\n$plan")
  }

  test("q77: one scan, one aggregate, no Expand (sums are not distinct)") {
    val plan = executedPlan("q77_correlation")
    assert(!plan.contains("Expand"), s"plain sums must not expand rows\n$plan")
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"correlation matrix must read lineitem once, got $scans\n$plan")
  }

  test("q76: mixture thresholds broadcast back onto the corpus") {
    val plan = executedPlan("q76_mixture_sample")
    assert(plan.contains("BroadcastHashJoin"),
      s"domain-count join should broadcast\n$plan")
  }

  test("q113: DSIR lambda table and totals broadcast onto the feature stream") {
    import graft.ops.Curation
    val docs = Tables.documents(spark, sf)
    val plan = Curation.dsirWeights(docs, "doc_id", "text",
      docs.filter(col("source") === "src0"), "text")
      .queryExecution.executedPlan.toString
    // the ≤nBuckets λ frame and the 1-row totals frame must broadcast —
    // the corpus-side feature stream shuffles only for the per-doc rollup
    assert(plan.contains("BroadcastHashJoin"),
      s"lambda join should broadcast\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"),
      s"totals cross join should broadcast\n$plan")
  }

  test("q114: temperature gate broadcasts; corpus never shuffles") {
    import graft.ops.Curation
    val docs = Tables.documents(spark, sf)
    val plan = Curation.temperatureSample(docs, "doc_id", "source",
      alpha = 0.5, budgetFrac = 0.5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"per-domain threshold join should broadcast\n$plan")
    // the corpus row stream itself never shuffles: the surviving
    // exchanges are the |domains|-plane agg/window + the broadcast —
    // a shuffled join flavor would mean the scan side repartitioned
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"corpus side must not shuffle for the gate join\n$plan")
  }

  test("q80: WITH RECURSIVE executes as UnionLoop (iterative, not unrolled)") {
    val plan = executedPlan("q80_recursive_hierarchy")
    assert(plan.contains("UnionLoop"), s"expected recursive UnionLoop node\n$plan")
  }

  test("q78/q79: funnel counts monotone; every cohort retains itself at offset 0") {
    val funnel = SparkEntry.queries("q78_funnel")(spark, sf)
      .orderBy("stage").collect().map(_.getLong(1))
    assert(funnel(0) >= funnel(1) && funnel(1) >= funnel(2),
      s"funnel stages must shrink: ${funnel.toSeq}")
    val ret = SparkEntry.queries("q79_retention")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val cohorts = ret.map(_._1).distinct
    // a signup event is itself activity on the cohort day
    assert(cohorts.forall(c => ret.exists(t => t._1 == c && t._2 == 0L)),
      "every cohort must have an offset-0 row")
    assert(ret.forall(t => t._2 >= 0 && t._2 <= 7))
  }

  test("q74/q75: PII redaction and repetition metrics are pure projections") {
    for (q <- Seq("q74_redact_pii", "q75_repetition")) {
      val plan = executedPlan(q)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"$q must not shuffle (per-row work only)\n$plan")
      assert(!plan.contains("Join"), s"$q must not join\n$plan")
    }
  }

  test("q121: URL canonicalization plane shuffles only (id, url) projections") {
    val plan = executedPlan("q121_url_curation")
    // the regex plane is pure projection; the only exchanges are the two
    // staged skinny windows (canonical dedup, host cap) + result sort —
    // the document text column must never appear in the plan. Match the
    // ATTRIBUTE form text#NNN, not the bare substring (a column named
    // fulltext or a codegen comment containing 'text' is not a leak)
    assert("\\btext#\\d+".r.findFirstIn(plan).isEmpty,
      s"q121 must never touch the text column\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"q121 must not cross-join\n$plan")
  }

  test("q124: table-sourced blocklist broadcast-anti-joins on the domain key") {
    val plan = executedPlan("q124_url_blocklist_table")
    // a small blocklist must ride a broadcast anti join (Catalyst picks
    // it from the local relation's size stats); shuffling the corpus on
    // the domain key for a tiny list is the failure mode
    assert("BroadcastHashJoin.*LeftAnti".r.findFirstIn(plan).isDefined,
      s"expected broadcast LeftAnti join for small blocklist\n$plan")
    assert("\\btext#\\d+".r.findFirstIn(plan).isEmpty,
      s"q124 must never touch the text column\n$plan")
  }

  test("q125: composed curation pipeline shuffles the text column zero times") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    // AQE wraps the plan and hides exchanges behind node boundaries —
    // unwrap adaptive roots and materialized query stages explicitly
    def collectShuffles(p: SparkPlan): Seq[ShuffleExchangeLike] = p.flatMap {
      case a: AdaptiveSparkPlanExec => collectShuffles(a.executedPlan)
      case q: QueryStageExec => collectShuffles(q.plan)
      case s: ShuffleExchangeLike => Seq(s)
      case _ => Nil
    }
    val df = SparkEntry.queries("q125_curation_e2e")(spark, sf)
    val shuffles = collectShuffles(df.queryExecution.executedPlan)
    // the composition is real distributed work: skinny windows, LM joins,
    // classifier counting all shuffle — but only (doc_id, derived) frames.
    // Text is consumed in projections off the scan (langid, bigram
    // explode, ngram hash) and must never be an exchange output.
    assert(shuffles.nonEmpty, "expected skinny shuffles in the composition")
    val leaky = shuffles.filter(_.output.exists(_.name == "text"))
    assert(leaky.isEmpty,
      s"text column must never shuffle:\n${leaky.map(_.treeString).mkString("\n")}")
  }

  test("q120/q125: no partition-less window anywhere (terciles via rankBuckets)") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    for (name <- Seq("q120_ccnet_pipeline", "q125_curation_e2e")) {
      val df = SparkEntry.queries(name)(spark, sf)
      val global = df.queryExecution.optimizedPlan.collect {
        case w: LWindow if w.partitionSpec.isEmpty => w
      }
      assert(global.isEmpty,
        s"$name: global (empty-partition) window funnels the corpus " +
          s"through one task:\n${global.map(_.treeString).mkString("\n")}")
    }
  }

  test("q169: media payloads never shuffle — signatures only") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def collectShuffles(p: SparkPlan): Seq[ShuffleExchangeLike] = p.flatMap {
      case a: AdaptiveSparkPlanExec => collectShuffles(a.executedPlan)
      case q: QueryStageExec => collectShuffles(q.plan)
      case s: ShuffleExchangeLike => Seq(s)
      case _ => Nil
    }
    val df = SparkEntry.queries("q169_media_neardup")(spark, sf)
    val shuffles = collectShuffles(df.queryExecution.executedPlan)
    assert(shuffles.nonEmpty)
    val leaky = shuffles.filter(_.output.exists(a =>
      a.name == "img_bytes" || a.name == "audio_bytes" || a.name == "bytes"))
    assert(leaky.isEmpty,
      s"media payloads must never shuffle:\n${leaky.map(_.treeString).mkString("\n")}")
  }

  test("q178/q184/q188: pair-forming joins are equi joins, never nested-loop products") {
    for (name <- Seq("q178_triangles", "q184_attribution",
        "q188_name_linkage")) {
      val plan = executedPlan(name)
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a cartesian product:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$name plans a nested-loop join:\n$plan")
    }
  }

  test("q183: SCD2 churn keys broadcast back; history never sorts globally") {
    val plan = executedPlan("q183_scd2")
    assert(plan.contains("BroadcastExchange"),
      s"churn keys must broadcast for the close/stay split:\n$plan")
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val df = SparkEntry.queries("q183_scd2")(spark, sf)
    val global = df.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.isEmpty => w
    }
    assert(global.isEmpty, "no global window in the SCD2 fold")
  }

  test("q122: classifier count tables broadcast; corpus shuffles only skinny features") {
    val plan = executedPlan("q122_quality_classifier")
    assert(plan.contains("BroadcastExchange"),
      s"bucket count/total tables must broadcast to the scoring join\n$plan")
    // the 1-row totals frame rides a broadcast (its nested-loop form is
    // the broadcast cross-join pattern); an unbroadcast cartesian is the
    // failure mode
    assert(!plan.contains("CartesianProduct"), s"unbroadcast cartesian\n$plan")
  }

  test("q81: heavy hitters plan as TakeOrderedAndProject over one agg") {
    val plan = executedPlan("q81_heavy_hitters")
    assert(plan.contains("TakeOrderedAndProject"), plan)
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans <= 2, s"events scanned once for counts + once for total, got $scans\n$plan")
  }

  test("q84: binned range join is an equi join, never a nested-loop cross") {
    val plan = executedPlan("q84_range_join")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"range join must bin to an equi join\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q91: interval overlap is an equi join, never a nested-loop cross") {
    val plan = executedPlan("q91_interval_overlap")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"overlap join must bin to an equi join\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q90: eval ships as a reference object; corpus joins stay broadcast") {
    val plan = executedPlan("q90_semantic_decontaminate")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus must not shuffle for the eval join\n$plan")
    // the eval matrix must ride the plan as ONE reference object: an
    // actual matrix entry (the UNIT-normalized first component) rendered
    // into the plan string would mean the typedLit unrolled into
    // per-element literals
    val v = Tables.embeddings(spark, sf)
      .filter(col("vec_id") === 0L).head().getSeq[Float](1)
      .map(_.toDouble).toArray
    val unit0 = (v.head / math.sqrt(v.map(x => x * x).sum)).toString.take(10)
    assert(!plan.contains(unit0),
      s"eval vector values leaked into the plan as literals ($unit0)\n$plan")
  }

  test("zscore stats joins: forced broadcast is opt-out for high-cardinality groups") {
    import spark.implicits._
    // default broadcastStats=true pins the |groups|-sized stats frames to
    // broadcast (right for bounded-cardinality metric streams) even when
    // the planner would never pick it; broadcastStats=false must leave a
    // shuffle-join path for per-entity groups in the tens of millions
    val df = (0L until 1000L).map(i => (s"g${i % 50}", i.toDouble)).toDF("g", "v")
    val conf = spark.conf
    val old = conf.get("spark.sql.autoBroadcastJoinThreshold")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val forced = graft.ops.Profile.zscoreOutliers(df, "g", "v", zThreshold = 1.0)
        .queryExecution.executedPlan.toString
      assert(forced.contains("BroadcastHashJoin"), forced)
      val free = graft.ops.Profile.zscoreOutliers(df, "g", "v", zThreshold = 1.0,
        broadcastStats = false).queryExecution.executedPlan.toString
      assert(!free.contains("BroadcastHashJoin"), free)
      assert(free.contains("SortMergeJoin") || free.contains("ShuffledHashJoin"), free)
    } finally conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("native expressions stay inside whole-stage codegen") {
    import spark.implicits._
    // NB: array<float>→double via transform() is a HOF and would break the
    // codegen span by itself, and a local Seq constant-folds away; build
    // array<double> with array() over a parquet scan so the projection is
    // real, and require the fused `*(N)` / WholeStageCodegen marker
    val df = Tables.lineitem(spark, sf)
      .select(graft.functions.ArrayMath.dot(
        array(col("l_quantity"), col("l_extendedprice")),
        array(col("l_discount"), col("l_tax"))).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WholeStageCodegen") || plan.matches("(?s).*\\*\\(\\d+\\) Project.*"),
      plan)
  }

  test("q135: MP4 sample catalog is scan → project → generate, zero hash shuffles") {
    val plan = executedPlan("q135_mp4_samples")
    assert(plan.contains("Generate"), s"explode must plan as Generate\n$plan")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashEx == 0,
      s"catalog extraction must not shuffle (only the result sort ranges), got $hashEx\n$plan")
  }

  test("q136/q140: perceptual hashes — zero hash shuffles; kernels codegen on column input") {
    // the fixture queries wrap the hash around a CodegenFallback fixture
    // ENCODER, which legitimately breaks the fused span there — the
    // production shape is the hash over a table's binary column, where
    // both kernels must stay inside whole-stage codegen
    Seq("q136_image_dhash", "q140_audio_fingerprint").foreach { q =>
      val plan = executedPlan(q)
      val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(hashEx == 0,
        s"$q is a pure projection — no hash shuffle expected, got $hashEx\n$plan")
    }
    val df = Tables.documents(spark, sf)
      .select(
        graft.functions.ArrayMath.imageDHash64(col("text").cast("binary")).as("h"),
        graft.functions.ArrayMath.audioFingerprint64(col("text").cast("binary")).as("a"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WholeStageCodegen") || plan.matches("(?s).*\\*\\(\\d+\\) Project.*"),
      plan)
  }

  test("q137: image near-dup degrees — banded joins only, no all-pairs operator") {
    val plan = executedPlan("q137_image_neardup_degree")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"near-dup degrees must never plan an all-pairs join\n$plan")
  }

  test("q138: boilerplate filter is a broadcast anti-join; full text shuffles once") {
    val plan = executedPlan("q138_boilerplate_lines")
    assert("BroadcastHashJoin.*LeftAnti".r.findFirstIn(plan).isDefined,
      s"the >maxDf line set is tiny by nature — it must broadcast\n$plan")
  }

  test("q139: WARC parse is Generate over the grouped files, no extra shuffles") {
    val plan = executedPlan("q139_warc_roundtrip")
    assert(plan.contains("Generate"), s"record explode must plan as Generate\n$plan")
    // one hash shuffle: the file-assembly groupBy. (Result sort is a
    // range exchange; distinct-ish ops would add more — they must not.)
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashEx == 1,
      s"expected exactly the file-assembly shuffle, got $hashEx\n$plan")
  }

  test("q141: corpus diff joins fingerprints only — text never crosses a shuffle") {
    val plan = formatted("q141_corpus_diff")
    // FormattedMode lists every operator's Input attributes: each
    // Exchange must carry only (id, fp) — a text#NNN attribute entering
    // any Exchange means document text crossed a shuffle
    val exchangeInputs =
      "(?s)\\(\\d+\\) Exchange.*?Input \\[\\d+\\]: \\[([^\\]]*)\\]".r
        .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(exchangeInputs.nonEmpty, s"expected exchanges in the plan\n$plan")
    exchangeInputs.foreach { in =>
      assert(!in.contains("text#"),
        s"document text must not cross a shuffle: [$in]\n$plan")
    }
  }

  test("nfc normalization stays inside whole-stage codegen") {
    val df = Tables.documents(spark, sf)
      .select(graft.functions.ArrayMath.nfcNormalize(col("text")).as("t"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WholeStageCodegen") || plan.matches("(?s).*\\*\\(\\d+\\) Project.*"),
      plan)
  }

  test("q143: html extraction is a pure codegen projection — zero hash shuffles") {
    val plan = executedPlan("q143_html_extract")
    // the only exchange is the result sort's range partitioning
    assert(!plan.contains("Exchange hashpartitioning"),
      s"html→text must be per-row projection work only\n$plan")
    // the whole chain is regexp_replace built-ins inside one Project —
    // codegen-eligible by construction (no UDF, no generator)
    assert(plan.contains("Project") && !plan.toLowerCase.contains("batchevalpython")
      && !plan.contains("ScalaUDF"), plan)
  }

  test("q144: the HTML column never crosses a shuffle — only host pairs do") {
    val plan = formatted("q144_link_graph")
    val exchangeInputs =
      "(?s)\\(\\d+\\) Exchange.*?Input \\[\\d+\\]: \\[([^\\]]*)\\]".r
        .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(exchangeInputs.nonEmpty, s"expected exchanges in the plan\n$plan")
    exchangeInputs.foreach { in =>
      assert(!in.contains("html#") && !in.contains("text#"),
        s"HTML/text must die in the projection, not cross a shuffle: [$in]\n$plan")
    }
  }

  test("q145: pageRank result plan is O(1) deep — iterations are checkpointed, not stacked") {
    val plan = executedPlan("q145_pagerank")
    assert(plan.contains("ExistingRDD"),
      s"final ranks must scan the checkpointed frame, not replay 8 join towers\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      s"no join may survive into the final plan\n$plan")
  }

  test("q156: funnel plans WITHOUT a window over the raw event stream") {
    val plan = executedPlan("q156_funnel")
    assert(!plan.contains("Window"),
      s"funnel is chained aggregations, never a window over all events\n$plan")
  }

  test("q164: markdown extraction is a pure projection — zero hash shuffles") {
    val plan = executedPlan("q164_markdown_extract")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"markdown→text must be per-row work only\n$plan")
  }

  test("q162: only the skinny verdict columns cross the fingerprint window's shuffle") {
    val plan = formatted("q162_pref_hygiene")
    val exchangeInputs =
      "(?s)\\(\\d+\\) Exchange.*?Input \\[\\d+\\]: \\[([^\\]]*)\\]".r
        .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(exchangeInputs.nonEmpty, s"expected the window exchange\n$plan")
    exchangeInputs.foreach { in =>
      // token-anchored: the no_prompt FLAG must not trip the probe for
      // the raw prompt column
      assert("(^|[ ,])(prompt|chosen|rejected|text)#".r.findFirstIn(in).isEmpty,
        s"pair text must die in the flag projection, not cross the shuffle: [$in]\n$plan")
    }
  }

  test("q191: LPA result plan is O(1) deep — rounds are checkpointed, not stacked") {
    val plan = executedPlan("q191_lpa_communities")
    // a stacked 3-round plan would carry >= 3 vote-count aggregations;
    // the checkpointed result rebuilds at most the final round
    val aggs = "HashAggregate".r.findAllIn(plan).size
    assert(aggs <= 8, s"plan depth suggests stacked rounds: $aggs aggs\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q240/q241: iterative chains are O(1) deep — rounds checkpointed, never stacked, no cartesians") {
    Seq("q240_markov_attribution", "q241_bradley_terry").foreach { q =>
      val plan = executedPlan(q)
      assert(plan.contains("ExistingRDD"),
        s"$q: the readout must scan checkpointed round frames, not replay " +
          s"the iteration towers\n$plan")
      val aggs = "HashAggregate".r.findAllIn(plan).size
      assert(aggs <= 10, s"$q: plan depth suggests stacked rounds: $aggs\n$plan")
      assert(!plan.contains("CartesianProduct"), s"$q:\n$plan")
    }
  }

  test("q256/q257: BFS centralities are O(1) deep — hops checkpointed, never stacked, no cartesians") {
    Seq("q256_betweenness", "q257_harmonic_closeness").foreach { q =>
      val plan = executedPlan(q)
      assert(plan.contains("ExistingRDD"),
        s"$q: the readout must scan checkpointed BFS frames, not replay " +
          s"the per-hop join towers\n$plan")
      val aggs = "HashAggregate".r.findAllIn(plan).size
      assert(aggs <= 10, s"$q: plan depth suggests stacked hops: $aggs\n$plan")
      assert(!plan.contains("CartesianProduct"), s"$q:\n$plan")
    }
  }

  test("q264: SCC readout is O(1) deep — rounds/hops checkpointed, " +
    "never stacked, no cartesians") {
    val plan = executedPlan("q264_scc")
    assert(plan.contains("ExistingRDD"),
      s"the readout must scan checkpointed per-round component frames, " +
        s"not replay the BFS towers\n$plan")
    val aggs = "HashAggregate".r.findAllIn(plan).size
    assert(aggs <= 10, s"plan depth suggests stacked rounds: $aggs\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q289/q290: walk and truss readouts are O(1) deep — rounds checkpointed, no cartesians") {
    Seq("q289_random_walks", "q290_ktruss").foreach { q =>
      val plan = executedPlan(q)
      assert(plan.contains("ExistingRDD"),
        s"$q: the readout must scan checkpointed round frames, not replay " +
          s"the per-round join towers\n$plan")
      val aggs = "HashAggregate".r.findAllIn(plan).size
      assert(aggs <= 10, s"$q: plan depth suggests stacked rounds: $aggs\n$plan")
      assert(!plan.contains("CartesianProduct"), s"$q:\n$plan")
    }
  }

  test("q300: MMR rounds are O(1) deep and the candidate cut is a windowed top-k") {
    val plan = executedPlan("q300_mmr_diversify")
    assert(plan.contains("ExistingRDD"),
      s"the readout must scan checkpointed per-round picks\n$plan")
    val aggs = "HashAggregate".r.findAllIn(plan).size
    assert(aggs <= 12, s"plan depth suggests stacked rounds: $aggs\n$plan")
  }

  test("q193: the CMS point-query join broadcasts the sketch side") {
    val plan = executedPlan("q193_cms_heavy_hitters")
    assert(plan.contains("BroadcastHashJoin"),
      s"sketch side must broadcast\n$plan")
  }

  test("q203/q211: co-occurrence self-joins are hash joins on user, never cartesian") {
    Seq("q203_item_cooccurrence", "q211_association_rules").foreach { q =>
      val plan = executedPlan(q)
      assert(!plan.contains("CartesianProduct"),
        s"$q must join pairs by user key\n$plan")
    }
  }

  test("q217/q218: the score plane compresses before the rank window") {
    Seq("q217_roc_auc", "q218_average_precision").foreach { q =>
      val plan = executedPlan(q)
      // the distinct-score aggregation must precede the window: the
      // window's sort input comes from an aggregate, not the raw scan
      assert(plan.contains("Window"), plan)
      assert("HashAggregate".r.findAllIn(plan).size >= 2,
        s"$q needs the per-score compaction aggregate\n$plan")
    }
  }

  test("no query plan contains a partition-less window") {
    // Every single-partition window in this engine is over a DOCUMENTED
    // bounded frame and carries the non-foldable BoundedKey partition key
    // (functions/BoundedKey.scala) — so an EMPTY partitionSpec in any
    // query's physical plan is, by policy, an undeclared scale smell.
    // This sweep keeps the WindowExec warning tail meaningful: a genuine
    // unpartitioned window on an unbounded frame fails here first.
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sf).queryExecution.executedPlan
        val bad = plan.collect {
          case w: org.apache.spark.sql.execution.window.WindowExec
              if w.partitionSpec.isEmpty => w
          case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec
              if w.partitionSpec.isEmpty => w
        }
        if (bad.nonEmpty) Some(s"$name (${bad.size})") else None
    }
    assert(offenders.isEmpty,
      s"partition-less windows in: ${offenders.mkString(", ")}")
  }
}
