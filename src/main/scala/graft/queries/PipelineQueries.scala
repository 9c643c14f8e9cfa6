package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Curation, Profile, Similarity, TextOps}

/** Third pipeline batch: corpus hygiene and profiling operators a
  * large-scale training-data pipeline runs before/alongside dedup —
  * boilerplate pruning, PII redaction, repetition/degeneracy metrics,
  * mixture sampling, and engine-reproducible correlation profiling.
  *
  * Same hash-stability conventions as [[RelationalQueries]]: identical
  * aliases both sides, decimal-routed sums, deterministic total order.
  */
object PipelineQueries {

  private val normSql = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

  /** DuckDB replica of [[Curation.hashBucket]] (see q64). */
  private def bucketSql(id: String, n: Int) =
    s"CAST(('0x' || substring(md5(CAST($id AS VARCHAR)), 1, 8)) AS BIGINT) % $n"

  // DuckDB replicas of the PII regexes (same RE2/Java-safe syntax;
  // single-quoted SQL strings pass backslashes through literally).
  private val emailSql = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val ipSql = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  private val phoneSql = "(?:\\+|\\b)\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"

  /** Generated oracle for q77: per-pair conditional DECIMAL sums in one
    * aggregate CTE, then one UNION ALL branch per pair computing the same
    * closed form the Spark plan uses (identical expression structure →
    * identical IEEE result).
    */
  private def corrOracle(cols: Seq[String]): String = {
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    val sums = pairs.zipWithIndex.flatMap { case ((x, y), p) =>
      val both = s"$x IS NOT NULL AND $y IS NOT NULL"
      def dec(e: String) = s"CAST($e AS DECIMAL(18,4))"
      // Widened (losslessly) to 19 digits for products: DuckDB multiplies
      // DECIMAL(18,·) in int64 (overflows); (19,4)×(19,4)→(38,8) runs in
      // int128. The value is identical — only the storage width changes.
      def decw(e: String) = s"CAST(${dec(e)} AS DECIMAL(19,4))"
      Seq(
        s"COUNT(CASE WHEN $both THEN 1 END) AS n_$p",
        s"SUM(CASE WHEN $both THEN ${dec(x)} END) AS sx_$p",
        s"SUM(CASE WHEN $both THEN ${dec(y)} END) AS sy_$p",
        s"SUM(CASE WHEN $both THEN ${decw(x)} * ${decw(x)} END) AS sxx_$p",
        s"SUM(CASE WHEN $both THEN ${decw(y)} * ${decw(y)} END) AS syy_$p",
        s"SUM(CASE WHEN $both THEN ${decw(x)} * ${decw(y)} END) AS sxy_$p")
    }.mkString(",\n    ")
    val branches = pairs.zipWithIndex.map { case ((x, y), p) =>
      val n = s"CAST(n_$p AS DOUBLE)"
      def d(pre: String) = s"CAST(${pre}_$p AS DOUBLE)"
      val num = s"$n * ${d("sxy")} - ${d("sx")} * ${d("sy")}"
      val den = s"sqrt($n * ${d("sxx")} - ${d("sx")} * ${d("sx")}) * " +
        s"sqrt($n * ${d("syy")} - ${d("sy")} * ${d("sy")})"
      s"""SELECT '$x' AS col_x, '$y' AS col_y, CAST(n_$p AS BIGINT) AS n,
         |  CASE WHEN ($den) = 0 THEN NULL
         |       ELSE round(($num) / ($den), 6) END AS corr FROM s""".stripMargin
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH s AS (
       |  SELECT
       |    $sums
       |  FROM lineitem
       |)
       |SELECT * FROM (
       |  $branches
       |) ORDER BY col_x, col_y""".stripMargin
  }

  val all: Seq[QuerySpec] = Seq(

    // ------------------------------------------------------------------
    // Corpus-level boilerplate pruning: tokens present in more than
    // maxDocFrac of all documents are template filler by definition; drop
    // them from every document, preserving order/multiplicity of the rest.
    // Threshold 0.78 bisects this synthetic corpus's near-uniform df band
    // (30 of 31 vocab tokens sit at df 0.75-0.80) so the prune is
    // non-degenerate: ~half the vocab goes, ~half stays. Frequent set
    // collapses to ONE broadcast array row (size bounded by
    // avg-distinct-units/frac, independent of corpus rows); rewrite is a
    // per-row filter HOF — no join fan-out. COALESCE on the oracle side:
    // DuckDB's array_to_string([]) is NULL where Spark's array_join is ''.
    QuerySpec(
      "q73_prune_boilerplate",
      (s, dir) =>
        Curation.pruneFrequentUnits(
          Tables.documents(s, dir)
            .select(col("doc_id"), TextOps.normalized(col("text")).as("text")),
          "doc_id", "text", delim = " ", maxDocFrac = 0.78)
          .sortWithinPartitions("doc_id"),
      Some(s"""WITH docs AS (
              |  SELECT doc_id, string_split($normSql, ' ') AS toks FROM documents
              |), dfreq AS (
              |  SELECT u AS tok, COUNT(*) AS df
              |  FROM (SELECT doc_id, unnest(list_distinct(toks)) AS u FROM docs)
              |  GROUP BY 1
              |), freq AS (
              |  SELECT COALESCE(list(tok ORDER BY tok), []) AS fl
              |  FROM dfreq WHERE df > 0.78 * (SELECT COUNT(*) FROM docs)
              |)
              |SELECT d.doc_id,
              |  COALESCE(array_to_string(list_filter(d.toks, t -> NOT list_contains(f.fl, t)), ' '), '') AS text_clean
              |FROM docs d, freq f ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------------------------
    // PII detection + redaction. The fixture corpus carries no PII, so the
    // query plants deterministic emails/phones/IPs derived from doc_id on a
    // subset of rows (mod-gated, so presence varies), then audits and
    // redacts — the oracle replays the same planting and the same RE2-safe
    // regex chain. Pure regexp projection: codegen'd, zero shuffles.
    QuerySpec(
      "q74_redact_pii",
      (s, dir) =>
        Tables.documents(s, dir)
          .withColumn("__pii", concat(
            when(col("doc_id") % 3 === 0,
              concat(lit("user"), col("doc_id"), lit("@example.com ")))
              .otherwise(""),
            when(col("doc_id") % 4 === 0,
              concat(lit("call 555-123-"),
                lpad((col("doc_id") % 10000).cast("string"), 4, "0"), lit(" ")))
              .otherwise(""),
            when(col("doc_id") % 5 === 0,
              concat(lit("host 192.168."),
                (col("doc_id") % 256).cast("string"), lit(".9 ")))
              .otherwise(""),
            col("text")))
          .select(col("doc_id") +: {
            val (e, i, p) = TextOps.piiCounts(col("__pii"))
            Seq(e.as("n_emails"), i.as("n_ips"), p.as("n_phones"),
              TextOps.redactPii(col("__pii")).as("text_redacted"))
          }: _*)
          .sortWithinPartitions("doc_id"),
      Some(s"""WITH planted AS (
              |  SELECT doc_id,
              |    concat(
              |      CASE WHEN doc_id % 3 = 0 THEN concat('user', doc_id, '@example.com ') ELSE '' END,
              |      CASE WHEN doc_id % 4 = 0 THEN concat('call 555-123-', lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'), ' ') ELSE '' END,
              |      CASE WHEN doc_id % 5 = 0 THEN concat('host 192.168.', CAST(doc_id % 256 AS VARCHAR), '.9 ') ELSE '' END,
              |      text) AS pii
              |  FROM documents
              |), steps AS (
              |  SELECT doc_id, pii,
              |    regexp_replace(pii, '$emailSql', '<EMAIL>', 'g') AS after_email,
              |    regexp_replace(regexp_replace(pii, '$emailSql', '<EMAIL>', 'g'), '$ipSql', '<IP>', 'g') AS after_ip
              |  FROM planted
              |)
              |SELECT doc_id,
              |  CAST(len(regexp_extract_all(pii, '$emailSql')) AS BIGINT) AS n_emails,
              |  CAST(len(regexp_extract_all(after_email, '$ipSql')) AS BIGINT) AS n_ips,
              |  CAST(len(regexp_extract_all(after_ip, '$phoneSql')) AS BIGINT) AS n_phones,
              |  regexp_replace(after_ip, '$phoneSql', '<PHONE>', 'g') AS text_redacted
              |FROM steps ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------------------------
    // Repetition/degeneracy metrics (Gopher-style): duplicate-token
    // fraction and top-bigram share per document. Exact integer counts +
    // one IEEE division each — bit-reproducible; per-row HOFs only, so the
    // operator is a pure projection (cost bounded by document length,
    // never corpus size).
    QuerySpec(
      "q75_repetition",
      (s, dir) =>
        Tables.documents(s, dir)
          .select(col("doc_id"),
            TextOps.dupTokenFraction(col("text")).as("dup_token_frac"),
            TextOps.topNgramFraction(col("text"), 2).as("top_bigram_frac"))
          .sortWithinPartitions("doc_id"),
      Some(s"""WITH t AS (
              |  SELECT doc_id, string_split($normSql, ' ') AS toks FROM documents
              |), b AS (
              |  SELECT doc_id, toks,
              |    list_transform(range(1, len(toks)),
              |      i -> list_extract(toks, i) || ' ' || list_extract(toks, i + 1)) AS grams
              |  FROM t
              |)
              |SELECT doc_id,
              |  CASE WHEN len(toks) = 0 THEN 0.0
              |       ELSE 1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) END AS dup_token_frac,
              |  CASE WHEN len(grams) = 0 THEN 0.0
              |       ELSE CAST(list_max(list_transform(list_distinct(grams),
              |              g -> len(list_filter(grams, x -> x = g)))) AS DOUBLE) / len(grams) END AS top_bigram_frac
              |FROM b ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------------------------
    // Mixture sampling: rebalance sources toward target weights under a
    // 50% token budget — weighted sources keep min(1, w·β·N/n_d) of their
    // rows via the deterministic hash gate; unweighted sources drop.
    // One |domains|-row aggregate broadcast back; the filter is a pure
    // projection. Reports per-source survivors (stable under re-runs).
    QuerySpec(
      "q76_mixture_sample",
      (s, dir) =>
        Curation.sampleToMixture(Tables.documents(s, dir), "doc_id", "source",
          weights = Seq("src0" -> 0.4, "src1" -> 0.3, "src2" -> 0.2, "src3" -> 0.1),
          budgetFrac = 0.5)
          .groupBy(col("source")).agg(count(lit(1)).as("n_kept"))
          .orderBy("source"),
      Some(s"""WITH c AS (
              |  SELECT source, COUNT(*) AS n_dom FROM documents GROUP BY 1
              |), t AS (
              |  SELECT SUM(n_dom) AS n_tot FROM c
              |), f AS (
              |  SELECT c.source,
              |    FLOOR(LEAST(1.0,
              |      (CASE c.source WHEN 'src0' THEN 0.4 WHEN 'src1' THEN 0.3
              |                     WHEN 'src2' THEN 0.2 WHEN 'src3' THEN 0.1 END)
              |      * 0.5 * t.n_tot / c.n_dom) * 10000) AS thresh
              |  FROM c, t
              |  WHERE c.source IN ('src0', 'src1', 'src2', 'src3')
              |)
              |SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_kept
              |FROM documents d JOIN f ON d.source = f.source
              |WHERE ${bucketSql("d.doc_id", 10000)} < f.thresh
              |GROUP BY 1 ORDER BY d.source""".stripMargin)),

    // ------------------------------------------------------------------
    // Engine-reproducible Pearson correlation matrix over the lineitem
    // numeric columns: every sum runs in DECIMAL (exact + commutative →
    // partial-agg order can't change the value), only the final closed
    // form runs in doubles. One HashAggregate over one scan.
    QuerySpec(
      "q77_correlation",
      (s, dir) =>
        Profile.correlationMatrix(Tables.lineitem(s, dir),
          Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
          .orderBy("col_x", "col_y"),
      Some(corrOracle(
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")))),

    // ------------------------------------------------------------------
    // Ordered conversion funnel over the event stream: users who viewed,
    // then clicked strictly after their first view, then purchased
    // strictly after that click. Each stage is one user-keyed aggregate
    // joined to the (shrinking) previous stage — co-keyed shuffles, no
    // windows over the full stream, no driver state. All comparisons on
    // exact integer micros (ts_ns div 1000 == DuckDB's truncating
    // nano→micro parquet read — verified, including the .999 edge).
    QuerySpec(
      "q78_funnel",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("user_id"), col("event_type"),
            expr("ts_ns div 1000").as("us"))
        val v = e.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min(col("us")).as("t1"))
        val c = e.filter(col("event_type") === "click")
          .join(v, "user_id").filter(col("us") > col("t1"))
          .groupBy("user_id").agg(min(col("us")).as("t2"))
        val p = e.filter(col("event_type") === "purchase")
          .join(c, "user_id").filter(col("us") > col("t2"))
          .groupBy("user_id").agg(min(col("us")).as("t3"))
        def stage(df: org.apache.spark.sql.DataFrame, name: String) =
          df.agg(count(lit(1)).as("n_users")).select(lit(name).as("stage"), col("n_users"))
        stage(v, "1_view").union(stage(c, "2_click")).union(stage(p, "3_purchase"))
          .orderBy("stage")
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events
             |), v AS (
             |  SELECT user_id, MIN(us) AS t1 FROM e WHERE event_type = 'view' GROUP BY 1
             |), c AS (
             |  SELECT e.user_id, MIN(us) AS t2 FROM e JOIN v USING (user_id)
             |  WHERE event_type = 'click' AND us > t1 GROUP BY 1
             |), p AS (
             |  SELECT e.user_id, MIN(us) AS t3 FROM e JOIN c USING (user_id)
             |  WHERE event_type = 'purchase' AND us > t2 GROUP BY 1
             |)
             |SELECT '1_view' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM v
             |UNION ALL SELECT '2_click', CAST(COUNT(*) AS BIGINT) FROM c
             |UNION ALL SELECT '3_purchase', CAST(COUNT(*) AS BIGINT) FROM p
             |ORDER BY stage""".stripMargin)),

    // ------------------------------------------------------------------
    // Cohort retention: users grouped by first-signup day; distinct
    // active users per (cohort day, day offset 0..7). Day arithmetic is
    // timezone-free integer division of exact micros (no to_date — a
    // session-TZ dependency the oracle couldn't replay). Shape: two
    // user-keyed aggregates + one join; count_distinct at the end is over
    // the already-deduped (user, day) pairs.
    QuerySpec(
      "q79_retention",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("user_id"), col("event_type"),
            expr("(ts_ns div 1000) div 86400000000").as("day"))
        val cohort = e.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(min(col("day")).as("cohort_day"))
        val active = e.select(col("user_id"), col("day")).distinct()
        active.join(cohort, "user_id")
          .withColumn("offset", col("day") - col("cohort_day"))
          .filter(col("offset").between(0, 7))
          .groupBy("cohort_day", "offset")
          .agg(count_distinct(col("user_id")).as("n_users"))
          .orderBy("cohort_day", "offset")
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_type, epoch_us(ts) // 86400000000 AS day FROM events
             |), cohort AS (
             |  SELECT user_id, MIN(day) AS cohort_day FROM e
             |  WHERE event_type = 'signup' GROUP BY 1
             |), active AS (
             |  SELECT DISTINCT user_id, day FROM e
             |)
             |SELECT c.cohort_day, a.day - c.cohort_day AS "offset",
             |  CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
             |FROM active a JOIN cohort c USING (user_id)
             |WHERE a.day - c.cohort_day BETWEEN 0 AND 7
             |GROUP BY 1, 2 ORDER BY cohort_day, "offset"""".stripMargin)),

    // ------------------------------------------------------------------
    // Recursive CTE (Spark 4.1 WITH RECURSIVE → UnionLoop): walk the
    // implicit heap hierarchy over supplier (parent(k) = (k−1) div 2,
    // root 0) and profile each level. Exercises the iterative-query
    // surface end-to-end in BOTH engines' SQL front ends; per-level work
    // is one join against the previous level only.
    QuerySpec(
      "q80_recursive_hierarchy",
      (s, dir) => {
        val tag = java.util.UUID.randomUUID().toString.replace("-", "").take(12)
        Tables.supplier(s, dir).createOrReplaceTempView(s"graft_supplier_$tag")
        val out = s.sql(
          s"""WITH RECURSIVE tree AS (
             |  SELECT s_suppkey AS k, 0 AS depth
             |  FROM graft_supplier_$tag WHERE s_suppkey = 0
             |  UNION ALL
             |  SELECT s.s_suppkey, t.depth + 1
             |  FROM graft_supplier_$tag s JOIN tree t
             |    ON (s.s_suppkey - 1) div 2 = t.k AND s.s_suppkey > 0
             |)
             |SELECT CAST(depth AS BIGINT) AS depth,
             |  CAST(COUNT(*) AS BIGINT) AS n,
             |  CAST(MIN(k) AS BIGINT) AS min_key, CAST(MAX(k) AS BIGINT) AS max_key
             |FROM tree GROUP BY depth ORDER BY depth""".stripMargin)
        s.catalog.dropTempView(s"graft_supplier_$tag")
        out
      },
      Some("""WITH RECURSIVE tree AS (
             |  SELECT s_suppkey AS k, 0 AS depth FROM supplier WHERE s_suppkey = 0
             |  UNION ALL
             |  SELECT s.s_suppkey, t.depth + 1
             |  FROM supplier s JOIN tree t
             |    ON (s.s_suppkey - 1) // 2 = t.k AND s.s_suppkey > 0
             |)
             |SELECT CAST(depth AS BIGINT) AS depth,
             |  CAST(COUNT(*) AS BIGINT) AS n,
             |  CAST(MIN(k) AS BIGINT) AS min_key, CAST(MAX(k) AS BIGINT) AS max_key
             |FROM tree GROUP BY depth ORDER BY depth""".stripMargin)),

    // ------------------------------------------------------------------
    // Heavy-hitter diagnostics: the top-k keys by frequency with their
    // share of all rows — what you run BEFORE picking a partitioning to
    // find the keys that will hot-spot a shuffle. One groupBy + top-k via
    // TakeOrderedAndProject (never a global sort); the total joins as a
    // broadcast one-row aggregate. Exact integer counts; share is one IEEE
    // division.
    QuerySpec(
      "q81_heavy_hitters",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val total = e.agg(count(lit(1)).as("__tot"))
        e.groupBy(col("user_id")).agg(count(lit(1)).as("n"))
          .crossJoin(broadcast(total))
          .select(col("user_id"), col("n"),
            round(col("n").cast("double") / col("__tot"), 6).as("share"))
          .orderBy(col("n").desc, col("user_id")).limit(20)
      },
      Some("""SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
             |  round(CAST(COUNT(*) AS DOUBLE) / (SELECT COUNT(*) FROM events), 6) AS share
             |FROM events GROUP BY user_id
             |ORDER BY n DESC, user_id LIMIT 20""".stripMargin)),

    // ------------------------------------------------------------------
    // Vocabulary coverage (Zipf curve): corpus token frequencies ranked,
    // with cumulative share — the statistic tokenizer/vocab-size decisions
    // read. The window cumsum runs over the VOCABULARY (post-aggregation),
    // not the corpus: its single-partition sort is |vocab|-sized, which is
    // the quantity that stays small when the corpus grows 100×. Cumulative
    // share divides exact BIGINT cumsums — deterministic on any engine.
    QuerySpec(
      "q82_vocab_coverage",
      (s, dir) => {
        val toks = Tables.documents(s, dir)
          .select(explode(TextOps.tokens(TextOps.normalized(col("text")))).as("token"))
        val counts = toks.groupBy(col("token")).agg(count(lit(1)).as("n"))
        val total = counts.agg(sum(col("n")).as("__tot"))
        // vocab-bounded plane: single-partition windows by construction
        val bk = graft.functions.ArrayMath.boundedKey(counts)
        val w = Window.partitionBy(bk).orderBy(col("n").desc, col("token"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        counts.crossJoin(broadcast(total))
          .withColumn("rank", row_number().over(
            Window.partitionBy(bk).orderBy(col("n").desc, col("token"))))
          .withColumn("cum_share",
            round(sum(col("n")).over(w).cast("double") / col("__tot"), 6))
          .select(col("rank"), col("token"), col("n"), col("cum_share"))
          .orderBy("rank")
      },
      Some(s"""WITH toks AS (
              |  SELECT unnest(string_split($normSql, ' ')) AS token FROM documents
              |), counts AS (
              |  SELECT token, COUNT(*) AS n FROM toks GROUP BY 1
              |)
              |SELECT CAST(row_number() OVER (ORDER BY n DESC, token) AS INTEGER) AS rank,
              |  token, CAST(n AS BIGINT) AS n,
              |  round(CAST(SUM(n) OVER (ORDER BY n DESC, token
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
              |    / (SELECT SUM(n) FROM counts), 6) AS cum_share
              |FROM counts ORDER BY rank""".stripMargin)),

    // ------------------------------------------------------------------
    // SemDeDup semantic dedup. Spherical k-means is iterative and seeded —
    // not SQL-expressible — so the oracle is the planted-duplicate banded
    // form the IvfSpec certification uses, made DuckDB-checkable: plant an
    // EXACT clone of every vec_id < 25 (ids shifted by 1e6 — a pure SQL
    // construction both engines replay), run the full SemDeDup drop over
    // the augmented corpus, and emit one row per planted pair with two
    // verdicts:
    //   planted_caught_ok  per pair: the original and its clone never BOTH
    //                      survive (clone cosine == 1 >= the 0.4 gate and
    //                      identical vectors land in the same cluster, so
    //                      a correct SemDeDup always catches the pair —
    //                      recall 1.0 on planted duplicates)
    //   drops_justified_ok global: every dropped id has SOME partner at
    //                      exact cosine >= 0.4 in the augmented corpus
    //                      (re-verified all-pairs, the q31 spelling — no
    //                      spurious drops; precision of the drop set)
    // Cluster count still comes from the √N ivfPolicy — no fixture-tuned
    // constant anywhere.
    QuerySpec(
      "q83_semantic_dedup",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
        val clones = emb.filter(col("vec_id") < 25L)
          .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
        val aug = emb.unionByName(clones)
        val surv = Similarity.dropSemanticDuplicates(aug, "vec_id", "embedding",
          minCosine = 0.4).select(col("vec_id"))
        val dropped = aug.select(col("vec_id"))
          .join(surv, Seq("vec_id"), "left_anti")
        val partners = {
          val p = Similarity.cosineNearDupPairsExact(aug, "vec_id", "embedding",
            minCosine = 0.4)
          p.select(col("id_a").as("vec_id"))
            .unionByName(p.select(col("id_b").as("vec_id"))).distinct()
        }
        val verdict = dropped.join(partners, Seq("vec_id"), "left_anti")
          .agg(count(lit(1)).as("__unjust"))
          .select((col("__unjust") === 0L).as("drops_justified_ok"))
        val survOrig = surv.select(col("vec_id").as("orig_id"), lit(true).as("__ko"))
        val survClone = surv.select(col("vec_id").as("clone_id"), lit(true).as("__kc"))
        emb.filter(col("vec_id") < 25L)
          .select(col("vec_id").as("orig_id"),
            (col("vec_id") + 1000000L).as("clone_id"))
          .join(survOrig, Seq("orig_id"), "left")
          .join(survClone, Seq("clone_id"), "left")
          .select(col("orig_id"), col("clone_id"),
            (!(coalesce(col("__ko"), lit(false)) &&
              coalesce(col("__kc"), lit(false)))).as("planted_caught_ok"))
          .crossJoin(broadcast(verdict)) // 1-row verdict frame
          .orderBy("orig_id")
      },
      Some("""SELECT vec_id AS orig_id, vec_id + 1000000 AS clone_id,
             |  TRUE AS planted_caught_ok, TRUE AS drops_justified_ok
             |FROM embeddings WHERE vec_id < 25 ORDER BY orig_id""".stripMargin)),

    // ------------------------------------------------------------------
    // Keyless range join via interval binning (ops.RangeJoin): every
    // error event opens a 10-minute incident window; count the events of
    // any user landing in each window (excluding the opener). A bare
    // BETWEEN join would plan as BroadcastNestedLoopJoin — O(n·m); the
    // binned plan equi-joins on the time bin and verifies exact bounds,
    // paying only per-bin density. All bounds are exact integer micros.
    QuerySpec(
      "q84_range_join",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("event_id"), col("event_type"),
            expr("ts_ns div 1000").as("us"))
        val windows = e.filter(col("event_type") === "error")
          .select(col("event_id").as("err_id"), col("us").as("w_start"),
            (col("us") + 600000000L).as("w_end"))
        val hits = graft.ops.RangeJoin.pointsInRanges(
          e.select(col("event_id"), col("us")), "us",
          windows, "w_start", "w_end", binWidth = 600000000L)
          .filter(col("event_id") =!= col("err_id"))
          .groupBy(col("err_id")).agg(count(lit(1)).as("n_events"))
        windows.join(hits, Seq("err_id"), "left")
          .select(col("err_id"),
            coalesce(col("n_events"), lit(0L)).as("n_events"))
          .orderBy("err_id")
      },
      Some("""WITH e AS (
             |  SELECT event_id, event_type, epoch_us(ts) AS us FROM events
             |), w AS (
             |  SELECT event_id AS err_id, us AS w_start, us + 600000000 AS w_end
             |  FROM e WHERE event_type = 'error'
             |)
             |SELECT w.err_id,
             |  CAST(COUNT(CASE WHEN ev.event_id IS NOT NULL THEN 1 END) AS BIGINT) AS n_events
             |FROM w LEFT JOIN e ev
             |  ON ev.us >= w.w_start AND ev.us < w.w_end AND ev.event_id <> w.err_id
             |GROUP BY w.err_id ORDER BY err_id""".stripMargin)),

    // ------------------------------------------------------------------
    // Interval-overlap join (RangeJoin.intervalOverlaps): which error
    // windows overlap each other — the interval×interval companion of
    // q84's point-in-interval. Binning turns the quadratic overlap
    // predicate into an equi join; the ownership predicate (pair kept
    // only in the bin of max(start_a, start_b)) makes each pair match
    // exactly once with NO dedup shuffle. Oracle replays the naive
    // overlap self-join.
    QuerySpec(
      "q91_interval_overlap",
      (s, dir) => {
        val w = Tables.events(s, dir)
          .filter(col("event_type") === "error")
          .select(col("event_id"), expr("ts_ns div 1000").as("us"))
          .select(col("event_id"), col("us").as("s"), (col("us") + 600000000L).as("e"))
        val a = w.select(col("event_id").as("id_a"), col("s").as("a_start"),
          col("e").as("a_end"))
        val b = w.select(col("event_id").as("id_b"), col("s").as("b_start"),
          col("e").as("b_end"))
        graft.ops.RangeJoin.intervalOverlaps(a, "a_start", "a_end",
          b, "b_start", "b_end", binWidth = 600000000L)
          .filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"),
            (least(col("a_end"), col("b_end")) -
              greatest(col("a_start"), col("b_start"))).as("overlap_us"))
          .sortWithinPartitions("id_a", "id_b")
      },
      Some("""WITH w AS (
             |  SELECT event_id AS id, epoch_us(ts) AS s, epoch_us(ts) + 600000000 AS e
             |  FROM events WHERE event_type = 'error'
             |)
             |SELECT a.id AS id_a, b.id AS id_b,
             |  least(a.e, b.e) - greatest(a.s, b.s) AS overlap_us
             |FROM w a JOIN w b ON a.id < b.id AND a.s < b.e AND b.s < a.e
             |ORDER BY id_a, id_b""".stripMargin)),

    // ------------------------------------------------------------------
    // Document chunking (Curation.chunkDocuments): 32-token windows with
    // 8-token overlap (step 24) — the RAG/pretraining window split. Token
    // array materialized once per row; one Generate, zero shuffles.
    QuerySpec(
      "q85_chunking",
      (s, dir) =>
        Curation.chunkDocuments(Tables.documents(s, dir), "doc_id", "text",
          chunkTokens = 32, overlap = 8)
          .sortWithinPartitions("doc_id", "chunk_id"),
      Some(s"""WITH t AS (
              |  SELECT doc_id, string_split($normSql, ' ') AS toks FROM documents
              |), st AS (
              |  SELECT doc_id, toks, len(toks) AS n,
              |    unnest(range(0, greatest(len(toks) - 8, 1), 24)) AS start
              |  FROM t
              |)
              |SELECT doc_id, CAST(start // 24 AS BIGINT) AS chunk_id,
              |  CAST(LEAST(32, n - start) AS BIGINT) AS n_tokens,
              |  array_to_string(array_slice(toks, start + 1, start + 32), ' ') AS chunk_text
              |FROM st ORDER BY doc_id, chunk_id""".stripMargin)),

    // ------------------------------------------------------------------
    // Z-score anomaly gate (Profile.zscoreOutliers): prices deviating
    // more than z from their return-flag group mean. Moments are computed
    // on SHIFTED values d = x − min(group) in DECIMAL (order-independent,
    // cancellation-safe — see Profile.zscoreOutliers scaladoc), stats
    // broadcast back. z=1.5 because the synthetic fixture is bounded-
    // uniform (max |z| ≈ 1.9): the threshold exercises the gate, the
    // semantics are threshold-independent. Oracle widens decimal products
    // to (19,4) — DuckDB multiplies DECIMAL(18,·) in int64 and overflows.
    QuerySpec(
      "q86_zscore_outliers",
      (s, dir) =>
        Profile.zscoreOutliers(
          Tables.lineitem(s, dir)
            .select(col("l_orderkey"), col("l_linenumber"),
              col("l_returnflag"), col("l_extendedprice")),
          "l_returnflag", "l_extendedprice", zThreshold = 1.5)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
            col("l_extendedprice"), col("z"))
          .orderBy("l_orderkey", "l_linenumber"),
      Some("""WITH v AS (
             |  SELECT l_returnflag AS g, CAST(l_extendedprice AS DECIMAL(18,4)) AS x
             |  FROM lineitem WHERE l_extendedprice IS NOT NULL
             |), m AS (
             |  SELECT g, MIN(x) AS shift FROM v GROUP BY 1
             |), s0 AS (
             |  SELECT v.g, COUNT(*) AS n, MIN(m.shift) AS shift,
             |    SUM(CAST(v.x - m.shift AS DECIMAL(18,4))) AS sd,
             |    SUM(CAST(CAST(v.x - m.shift AS DECIMAL(18,4)) AS DECIMAL(19,4))
             |      * CAST(CAST(v.x - m.shift AS DECIMAL(18,4)) AS DECIMAL(19,4))) AS ssd
             |  FROM v JOIN m ON v.g = m.g GROUP BY 1
             |), s AS (
             |  SELECT g, CAST(shift AS DOUBLE) + CAST(sd AS DOUBLE) / n AS mean,
             |    sqrt(GREATEST(CAST(ssd AS DOUBLE) / n
             |      - (CAST(sd AS DOUBLE) / n) * (CAST(sd AS DOUBLE) / n), 0.0)) AS std
             |  FROM s0
             |)
             |SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag, l.l_extendedprice,
             |  round((l.l_extendedprice - s.mean) / s.std, 4) AS z
             |FROM lineitem l JOIN s ON l.l_returnflag = s.g
             |WHERE s.std > 0 AND abs(l.l_extendedprice - s.mean) > 1.5 * s.std
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // ------------------------------------------------------------------
    // Cross-document duplicated spans (passage-level dedup, Lee et al.
    // ACL'22): per doc, the fraction of 8-token windows whose fingerprint
    // appears in >= 2 distinct documents. Catches copied passages and
    // shared boilerplate that document-level near-dup misses. The op's
    // scale path fingerprints with xxhash64 (8-byte shuffle keys); the
    // query passes md5 so DuckDB can replay the identical fingerprints —
    // same plan, engine-reproducible keys (the q25/q27 split, span
    // edition). Only docs with at least one duplicated window are
    // emitted (the interesting rows; keeps the output skinny).
    QuerySpec(
      "q87_span_dedup",
      (s, dir) =>
        graft.ops.Dedup.crossDocSpans(Tables.documents(s, dir),
          "doc_id", "text", n = 8, minDocs = 2, fingerprint = md5 _)
          .filter(col("n_dup_windows") >= 1)
          .orderBy("doc_id"),
      Some("""WITH t AS (
             |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
             |  FROM documents
             |), s AS (
             |  SELECT doc_id,
             |    md5(array_to_string(toks[CAST(i AS INT):CAST(i + 7 AS INT)], ' ')) AS fp
             |  FROM t, LATERAL unnest(range(1, len(toks) - 8 + 2)) AS r(i)
             |  WHERE len(toks) >= 8
             |), dfq AS (
             |  SELECT fp FROM (SELECT DISTINCT doc_id, fp FROM s)
             |  GROUP BY fp HAVING COUNT(*) >= 2
             |), d AS (
             |  SELECT doc_id, COUNT(*) AS n_dup
             |  FROM s WHERE fp IN (SELECT fp FROM dfq) GROUP BY doc_id
             |)
             |SELECT t.doc_id,
             |  CAST(GREATEST(len(t.toks) - 7, 0) AS BIGINT) AS n_windows,
             |  CAST(d.n_dup AS BIGINT) AS n_dup_windows,
             |  round(CAST(d.n_dup AS DOUBLE) / (len(t.toks) - 7), 6) AS dup_fraction
             |FROM t JOIN d USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------------------------
    // Incremental span dedup (Dedup.crossDocSpansAgainstCorpus): the
    // nightly-ingest shape at PASSAGE level — new batch (doc_id % 5 = 0)
    // checked against a prebuilt span-fingerprint index of the corpus
    // (the rest); a batch window is duplicated when batch + corpus
    // distinct-doc counts reach minDocs. Cost ∝ batch; equals q87 over
    // the union restricted to batch docs (property-asserted in OpsSpec).
    QuerySpec(
      "q92_span_dedup_incremental",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val index = graft.ops.Dedup.spanIndex(
          docs.filter(col("doc_id") % 5 =!= 0), "doc_id", "text",
          n = 8, fingerprint = md5 _)
        graft.ops.Dedup.crossDocSpansAgainstCorpus(
          docs.filter(col("doc_id") % 5 === 0), "doc_id", "text",
          index, n = 8, minDocs = 2, fingerprint = md5 _)
          .filter(col("n_dup_windows") >= 1)
          .orderBy("doc_id")
      },
      Some("""WITH tb AS (
             |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
             |  FROM documents WHERE doc_id % 5 = 0
             |), sb AS (
             |  SELECT doc_id,
             |    md5(array_to_string(toks[CAST(i AS INT):CAST(i + 7 AS INT)], ' ')) AS fp
             |  FROM tb, LATERAL unnest(range(1, len(toks) - 8 + 2)) AS r(i)
             |  WHERE len(toks) >= 8
             |), tc AS (
             |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
             |  FROM documents WHERE doc_id % 5 != 0
             |), sc AS (
             |  SELECT doc_id,
             |    md5(array_to_string(toks[CAST(i AS INT):CAST(i + 7 AS INT)], ' ')) AS fp
             |  FROM tc, LATERAL unnest(range(1, len(toks) - 8 + 2)) AS r(i)
             |  WHERE len(toks) >= 8
             |), bdf AS (
             |  SELECT fp, COUNT(*) AS nb FROM (SELECT DISTINCT doc_id, fp FROM sb)
             |  GROUP BY fp
             |), cdf AS (
             |  SELECT fp, COUNT(*) AS nc FROM (SELECT DISTINCT doc_id, fp FROM sc)
             |  GROUP BY fp
             |), dfq AS (
             |  SELECT bdf.fp FROM bdf LEFT JOIN cdf USING (fp)
             |  WHERE bdf.nb + COALESCE(cdf.nc, 0) >= 2
             |), d AS (
             |  SELECT doc_id, COUNT(*) AS n_dup
             |  FROM sb WHERE fp IN (SELECT fp FROM dfq) GROUP BY doc_id
             |)
             |SELECT tb.doc_id,
             |  CAST(GREATEST(len(tb.toks) - 7, 0) AS BIGINT) AS n_windows,
             |  CAST(d.n_dup AS BIGINT) AS n_dup_windows,
             |  round(CAST(d.n_dup AS DOUBLE) / (len(tb.toks) - 7), 6) AS dup_fraction
             |FROM tb JOIN d USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------------------------
    // Statistical LM quality score (CCNet-style filtering, Wenzek et al.
    // LREC'20): per-doc average log2-likelihood of token bigrams under an
    // add-1-smoothed bigram LM trained on the corpus itself — the cheap,
    // deterministic stand-in for perplexity filtering. Per-term log2
    // rounds through DECIMAL(18,12) before the per-doc sum on BOTH
    // engines, so partial-agg order can't change the hash.
    QuerySpec(
      "q88_lm_quality",
      (s, dir) =>
        TextOps.lmQualityScore(Tables.documents(s, dir), "doc_id", "text")
          .orderBy("doc_id"),
      Some("""WITH t AS (
             |  SELECT doc_id,
             |    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
             |  FROM documents
             |  WHERE len(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) >= 2
             |), bg AS (
             |  SELECT doc_id, toks[CAST(i AS INT)] AS w1, toks[CAST(i + 1 AS INT)] AS w2
             |  FROM t, LATERAL unnest(range(1, len(toks))) AS r(i)
             |), b AS (SELECT w1, w2, COUNT(*) AS nb FROM bg GROUP BY 1, 2
             |), c AS (SELECT w1, COUNT(*) AS nc FROM bg GROUP BY 1
             |), v AS (
             |  SELECT CAST(COUNT(DISTINCT w) AS DOUBLE) AS nv
             |  FROM (SELECT unnest(toks) AS w FROM t)
             |)
             |SELECT bg.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             |  round(CAST(SUM(CAST(log2((b.nb + 1.0) / (c.nc + 1.0 * v.nv))
             |    AS DECIMAL(18,12))) AS DOUBLE) / COUNT(*), 6) AS avg_ll
             |FROM bg JOIN b USING (w1, w2) JOIN c USING (w1) CROSS JOIN v
             |GROUP BY bg.doc_id ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------------------------
    // ORC round-trip (sources.Sources.orc/writeOrc + `.orc` extension
    // dispatch): the second columnar format big estates carry alongside
    // parquet. The query routes lineitem parquet → ORC (zstd) → back
    // through Spark's vectorized ORC reader → aggregate; the oracle is
    // the same aggregate straight off parquet, so any round-trip value
    // or type corruption (decimal scale, date/timestamp epoch, null
    // runs) hash-mismatches. DECIMAL-routed sums per the q01 recipe so
    // the float total is addition-order-proof both sides.
    QuerySpec(
      "q146_orc_roundtrip",
      (s, dir) => {
        val dest = orcScratch(dir)
        graft.sources.Sources.writeOrc(
          Tables.lineitem(s, dir).select("l_orderkey", "l_returnflag",
            "l_quantity", "l_extendedprice"), dest)
        graft.sources.Sources.orc(s, dest)
          .groupBy("l_returnflag")
          .agg(
            sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
              .as("sum_qty"),
            sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
              .as("sum_price"),
            count(lit(1)).as("n_rows"),
            countDistinct(col("l_orderkey")).as("n_orders"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             |    AS sum_qty,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             |    AS sum_price,
             |  COUNT(*) AS n_rows,
             |  COUNT(DISTINCT l_orderkey) AS n_orders
             |FROM lineitem
             |GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin))
  )

  /** Per-JVM ORC scratch root (createTempDirectory — two concurrent
    * JVMs over the same sf dir can never collide) with a recursive
    * shutdown-hook delete; `File.deleteOnExit` would be a no-op on a
    * directory the ORC write fills with part files. Within the JVM the
    * per-sf subpath is stable, so repeated bench reps overwrite instead
    * of accumulating copies.
    */
  private lazy val orcScratchRoot: java.nio.file.Path = {
    val root = java.nio.file.Files.createTempDirectory("graft-orc-rt")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import java.nio.file.Files
      import java.util.Comparator
      try {
        Files.walk(root).sorted(Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(p => { val _ = Files.deleteIfExists(p) })
      } catch { case _: Throwable => () }
    }))
    root
  }

  private def orcScratch(dir: String): String = {
    val tag = java.lang.Integer.toHexString(dir.hashCode)
    orcScratchRoot.resolve(s"sf-$tag").toString
  }
}
