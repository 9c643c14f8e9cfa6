package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: fuse a lexical (BM25) ranking and an embedding
  * (cosine) ranking of the same corpus with Reciprocal Rank Fusion
  * (Cormack, Clarke & Buettcher, SIGIR 2009) — the standard score-free
  * combiner behind most production "hybrid search" stacks (a document's
  * fused score is Σ 1/(K + rank_r) over the rankings r that retrieved it).
  *
  * Determinism spellings (the oracle compares value hashes):
  *   - both input rankings order by their ROUNDED score (6 dp — the
  *     engine's cross-engine double boundary, q90/q104 precedent) with
  *     id ascending on ties, so ranks replay exactly in SQL;
  *   - the RRF term is computed in SCALED INTEGER arithmetic:
  *     `SCALE div (K + rank)` with SCALE = 10^12 — integer division is
  *     bit-identical on every engine, so the fused score needs no float
  *     tolerance at all.
  *
  * Scale shape: each ranking reduces to its top `topN` with
  * `orderBy.limit` — per-partition top-k + driver merge
  * (TakeOrderedAndProject), never a global sort of the corpus. Only the
  * two ≤topN-row lists are ranked (the rank window runs on a
  * limit-bounded frame) and outer-joined; the corpus itself is scanned
  * once per ranking. At 100 TB the expensive parts are the two scoring
  * scans, which are the already-certified q104/q28 plan shapes.
  */
object Retrieval {

  /** 1/(K+rank) in scaled integers: bit-exact on any engine. */
  private val RrfScale = 1000000000000L

  /** Rank a scored frame's top `topN`: highest `scoreCol` first, `idCol`
    * ascending on ties. The window is single-partition BY CONSTRUCTION on a
    * ≤topN-row frame (the limit runs before it) — bounded, not a scale
    * smell; the [[graft.functions.BoundedKey]] partition key documents that
    * and keeps the WindowExec warning for real smells.
    */
  private def topRanked(scored: DataFrame, idCol: String, scoreCol: String,
                        topN: Int): DataFrame = {
    val top = scored.orderBy(col(scoreCol).desc, col(idCol)).limit(topN)
    top.withColumn("rank",
      row_number().over(Window
        .partitionBy(graft.functions.ArrayMath.boundedKey(top))
        .orderBy(col(scoreCol).desc, col(idCol))))
  }

  /** Fuse a BM25 ranking of `docs` (for `queryTerms`) with a cosine
    * ranking of `embeddings` (against the stored vector `queryVecId`) —
    * the id spaces must be aligned (`doc_id` = `vec_id`, as in the
    * documents/embeddings fixture pair).
    *
    * @return (doc_id, lex_rank, emb_rank, rrf_scaled) ordered by fused
    *         score descending (ties: doc_id); ranks are null for a
    *         document the respective ranking did not retrieve.
    */
  def hybridRrf(docs: DataFrame, docIdCol: String, textCol: String,
                queryTerms: Seq[String],
                embeddings: DataFrame, vecIdCol: String, vecCol: String,
                queryVecId: Long, topN: Int = 50, rrfK: Int = 60): DataFrame = {
    require(topN >= 1, "topN must be at least 1")
    require(rrfK >= 0, "rrfK must be non-negative")
    val lex = topRanked(
      TextOps.bm25Scores(docs, docIdCol, textCol, queryTerms),
      docIdCol, "score", topN)
      .select(col(docIdCol).as("doc_id"), col("rank").as("lex_rank"))

    // query vector: one stored embedding, fetched via a 1-row broadcast
    // (never a driver-side vector literal — the plan stays serializable
    // however wide the embedding is)
    val query = broadcast(
      embeddings.filter(col(vecIdCol) === queryVecId)
        .select(col(vecCol).as("__qv")).limit(1))
    val scored = embeddings.crossJoin(query)
      .filter(col(vecIdCol) =!= queryVecId) // the query is not a result
      .select(col(vecIdCol).as("doc_id"),
        round(Similarity.cosine(col(vecCol), col("__qv")), 6).as("cosine"))
    val emb = topRanked(scored, "doc_id", "cosine", topN)
      .select(col("doc_id"), col("rank").as("emb_rank"))

    lex.join(emb, Seq("doc_id"), "full_outer")
      .withColumn("rrf_scaled",
        (coalesce(expr(s"$RrfScale div ($rrfK + lex_rank)"), lit(0L))
          + coalesce(expr(s"$RrfScale div ($rrfK + emb_rank)"), lit(0L))))
      .select(col("doc_id"), col("lex_rank"), col("emb_rank"), col("rrf_scaled"))
      .orderBy(col("rrf_scaled").desc, col("doc_id"))
  }

  /** NDCG@k per query (Järvelin & Kekäläinen, TOIS 2002 — the graded
    * ranking-quality standard): DCG = Σ_{i≤k} (2^rel − 1)/log2(i+1)
    * over the SYSTEM order, normalized by the ideal (relevance-sorted)
    * DCG. Both orders carry an explicit doc tiebreak — (score DESC,
    * doc) and (rel DESC, doc) — so tied scores cannot make the metric
    * run-dependent, and each per-position gain is an engine-identical
    * double cast to DECIMAL(18,12) before the order-independent sum
    * (the q106 discipline applied to log2 discounts).
    *
    * Scale shape: two query-partitioned rank windows + one aggregation
    * — per-query candidate lists are the frame, never the corpus.
    *
    * → (queryCol, dcg, idcg, ndcg) — ndcg NULL when the query has no
    *   relevant result (IDCG 0).
    */
  def ndcgAtK(results: DataFrame, queryCol: String, docCol: String,
              scoreCol: String, relCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val W = org.apache.spark.sql.expressions.Window
    val base = results.select(col(queryCol), col(docCol).as("__doc"),
        col(scoreCol).as("__score"), col(relCol).cast("long").as("__rel"))
      .filter(col("__rel").isNotNull)
    val sysW = W.partitionBy(col(queryCol))
      .orderBy(col("__score").desc, col("__doc"))
    val idealW = W.partitionBy(col(queryCol))
      .orderBy(col("__rel").desc, col("__doc"))
    def gain(rank: Column) =
      ((pow(lit(2.0), col("__rel").cast("double")) - lit(1.0)) /
        (log(rank.cast("double") + lit(1.0)) / log(lit(2.0))))
        .cast("decimal(18,12)")
    base
      .withColumn("__sr", row_number().over(sysW))
      .withColumn("__ir", row_number().over(idealW))
      .withColumn("__g", when(col("__sr") <= k, gain(col("__sr"))))
      .withColumn("__ig", when(col("__ir") <= k, gain(col("__ir"))))
      .groupBy(col(queryCol))
      .agg(sum(col("__g")).as("__dcg"), sum(col("__ig")).as("__idcg"))
      .select(col(queryCol),
        coalesce(col("__dcg").cast("string").cast("double"), lit(0.0))
          .as("dcg"),
        coalesce(col("__idcg").cast("string").cast("double"), lit(0.0))
          .as("idcg"),
        when(coalesce(col("__idcg").cast("string").cast("double"),
          lit(0.0)) > 0,
          col("__dcg").cast("string").cast("double") /
            col("__idcg").cast("string").cast("double")).as("ndcg"))
  }

  /** Maximal Marginal Relevance diversification (Carbonell & Goldstein,
    * SIGIR 1998) — the standard redundancy-aware re-ranker over a
    * retrieved candidate list: greedily pick, k times per query,
    *
    *   argmax over remaining candidates of
    *     λ·relevance − (1−λ)·max cosine to the already-selected set
    *
    * so near-duplicate hits stop crowding out coverage — the serving-
    * side complement of the SemDeDup/near-dup corpus lanes. λ arrives
    * as the exact rational lambdaNum/lambdaDen; the pick compares the
    * ROUNDED (6 dp) score with ties toward the smaller id — the
    * [[hybridRrf]] cross-engine rank discipline — so an engine
    * replaying the same cosines replays every pick. Round 1 has an
    * empty selected set: pure relevance.
    *
    * Scale shape: candidates arrive PRE-CUT (top-N per query — the
    * [[topRanked]]/ANN serving shapes), so every round works on the
    * bounded candidates×selected plane: one join keyed on the query +
    * one per-query window, k ≤ 16 rounds, per-round localCheckpoint.
    * Nothing corpus-scale moves.
    *
    * → (queryCol, rank 1..k, idCol, mmr_score) — fewer than k rows per
    *   query when candidates run out.
    */
  def mmrSelect(cands: DataFrame, queryCol: String, idCol: String,
                relCol: String, vecCol: String, k: Int,
                lambdaNum: Int = 1, lambdaDen: Int = 2): DataFrame = {
    require(k >= 1 && k <= 16, s"k must be in [1,16], got $k")
    require(lambdaDen > 0 && lambdaNum >= 0 && lambdaNum <= lambdaDen,
      s"lambda must be in [0,1], got $lambdaNum/$lambdaDen")
    val lam = lambdaNum.toDouble / lambdaDen
    val oneMinus = (lambdaDen - lambdaNum).toDouble / lambdaDen
    val base = cands.select(col(queryCol).as("__q"), col(idCol).as("__id"),
        col(relCol).cast("double").as("__rel"),
        Similarity.asDouble(col(vecCol)).as("__v"))
      .filter(col("__v").isNotNull)
      .localCheckpoint() // bounded candidate plane, reused every round
    val wPick = Window.partitionBy(col("__q"))
      .orderBy(col("__score").desc, col("__id"))
    var selected: DataFrame = null
    for (r <- 1 to k) {
      val rem =
        if (r == 1) base
        else base.join(selected.select(col("__q"), col("__id")),
          Seq("__q", "__id"), "left_anti")
      val scored =
        if (r == 1) rem.withColumn("__mx", lit(0.0))
        else {
          val mx = rem
            .join(selected.select(col("__q"), col("__v").as("__sv")),
              Seq("__q"))
            .select(col("__q"), col("__id"),
              Similarity.cosine(col("__v"), col("__sv")).as("__c"))
            .groupBy(col("__q"), col("__id")).agg(max(col("__c")).as("__mx"))
          rem.join(mx, Seq("__q", "__id"), "left")
            .withColumn("__mx", coalesce(col("__mx"), lit(0.0)))
        }
      val pick = scored
        .withColumn("__score",
          round(lit(lam) * col("__rel") - lit(oneMinus) * col("__mx"), 6))
        .withColumn("__rn", row_number().over(wPick))
        .filter(col("__rn") === 1)
        .select(col("__q"), col("__id"), col("__v"), lit(r).as("rank"),
          col("__score"))
        .localCheckpoint() // plan depth stays O(1) per round
      selected = if (r == 1) pick else selected.unionByName(pick)
    }
    selected.select(col("__q").as(queryCol), col("rank"),
      col("__id").as(idCol), col("__score").as("mmr_score"))
  }
}
