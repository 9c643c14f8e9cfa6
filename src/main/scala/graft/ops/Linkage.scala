package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity resolution / record linkage: blocked fuzzy matching — the
  * dedup step master-data and customer pipelines run where keys don't
  * line up. The classic two-phase shape (Fellegi–Sunter practice):
  * a cheap BLOCKING key bounds the candidate space (never an all-pairs
  * cross join — the quadratic melt at 100 TB), then the expensive
  * similarity kernel verifies only within blocks.
  */
object Linkage {

  /** Blocked fuzzy name matching between two frames: candidates pair
    * within equal blocking-key values (a structured field — country,
    * zip, birth year — never the noisy name itself), verified by the
    * codegen'd Jaro-Winkler kernel
    * ([[graft.functions.JaroWinklerSim]]) at `minSim`, with
    * Levenshtein distance carried for diagnostics (Spark built-in,
    * the same classic DP as every other engine).
    *
    * Blocking trades recall for scale by construction: records whose
    * blocking key itself is wrong escape their block — union several
    * blocking passes when that matters.
    *
    * → (id_a, name_a, id_b, name_b, jw, lev); jw rounded to 6 decimals
    *   BEFORE the threshold (cross-engine last-ulp discipline)
    */
  def blockedNameMatch(a: DataFrame, idColA: String, nameColA: String,
                       blockColA: String,
                       b: DataFrame, idColB: String, nameColB: String,
                       blockColB: String,
                       minSim: Double): DataFrame = {
    require(minSim >= 0.0 && minSim <= 1.0, "minSim in [0,1]")
    val l = a.select(col(idColA).as("id_a"), col(nameColA).as("name_a"),
      col(blockColA).as("__blk"))
    val r = b.select(col(idColB).as("id_b"), col(nameColB).as("name_b"),
      col(blockColB).as("__blk"))
    l.join(r, "__blk")
      .withColumn("jw", round(graft.functions.ArrayMath.jaroWinkler(
        col("name_a"), col("name_b")), 6))
      .filter(col("jw") >= minSim)
      .select(col("id_a"), col("name_a"), col("id_b"), col("name_b"),
        col("jw"),
        levenshtein(col("name_a"), col("name_b")).cast("long").as("lev"))
  }

  /** Sorted-neighborhood candidate generation (Hernández & Stolfo,
    * SIGMOD 1995 — the OTHER classic blocking family: sort by a key,
    * pair records within a sliding window of `window` positions;
    * catches near-miss keys that equality blocking separates). The two
    * scale problems both solved structurally:
    *
    *   - the GLOBAL SORT RANK comes from [[ScaleOps.contiguousIds]]'
    *     range-partition + per-partition-offset recipe — identical to
    *     a single-task row_number for unique (key, id) but never
    *     funneling the corpus through one task;
    *   - the WINDOWED PAIRING is banded: each record lands in blocks
    *     rank div w and rank div w + 1, so every pair within w−1
    *     positions shares a block (same block, or the straddling pair
    *     meets in the overlap copy) and the join is keyed, never a
    *     cartesian sweep. Duplicated meetings collapse via distinct.
    *
    * Like all blocking this trades recall for scale: records sorting
    * far apart escape the window — run multiple passes with different
    * keys (the multi-pass SNM of the paper) and union the candidates.
    *
    * → (id_a, key_a, id_b, key_b), id ordering by rank (a before b)
    */
  def sortedNeighborhoodPairs(df: DataFrame, idCol: String, keyCol: String,
                              window: Int,
                              numPartitions: Int = 8): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    val ranked = ScaleOps.contiguousIds(
      df.select(col(idCol), col(keyCol))
        .filter(col(idCol).isNotNull && col(keyCol).isNotNull),
      Seq(keyCol, idCol), numPartitions, idName = "__rank")
    val b0 = ranked.withColumn("__blk", expr(s"__rank div $window"))
    val b1 = ranked.withColumn("__blk", expr(s"__rank div $window + 1"))
    val banded = b0.unionByName(b1)
    banded.alias("x").join(banded.alias("y"),
        col("x.__blk") === col("y.__blk") &&
          col("y.__rank") > col("x.__rank") &&
          col("y.__rank") - col("x.__rank") < window)
      .select(col(s"x.$idCol").as("id_a"), col(s"x.$keyCol").as("key_a"),
        col(s"y.$idCol").as("id_b"), col(s"y.$keyCol").as("key_b"))
      .distinct()
  }
}
