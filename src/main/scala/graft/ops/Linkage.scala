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
}
