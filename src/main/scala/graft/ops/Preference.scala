package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Preference-pair (DPO/RLHF) data hygiene: the checks a reward-model /
  * preference-optimization pipeline runs before training — degenerate
  * pairs, duplicated prompts, and the length-bias audit (reward models
  * notoriously learn "longer is better" when the chosen side skews
  * long; Singhal et al. 2023). Completes the post-training plane next
  * to [[Chat]].
  *
  * All projections + one window on the prompt fingerprint + one
  * aggregation — nothing leaves the engine, everything SQL-replayable.
  */
object Preference {

  /** Per-pair hygiene verdicts:
    *   - `prompt_fp`: md5 of the whitespace/case-normalized prompt
    *     (the [[TextOps.fingerprintMd5]] spelling) — the dedup/leakage
    *     join key;
    *   - `degenerate`: chosen and rejected normalize to the SAME text —
    *     zero preference signal (NULL-safe: a NULL side is not equal);
    *   - `empty_side`: either side normalizes to empty or is NULL;
    *   - `prompt_dups`: pairs sharing this prompt fingerprint (window
    *     count — >1 means the prompt repeats across pairs);
    *   - `keep`: the pair is clean (neither flag fires) and is the
    *     min-id representative among this fingerprint's CLEAN pairs —
    *     a degenerate min-id pair must not drag its whole prompt group
    *     down with it.
    */
  def pairHygiene(pairs: DataFrame, idCol: String, promptCol: String,
                  chosenCol: String, rejectedCol: String): DataFrame = {
    val nc = TextOps.normalized(col(chosenCol))
    val nr = TextOps.normalized(col(rejectedCol))
    val fp = TextOps.fingerprintMd5(col(promptCol))
    val wFp = Window.partitionBy(col("prompt_fp"))
    val enriched = pairs
      .withColumn("prompt_fp", fp)
      .withColumn("degenerate", nc.isNotNull && nr.isNotNull && nc === nr)
      .withColumn("empty_side",
        col(chosenCol).isNull || col(rejectedCol).isNull ||
          nc === "" || nr === "")
      .withColumn("prompt_dups", count(lit(1)).over(wFp))
      .withColumn("__clean", !col("degenerate") && !col("empty_side"))
      .withColumn("__minClean",
        min(when(col("__clean"), col(idCol))).over(wFp))
    enriched
      .withColumn("keep",
        col("__clean") && col(idCol) === col("__minClean"))
      .drop("__clean", "__minClean")
  }

  /** Corpus-level length-bias audit: exact token totals per side, the
    * count of pairs whose chosen side is strictly longer, and the mean
    * lengths (6-dp rounded — replayable). A `frac_chosen_longer` far
    * from 0.5 is the classic length-hacking signature.
    */
  def lengthBias(pairs: DataFrame, chosenCol: String,
                 rejectedCol: String): DataFrame = {
    val tc = TextOps.tokenCount(col(chosenCol))
    val tr = TextOps.tokenCount(col(rejectedCol))
    pairs
      .select(tc.as("__tc"), tr.as("__tr"))
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(col("__tc")).as("chosen_tokens"),
        sum(col("__tr")).as("rejected_tokens"),
        sum((col("__tc") > col("__tr")).cast("long")).as("n_chosen_longer"))
      .select(col("n_pairs"), col("chosen_tokens"), col("rejected_tokens"),
        col("n_chosen_longer"),
        round(col("chosen_tokens").cast("double") / col("n_pairs"), 6)
          .as("mean_chosen_tokens"),
        round(col("rejected_tokens").cast("double") / col("n_pairs"), 6)
          .as("mean_rejected_tokens"),
        round(col("n_chosen_longer").cast("double") / col("n_pairs"), 6)
          .as("frac_chosen_longer"))
  }
}
