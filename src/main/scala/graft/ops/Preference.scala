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
    *   - `no_prompt`: the prompt normalizes to empty or is NULL (all
    *     such pairs share md5("") — without the flag they would be
    *     "deduped" to one promptless survivor);
    *   - `prompt_dups`: pairs sharing this prompt fingerprint (window
    *     count — >1 means the prompt repeats across pairs);
    *   - `keep`: the pair is clean (neither flag fires) and is the
    *     min-id representative among this fingerprint's CLEAN pairs —
    *     a degenerate min-id pair must not drag its whole prompt group
    *     down with it.
    *
    * Returns the SKINNY verdict frame (idCol, prompt_fp, degenerate,
    * empty_side, no_prompt, prompt_dups, keep): only these columns
    * enter the fingerprint window's shuffle — pair text never travels;
    * join verdicts back on the id to recover it.
    */
  def pairHygiene(pairs: DataFrame, idCol: String, promptCol: String,
                  chosenCol: String, rejectedCol: String): DataFrame = {
    val nc = TextOps.normalized(col(chosenCol))
    val nr = TextOps.normalized(col(rejectedCol))
    val fp = TextOps.fingerprintMd5(col(promptCol))
    val wFp = Window.partitionBy(col("prompt_fp"))
    val np = TextOps.normalized(col(promptCol))
    // flags are per-row projections computed BEFORE the fingerprint
    // window, and only the skinny (id, fp, flags) frame enters its
    // shuffle — pair text never travels (the q125 contract); callers
    // needing the text join back on the id
    val flagged = pairs.select(
      col(idCol),
      fp.as("prompt_fp"),
      (nc.isNotNull && nr.isNotNull && nc === nr).as("degenerate"),
      (col(chosenCol).isNull || col(rejectedCol).isNull ||
        nc === "" || nr === "").as("empty_side"),
      // a promptless pair is its own defect — and WITHOUT this flag
      // every empty-prompt pair in the corpus would share md5("") and
      // be "deduped" down to one survivor that then trains promptless
      (np.isNull || np === "").as("no_prompt"))
    flagged
      .withColumn("prompt_dups", count(lit(1)).over(wFp))
      .withColumn("__clean",
        !col("degenerate") && !col("empty_side") && !col("no_prompt"))
      .withColumn("__minClean",
        min(when(col("__clean"), col(idCol))).over(wFp))
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
    // totals, means and the longer-fraction run over COMPARED pairs
    // only (both sides non-NULL): mixing NULL-sided pairs into n_pairs
    // while their tokens skip the sums would deflate the means and cap
    // frac_chosen_longer — masking exactly the bias this audit detects
    val cmp = col("__tc").isNotNull && col("__tr").isNotNull
    pairs
      .select(tc.as("__tc"), tr.as("__tr"))
      .agg(
        count(lit(1)).as("n_pairs"),
        count(when(cmp, lit(1))).as("n_compared"),
        coalesce(sum(when(cmp, col("__tc"))), lit(0L)).as("chosen_tokens"),
        coalesce(sum(when(cmp, col("__tr"))), lit(0L)).as("rejected_tokens"),
        coalesce(sum(when(cmp && col("__tc") > col("__tr"), 1L)
          .otherwise(when(cmp, 0L))), lit(0L)).as("n_chosen_longer"))
      .select(col("n_pairs"), col("n_compared"), col("chosen_tokens"),
        col("rejected_tokens"), col("n_chosen_longer"),
        round(col("chosen_tokens").cast("double") / col("n_compared"), 6)
          .as("mean_chosen_tokens"),
        round(col("rejected_tokens").cast("double") / col("n_compared"), 6)
          .as("mean_rejected_tokens"),
        round(col("n_chosen_longer").cast("double") / col("n_compared"), 6)
          .as("frac_chosen_longer"))
  }
}
