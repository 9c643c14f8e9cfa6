package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType, StructField, StructType}

/** Instruction-tuning (SFT) conversation preparation: parse chat-format
  * JSON, flatten turns, render a training template, and compute the
  * assistant-span mask — the loss-masking step every SFT pipeline runs
  * (only assistant tokens carry loss; prompt tokens are context).
  *
  * Engine-extension surface like [[Html]]/[[Robots]]; everything is
  * built-ins (`from_json`, explode, one window per conversation) and
  * exact integer offsets, so whole mask layouts replay in SQL.
  */
object Chat {

  /** messages-format schema: [{"role": …, "content": …}, …] (the
    * OpenAI/HF chat-messages shape every SFT corpus uses).
    */
  val messagesSchema: ArrayType = ArrayType(StructType(Seq(
    StructField("role", StringType), StructField("content", StringType))))

  /** Parse a messages-format JSON column; malformed JSON yields NULL
    * (from_json's PERMISSIVE default), so corrupt rows are filterable
    * rather than fatal.
    */
  def parseConversation(json: Column): Column =
    from_json(json, messagesSchema)

  /** One row per turn: (keep…, turn_idx, role, content). Conversations
    * that fail to parse contribute no rows (NULL arrays do not explode).
    */
  def flattenTurns(df: DataFrame, jsonCol: String,
                   keepCols: Seq[String] = Nil): DataFrame = {
    val keep = keepCols.map(col)
    df.select(keep :+ posexplode(parseConversation(col(jsonCol)))
        .as(Seq("turn_idx", "__t")): _*)
      .select(keep ++ Seq(col("turn_idx"),
        col("__t.role").as("role"), col("__t.content").as("content")): _*)
  }

  /** The per-turn rendered template text: `<|role|>content\n`. One fixed
    * public template — the offsets below are defined against it; swap in
    * a model-specific template by mapping this column.
    */
  def renderTurn(role: Column, content: Column): Column =
    concat(lit("<|"), role, lit("|>"), content, lit("\n"))

  /** Assistant-span mask over the rendered conversation: for every turn,
    * the [start, end) character offsets of its rendered text inside the
    * full rendered conversation (cumulative-length window — ONE shuffle
    * per conversation id), plus the loss flag (role = assistant). The
    * mask an SFT tokenizer applies is exactly these spans; keeping them
    * in character space makes them tokenizer-independent and
    * SQL-replayable.
    *
    * @param turns [[flattenTurns]] output (idCol, turn_idx, role, content)
    * @return (idCol, turn_idx, role, span_start, span_end, loss) —
    *         span column names chosen to stay clear of SQL reserved
    *         words (`end`) in every replay dialect
    */
  def assistantSpans(turns: DataFrame, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("turn_idx"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    turns
      // NULL role/content coalesce to "" BEFORE rendering: a missing
      // field must contribute its rendered length (the `<|role|>\n`
      // skeleton), not a NULL that silently shifts every later span —
      // the offsets must match a renderer that coalesces the same way
      .withColumn("__len",
        length(renderTurn(coalesce(col("role"), lit("")),
          coalesce(col("content"), lit("")))).cast("long"))
      .withColumn("span_end", sum(col("__len")).over(w))
      .select(col(idCol), col("turn_idx"), col("role"),
        (col("span_end") - col("__len")).as("span_start"), col("span_end"),
        (col("role") === "assistant").as("loss"))
  }

  /** Per-conversation SFT accounting: turn counts, rendered length, and
    * the assistant (loss-carrying) share in characters and whitespace
    * tokens — the numbers a data-mixture plan budgets by. One
    * aggregation over the flattened turns.
    */
  def sftStats(turns: DataFrame, idCol: String): DataFrame = {
    val isA = col("role") === "assistant"
    val rlen = length(renderTurn(coalesce(col("role"), lit("")),
      coalesce(col("content"), lit("")))).cast("long")
    turns.groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_turns"),
        sum(isA.cast("long")).as("n_assistant_turns"),
        sum(rlen).as("rendered_chars"),
        sum(when(isA, rlen).otherwise(0L)).as("assistant_chars"),
        sum(when(isA, TextOps.tokenCount(col("content"))).otherwise(0L))
          .as("assistant_tokens"))
  }
}
