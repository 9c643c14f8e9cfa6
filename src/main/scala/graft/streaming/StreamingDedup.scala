package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.TextOps

/** Streaming deduplication: exactly-once-BY-CONTENT across micro-batches.
  *
  * Two layers, composable:
  *   1. `withinStreamExact` — Spark's built-in `dropDuplicates` on the
  *      content fingerprint with a watermark bound on state (stock, for
  *      when late duplicates beyond the horizon are acceptable);
  *   2. `firstSeen` — keyed state via flatMapGroupsWithState: emits only
  *      the FIRST document per fingerprint ever seen by the query,
  *      regardless of arrival time. State is one tiny record per distinct
  *      fingerprint — the shape that scales to corpus-sized streams (state
  *      grows with DISTINCT content, not with traffic).
  */
object StreamingDedup {

  /** Built-in: drop in-stream duplicates by fingerprint, state bounded by
    * the event-time watermark.
    */
  def withinStreamExact(docs: DataFrame, textCol: String, tsCol: String,
                        watermark: String = "1 hour"): DataFrame =
    docs.withColumn("__fp", TextOps.fingerprintMd5(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicates("__fp")
      .drop("__fp")

  final case class Doc(doc_id: Long, fp: String, text: String)
  final case class SeenState(firstDocId: Long, nDuplicates: Long)
  final case class FirstSeen(doc_id: Long, fp: String, duplicateOfFirst: Boolean)

  /** Unbounded first-seen dedup with explicit keyed state. Emits one row
    * per incoming doc, flagged; downstream keeps `!duplicateOfFirst`.
    */
  def firstSeen(spark: SparkSession, docs: DataFrame,
                idCol: String, textCol: String): Dataset[FirstSeen] = {
    import spark.implicits._
    docs.select(col(idCol).as("doc_id"),
        TextOps.fingerprintMd5(col(textCol)).as("fp"),
        col(textCol).as("text"))
      .as[Doc]
      .groupByKey(_.fp)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (fp: String, batch: Iterator[Doc], state: GroupState[SeenState]) => {
          val docsSorted = batch.toSeq.sortBy(_.doc_id)
          state.getOption match {
            case Some(s) =>
              state.update(SeenState(s.firstDocId, s.nDuplicates + docsSorted.size))
              docsSorted.iterator.map(d => FirstSeen(d.doc_id, fp, duplicateOfFirst = true))
            case None =>
              docsSorted.headOption match {
                case None => Iterator.empty
                case Some(first) =>
                  state.update(SeenState(first.doc_id, docsSorted.size - 1L))
                  Iterator(FirstSeen(first.doc_id, fp, duplicateOfFirst = false)) ++
                    docsSorted.tail.iterator.map(d =>
                      FirstSeen(d.doc_id, fp, duplicateOfFirst = true))
              }
          }
        })
  }
}
