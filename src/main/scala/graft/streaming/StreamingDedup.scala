package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import scala.concurrent.duration.Duration

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

  /** Native bounded-state dedup (Spark 3.5+ `dropDuplicatesWithinWatermark`):
    * unlike plain `dropDuplicates`, the state store evicts a fingerprint
    * once the watermark passes its first arrival + delay even though the
    * event-time column is NOT part of the dedup key — the missing piece
    * that makes watermark-bounded content dedup actually bounded. Any two
    * docs with equal fingerprints arriving within the delay of each other
    * dedup exactly; re-arrivals beyond the horizon re-emit (the same trade
    * [[firstSeen]]'s TTL flavor makes, but with event-time semantics and
    * stock state cleanup).
    */
  def withinWatermark(docs: DataFrame, textCol: String, tsCol: String,
                      delay: String = "1 hour"): DataFrame =
    docs.withColumn("__fp", TextOps.fingerprintMd5(col(textCol)))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")

  final case class Doc(doc_id: Long, fp: String, text: String)
  final case class SeenState(firstDocId: Long, nDuplicates: Long)
  final case class FirstSeen(doc_id: Long, fp: String, duplicateOfFirst: Boolean)

  /** Session configs that switch the state store to RocksDB — the backend
    * for corpus-sized keyed state. The default HDFSBackedStateStoreProvider
    * keeps EVERY version of EVERY key on the executor heap; RocksDB keeps
    * state off-heap/on-disk with changelog checkpointing, so state size is
    * bounded by local disk, not executor memory. Apply before starting the
    * query: `rocksDbStateStore.foreach { case (k, v) => spark.conf.set(k, v) }`.
    */
  val rocksDbStateStore: Map[String, String] = Map(
    "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    // replay small changelogs instead of uploading full snapshots per batch
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> "true")

  /** First-seen dedup with explicit keyed state. Emits one row per incoming
    * doc, flagged; downstream keeps `!duplicateOfFirst`.
    *
    * State-growth contract: state is one ~24-byte record per DISTINCT
    * fingerprint ever seen, so it grows with corpus vocabulary, not traffic.
    *   - `ttl = None` (default): exact first-seen semantics forever —
    *     state is unbounded by design. Run this flavor on the RocksDB
    *     backend ([[rocksDbStateStore]]) so "unbounded" means local disk,
    *     not executor heap.
    *   - `ttl = Some(d)`: a processing-time TTL bounds state to
    *     fingerprints active within the last `d`. A fingerprint idle longer
    *     than `d` is evicted, and a LATER re-arrival of the same content is
    *     re-emitted as first-seen — the deliberate trade for bounded state
    *     (the same horizon trade `withinStreamExact` makes via watermark).
    *     Run TTL queries with a real trigger interval (or AvailableNow):
    *     processing-time timeouts make Spark schedule no-data micro-batches
    *     continuously, so the default 0 ms trigger busy-loops the cluster.
    */
  def firstSeen(spark: SparkSession, docs: DataFrame,
                idCol: String, textCol: String,
                ttl: Option[Duration] = None): Dataset[FirstSeen] = {
    import spark.implicits._
    val timeoutConf =
      if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    docs.select(col(idCol).as("doc_id"),
        TextOps.fingerprintMd5(col(textCol)).as("fp"),
        col(textCol).as("text"))
      .as[Doc]
      .groupByKey(_.fp)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        (fp: String, batch: Iterator[Doc], state: GroupState[SeenState]) => {
          if (state.hasTimedOut) { // TTL expired with no new arrivals: evict
            state.remove()
            Iterator.empty
          } else {
            val docsSorted = batch.toSeq.sortBy(_.doc_id)
            val out = state.getOption match {
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
            ttl.foreach(d => state.setTimeoutDuration(d.toMillis))
            out
          }
        })
  }
}
