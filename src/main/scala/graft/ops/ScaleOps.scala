package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale utilities: the partitioning/bucketing/skew patterns that make the
  * engine's joins hold up at 100 TB (SURVEY.md §4.3; north-star mandate).
  */
object ScaleOps {

  /** Write a table bucketed (and sorted) by the join key. Two tables
    * bucketed the same way join WITHOUT a shuffle exchange on either side —
    * the physical plan co-locates by bucket id. This is the preparation
    * step for any fact-to-fact join that repeats across workloads: pay the
    * shuffle once at write time, never at query time.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Salted join for a skewed LEFT key: the left side gets a random salt in
    * [0, salts), the right side is replicated once per salt value, and the
    * join key becomes (key, salt) — a hot key's rows spread over `salts`
    * partitions instead of one straggler task. AQE's skew-join handles
    * moderate skew automatically; explicit salting is for the pathological
    * key whose single value exceeds an executor.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salts: Int = 8, joinType: String = "inner"): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      (abs(hash(monotonically_increasing_id())) % salts).cast("int"))
    val saltedRight = right.withColumn("__salt",
      explode(typedLit((0 until salts).toList)))
    saltedLeft.join(saltedRight, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Range-repartition + sort-within-partitions by a time/sequence column
    * before a partitioned write: downstream scans of one partition read
    * locally sorted data (min/max pruning inside files is tight).
    */
  def writeTimePartitioned(df: DataFrame, path: String, partitionCol: String,
                           sortCol: String, targetPartitions: Int): Unit =
    df.repartitionByRange(targetPartitions, col(partitionCol))
      .sortWithinPartitions(col(partitionCol), col(sortCol))
      .write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCol)
      .parquet(path)

  /** SCD1 merge (MERGE INTO … WHEN MATCHED UPDATE, WHEN NOT MATCHED
    * INSERT, for whole rows): updates win on key collision, unmatched base
    * rows survive, unmatched updates insert. One left-anti join — when the
    * update batch is small relative to the base (the overwhelmingly common
    * incremental case) AQE broadcasts it, so the 100 TB base is scanned
    * once with NO base-side shuffle; the alternative full-outer-join
    * formulation shuffles BOTH sides on the key.
    */
  def upsert(base: DataFrame, updates: DataFrame, keyCols: Seq[String]): DataFrame =
    base.join(updates.select(keyCols.map(col): _*), keyCols, "left_anti")
      .unionByName(updates)

  /** Contiguous global ids 0..n-1 in sort-key order WITHOUT the global-sort
    * bottleneck: a `row_number() OVER (ORDER BY …)` window funnels 100 TB
    * through ONE task; this instead range-repartitions (each partition owns
    * a disjoint key range), sorts locally, and lets zipWithIndex assign
    * offsets — one lightweight count job (per-partition counts to the
    * driver, a few longs) plus one map pass. For UNIQUE sort keys the
    * assignment is identical to the single-task window on any cluster
    * layout, because the global order is fully determined by the keys.
    */
  def contiguousIds(df: DataFrame, sortCols: Seq[String],
                    numPartitions: Int, idName: String = "global_id"): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.LongType
    val arranged = df
      .repartitionByRange(numPartitions, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
    val schema = arranged.schema.add(idName, LongType, nullable = false)
    val withId = arranged.rdd.zipWithIndex().map { case (row, idx) =>
      Row.fromSeq(row.toSeq :+ idx)
    }
    arranged.sparkSession.createDataFrame(withId, schema)
  }
}
