package graft.etl

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** File-level pre-flight checks (SURVEY.md §2.7, first table rows): the
  * reference downloads whole files into the orchestrator worker to check
  * them (`/root/reference/dataflow.py:158-186`); here the checks are
  * metadata-only Hadoop FS calls (exists, size, mtime) plus a bounded
  * head-sample UTF-8 probe — O(files), not O(bytes), so a 100 TB input
  * glob costs a listing, and full-content validation happens distributed
  * in [[Validation]] instead.
  */
object FileChecks {

  final case class FileReport(
      path: String,
      exists: Boolean,
      sizeBytes: Long,
      empty: Boolean,
      largeWarn: Boolean,   // > maxSizeBytes (reference: 100 MB warn)
      staleWarn: Boolean,   // older than maxAgeDays (reference: 7 days)
      utf8Ok: Boolean)

  final case class Summary(files: Seq[FileReport]) {
    def failed: Boolean = files.exists(f => !f.exists || f.empty || !f.utf8Ok)
    def warnings: Seq[FileReport] = files.filter(f => f.largeWarn || f.staleWarn)
    def totalBytes: Long = files.map(_.sizeBytes).sum
  }

  def check(spark: SparkSession, glob: String,
            maxSizeBytes: Long = 100L * 1024 * 1024,
            maxAgeDays: Int = 7,
            utf8SampleBytes: Int = 64 * 1024,
            nowMs: Long = System.currentTimeMillis()): Summary = {
    val path = new Path(glob)
    val fs = FileSystem.get(path.toUri, spark.sparkContext.hadoopConfiguration)
    val statuses = Option(fs.globStatus(path)).map(_.toSeq).getOrElse(Nil)
    if (statuses.isEmpty)
      return Summary(Seq(FileReport(glob, exists = false, 0L, empty = true,
        largeWarn = false, staleWarn = false, utf8Ok = false)))
    Summary(statuses.map { st =>
      val size = st.getLen
      val ageMs = nowMs - st.getModificationTime
      FileReport(
        st.getPath.toString,
        exists = true,
        sizeBytes = size,
        empty = size == 0L,
        largeWarn = size > maxSizeBytes,
        staleWarn = ageMs > maxAgeDays.toLong * 24 * 3600 * 1000,
        utf8Ok = size == 0L || utf8Head(fs, st.getPath, math.min(size, utf8SampleBytes.toLong).toInt))
    })
  }

  /** Airflow's sensor-timeout task failure (`airflow.py:51-53`). */
  final class SensorTimeoutException(msg: String) extends RuntimeException(msg)

  /** Poke-loop file sensor — parity with the reference's
    * `GCSObjectExistenceSensor(poke_interval=60, timeout=300)`
    * (`/root/reference/airflow.py:48-55`): re-check `glob` for a match every
    * `pokeIntervalMs` until one appears (returns the number of pokes) or
    * `timeoutMs` elapses (throws [[SensorTimeoutException]] — the sensor
    * timing out fails the task, as in Airflow). The clock and sleep are
    * injectable so tests can drive the loop without wall-clock sleeping.
    * Driver-side metadata polling only — no executor is occupied while
    * waiting, matching Airflow's worker-slot (non-deferrable) sensor.
    */
  def sense(spark: SparkSession, glob: String,
            pokeIntervalMs: Long = 60000L,
            timeoutMs: Long = 300000L,
            clock: () => Long = () => System.currentTimeMillis(),
            sleep: Long => Unit = Thread.sleep): Int = {
    val path = new Path(glob)
    val fs = FileSystem.get(path.toUri, spark.sparkContext.hadoopConfiguration)
    val start = clock()
    var pokes = 0
    while (true) {
      pokes += 1
      if (Option(fs.globStatus(path)).exists(_.nonEmpty)) return pokes
      if (clock() - start >= timeoutMs)
        throw new SensorTimeoutException(
          s"sensor timed out after ${timeoutMs}ms ($pokes pokes) waiting for $glob")
      sleep(pokeIntervalMs)
    }
    pokes // unreachable
  }

  /** Move processed inputs to an archive directory (the reference's
    * move-to-processed step, `README.md:67`/`:132`) — an FS rename, so on
    * object stores it must run AFTER the source checkpoint commits (the
    * streaming ingest's exactly-once guarantee does not depend on it).
    */
  def archive(spark: SparkSession, glob: String, processedDir: String): Seq[String] = {
    val path = new Path(glob)
    val fs = FileSystem.get(path.toUri, spark.sparkContext.hadoopConfiguration)
    val dest = new Path(processedDir)
    if (!fs.exists(dest)) fs.mkdirs(dest)
    Option(fs.globStatus(path)).map(_.toSeq).getOrElse(Nil).map { st =>
      val target = new Path(dest, st.getPath.getName)
      fs.rename(st.getPath, target)
      target.toString
    }
  }

  /** Strict UTF-8 decode of the first `n` bytes (truncated trailing
    * multi-byte sequences tolerated). The reference decodes ENTIRE files in
    * the worker (`dataflow.py:182-186`); a bounded head probe catches the
    * same wrong-encoding mistakes at O(1) cost.
    */
  private def utf8Head(fs: FileSystem, p: Path, n: Int): Boolean = {
    val buf = new Array[Byte](n)
    val in = fs.open(p)
    try {
      var off = 0
      while (off < n) {
        val r = in.read(buf, off, n - off)
        if (r < 0) return decodeUtf8(buf, off, trimTail = false)
        off += r
      }
      decodeUtf8(buf, off, trimTail = true)
    } finally in.close()
  }

  private def decodeUtf8(buf: Array[Byte], len: Int, trimTail: Boolean): Boolean = {
    // drop up to 3 trailing continuation/lead bytes of a cut-off sequence
    var end = len
    if (trimTail) {
      var drop = 0
      while (drop < 3 && end > 0 && (buf(end - 1) & 0xC0) == 0x80) { end -= 1; drop += 1 }
      if (end > 0 && (buf(end - 1) & 0xC0) == 0xC0) end -= 1
    }
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
    try { dec.decode(java.nio.ByteBuffer.wrap(buf, 0, end)); true }
    catch { case _: java.nio.charset.CharacterCodingException => false }
  }
}
