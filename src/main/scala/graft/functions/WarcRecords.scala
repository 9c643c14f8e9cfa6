package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WARC record walking — the Common-Crawl ingest grammar (ISO 28500 /
  * the WARC 1.x specification; WET "conversion" records are the
  * standard text lane LLM pretraining pipelines start from): a WARC
  * file is a concatenation of records, each a version line + CRLF
  * header block + an EXACTLY Content-Length-byte payload + a CRLFCRLF
  * record separator. Content-Length framing means payloads may contain
  * anything — including text that LOOKS like a record header — without
  * confusing the walk (spec-pinned in OpsSpec). Reference behavior:
  * `/root/reference` reads line-oriented CSV/JSON only (`dataflow.py`);
  * north-star extension surface.
  *
  * Strictness (NULL on violation, never a guess): version line must be
  * `WARC/1.0` or `WARC/1.1`; every header line must contain a colon;
  * `Content-Length` is mandatory, digits only, and the payload must be
  * exactly that many BYTES (multi-byte UTF-8 counts bytes, not chars);
  * each record must close with CRLFCRLF; records tile the buffer
  * exactly (trailing junk rejects); at least one record.
  */
object WarcKernel {

  private val CRLF = Array[Byte]('\r', '\n')

  def isWarc(b: Array[Byte]): Boolean =
    b != null && b.length >= 10 &&
      b(0) == 'W' && b(1) == 'A' && b(2) == 'R' && b(3) == 'C' &&
      b(4) == '/' && b(5) == '1' && b(6) == '.' &&
      (b(7) == '0' || b(7) == '1') && b(8) == '\r' && b(9) == '\n'

  /** Find CRLF starting at or after `from`; -1 when absent. */
  private def findCrlf(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 1 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n') return i
      i += 1
    }
    -1
  }

  /** Strict record walk: array<struct<warc_type,record_id,target_uri,
    * warc_date,content_length,payload>>, null on any grammar violation.
    * Headers the struct doesn't carry are validated (colon grammar) and
    * skipped; absent optional headers surface as null fields.
    */
  def parse(b: Array[Byte]): GenericArrayData = {
    if (!isWarc(b)) return null
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var pos = 0
    while (pos < b.length) {
      // version line
      val vEnd = findCrlf(b, pos)
      if (vEnd < 0) return null
      val version = new String(b, pos, vEnd - pos,
        java.nio.charset.StandardCharsets.US_ASCII)
      if (version != "WARC/1.0" && version != "WARC/1.1") return null
      pos = vEnd + 2
      // header block until the empty line
      var warcType: String = null
      var recordId: String = null
      var uri: String = null
      var date: String = null
      var contentLength = -1L
      var closed = false
      while (!closed) {
        val hEnd = findCrlf(b, pos)
        if (hEnd < 0) return null
        if (hEnd == pos) { closed = true; pos += 2 }
        else {
          val line = new String(b, pos, hEnd - pos,
            java.nio.charset.StandardCharsets.UTF_8)
          val colon = line.indexOf(':')
          if (colon <= 0) return null // header without a colon is corrupt
          val name = line.substring(0, colon).trim
          val value = line.substring(colon + 1).trim
          name.toLowerCase(java.util.Locale.ROOT) match {
            case "warc-type" => warcType = value
            case "warc-record-id" => recordId = value
            case "warc-target-uri" => uri = value
            case "warc-date" => date = value
            case "content-length" =>
              // ASCII digits ONLY — Char.isDigit accepts Unicode digit
              // classes (e.g. Arabic-Indic), which toLong would parse;
              // that would accept a corrupt record instead of rejecting
              if (!value.nonEmpty ||
                !value.forall(c => c >= '0' && c <= '9') ||
                value.length > 15) return null
              contentLength = value.toLong
            case _ => () // spec-sanctioned: other headers pass through
          }
          pos = hEnd + 2
        }
      }
      if (contentLength < 0 || warcType == null) return null
      if (pos + contentLength + 4 > b.length) return null // truncated payload
      val payloadEnd = pos + contentLength.toInt
      // record separator: exactly CRLFCRLF after the payload
      if (b(payloadEnd) != '\r' || b(payloadEnd + 1) != '\n' ||
        b(payloadEnd + 2) != '\r' || b(payloadEnd + 3) != '\n') return null
      val payload = java.util.Arrays.copyOfRange(b, pos, payloadEnd)
      out += new GenericInternalRow(Array[Any](
        UTF8String.fromString(warcType),
        if (recordId == null) null else UTF8String.fromString(recordId),
        if (uri == null) null else UTF8String.fromString(uri),
        if (date == null) null else UTF8String.fromString(date),
        contentLength,
        payload)) // BINARY: 'response' records carry gzip/image bodies —
                  // a StringType here would mangle them; WET text lanes
                  // cast to string downstream
      pos = payloadEnd + 4
    }
    if (out.isEmpty) return null
    new GenericArrayData(out.toArray[Any])
  }

  /** One WET-style "conversion" record with a byte-exact Content-Length
    * — the fixture/export side of [[parse]]. Record id derives from the
    * URI (`urn:graft:<uri>`) so an oracle replays it without state.
    */
  def encodeRecord(uri: String, date: String, payload: String): Array[Byte] = {
    // header-injection guard: a CR/LF inside a header VALUE would splice
    // arbitrary headers into the record (or fail its own round trip)
    require(!uri.exists(c => c == '\r' || c == '\n'),
      "uri must not contain CR/LF")
    require(!date.exists(c => c == '\r' || c == '\n'),
      "date must not contain CR/LF")
    val body = payload.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val header = new StringBuilder()
      .append("WARC/1.0\r\n")
      .append("WARC-Type: conversion\r\n")
      .append("WARC-Record-ID: urn:graft:").append(uri).append("\r\n")
      .append("WARC-Target-URI: ").append(uri).append("\r\n")
      .append("WARC-Date: ").append(date).append("\r\n")
      .append("Content-Length: ").append(body.length).append("\r\n")
      .append("\r\n")
      .toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new Array[Byte](header.length + body.length + 4)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(body, 0, out, header.length, body.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  val recordType: StructType = StructType(Seq(
    StructField("warc_type", StringType, nullable = false),
    StructField("record_id", StringType, nullable = true),
    StructField("target_uri", StringType, nullable = true),
    StructField("warc_date", StringType, nullable = true),
    StructField("content_length", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))
}

/** binary → array<struct<warc_type,record_id,target_uri,warc_date,
  * content_length,payload>> via [[WarcKernel.parse]]'s strict walk;
  * NULL on any grammar violation. Corpus-scale: codegen'd
  * static-kernel call, O(bytes) with no allocation beyond the records.
  */
case class WarcParse(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${t.catalogString}")
  }

  override def nullable: Boolean = true

  override def dataType: DataType =
    ArrayType(WarcKernel.recordType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    WarcKernel.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.WarcKernel.parse($c);
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "warc_parse"
}

/** (uri, date, payload) → one byte-exact WET conversion record
  * ([[WarcKernel.encodeRecord]]); fixture/export side, CodegenFallback.
  */
case class WarcRecordBytes(first: Expression, second: Expression,
                           third: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(first, second, third)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == StringType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires 3 string args (uri, date, payload)")

  override def nullable: Boolean = children.exists(_.nullable)
  override def dataType: DataType = BinaryType

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) null
    else WarcKernel.encodeRecord(
      vs(0).asInstanceOf[UTF8String].toString,
      vs(1).asInstanceOf[UTF8String].toString,
      vs(2).asInstanceOf[UTF8String].toString)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(first = newChildren(0), second = newChildren(1),
      third = newChildren(2))

  override def prettyName: String = "warc_record_bytes"
}
