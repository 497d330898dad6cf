package graft.ops

/** WARC 1.0 (ISO 28500) reader/writer — the container format web-scale
  * pretraining corpora actually arrive in (Common Crawl ships WARC
  * response captures and WET text conversions; reference coverage:
  * Doris ingests such corpora through its load pipeline, see SURVEY §3.2).
  *
  * Everything here is byte-level against the public spec, JDK-only:
  *
  *  - A record is `WARC/1.0 CRLF` + named header fields + CRLF CRLF +
  *    a Content-Length-delimited block + CRLF CRLF.
  *  - A `.warc.gz` file is NOT one gzip stream: each record is its own
  *    gzip MEMBER and the members are concatenated. That framing is
  *    what makes 100 TB of WARC seekable — a CDX index row carries
  *    (file, member offset, member length) and a reader inflates just
  *    that slice. `buildWarcGz` returns the member index alongside the
  *    bytes, `readMemberAt` is the CDX random-access path, and
  *    `parseWarcGz` is the full sequential scan (GZIPInputStream
  *    concatenated-member semantics, then record framing).
  *
  * The synthetic writers are scaffolding (a corpus landing job would
  * receive real crawler output); the parsers are the product path and
  * run one decoder per partition inside mapPartitions — no shuffle.
  */
object WarcCodec {

  final case class WarcRecord(
      warcType: String,
      targetUri: String,
      date: String,
      recordId: String,
      contentType: String,
      language: String, // WARC-Identified-Content-Language (WET field)
      block: Array[Byte])

  private val Crlf = "\r\n"

  /** Deterministic urn:uuid from a seed (real writers use random UUIDs;
    * determinism keeps the round-trip oracle closed-form). */
  def recordId(seed: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5").digest(
      seed.getBytes("UTF-8"))
    // RFC 4122 name-based form: set version 3 + variant bits
    md(6) = ((md(6) & 0x0f) | 0x30).toByte
    md(8) = ((md(8) & 0x3f) | 0x80).toByte
    val hex = md.map(b => f"${b & 0xff}%02x").mkString
    s"<urn:uuid:${hex.substring(0, 8)}-${hex.substring(8, 12)}-" +
      s"${hex.substring(12, 16)}-${hex.substring(16, 20)}-${hex.substring(20)}>"
  }

  def recordBytes(r: WarcRecord): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("WARC/1.0").append(Crlf)
    sb.append("WARC-Type: ").append(r.warcType).append(Crlf)
    sb.append("WARC-Record-ID: ").append(r.recordId).append(Crlf)
    sb.append("WARC-Date: ").append(r.date).append(Crlf)
    if (r.targetUri.nonEmpty)
      sb.append("WARC-Target-URI: ").append(r.targetUri).append(Crlf)
    if (r.language.nonEmpty)
      sb.append("WARC-Identified-Content-Language: ").append(r.language).append(Crlf)
    sb.append("Content-Type: ").append(r.contentType).append(Crlf)
    sb.append("Content-Length: ").append(r.block.length).append(Crlf)
    sb.append(Crlf)
    val head = sb.toString.getBytes("UTF-8")
    val out = new java.io.ByteArrayOutputStream(head.length + r.block.length + 4)
    out.write(head)
    out.write(r.block)
    out.write(Crlf.getBytes("UTF-8"))
    out.write(Crlf.getBytes("UTF-8"))
    out.toByteArray
  }

  /** One gzip member per record, concatenated; returns the bytes plus
    * the (offset, length) member index — the CDX seek table. */
  def buildWarcGz(records: Seq[WarcRecord]): (Array[Byte], Seq[(Long, Long)]) = {
    val out = new java.io.ByteArrayOutputStream()
    val idx = Seq.newBuilder[(Long, Long)]
    records.foreach { r =>
      val member = MultimodalOps.gzipRaw(recordBytes(r))
      idx += ((out.size.toLong, member.length.toLong))
      out.write(member)
    }
    (out.toByteArray, idx.result())
  }

  /** Parse an UNCOMPRESSED warc stream: walk record frames, verifying
    * the version line and the Content-Length framing exactly. */
  def parseWarc(bytes: Array[Byte]): Seq[WarcRecord] = {
    val res = Seq.newBuilder[WarcRecord]
    var off = 0
    while (off < bytes.length) {
      // header block ends at the first CRLF CRLF
      val headEnd = indexOf(bytes, off, "\r\n\r\n".getBytes("US-ASCII"))
      require(headEnd >= 0, s"unterminated WARC header at offset $off")
      val head = new String(bytes, off, headEnd - off, "UTF-8")
      val lines = head.split("\r\n")
      require(lines.head == "WARC/1.0",
        s"bad WARC version line at offset $off: '${lines.head}'")
      val fields = lines.tail.map { l =>
        val i = l.indexOf(':')
        require(i > 0, s"malformed WARC header field: '$l'")
        l.substring(0, i) -> l.substring(i + 1).trim
      }.toMap
      val len = fields("Content-Length").toInt
      val blockStart = headEnd + 4
      require(blockStart + len + 4 <= bytes.length,
        s"truncated WARC block at offset $off")
      val block = java.util.Arrays.copyOfRange(bytes, blockStart, blockStart + len)
      require(bytes(blockStart + len) == '\r' && bytes(blockStart + len + 1) == '\n'
        && bytes(blockStart + len + 2) == '\r' && bytes(blockStart + len + 3) == '\n',
        s"missing record terminator at offset ${blockStart + len}")
      res += WarcRecord(
        fields.getOrElse("WARC-Type", ""),
        fields.getOrElse("WARC-Target-URI", ""),
        fields.getOrElse("WARC-Date", ""),
        fields.getOrElse("WARC-Record-ID", ""),
        fields.getOrElse("Content-Type", ""),
        fields.getOrElse("WARC-Identified-Content-Language", ""),
        block)
      off = blockStart + len + 4
    }
    res.result()
  }

  /** Sequential scan of a .warc.gz: concatenated gzip members inflate
    * as one stream (RFC 1952 multi-member semantics — GZIPInputStream
    * handles the member chain), then record framing applies. */
  def parseWarcGz(gz: Array[Byte]): Seq[WarcRecord] =
    parseWarc(MultimodalOps.gunzipRaw(gz))

  /** CDX random access: inflate ONE member given its (offset, length)
    * slice — the only bytes a seek-read touches. */
  def readMemberAt(gz: Array[Byte], offset: Long, length: Long): WarcRecord = {
    val slice = java.util.Arrays.copyOfRange(
      gz, offset.toInt, (offset + length).toInt)
    val recs = parseWarc(MultimodalOps.gunzipRaw(slice))
    require(recs.size == 1, s"member at $offset holds ${recs.size} records")
    recs.head
  }

  /** Build an HTTP response block (what a `response` record stores). */
  def httpResponseBlock(payload: Array[Byte], mime: String): Array[Byte] = {
    val head = ("HTTP/1.1 200 OK" + Crlf +
      s"Content-Type: $mime" + Crlf +
      s"Content-Length: ${payload.length}" + Crlf + Crlf).getBytes("UTF-8")
    val out = new java.io.ByteArrayOutputStream(head.length + payload.length)
    out.write(head); out.write(payload)
    out.toByteArray
  }

  /** Split an HTTP message block into (headers, payload). */
  def httpPayload(block: Array[Byte]): Array[Byte] = {
    val sep = indexOf(block, 0, "\r\n\r\n".getBytes("US-ASCII"))
    require(sep >= 0, "no HTTP header/payload separator")
    java.util.Arrays.copyOfRange(block, sep + 4, block.length)
  }

  /** WET conversion: a response record's extracted-text twin (what
    * Common Crawl's WET generator emits — WARC-Type: conversion, plain
    * text block, the identified language carried in the header). */
  def toConversion(r: WarcRecord, text: Array[Byte]): WarcRecord =
    r.copy(warcType = "conversion", contentType = "text/plain",
      recordId = recordId(r.recordId + ":wet"), block = text)

  private def indexOf(hay: Array[Byte], from: Int, needle: Array[Byte]): Int = {
    var i = from
    val last = hay.length - needle.length
    while (i <= last) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }
}
