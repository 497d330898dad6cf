package graft

import graft.ops.WarcCodec
import graft.ops.WarcCodec.WarcRecord
import org.scalatest.funsuite.AnyFunSuite

/** WARC 1.0 framing (ops/WarcCodec.scala): member-per-record gzip
  * layout, CDX random access, length-delimited binary-safe blocks,
  * and loud failure on corrupt framing. */
class WarcCodecSpec extends AnyFunSuite {

  private def rec(id: Long, text: String, lang: String = "en") =
    WarcRecord("response", s"http://x.example/doc/$id", "2026-01-01T00:00:00Z",
      WarcCodec.recordId(s"doc:$id"), "application/http;msgtype=response",
      lang, WarcCodec.httpResponseBlock(text.getBytes("UTF-8"), "text/plain"))

  test("round-trip preserves every field and the exact block bytes") {
    val recs = Seq(rec(1, "hello world"), rec(2, "second doc"), rec(3, ""))
    val (gz, idx) = WarcCodec.buildWarcGz(recs)
    assert(idx.size == 3)
    val back = WarcCodec.parseWarcGz(gz)
    assert(back.size == 3)
    back.zip(recs).foreach { case (b, o) =>
      assert(b.warcType == o.warcType && b.targetUri == o.targetUri &&
        b.recordId == o.recordId && b.language == o.language)
      assert(java.util.Arrays.equals(b.block, o.block))
    }
  }

  test("each record is its OWN gzip member: any member inflates alone") {
    val recs = (0L until 5L).map(i => rec(i, s"text $i"))
    val (gz, idx) = WarcCodec.buildWarcGz(recs)
    idx.zipWithIndex.foreach { case ((off, len), i) =>
      val r = WarcCodec.readMemberAt(gz, off, len)
      assert(r.targetUri.endsWith(s"/$i"))
    }
    // members tile the file exactly: offsets are cumulative lengths
    assert(idx.map(_._2).sum == gz.length)
    assert(idx.scanLeft(0L)(_ + _._2).init == idx.map(_._1))
  }

  test("binary-safe: tabs, newlines, CRLFs and the header terminator inside a body survive") {
    // "\r\n\r\n" INSIDE the payload is the killer case for any
    // delimiter-scanning parser; Content-Length framing must not care.
    val nasty = "a\tb\nc\r\nd\r\n\r\nWARC/1.0\r\ne"
    val (gz, _) = WarcCodec.buildWarcGz(Seq(rec(7, nasty)))
    val back = WarcCodec.parseWarcGz(gz)
    assert(back.size == 1)
    val text = new String(WarcCodec.httpPayload(back.head.block), "UTF-8")
    assert(text == nasty)
  }

  test("warcinfo records coexist and carry no target URI") {
    val info = WarcRecord("warcinfo", "", "2026-01-01T00:00:00Z",
      WarcCodec.recordId("warcinfo:0"), "application/warc-fields", "",
      "software: graft-warc/1.0\r\n".getBytes("UTF-8"))
    val (gz, _) = WarcCodec.buildWarcGz(Seq(info, rec(1, "x")))
    val back = WarcCodec.parseWarcGz(gz)
    assert(back.map(_.warcType) == Seq("warcinfo", "response"))
    assert(back.head.targetUri.isEmpty)
  }

  test("WET conversion keeps URI + language, swaps type and block") {
    val r = rec(3, "the text body", lang = "fr")
    val wet = WarcCodec.toConversion(r, WarcCodec.httpPayload(r.block))
    assert(wet.warcType == "conversion" && wet.contentType == "text/plain")
    assert(wet.targetUri == r.targetUri && wet.language == "fr")
    assert(new String(wet.block, "UTF-8") == "the text body")
    assert(wet.recordId != r.recordId) // new identity, per the WET spec
  }

  test("corrupt framing fails loudly") {
    val bytes = WarcCodec.recordBytes(rec(1, "abc"))
    // break the version line
    val bad = bytes.clone(); bad(0) = 'X'
    assertThrows[IllegalArgumentException](WarcCodec.parseWarc(bad))
    // truncate the trailing record terminator
    val short = java.util.Arrays.copyOfRange(bytes, 0, bytes.length - 2)
    assertThrows[IllegalArgumentException](WarcCodec.parseWarc(short))
  }

  test("record ids are deterministic RFC-4122 v3-shaped urns") {
    val a = WarcCodec.recordId("doc:42")
    assert(a == WarcCodec.recordId("doc:42"))
    assert(a.matches("<urn:uuid:[0-9a-f]{8}-[0-9a-f]{4}-3[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}>"))
    assert(a != WarcCodec.recordId("doc:43"))
  }
}
