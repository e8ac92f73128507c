package graft.sources

import java.nio.charset.StandardCharsets.ISO_8859_1

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** WARC ingestion tier: record serialization round-trip (plain and
  * multi-member gzip), strict failure modes, header case-insensitivity,
  * HTTP envelope split, and the lenient per-file quarantine contract.
  */
class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def oneRecord(body: String = "hello world"): Array[Byte] =
    Warc.encodeWarcRecord("resource", "<urn:uuid:1>", "2026-01-01T00:00:00Z",
      Some("http://a.example/x"), "text/plain", body.getBytes(ISO_8859_1))

  test("encode→parse round-trips every field, plain and gzipped") {
    val plain = oneRecord()
    for (bytes <- Seq(plain, Warc.gzipBytes(plain))) {
      val recs = Warc.parseWarc(bytes)
      assert(recs.length == 1)
      val r = recs.head
      assert(r.warcType == "resource")
      assert(r.recordId == "<urn:uuid:1>")
      assert(r.targetUri.contains("http://a.example/x"))
      assert(r.warcDate == "2026-01-01T00:00:00Z")
      assert(r.contentType.contains("text/plain"))
      assert(new String(r.body, ISO_8859_1) == "hello world")
    }
  }

  test("multi-member gzip: each record its own member (Common Crawl layout)") {
    val a = Warc.gzipBytes(oneRecord("first"))
    val b = Warc.gzipBytes(oneRecord("second"))
    val recs = Warc.parseWarc(a ++ b)
    assert(recs.map(r => new String(r.body, ISO_8859_1)) == Seq("first", "second"))
    assert(recs.map(_.idx) == Seq(0, 1))
  }

  test("gzip member corruption is named: CRC mismatch and truncation") {
    val gz = Warc.gzipBytes(oneRecord())
    val flipped = gz.clone()
    flipped(12) = (flipped(12) ^ 0x01).toByte // inside the deflate stream
    val e1 = intercept[Exception](Warc.parseWarc(flipped))
    assert(e1.getMessage.contains("gzip"))
    val e2 = intercept[Exception](Warc.parseWarc(gz.dropRight(6)))
    assert(e2.getMessage.contains("gzip member"))
  }

  test("header names are case-insensitive; optional headers may be absent") {
    val body = "x"
    val raw = ("WARC/1.0\r\nwarc-type: metadata\r\nWARC-RECORD-ID: <id>\r\n" +
      "Warc-Date: 2026-01-02T00:00:00Z\r\ncontent-length: 1\r\n\r\n" +
      body + "\r\n\r\n").getBytes(ISO_8859_1)
    val r = Warc.parseWarc(raw).head
    assert(r.warcType == "metadata" && r.recordId == "<id>")
    assert(r.targetUri.isEmpty && r.contentType.isEmpty)
  }

  test("strict parse fails loudly: bad version, missing length, short block, missing separator") {
    val bad1 = "HARC/1.0\r\n\r\n".getBytes(ISO_8859_1)
    assert(intercept[Exception](Warc.parseWarc(bad1)).getMessage.contains("version"))
    val bad2 = ("WARC/1.0\r\nWARC-Type: a\r\nWARC-Record-ID: <i>\r\n" +
      "WARC-Date: d\r\n\r\n").getBytes(ISO_8859_1)
    assert(intercept[Exception](Warc.parseWarc(bad2)).getMessage
      .contains("content-length"))
    val bad3 = ("WARC/1.0\r\nWARC-Type: a\r\nWARC-Record-ID: <i>\r\n" +
      "WARC-Date: d\r\nContent-Length: 99\r\n\r\nshort").getBytes(ISO_8859_1)
    assert(intercept[Exception](Warc.parseWarc(bad3)).getMessage.contains("truncated"))
    val rec = oneRecord()
    val noSep = rec.dropRight(4) ++ "\r\n".getBytes(ISO_8859_1) ++ oneRecord()
    assert(intercept[Exception](Warc.parseWarc(noSep)).getMessage
      .contains("separator"))
  }

  test("EOF directly after the final content block is tolerated") {
    val r = Warc.parseWarc(oneRecord().dropRight(4)).head
    assert(new String(r.body, ISO_8859_1) == "hello world")
  }

  test("warcRecords explodes files into ordered record rows") {
    val ids = Seq((1L, 2, false), (2L, 1, true)).toDF("id", "n", "gz")
    val files = Warc.genWarcs(ids, "id", "n", "gz")
    val recs = Warc.warcRecords(files, "id", "content")
      .orderBy("id", "rec_idx").collect()
    // file 1: warcinfo + 2×(request,response) = 5; file 2: 1 + 2 = 3
    assert(recs.length == 8)
    assert(recs.map(_.getString(2)).toSeq == Seq(
      "warcinfo", "request", "response", "request", "response",
      "warcinfo", "request", "response"))
    val resp = recs(2)
    assert(resp.getString(4) == "http://site1.example/page0")
    assert(resp.getString(5) == "2026-01-02T00:02:00Z")
    assert(resp.getLong(7) == resp.getAs[Array[Byte]](8).length.toLong)
  }

  test("warcResponses splits the HTTP envelope; statuses follow the formula") {
    val ids = Seq((0L, 7, false)).toDF("id", "n", "gz")
    val out = Warc.warcResponses(Warc.genWarcs(ids, "id", "n", "gz"),
      "id", "content").orderBy("rec_idx").collect()
    assert(out.length == 7)
    // k=0: status 404 iff i % 7 == 0 → exactly page 0
    assert(out.map(_.getInt(3)).toSeq == Seq(404, 200, 200, 200, 200, 200, 200))
    assert(out.forall(_.getString(4) == "text/html; charset=utf-8"))
    assert(out.head.getString(5).contains("<p>alpha0 beta0 gamma0</p>"))
  }

  test("warcResponses body feeds htmlToText to the formula visible text") {
    val ids = Seq((3L, 2, true)).toDF("id", "n", "gz")
    val got = Warc.warcResponses(Warc.genWarcs(ids, "id", "n", "gz"),
      "id", "content")
      .select(col("rec_idx"),
        graft.functions.TextFunctions.htmlToText(col("http_body")).as("t"))
      .orderBy("rec_idx").as[(Int, String)].collect()
    assert(got.map(_._2).toSeq == Seq(
      "T3-0 alpha3 beta0 gamma21", "T3-1 alpha3 beta1 gamma22"))
  }

  test("warcRecordsLenient quarantines a bad file, passes good files' records") {
    val ids = Seq((1L, 1, false)).toDF("id", "n", "gz")
    val good = Warc.genWarcs(ids, "id", "n", "gz")
    val bad = Seq((9L, "not a warc at all".getBytes(ISO_8859_1)))
      .toDF("id", "content")
    val out = Warc.warcRecordsLenient(good.unionByName(bad), "id", "content")
    val rows = out.orderBy("id", "rec_idx").collect()
    assert(rows.count(_.getBoolean(1)) == 3) // warcinfo + request + response
    val q = rows.filter(!_.getBoolean(1))
    assert(q.length == 1 && q.head.getLong(0) == 9L)
    assert(q.head.getString(2) == "IllegalArgumentException")
    assert(q.head.isNullAt(3))
    // strict twin on the same mix fails the job
    intercept[org.apache.spark.SparkException] {
      Warc.warcRecords(good.unionByName(bad), "id", "content").collect()
    }
  }

  test("lenient good rows are bit-equal to the strict path") {
    val ids = Seq((4L, 3, true), (5L, 2, false)).toDF("id", "n", "gz")
    val files = Warc.genWarcs(ids, "id", "n", "gz")
    val strict = Warc.warcRecords(files, "id", "content")
      .orderBy("id", "rec_idx").collect().toSeq
    val lenient = Warc.warcRecordsLenient(files, "id", "content")
      .filter(col("decode_ok"))
      .drop("decode_ok", "decode_err")
      .orderBy("id", "rec_idx").collect().toSeq
    assert(strict.map(_.toSeq.map {
      case b: Array[Byte] => b.toSeq; case x => x
    }) == lenient.map(_.toSeq.map {
      case b: Array[Byte] => b.toSeq; case x => x
    }))
  }
}
