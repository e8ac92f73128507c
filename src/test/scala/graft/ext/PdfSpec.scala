package graft.ext

import java.nio.charset.StandardCharsets.ISO_8859_1

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PDF text-extraction tier: object/stream walk, FlateDecode, the
  * content-stream tokenizer (escapes, hex strings, TJ arrays, newline
  * operators), fixture round-trips, and the lenient quarantine contract.
  */
class PdfSpec extends SparkSpec {
  import spark.implicits._

  test("encode→extract round-trips fixture pages, plain and FlateDecode") {
    for (flate <- Seq(false, true)) {
      val pdf = Pdf.encodePdf(Seq(Pdf.fixturePage(7L, 0), Pdf.fixturePage(7L, 1),
        Pdf.fixturePage(7L, 2)), flate)
      val texts = Pdf.contentStreams(pdf).map(Pdf.streamText(_))
      assert(texts == Seq(
        "Doc 7 page 0\nalpha(91) beta",
        "Doc 7 page 1\nalpha(92) beta",
        "Doc 7 page 2\nalpha(93) beta"))
    }
  }

  test("literal-string escapes: named, octal, nested parens, line continuation") {
    val content = "BT (a\\(b\\)c \\\\ \\101\\12 (nested) d) Tj ET"
    val pdf = Pdf.encodePdf(Seq(content), flate = false)
    assert(Pdf.contentStreams(pdf).map(Pdf.streamText(_)) ==
      Seq("a(b)c \\ A\n (nested) d"))
    // backslash-EOL is a line continuation: the break vanishes
    val cont = "BT (one\\\ntwo) Tj ET"
    val pdf2 = Pdf.encodePdf(Seq(cont), flate = false)
    assert(Pdf.contentStreams(pdf2).map(Pdf.streamText(_)) == Seq("onetwo"))
  }

  test("hex strings decode, odd length zero-padded; whitespace inside ignored") {
    val content = "BT <48 656C6C 6F> Tj <7> Tj ET" // "Hello" then 0x70='p'
    val pdf = Pdf.encodePdf(Seq(content), flate = false)
    assert(Pdf.contentStreams(pdf).map(Pdf.streamText(_)) == Seq("Hellop"))
  }

  test("TJ kerning numbers are ignored; quote operators imply a line break") {
    val content = "BT [(ab) -250 (cd) 40 (ef)] TJ (gh) ' (ij) \" ET"
    val pdf = Pdf.encodePdf(Seq(content), flate = false)
    assert(Pdf.contentStreams(pdf).map(Pdf.streamText(_)) == Seq("abcdef\ngh\nij"))
  }

  test("Td/TD/T* emit newlines; leading break suppressed, runs collapse") {
    val content = "BT 72 720 Td (l1) Tj T* T* (l2) Tj 0 -14 TD (l3) Tj ET"
    val pdf = Pdf.encodePdf(Seq(content), flate = false)
    assert(Pdf.contentStreams(pdf).map(Pdf.streamText(_)) == Seq("l1\nl2\nl3"))
  }

  test("strict failures are named: not a PDF, unsupported filter, corrupt deflate") {
    assert(intercept[Exception](
      Pdf.contentStreams("hello world".getBytes(ISO_8859_1)))
      .getMessage.contains("not a PDF"))
    val dct = ("%PDF-1.4\n1 0 obj << /Length 3 /Filter /DCTDecode >>\n" +
      "stream\nabc\nendstream endobj\n").getBytes(ISO_8859_1)
    assert(intercept[Exception](Pdf.contentStreams(dct))
      .getMessage.contains("unsupported filter"))
    val good = Pdf.encodePdf(Seq(Pdf.fixturePage(1L, 0)), flate = true)
    val corrupt = good.clone()
    val streamAt = {
      var i = 0
      while (!(corrupt(i) == 's' && new String(corrupt, i, 7, ISO_8859_1) == "stream\n")) i += 1
      i + 10
    }
    corrupt(streamAt) = (corrupt(streamAt) ^ 0x55).toByte
    val e = intercept[Exception](
      Pdf.contentStreams(corrupt).map(Pdf.streamText(_)))
    assert(e.getMessage.contains("FlateDecode"))
  }

  test("indirect /Length N G R falls back to the endstream scan") {
    // "/Length 12 0 R": regex backtracking could shorten the digit run to
    // "1" and read the stream as 1 byte — the \b-pinned pattern must
    // reject ANY "N G R" reference and scan for endstream instead
    val pdf = ("%PDF-1.4\n1 0 obj << /Length 12 0 R >>\n" +
      "stream\nBT (ok) Tj ET\nendstream endobj\n" +
      "12 0 obj 14 endobj\n").getBytes(ISO_8859_1)
    assert(Pdf.contentStreams(pdf).map(Pdf.streamText(_)) == Seq("ok"))
    // non-zero object numbers too (the old lookahead only excluded "0 R")
    val pdf2 = ("%PDF-1.4\n1 0 obj << /Length 7 3 R >>\n" +
      "stream\nBT (yes) Tj ET\nendstream endobj\n").getBytes(ISO_8859_1)
    assert(Pdf.contentStreams(pdf2).map(Pdf.streamText(_)) == Seq("yes"))
    // a direct length is still honored exactly
    val direct = ("%PDF-1.4\n1 0 obj << /Length 15 >>\n" +
      "stream\nBT (dl) Tj ET\nendstream endobj\n").getBytes(ISO_8859_1)
    assert(Pdf.contentStreams(direct).map(Pdf.streamText(_)) == Seq("dl"))
  }

  test("pdfText explodes docs into per-stream rows with version") {
    val ids = Seq((2L, 3, true), (3L, 2, false)).toDF("id", "n", "flate")
    val out = Pdf.pdfText(Pdf.genPdfs(ids, "id", "n", "flate"), "id", "content")
      .orderBy("id", "stream_idx").collect()
    assert(out.length == 5)
    assert(out.forall(_.getString(2) == "1.4"))
    assert(out.head.getString(3) == "Doc 2 page 0\nalpha(26) beta")
    assert(out.map(r => (r.getLong(0), r.getInt(1))).toSeq ==
      Seq((2L, 0), (2L, 1), (2L, 2), (3L, 0), (3L, 1)))
  }

  test("pdfTextLenient quarantines garbage, good rows bit-equal strict") {
    val ids = Seq((1L, 2, true)).toDF("id", "n", "flate")
    val good = Pdf.genPdfs(ids, "id", "n", "flate")
    val bad = Seq((9L, "not a pdf".getBytes(ISO_8859_1))).toDF("id", "content")
    val mixed = good.unionByName(bad)
    val out = Pdf.pdfTextLenient(mixed, "id", "content")
      .orderBy("id", "stream_idx").collect()
    assert(out.count(_.getBoolean(1)) == 2)
    val q = out.filter(!_.getBoolean(1))
    assert(q.length == 1 && q.head.getLong(0) == 9L &&
      q.head.getString(2) == "IllegalArgumentException")
    val strict = Pdf.pdfText(good, "id", "content")
      .orderBy("id", "stream_idx").collect().toSeq
    val lenientGood = Pdf.pdfTextLenient(good, "id", "content")
      .filter(col("decode_ok")).drop("decode_ok", "decode_err")
      .orderBy("id", "stream_idx").collect().toSeq
    assert(strict.map(_.toSeq) == lenientGood.map(_.toSeq))
    intercept[org.apache.spark.SparkException] {
      Pdf.pdfText(mixed, "id", "content").collect()
    }
  }

  test("extracted text flows into the text tier (token counts)") {
    val ids = Seq((5L, 3, false)).toDF("id", "n", "flate")
    val toks = Pdf.pdfText(Pdf.genPdfs(ids, "id", "n", "flate"), "id", "content")
      .select(graft.functions.TextFunctions.tokenCount(col("text")).as("tc"))
      .as[Long].collect()
    assert(toks.toSeq == Seq(6L, 6L, 6L)) // "Doc 5 page i" + "alpha(m) beta"
  }

  test("parseToUnicodeCMap: codespace width, bfchar, scalar + array bfrange") {
    val cmap =
      """1 begincodespacerange
        |<0000> <FFFF>
        |endcodespacerange
        |2 beginbfchar
        |<0020> <0020>
        |<0041> <00E9>
        |endbfchar
        |2 beginbfrange
        |<0100> <0102> <0390>
        |<0200> <0201> [<05D0> <05D105D2>]
        |endbfrange""".stripMargin
    val m = Pdf.parseToUnicodeCMap(cmap.getBytes(ISO_8859_1))
    assert(m.codeBytes == 2)
    assert(m.map(0x20) == " " && m.map(0x41) == "é")
    // scalar range: the destination's last UTF-16 unit increments
    assert(m.map(0x100) == "ΐ" && m.map(0x101) == "Α" &&
      m.map(0x102) == "Β")
    // array range: one destination per code, multi-char strings allowed
    assert(m.map(0x200) == "א" && m.map(0x201) == "בג")
    assert(!m.map.contains(0x103))
    // width falls back to the first source token when codespace is absent
    val one = Pdf.parseToUnicodeCMap(
      "1 beginbfchar\n<61> <0041>\nendbfchar".getBytes(ISO_8859_1))
    assert(one.codeBytes == 1 && one.map(0x61) == "A")
  }

  test("ToUnicode fonts decode hex show strings; unmapped codes → U+FFFD") {
    for (flate <- Seq(false, true)) {
      val pdf = Pdf.encodePdfCmap(
        Seq(Pdf.fixturePageUnicode(7L, 0)), Pdf.FixtureCMap, flate)
      val texts = Pdf.pdfText(
        Seq((1L, pdf)).toDF("id", "content"), "id", "content")
        .select("text").as[String].collect().toSeq
      val greek = (0 until 13).map { j =>
        if (j == 6) ' ' else (0x390 + ((7 * 13 + j * 3) % 64)).toChar
      }.mkString
      assert(texts == Seq(s"Doc 7 page 0:\n$greek"))
    }
    // a code outside every bfchar/bfrange decodes to the replacement char
    val pdf = Pdf.encodePdfCmap(
      Seq("BT /F2 12 Tf <0EEE0100> Tj ET"), Pdf.FixtureCMap, flate = false)
    val got = Pdf.pdfText(Seq((1L, pdf)).toDF("id", "content"),
      "id", "content").select("text").as[String].head()
    assert(got == "�ΐ")
  }

  test("fonts WITHOUT ToUnicode keep the Latin-1 read; F1/F2 mix per Tf") {
    // the same show syntax through F1 (no CMap) reads Latin-1, through F2
    // as 2-byte glyph codes — the Tf state machine switches mid-stream
    val pdf = Pdf.encodePdfCmap(
      Seq("BT /F1 12 Tf (AB) Tj /F2 12 Tf <01000101> Tj /F1 9 Tf (C) Tj ET"),
      Pdf.FixtureCMap, flate = false)
    val got = Pdf.pdfText(Seq((1L, pdf)).toDF("id", "content"),
      "id", "content").select("text").as[String].head()
    assert(got == "ABΐΑC")
  }

  test("ObjStm-packed page/font dicts resolve CMaps like top-level ones") {
    for (flate <- Seq(false, true)) {
      val packed = Pdf.encodePdfObjStm(
        Seq(Pdf.fixturePageUnicode(7L, 0), Pdf.fixturePageUnicode(7L, 1)),
        Pdf.FixtureCMap, flate)
      // the packed objects parse out of the ObjStm by number
      val objs = Pdf.objStmObjects(packed)
      assert(objs.size == 4) // 2 page dicts + 2 font dicts
      assert(objs.values.count(_.contains("/Type /Page")) == 2)
      assert(objs.values.exists(_.contains("/ToUnicode")))
      // and extraction lands on EXACTLY the top-level layout's text
      val flat = Pdf.encodePdfCmap(
        Seq(Pdf.fixturePageUnicode(7L, 0), Pdf.fixturePageUnicode(7L, 1)),
        Pdf.FixtureCMap, flate)
      def texts(pdf: Array[Byte]) = Pdf.pdfText(
        Seq((1L, pdf)).toDF("id", "content"), "id", "content")
        .select("stream_idx", "text").as[(Int, String)]
        .collect().sortBy(_._1).toSeq
      assert(texts(packed) == texts(flat))
      assert(texts(packed).head._2.startsWith("Doc 7 page 0:\n"))
    }
    // a raw-scan-only reader would fall back to mojibake: prove the greek
    // line actually contains non-Latin codepoints (the scan found the CMap)
    val t = Pdf.pdfText(Seq((1L, Pdf.encodePdfObjStm(
      Seq(Pdf.fixturePageUnicode(3L, 0)), Pdf.FixtureCMap, flate = true)))
      .toDF("id", "content"), "id", "content")
      .select("text").as[String].head()
    assert(t.exists(c => c >= 0x390 && c < 0x3D0))
  }

  test("strict/lenient parity on CMap fixtures; corrupt CMap quarantines") {
    val good = Pdf.encodePdfCmap(Seq(Pdf.fixturePageUnicode(3L, 0),
      Pdf.fixturePageUnicode(3L, 1)), Pdf.FixtureCMap, flate = true)
    // corrupt the CMap stream's deflate bytes: its object is emitted last,
    // so target the final " >>\nstream\n" keyword's data
    val bad = good.clone()
    val streamPos =
      new String(bad, ISO_8859_1).lastIndexOf(" >>\nstream\n") + 12
    (0 until 8).foreach(i => bad(streamPos + i) = 0x7f)
    val df = Seq((1L, good), (2L, bad)).toDF("id", "content")
    val strict = Pdf.pdfText(df.filter($"id" === 1L), "id", "content")
      .select("stream_idx", "text").as[(Int, String)].collect().sortBy(_._1)
    val lenient = Pdf.pdfTextLenient(df, "id", "content")
    val lenGood = lenient.filter($"id" === 1L && $"decode_ok")
      .select("stream_idx", "text").as[(Int, String)].collect().sortBy(_._1)
    assert(strict.toSeq == lenGood.toSeq && strict.length == 2)
    val q = lenient.filter($"id" === 2L)
      .select("decode_ok", "decode_err").as[(Boolean, String)].collect().toSeq
    assert(q.length == 1 && !q.head._1 && q.head._2.nonEmpty)
    intercept[Exception] { Pdf.pdfText(df, "id", "content").collect() }
  }
}
