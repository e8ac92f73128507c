package graft.ext

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.ISO_8859_1
import java.util.zip.{Deflater, Inflater}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** PDF text extraction — the remaining big crawl modality after
  * HTML/image/audio/video: a large share of the high-quality document web
  * (papers, reports, books) arrives as PDF, and a training-data pipeline
  * that cannot read it loses that slice entirely. The reference ingests
  * documents one fetch at a time (`src/Sources/Http.php:27-38` download
  * mode) and leaves parsing to per-format transforms; this tier is the
  * PDF analogue of `ext/Media`'s codec tier — pure JDK (the only
  * decompressor needed for the dominant stream filter, FlateDecode, is
  * `java.util.zip.Inflater`), per-row, shuffle-free.
  *
  * What it implements (all public format, ISO 32000):
  *  - object walk: `N G obj … endobj` scanned in file order (no xref
  *    needed for extraction — robust to linearized files and mild damage);
  *  - stream objects: dict `/Length` honored when direct, `endstream`
  *    scan as fallback; `/Filter /FlateDecode` inflated, no filter passed
  *    through, any other filter is an explicit unsupported-failure;
  *  - content-stream text: a real tokenizer over the operator syntax —
  *    literal strings with the full escape set (`\( \) \\ \n \r \t \b \f`,
  *    octal `\ddd`, line continuation), nested unescaped parens, hex
  *    strings (odd length zero-padded), arrays — feeding the show
  *    operators `Tj`, `TJ` (kerning numbers ignored), `'` and `"` (which
  *    imply a line break), with `Td`/`TD`/`T*` emitting newlines.
  *
  * Documented boundary: bytes in strings are decoded as Latin-1, which is
  * exact for the standard-encoding standard-14-font PDFs this targets;
  * font-specific CMaps (Identity-H CJK etc.) are out of scope — a row
  * whose text needs them extracts with wrong glyph bytes, the same
  * boundary every lightweight extractor (pdftotext -raw) draws.
  *
  * Scale: one input row = one PDF, one output row per content stream
  * (≈ page), no shuffle — embarrassingly parallel over a 100 TB crawl,
  * with [[pdfTextLenient]] quarantining undecodable files in place.
  */
object Pdf {

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new ByteArrayOutputStream(data.length * 4)
    val buf = new Array[Byte](1 << 16)
    while (!inf.finished()) {
      val n =
        try inf.inflate(buf)
        catch {
          case e: java.util.zip.DataFormatException =>
            throw new IllegalArgumentException(
              s"FlateDecode: corrupt deflate stream (${e.getMessage})")
        }
      if (n > 0) out.write(buf, 0, n)
      else {
        require(inf.finished() || !inf.needsInput(),
          "FlateDecode: truncated deflate stream")
        require(!inf.needsDictionary(),
          "FlateDecode: preset dictionary unsupported")
      }
    }
    inf.end()
    out.toByteArray
  }

  private def indexOf(hay: Array[Byte], needle: String, from: Int): Int = {
    val n = needle.getBytes(ISO_8859_1)
    var i = from
    val last = hay.length - n.length
    while (i <= last) {
      var j = 0
      while (j < n.length && hay(i + j) == n(j)) j += 1
      if (j == n.length) return i
      i += 1
    }
    -1
  }

  /** Decoded content streams of a PDF, in file order: scan for
    * `stream` keywords, read the governing dict (nearest preceding
    * `<<`…`>>`), cut the data by direct `/Length` when present (falling
    * back to an `endstream` scan), and apply the filter. Strict: a
    * non-Flate filter or corrupt deflate data throws with the stream's
    * byte offset.
    */
  private[ext] def contentStreams(bytes: Array[Byte]): Seq[Array[Byte]] = {
    require(bytes != null, "null payload")
    require(bytes.length >= 8 &&
      new String(bytes, 0, 5, ISO_8859_1) == "%PDF-",
      "not a PDF: missing %PDF- header")
    val out = Seq.newBuilder[Array[Byte]]
    var p = 0
    var done = false
    while (!done) {
      val s = indexOf(bytes, "stream", p)
      if (s < 0) done = true
      else if (s + 6 <= bytes.length &&
        // reject "endstream" matches: require non-letter before
        (s == 0 || !Character.isLetter((bytes(s - 1) & 0xff).toChar))) {
        // dict governing this stream: nearest preceding "<<" … the text
        // between it and the keyword (nested dicts don't occur in content
        // stream dicts; a Resources dict lives on the page object instead)
        val dictStart = {
          var q = s - 1; var found = -1
          while (found < 0 && q > 0) {
            if (bytes(q - 1) == '<' && bytes(q) == '<') found = q - 1
            q -= 1
          }
          require(found >= 0, s"stream at byte $s: no governing dictionary")
          found
        }
        val dict = new String(bytes, dictStart, s - dictStart, ISO_8859_1)
        val filterIdx = dict.indexOf("/Filter")
        val flate = dict.contains("/FlateDecode")
        require(filterIdx < 0 || flate,
          s"stream at byte $s: unsupported filter in $dict")
        // data starts after the keyword's EOL (CRLF or LF per spec)
        var d = s + 6
        if (d < bytes.length && bytes(d) == '\r') d += 1
        if (d < bytes.length && bytes(d) == '\n') d += 1
        val lenRe = "/Length\\s+(\\d+)(?!\\s+0\\s+R)".r
        val end = lenRe.findFirstMatchIn(dict) match {
          case Some(m) => d + m.group(1).toInt
          case None =>
            val e = indexOf(bytes, "endstream", d)
            require(e >= 0, s"stream at byte $s: no endstream")
            // strip the EOL preceding the keyword
            var e2 = e
            if (e2 > d && bytes(e2 - 1) == '\n') e2 -= 1
            if (e2 > d && bytes(e2 - 1) == '\r') e2 -= 1
            e2
        }
        require(end <= bytes.length, s"stream at byte $s: declared /Length " +
          s"overruns the file (${end - bytes.length} bytes short)")
        val data = java.util.Arrays.copyOfRange(bytes, d, end)
        out += (if (flate) inflate(data) else data)
        p = end
      } else p = s + 6
    }
    out.result()
  }

  /** Text of one decoded content stream: tokenizes strings/arrays/
    * operators and assembles show-text in reading order. Newlines come
    * from `Td`/`TD`/`T*` and the implicit line break of `'`/`"`;
    * consecutive line breaks collapse and a leading break is suppressed,
    * so the result is exactly the lines a viewer paints, joined by \n.
    */
  private[ext] def streamText(data: Array[Byte]): String = {
    val sb = new StringBuilder
    var pendingNl = false
    def emit(s: String): Unit = {
      if (s.nonEmpty || sb.nonEmpty) {
        if (pendingNl && sb.nonEmpty) sb.append('\n')
        pendingNl = false
        sb.append(s)
      }
    }
    var lastStr: String = null
    var arrayBuf: StringBuilder = null
    var i = 0
    val n = data.length
    def isDelim(c: Char): Boolean =
      c.isWhitespace || "()<>[]{}/%".indexOf(c) >= 0
    while (i < n) {
      val c = (data(i) & 0xff).toChar
      if (c.isWhitespace) i += 1
      else if (c == '%') { // comment to EOL
        while (i < n && data(i) != '\n' && data(i) != '\r') i += 1
      } else if (c == '(') {
        val s = new StringBuilder
        var depth = 1
        i += 1
        while (depth > 0) {
          require(i < n, "unterminated literal string")
          val ch = (data(i) & 0xff).toChar
          if (ch == '\\') {
            require(i + 1 < n, "dangling escape at end of stream")
            val e = (data(i + 1) & 0xff).toChar
            e match {
              case 'n' => s.append('\n'); i += 2
              case 'r' => s.append('\r'); i += 2
              case 't' => s.append('\t'); i += 2
              case 'b' => s.append('\b'); i += 2
              case 'f' => s.append('\f'); i += 2
              case '(' | ')' | '\\' => s.append(e); i += 2
              case '\r' => // line continuation (swallow optional LF)
                i += 2; if (i < n && data(i) == '\n') i += 1
              case '\n' => i += 2
              case d if d >= '0' && d <= '7' =>
                var v = 0; var k = 0; i += 1
                while (k < 3 && i < n && data(i) >= '0' && data(i) <= '7') {
                  v = v * 8 + (data(i) - '0'); i += 1; k += 1
                }
                s.append((v & 0xff).toChar)
              case other => s.append(other); i += 2 // spec: ignore backslash
            }
          } else if (ch == '(') { depth += 1; s.append(ch); i += 1 }
          else if (ch == ')') {
            depth -= 1; if (depth > 0) s.append(ch); i += 1
          } else { s.append(ch); i += 1 }
        }
        lastStr = s.toString
        if (arrayBuf != null) arrayBuf.append(lastStr)
      } else if (c == '<' && i + 1 < n && data(i + 1) == '<') {
        i += 2 // dict open — inline dicts (BDC properties) carry no text
      } else if (c == '>' && i + 1 < n && data(i + 1) == '>') {
        i += 2
      } else if (c == '<') { // hex string
        val e = { val k = indexOf(data, ">", i + 1)
          require(k >= 0, "unterminated hex string"); k }
        val hex = new String(data, i + 1, e - i - 1, ISO_8859_1)
          .filterNot(_.isWhitespace)
        val padded = if (hex.length % 2 == 0) hex else hex + "0"
        val s = new StringBuilder
        var k = 0
        while (k < padded.length) {
          s.append(Integer.parseInt(padded.substring(k, k + 2), 16).toChar)
          k += 2
        }
        lastStr = s.toString
        if (arrayBuf != null) arrayBuf.append(lastStr)
        i = e + 1
      } else if (c == '[') { arrayBuf = new StringBuilder; i += 1 }
      else if (c == ']') { lastStr = arrayBuf.toString; arrayBuf = null; i += 1 }
      else if (c == '/') { // name
        i += 1; while (i < n && !isDelim((data(i) & 0xff).toChar)) i += 1
      } else if (c.isDigit || c == '+' || c == '-' || c == '.') { // number
        i += 1; while (i < n && !isDelim((data(i) & 0xff).toChar)) i += 1
      } else { // operator
        val start = i
        while (i < n && !isDelim((data(i) & 0xff).toChar)) i += 1
        new String(data, start, i - start, ISO_8859_1) match {
          case "Tj" | "TJ" => emit(lastStr)
          case "'" => pendingNl = true; emit(lastStr)
          case "\"" => pendingNl = true; emit(lastStr)
          case "Td" | "TD" | "T*" => pendingNl = true
          case _ => // Tf, Tm, BT, ET, graphics ops — no text effect
        }
      }
    }
    sb.toString
  }

  private def versionOf(bytes: Array[Byte]): String = {
    var e = 5
    while (e < bytes.length && bytes(e) != '\n' && bytes(e) != '\r') e += 1
    new String(bytes, 5, e - 5, ISO_8859_1)
  }

  /** Extract page text: one output row per content stream that shows any
    * text — (idCol, stream_idx, pdf_version, text), file order. Strict
    * ([[pdfTextLenient]] is the dirty-crawl twin).
    */
  def pdfText(df: DataFrame, idCol: String, contentCol: String): DataFrame = {
    val spark = df.sparkSession
    val in = df.select(col(idCol), col(contentCol))
    val outSchema = StructType(Seq(in.schema.head,
      StructField("stream_idx", IntegerType, nullable = false),
      StructField("pdf_version", StringType, nullable = false),
      StructField("text", StringType, nullable = false)))
    spark.createDataFrame(in.rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](1)
        val texts = contentStreams(bytes).map(streamText).filter(_.nonEmpty)
        val ver = versionOf(bytes)
        texts.zipWithIndex.map { case (t, idx) => Row(r.get(0), idx, ver, t) }
      }
    }, outSchema)
  }

  /** [[pdfText]] for DIRTY corpora: a file that fails (not a PDF,
    * unsupported filter, corrupt deflate) quarantines as ONE row with
    * the failure class instead of failing the job — the
    * `Media.decodeImageMetaLenient` contract.
    */
  def pdfTextLenient(df: DataFrame, idCol: String, contentCol: String): DataFrame = {
    val spark = df.sparkSession
    val in = df.select(col(idCol), col(contentCol))
    val outSchema = StructType(Seq(in.schema.head,
      StructField("decode_ok", BooleanType, nullable = false),
      StructField("decode_err", StringType, nullable = true),
      StructField("stream_idx", IntegerType, nullable = true),
      StructField("pdf_version", StringType, nullable = true),
      StructField("text", StringType, nullable = true)))
    spark.createDataFrame(in.rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        try {
          val bytes = r.getAs[Array[Byte]](1)
          val texts = contentStreams(bytes).map(streamText).filter(_.nonEmpty)
          val ver = versionOf(bytes)
          texts.zipWithIndex.map { case (t, idx) =>
            Row(r.get(0), true, null, idx, ver, t) }
        } catch {
          case e: Exception =>
            Seq(Row(r.get(0), false, e.getClass.getSimpleName,
              null, null, null))
        }
      }
    }, outSchema)
  }

  // ---- fixture generation (encode side) ----------------------------------

  /** Serialize a complete single-font PDF — catalog, page tree, one
    * content stream per page, a real xref table with byte offsets and a
    * trailer (external tools can open these). Each page's content is the
    * caller's raw operator text, optionally FlateDecode-compressed.
    */
  def encodePdf(pageContents: Seq[String], flate: Boolean): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val offsets = scala.collection.mutable.ArrayBuffer[Int]()
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    def obj(body: => Unit): Unit = {
      offsets += out.size()
      val num = offsets.length
      w(s"$num 0 obj\n"); body; w("endobj\n")
    }
    val nPages = pageContents.length
    val fontObj = 3 + 2 * nPages
    w("%PDF-1.4\n")
    obj { w("<< /Type /Catalog /Pages 2 0 R >>\n") }
    obj {
      val kids = (0 until nPages).map(p => s"${3 + 2 * p} 0 R").mkString(" ")
      w(s"<< /Type /Pages /Kids [$kids] /Count $nPages >>\n")
    }
    pageContents.zipWithIndex.foreach { case (content, p) =>
      obj {
        w(s"<< /Type /Page /Parent 2 0 R /Contents ${4 + 2 * p} 0 R " +
          s"/MediaBox [0 0 612 792] " +
          s"/Resources << /Font << /F1 $fontObj 0 R >> >> >>\n")
      }
      obj {
        val raw = content.getBytes(ISO_8859_1)
        val data = if (flate) {
          val d = new Deflater()
          d.setInput(raw); d.finish()
          val bos = new ByteArrayOutputStream()
          val buf = new Array[Byte](4096)
          while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
          d.end(); bos.toByteArray
        } else raw
        w(s"<< /Length ${data.length}" +
          (if (flate) " /Filter /FlateDecode" else "") + " >>\nstream\n")
        out.write(data)
        w("\nendstream\n")
      }
    }
    obj { w("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\n") }
    val xref = out.size()
    w(s"xref\n0 ${offsets.length + 1}\n0000000000 65535 f \n")
    offsets.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size ${offsets.length + 1} /Root 1 0 R >>\n" +
      s"startxref\n$xref\n%%EOF\n")
    out.toByteArray
  }

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")

  private def hexStr(s: String): String =
    s.map(c => f"${c.toInt}%02X").mkString

  /** The deterministic fixture formula shared with the DuckDB oracle —
    * doc k has `n` pages; page i paints two lines,
    * `"Doc {k} page {i}"` and `"alpha({(k*13+i)%97}) beta"` (the second
    * exercises paren escaping), through a per-page rotation of show
    * syntax: i%3==0 hex string + `T*`, i%3==1 split `TJ` array + `'`,
    * i%3==2 plain `Tj` + `T*`. Extracted text per stream is exactly
    * `line1 + "\n" + line2` regardless of variant.
    */
  private[graft] def fixturePage(k: Long, i: Int): String = {
    val line1 = s"Doc $k page $i"
    val line2 = s"alpha(${(k * 13 + i) % 97}) beta"
    val body = (i % 3: @unchecked) match {
      case 0 => s"<${hexStr(line1)}> Tj T* (${esc(line2)}) Tj"
      case 1 =>
        val (a, b) = line1.splitAt(4)
        s"[(${esc(a)}) -120 (${esc(b)})] TJ (${esc(line2)}) '"
      case 2 => s"(${esc(line1)}) Tj T* (${esc(line2)}) Tj"
    }
    s"BT /F1 12 Tf 72 720 Td $body ET"
  }

  /** Deterministic PDF fixtures, one per input row: [[fixturePage]]
    * content for id k over `nPagesCol` pages; `flateCol` toggles
    * FlateDecode on every stream of the file. Output (idCol, content).
    */
  def genPdfs(df: DataFrame, idCol: String, nPagesCol: String,
              flateCol: String): DataFrame = {
    val spark = df.sparkSession
    val in = df.select(col(idCol).cast("long"), col(nPagesCol).cast("int"),
      col(flateCol).cast("boolean"))
    val outSchema = StructType(Seq(
      in.schema.head.copy(name = idCol),
      StructField("content", BinaryType, nullable = false)))
    spark.createDataFrame(in.rdd.mapPartitions { rows =>
      rows.map { r =>
        val k = r.getLong(0)
        val pages = (0 until r.getInt(1)).map(i => fixturePage(k, i))
        Row(k, encodePdf(pages, r.getBoolean(2)))
      }
    }, outSchema)
  }
}
