package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream

import scala.collection.mutable.ArrayBuffer
import scala.xml.XML

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** XLSX ingestion — the reference's Excel branch of `Transforms\LineParser`
  * (`/root/reference/src/Transforms/LineParser.php:148-161`, via the
  * xlswriter extension with SKIP_EMPTY_ROW). No Spark Excel connector ships
  * offline, but XLSX is a zip of XML — `java.util.zip` + `scala-xml` (both
  * on Spark's classpath) cover the OOXML subset the reference reads:
  * sharedStrings, inline strings, and numeric cells of the first sheet.
  *
  * Spark-first shape: [[readDir]] scans with the `binaryFile` source and
  * parses PER FILE in executor tasks — a directory of workbooks becomes a
  * distributed parse (the reference emits one message per file,
  * `Sources/FindFiles.php:53-74`; here one task per file). A single
  * workbook is driver-parsed ([[read]]) — one workbook is small by format
  * design (xlsx row limit ~1M), parallelizing inside one is pointless.
  *
  * All values surface as strings (the reference is schema-free, SURVEY.md
  * §1.2); header semantics (headLine/dataStart/endLine) match LineParser.
  */
object Excel {

  /** Parse one workbook's bytes → rows of cells (first sheet, row order,
    * empty rows skipped — the reference's SKIP_EMPTY_ROW).
    */
  private[sources] def parseSheet(bytes: Array[Byte]): Seq[Seq[String]] = {
    var shared: IndexedSeq[String] = IndexedSeq.empty
    var sheetXml: Option[String] = None
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      var entry = zin.getNextEntry
      while (entry != null) {
        entry.getName match {
          case "xl/sharedStrings.xml" =>
            val x = XML.loadString(new String(zin.readAllBytes(), "UTF-8"))
            shared = (x \ "si").map(si => (si \\ "t").map(_.text).mkString).toIndexedSeq
          case n if sheetXml.isEmpty && n.matches("xl/worksheets/sheet1\\.xml") =>
            sheetXml = Some(new String(zin.readAllBytes(), "UTF-8"))
          case _ => ()
        }
        entry = zin.getNextEntry
      }
    } finally zin.close()
    val sheet = sheetXml.getOrElse(
      throw new IllegalArgumentException("no xl/worksheets/sheet1.xml in workbook"))

    def colIndex(ref: String): Int = {
      val letters = ref.takeWhile(_.isLetter)
      letters.foldLeft(0)((acc, c) => acc * 26 + (c - 'A' + 1)) - 1
    }

    val x = XML.loadString(sheet)
    (x \\ "row").iterator.map { row =>
      val cells = ArrayBuffer.empty[(Int, String)]
      (row \ "c").foreach { c =>
        val idx = (c \ "@r").text match {
          case "" => cells.length
          case ref => colIndex(ref)
        }
        val t = (c \ "@t").text
        val value = t match {
          case "s"         => shared((c \ "v").text.trim.toInt)
          case "inlineStr" => (c \ "is" \\ "t").map(_.text).mkString
          case _           => (c \ "v").text
        }
        cells += ((idx, value))
      }
      if (cells.isEmpty) Seq.empty[String]
      else {
        val width = cells.map(_._1).max + 1
        val arr = Array.fill(width)("")
        cells.foreach { case (i, v) => if (i >= 0) arr(i) = v }
        arr.toSeq
      }
    }.filter(_.exists(_.nonEmpty)).toSeq                 // SKIP_EMPTY_ROW
  }

  private def toDf(spark: SparkSession, rows: Seq[Seq[String]],
                   cfg: LineParserConfig): DataFrame = {
    val header: Seq[String] =
      if (cfg.headLine > 0) rows(cfg.headLine - 1) else cfg.columns
    require(header.nonEmpty, "Excel: no header row and no explicit columns")
    val end = cfg.endLine.getOrElse(rows.length)
    val data = rows.slice(cfg.dataStart - 1, end)
      .map(r => Row.fromSeq(header.indices.map(i => r.lift(i).filter(_.nonEmpty).orNull)))
    val schema = StructType(header.map(h => StructField(h, StringType, nullable = true)))
    spark.createDataFrame(spark.sparkContext.parallelize(data.toList), schema)
  }

  /** One workbook, driver-parsed, LineParser-style header config. */
  def read(spark: SparkSession, path: String,
           cfg: LineParserConfig = LineParserConfig()): DataFrame = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    toDf(spark, parseSheet(bytes), cfg)
  }

  /** Write a DataFrame as one xlsx workbook (header row + inline-string
    * cells). Driver-side collect by design: a workbook is a small-export
    * format; big data goes to parquet/csv. The documented bound is
    * ENFORCED, not advisory — the collect itself is capped at
    * `maxRows + 1` rows (`limit`, not `count`: no extra job, and the
    * driver can never be handed more than the cap even when the input is
    * a 1 TB DataFrame), and exceeding the cap fails fast with a clear
    * message. `maxRows` defaults to the xlsx sheet limit minus the header
    * row (1,048,575).
    */
  def write(df: DataFrame, path: String, maxRows: Int = 1048575): Unit = {
    import java.util.zip.{ZipEntry, ZipOutputStream}
    require(maxRows > 0 && maxRows < Int.MaxValue,
      s"maxRows must be in (0, Int.MaxValue), got $maxRows")
    def esc(s: String): String = s
      .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    def colRef(c: Int, row: Int): String = {
      var n = c + 1; val sb = new StringBuilder
      while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
      sb.toString + row
    }
    val header = df.columns.toSeq
    val collected = df.limit(maxRows + 1).collect().toSeq
    require(collected.length <= maxRows,
      s"Excel.write is a small-export sink capped at $maxRows rows and the " +
        "input exceeds it — write parquet/csv instead, or raise maxRows " +
        "explicitly if the workbook is genuinely meant to hold more")
    val rows: Seq[Seq[String]] = header +: collected
      .map(r => header.indices.map(i => Option(r.get(i)).map(_.toString).getOrElse("")))
    val body = rows.zipWithIndex.map { case (cells, r) =>
      val cs = cells.zipWithIndex.map { case (v, c) =>
        s"""<c r="${colRef(c, r + 1)}" t="inlineStr"><is><t>${esc(v)}</t></is></c>"""
      }.mkString
      s"""<row r="${r + 1}">$cs</row>"""
    }.mkString
    val sheet =
      s"""<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>$body</sheetData></worksheet>"""
    val out = java.nio.file.Paths.get(path)
    java.nio.file.Files.createDirectories(out.getParent)
    val zip = new ZipOutputStream(java.nio.file.Files.newOutputStream(out))
    try {
      def put(name: String, content: String): Unit = {
        zip.putNextEntry(new ZipEntry(name)); zip.write(content.getBytes("UTF-8")); zip.closeEntry()
      }
      put("[Content_Types].xml",
        """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""")
      put("xl/workbook.xml", """<?xml version="1.0"?><workbook/>""")
      put("xl/worksheets/sheet1.xml", sheet)
    } finally zip.close()
  }

  /** A directory of workbooks: `binaryFile` scan + per-file parse in the
    * executors; every workbook contributes its data rows (headers per
    * `cfg` are applied per file). Column names come from `cfg.columns` or
    * the first file's header.
    */
  def readDir(spark: SparkSession, dir: String,
              cfg: LineParserConfig = LineParserConfig()): DataFrame = {
    val bin = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.xlsx").load(dir)
      .select("content")
    val header: Seq[String] =
      if (cfg.columns.nonEmpty) cfg.columns
      else {
        val first = bin.limit(1).collect()
        require(first.nonEmpty, s"Excel.readDir: no .xlsx files under $dir")
        parseSheet(first.head.getAs[Array[Byte]](0))(cfg.headLine - 1)
      }
    val schema = StructType(header.map(h => StructField(h, StringType, nullable = true)))
    val width = header.length
    val rows = bin.rdd.flatMap { r =>
      val all = parseSheet(r.getAs[Array[Byte]](0))
      val end = cfg.endLine.getOrElse(all.length)
      all.slice(cfg.dataStart - 1, end)
        .map(cells => Row.fromSeq((0 until width).map(i => cells.lift(i).filter(_.nonEmpty).orNull)))
    }
    spark.createDataFrame(rows, schema)
  }
}
