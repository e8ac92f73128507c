package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Line-addressed tabular text parsing — the Spark-native re-expression of
  * the reference's biggest transform (`/root/reference/src/Transforms/
  * LineParser.php:135-258`): `headLine` (header row number), `dataLine`
  * start, `endLine` cutoff, `fieldLine` (a factored-out shared row spliced
  * as leading columns into every data row, :184-189,246-250).
  *
  * Row numbers require a total file order. Plain `spark.read.csv` has no
  * such notion across partitions, so we index lines with `zipWithIndex`
  * over the text RDD: for a given file, Spark's text splits are ordered by
  * byte offset, so partition-then-offset order IS file order.
  *
  * Data rows are parsed with `from_csv` — quote/escape-aware, matching the
  * reference's `str_getcsv` semantics (`LineParser.php:172`: a quoted field
  * may contain the delimiter). Header/field rows are fetched driver-side
  * via one `take(maxNeededLine)` (a bounded scan of the file head, one job)
  * — that is schema inference, inherently a driver action, on 1-2 rows.
  *
  * All output columns are strings (the reference is schema-free, SURVEY.md
  * §1.2); callers cast.
  */
final case class LineParserConfig(
    delimiter: String = ",",
    quote: String = "\"",
    headLine: Int = 1,                  // 1-based header line; <=0 means no header
    dataStart: Int = 2,                 // 1-based first data line
    dataLines: Seq[Int] = Nil,          // explicit data-row list; overrides dataStart
    endLine: Option[Int] = None,        // 1-based last data line (inclusive)
    fieldLine: Option[Int] = None,      // 1-based shared-values line
    fieldNames: Seq[String] = Nil,      // names for the shared-values columns
    columns: Seq[String] = Nil)         // explicit names when headLine <= 0

object LineParser {

  /** Minimal RFC-4180-style splitter for the 1-2 driver-side schema rows
    * (data rows go through `from_csv`, not this).
    */
  private[sources] def splitCsvLine(line: String, delim: Char, quote: Char): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inQ = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQ) {
        if (c == quote && i + 1 < line.length && line.charAt(i + 1) == quote) {
          cur += quote; i += 1
        } else if (c == quote) inQ = false
        else cur += c
      } else {
        if (c == quote) inQ = true
        else if (c == delim) { out += cur.result(); cur.clear() }
        else cur += c
      }
      i += 1
    }
    out += cur.result()
    out.result()
  }

  def parse(spark: SparkSession, path: String, cfg: LineParserConfig): DataFrame =
    parseLines(spark.read.textFile(path), cfg)

  /** Parse pre-read lines (also the in-memory test/MemoryStream path). */
  def parseLines(lines: Dataset[String], cfg: LineParserConfig): DataFrame = {
    val spark = lines.sparkSession
    val delim = cfg.delimiter.charAt(0)
    val quote = cfg.quote.charAt(0)

    // One bounded job fetches every driver-side schema row (file head only).
    val maxNeeded = math.max(cfg.headLine, cfg.fieldLine.getOrElse(0))
    val headRows: Array[String] = if (maxNeeded > 0) lines.take(maxNeeded) else Array.empty

    val header: Seq[String] =
      if (cfg.headLine > 0) splitCsvLine(headRows(cfg.headLine - 1), delim, quote)
      else cfg.columns
    require(header.nonEmpty, "LineParser: no header line and no explicit columns")

    val shared: Seq[(String, String)] = cfg.fieldLine match {
      case Some(fl) =>
        cfg.fieldNames.zip(splitCsvLine(headRows(fl - 1), delim, quote))
      case None => Nil
    }

    val indexed = lines.rdd.zipWithIndex()
      .map { case (line, idx) => (idx + 1, line) }
    val indexedDf = spark.createDataFrame(indexed).toDF("__lineno", "__line")

    val rowSchema = StructType(header.map(h => StructField(h, StringType, nullable = true)))
    // escape = quote char → RFC-4180 doubled-quote unescaping ("Bo""b" → Bo"b),
    // matching the reference's str_getcsv (`LineParser.php:172`)
    val parsed = from_csv(col("__line"), rowSchema,
      Map("sep" -> cfg.delimiter, "quote" -> cfg.quote, "escape" -> cfg.quote))

    val endCond = cfg.endLine.map(e => col("__lineno") <= e).getOrElse(lit(true))
    // Data-row admission. `dataLines` is the reference's `dataLine[]` list
    // (`LineParser.php:175`: `in_array($i, $dataLine) || $i >= max($dataLine)`)
    // — the listed rows plus everything from the largest listed row on,
    // which lets a file interleave skippable junk before the data tail.
    // Header/field rows are never data rows.
    val dataCond =
      if (cfg.dataLines.nonEmpty) {
        val schemaRows = (Seq(cfg.headLine) ++ cfg.fieldLine.toSeq).filter(_ > 0)
        (col("__lineno").isInCollection(cfg.dataLines.map(_.toLong)) ||
          col("__lineno") >= cfg.dataLines.max) &&
          (if (schemaRows.isEmpty) lit(true)
           else !col("__lineno").isInCollection(schemaRows.map(_.toLong)))
      } else col("__lineno") >= cfg.dataStart
    val sharedCols = shared.map { case (n, v) => lit(v).as(n) }
    val dataCols: Seq[Column] = header.map(h => col(s"__parsed.`$h`").as(h))

    indexedDf
      .filter(dataCond && endCond)
      .withColumn("__parsed", parsed)
      .select(sharedCols ++ dataCols: _*)
  }
}
