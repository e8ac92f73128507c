package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Line-addressed tabular text parsing — the Spark-native re-expression of
  * the reference's biggest transform (`/root/reference/src/Transforms/
  * LineParser.php:135-258`): `headLine` (header row number), `dataLine`
  * start, `endLine` cutoff, `fieldLine` (a factored-out shared row spliced
  * as leading columns into every data row, :184-189,246-250).
  *
  * Row numbers require a total file order. Plain `spark.read.csv` has no
  * such notion across partitions, so we index lines with `zipWithIndex`
  * over the text RDD: for a given file, Spark's text splits are ordered by
  * byte offset, so partition-then-offset order IS file order. Each file is
  * indexed independently (`input_file_name` grouping is unnecessary since we
  * parse one logical file per call — the reference emits one Message per
  * file too, `src/Sources/FindFiles.php:53-74`).
  *
  * All output columns are strings (the reference is schema-free, SURVEY.md
  * §1.2); callers cast. Header/field rows are fetched driver-side — that is
  * schema inference, inherently a driver action, on 1-2 rows only.
  */
final case class LineParserConfig(
    delimiter: String = ",",
    headLine: Int = 1,                  // 1-based header line; <=0 means no header
    dataStart: Int = 2,                 // 1-based first data line
    endLine: Option[Int] = None,        // 1-based last data line (inclusive)
    fieldLine: Option[Int] = None,      // 1-based shared-values line
    fieldNames: Seq[String] = Nil,      // names for the shared-values columns
    columns: Seq[String] = Nil)         // explicit names when headLine <= 0

object LineParser {

  def parse(spark: SparkSession, path: String, cfg: LineParserConfig): DataFrame = {
    import spark.implicits._
    val indexed = spark.read.textFile(path).rdd.zipWithIndex()
      .map { case (line, idx) => (idx + 1, line) }.toDF("__lineno", "__line")

    def lineAt(n: Int): String =
      indexed.filter(col("__lineno") === n).select("__line").head().getString(0)

    val header: Seq[String] =
      if (cfg.headLine > 0) lineAt(cfg.headLine).split(java.util.regex.Pattern.quote(cfg.delimiter), -1).toSeq
      else cfg.columns
    require(header.nonEmpty, "LineParser: no header line and no explicit columns")

    val shared: Seq[(String, String)] = cfg.fieldLine match {
      case Some(fl) =>
        val vals = lineAt(fl).split(java.util.regex.Pattern.quote(cfg.delimiter), -1).toSeq
        cfg.fieldNames.zip(vals)
      case None => Nil
    }

    val endCond = cfg.endLine.map(e => col("__lineno") <= e).getOrElse(lit(true))
    val cells = split(col("__line"), java.util.regex.Pattern.quote(cfg.delimiter), -1)
    val dataCols = header.zipWithIndex.map { case (h, i) => cells.getItem(i).as(h) }
    val sharedCols = shared.map { case (n, v) => lit(v).as(n) }

    indexed
      .filter(col("__lineno") >= cfg.dataStart && endCond)
      .select(sharedCols ++ dataCols: _*)
  }
}
