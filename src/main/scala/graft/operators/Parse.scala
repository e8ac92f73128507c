package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Structured-text parse/format — the reference's `Transforms\XmlParser`
  * (`/root/reference/src/Transforms/XmlParser.php:31-54`: XML → array →
  * dot-path field projection with first-non-null fallback) and
  * `Transforms\XmlFormat` (`XmlFormat.php:30-65`: array → XML with
  * rootTag/itemTag). Spark 4 has `from_xml`/`to_xml` built in, so parsing
  * runs codegen'd in the executors instead of simplexml on a coroutine.
  */
object Parse {

  /** Parse an XML string column into a struct column (`XmlParser.php:37-39`
    * simplexml→json→array collapses to one expression).
    */
  def xmlParse(xmlCol: Column, schema: StructType,
               options: Map[String, String] = Map.empty): Column =
    from_xml(xmlCol, schema, options.asJava)

  /** Parse + project fields with first-non-null fallback across candidate
    * paths — `XmlParser.php:42-47`: each output field lists candidate keys,
    * first present wins. `fields` maps output name → candidate paths *within
    * the parsed struct*.
    */
  def xmlExtract(df: DataFrame, xmlCol: String, schema: StructType,
                 fields: Map[String, Seq[String]],
                 keepInput: Boolean = false): DataFrame = {
    val parsed = df.withColumn("__xml", from_xml(col(xmlCol), schema))
    val outCols = fields.toSeq.map { case (out, paths) =>
      coalesce(paths.map(p => col(s"__xml.$p")): _*).as(out)
    }
    val base = if (keepInput) df.columns.toSeq.map(col) else Nil
    parsed.select(base ++ outCols: _*)
  }

  /** Format selected columns as an XML string (`XmlFormat.php:30-65`; the
    * reference's rootTag becomes the rowTag option).
    */
  def xmlFormat(cols: Column, rowTag: String = "row"): Column =
    to_xml(cols, Map("rowTag" -> rowTag).asJava)

  /** JSON bridges (the reference round-trips payloads through
    * `json_encode`/`json_decode`, e.g. `Sources/Pdo.php:114`).
    */
  def jsonParse(c: Column, schema: StructType): Column = from_json(c, schema)
  def jsonFormat(c: Column): Column = to_json(c)

  private implicit class MapOps(m: Map[String, String]) {
    def asJava: java.util.Map[String, String] = {
      val jm = new java.util.HashMap[String, String]()
      m.foreach { case (k, v) => jm.put(k, v) }
      jm
    }
  }
}
