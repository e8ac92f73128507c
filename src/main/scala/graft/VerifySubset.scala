package graft

import org.apache.spark.sql.SparkSession

/** [[Verify]] restricted to a key prefix — the fast oracle-iteration loop
  * while building one tier: dump only `<prefix>*` queries + their oracle
  * SQL, then `python3 tools/oracle_check.py <sfDir> <outDir>`. Not used by
  * the driver (it runs the full [[Verify]]); kept because per-tier oracle
  * turnaround is minutes-vs-seconds at sf0.001.
  */
object VerifySubset {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, prefix) = args
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val keys = SparkEntry.queries.keys.filter(_.startsWith(prefix))
    keys.foreach { name =>
      SparkEntry.queries(name)(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$name")
      println(s"[scratch] wrote $name")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.view.filterKeys(_.startsWith(prefix))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
