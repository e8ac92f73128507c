package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Scratch runner: dump the queries named in args(2..) + their oracle SQL
  * for a targeted tools/oracle_check.py pass. Deleted after use.
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val keys = args.drop(2).toSeq
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    keys.foreach { k =>
      SparkEntry.queries(k)(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$k")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c => c.toString
    } + "\""
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      keys.filter(SparkEntry.oracleSql.contains)
        .map(k => s"${q(k)}: ${q(SparkEntry.oracleSql(k))}").mkString("{", ",", "}"))
    spark.stop()
  }
}
