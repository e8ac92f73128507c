package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Failure policy (round-10 postmortem): a query that throws must NOT
  * silently vanish from the artifact — that made 14 broken queries read
  * as an all-green round. Instead we (a) write a one-row parquet with a
  * single `__graft_error` column so the driver's oracle compare records a
  * loud schema/hash FAIL for that name, (b) aggregate every failure into
  * `outDir/errors.json`, and (c) print an attempted/ok/failed summary.
  * `GRAFT_VERIFY_STRICT=1` additionally exits nonzero on any failure
  * (used by local pre-commit smoke, not by the driver). */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // older fixtures store events.ts as TIMESTAMP(NANOS), which Spark's
      // reader rejects; read those as nanos-long (queries adapt per actual
      // column type — see SparkEntry.tsUsCol)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val failures = scala.collection.mutable.LinkedHashMap[String, String]()
    // local spot-check lever (the driver sets no env, so it always dumps
    // the full set): comma-separated key prefixes to restrict the run
    val keyFilter = sys.env.get("GRAFT_VERIFY_FILTER")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val selected = keyFilter match {
      case Some(prefixes) =>
        SparkEntry.queries.filter { case (n, _) => prefixes.exists(n.startsWith) }
      case None => SparkEntry.queries
    }
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        val msg = s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(500)}"
        System.err.println(s"[verify] $name FAILED: $msg")
        failures(name) = msg
        // still emit an artifact so the driver's compare fails LOUDLY for
        // this name instead of dropping it from the round's query set.
        // Oracled queries get a 1-row error marker (schema+hash mismatch);
        // rows-only queries get an EMPTY frame — a 1-row marker would PASS
        // their rows>0 check and hide the failure
        try {
          import spark.implicits._
          val marker =
            if (SparkEntry.oracleSql.contains(name)) Seq(msg).toDF("__graft_error")
            else Seq.empty[String].toDF("__graft_error")
          marker.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        } catch { case e2: Throwable =>
          // a failed marker write re-opens the round-10 hole (the name
          // vanishes from the driver's compare set) — say so LOUDLY and
          // record it so strict mode still fails the run
          System.err.println(s"[verify] $name error-marker write ALSO " +
            s"failed (${e2.getClass.getSimpleName}: " +
            s"${String.valueOf(e2.getMessage).take(200)}) — this query " +
            "will be MISSING from the oracle compare, not failed")
          failures(name) = s"$msg; marker write failed: " +
            s"${e2.getClass.getSimpleName}"
        }
      }
    }
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val errJson = failures
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/errors.json"), errJson)
    val n = selected.size
    println(s"[verify] attempted=$n ok=${n - failures.size} failed=${failures.size}" +
      (if (failures.nonEmpty) s" -> ${failures.keys.mkString(",")}" else ""))
    spark.stop()
    if (failures.nonEmpty && sys.env.get("GRAFT_VERIFY_STRICT").contains("1"))
      sys.exit(1)
  }
}
