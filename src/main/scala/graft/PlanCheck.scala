package graft

import org.apache.spark.sql.SparkSession

/** Plan-shape audit (scratch): prints formatted plans for the queries whose
  * 100 TB behavior depends on pushdown/broadcast/shuffle shape.
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q1_agg", "sync_anti_insert", "sync_watermark", "dedup_exact",
        "ann_cosine_topk", "xf_project_include")
    names.foreach { n =>
      println(s"\n===== $n =====")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
