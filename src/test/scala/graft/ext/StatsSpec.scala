package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StatsSpec extends SparkSpec {
  import spark.implicits._

  private def viaAggregate(df: org.apache.spark.sql.DataFrame, p: Double) =
    df.groupBy("k").agg(expr(s"percentile(cast(v as double), $p)").as("e"))
      .as[(String, Option[Double])].collect().toMap

  private def viaStats(df: org.apache.spark.sql.DataFrame, p: Double) =
    Stats.exactPercentiles(df, Seq("k"), "v", Seq("e" -> p))
      .as[(String, Option[Double])].collect().toMap

  test("matches the percentile aggregate on edge-shaped groups") {
    val df = Seq(
      ("one", Some(42.0)),                       // single-row group
      ("dup", Some(5.0)), ("dup", Some(5.0)), ("dup", Some(5.0)),
      ("mix", Some(1.0)), ("mix", Some(2.0)), ("mix", Some(2.0)),
      ("mix", Some(9.0)), ("mix", None),
      ("nul", None), ("nul", None)               // all-null group
    ).toDF("k", "v")
    for (p <- Seq(0.0, 0.25, 0.5, 0.75, 0.95, 1.0)) {
      assert(viaStats(df, p) == viaAggregate(df, p), s"p=$p")
    }
  }

  test("matches the percentile aggregate on real data through the GK bracket") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_returnflag").as("k"), col("l_extendedprice").as("v"))
    // accuracy below the group sizes so the sketch-bracket path (not the
    // small-group [min,max] shortcut) is what gets exercised
    for (p <- Seq(0.0, 0.5, 0.95, 1.0)) {
      val got = Stats.exactPercentiles(li, Seq("k"), "v", Seq("e" -> p),
        accuracy = 100).as[(String, Option[Double])].collect().toMap
      assert(got == viaAggregate(li, p), s"p=$p")
    }
  }

  test("NULL group keys form a group, matching the percentile aggregate") {
    val df = Seq(
      (Option("a"), Some(1.0)), (Option("a"), Some(3.0)),
      (Option.empty[String], Some(10.0)), (None, Some(20.0)), (None, Some(30.0))
    ).toDF("k", "v")
    for (p <- Seq(0.0, 0.5, 1.0)) {
      assert(viaStats(df, p) == viaAggregate(df, p), s"p=$p")
      // the null-keyed group really is present, not dropped by the joins
      assert(viaStats(df, p).contains(null))
    }
  }

  test("column names needing backticks work (no string-SQL interpolation)") {
    val df = Seq(("g", 1.0), ("g", 2.0), ("g", 3.0)).toDF("k", "unit price")
    val got = Stats.exactPercentiles(df, Seq("k"), "unit price", Seq("e" -> 0.5))
      .as[(String, Double)].collect().head
    assert(got == (("g", 2.0)))
  }

  test("several percentiles at once, ungrouped-style single group") {
    val df = (1 to 1000).map(i => ("g", i.toDouble)).toDF("k", "v")
    val got = Stats.exactPercentiles(df, Seq("k"), "v",
      Seq("p50" -> 0.5, "p95" -> 0.95), accuracy = 50)
      .as[(String, Double, Double)].collect().head
    assert(got == (("g", 500.5, 950.05)))
  }
}
