package graft.operators

import graft.SparkSpec

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def trades = Seq(
    ("A", 100L, "t1"), ("A", 250L, "t2"), ("A", 300L, "t3"), ("B", 50L, "t4"))
    .toDF("sym", "ts", "trade")

  private def quotes = Seq(
    ("A", 90L, 10.0), ("A", 240L, 11.0), ("A", 300L, 12.0), ("B", 60L, 5.0))
    .toDF("sym", "qts", "px")

  test("backward as-of picks the latest quote at or before each trade") {
    val out = AsOf.joinBackward(trades, quotes, Seq("sym"), "ts", "qts", Seq("px"))
      .as[(String, Long, String, Option[Double])].collect().toSet
    assert(out == Set(
      ("A", 100L, "t1", Some(10.0)),
      ("A", 250L, "t2", Some(11.0)),
      ("A", 300L, "t3", Some(12.0)),     // equal timestamps match (inclusive)
      ("B", 50L, "t4", None)))           // no quote at or before 50
  }

  test("tolerance nulls out stale matches") {
    val out = AsOf.joinBackward(trades, quotes, Seq("sym"), "ts", "qts", Seq("px"),
      tolerance = Some(10L))
      .as[(String, Long, String, Option[Double])].collect().toMap2
    assert(out(("A", 100L)) == Some(10.0))   // 100-90=10 ≤ 10
    assert(out(("A", 250L)) == Some(11.0))   // 250-240=10 ≤ 10
    assert(out(("A", 300L)) == Some(12.0))   // exact
    assert(out(("B", 50L)).isEmpty)
  }

  test("forward as-of picks the earliest quote at or after each trade") {
    val out = AsOf.joinForward(trades, quotes, Seq("sym"), "ts", "qts", Seq("px"))
      .as[(String, Long, String, Option[Double])].collect().toSet
    assert(out == Set(
      ("A", 100L, "t1", Some(11.0)),     // next quote after 100 is 240
      ("A", 250L, "t2", Some(12.0)),
      ("A", 300L, "t3", Some(12.0)),     // equal timestamps match (inclusive)
      ("B", 50L, "t4", Some(5.0))))      // quote at 60 is ahead of 50
  }

  test("forward tolerance bounds how far ahead a match may be") {
    val out = AsOf.joinForward(trades, quotes, Seq("sym"), "ts", "qts", Seq("px"),
      tolerance = Some(20L))
      .as[(String, Long, String, Option[Double])].collect().toMap2
    assert(out(("A", 100L)).isEmpty)         // 240-100 > 20
    assert(out(("A", 300L)).contains(12.0))  // 0 ≤ 20
    assert(out(("B", 50L)).contains(5.0))    // 60-50 ≤ 20
  }

  test("plan has a single exchange (one shuffle, no range explosion)") {
    val out = AsOf.joinBackward(trades, quotes, Seq("sym"), "ts", "qts", Seq("px"))
    val exchanges = out.queryExecution.executedPlan.toString()
      .split("Exchange hashpartitioning").length - 1
    assert(exchanges == 1)
  }

  private implicit class M(rows: Array[(String, Long, String, Option[Double])]) {
    def toMap2: Map[(String, Long), Option[Double]] =
      rows.map(r => (r._1, r._2) -> r._4).toMap
  }
}
