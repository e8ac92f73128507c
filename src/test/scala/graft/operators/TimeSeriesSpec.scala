package graft.operators

import graft.SparkSpec

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val sparse = Seq(
    ("a", 1L, Some(10.0)), ("a", 4L, Some(40.0)),
    ("b", 2L, Some(2.0))).toDF("k", "t", "v")

  test("gapFill emits every tick in each key's own span") {
    val out = TimeSeries.gapFill(sparse, Seq("k"), "t")
      .select("k", "t").as[(String, Long)].collect().toSet
    assert(out == Set(("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L), ("b", 2L)))
  }

  test("ffill carries the last observation forward, per key") {
    val filled = TimeSeries.ffill(
      TimeSeries.gapFill(sparse, Seq("k"), "t"), Seq("k"), "t", Seq("v"))
      .select("k", "t", "v").as[(String, Long, Option[Double])].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(filled(("a", 2L)).contains(10.0))   // filled from t=1
    assert(filled(("a", 3L)).contains(10.0))
    assert(filled(("a", 4L)).contains(40.0))   // real observation wins
  }

  test("ffill leaves leading NULLs before the first observation") {
    val df = Seq(("a", 1L, None: Option[Double]), ("a", 2L, Some(5.0)),
      ("a", 3L, None)).toDF("k", "t", "v")
    val out = TimeSeries.ffill(df, Seq("k"), "t", Seq("v"))
      .orderBy("t").select("v").as[Option[Double]].collect().toSeq
    assert(out == Seq(None, Some(5.0), Some(5.0)))
  }
}
