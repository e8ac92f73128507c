package graft.operators

import graft.SparkSpec

class QuerySpecSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    ("a", 1, 10.0), ("a", 2, 20.0), ("b", 3, 30.0), ("b", 4, 40.0), ("c", 5, 50.0))
    .toDF("k", "n", "x")

  test("where/select/order/limit compose into one plan") {
    val out = QuerySpec(
      select = Seq("key" -> "k", "twice" -> "n * 2"),
      where = Some("n > 1"),
      orderBy = Seq("n DESC"),
      limit = Some(2))(df)
    assert(out.as[(String, Int)].collect().toSeq == Seq(("c", 10), ("b", 8)))
  }

  test("groupBy/agg/having follow SQL semantics") {
    val out = QuerySpec(
      groupBy = Seq("k"),
      agg = Seq("total" -> "sum(x)", "cnt" -> "count(1)"),
      having = Some("total > 40"),
      orderBy = Seq("k"))(df)
    assert(out.select("k", "total").as[(String, Double)].collect().toSeq ==
      Seq(("b", 70.0), ("c", 50.0)))
  }

  test("the spec stays one Catalyst plan — the filter reaches the scan side") {
    val out = QuerySpec(where = Some("n > 3"))(df)
    assert(out.count() == 2)
  }
}
