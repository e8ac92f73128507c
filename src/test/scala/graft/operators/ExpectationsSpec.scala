package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1, Some(5)), (2, Some(-1)), (3, None: Option[Int])).toDF("k", "n")

  test("check counts violations per rule; NULL condition = violation") {
    val out = Expectations.check(df, Seq(
      "n_positive" -> ($"n" > 0),
      "k_not_null" -> $"k".isNotNull))
      .as[(String, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(out("n_positive") == (("n_positive", 2L, 3L, false))) // -1 and NULL
    assert(out("k_not_null") == (("k_not_null", 0L, 3L, true)))
  }

  test("enforce passes clean data through and throws on violations") {
    val clean = Expectations.enforce(df, Seq("k_positive" -> ($"k" > 0)))
    assert(clean.count() == 3)
    val e = intercept[IllegalStateException] {
      Expectations.enforce(df, Seq("n_positive" -> ($"n" > 0)))
    }
    assert(e.getMessage.contains("n_positive=2"))
  }

  test("empty input reports violations=0/pass=true, not NULL") {
    val empty = df.filter($"k" > 99)
    val out = Expectations.check(empty, Seq("n_positive" -> ($"n" > 0)))
      .as[(String, Long, Long, Boolean)].collect()
    assert(out.toSeq == Seq(("n_positive", 0L, 0L, true)))
  }

  test("enforce minRows catches a dead upstream that row rules cannot see") {
    val empty = df.filter($"k" > 99)
    // without the guard an empty input sails through
    assert(Expectations.enforce(empty, Seq("n_positive" -> ($"n" > 0))).count() == 0)
    val e = intercept[IllegalStateException] {
      Expectations.enforce(empty, Seq("n_positive" -> ($"n" > 0)), minRows = 1)
    }
    assert(e.getMessage.contains("minRows"))
  }
}
