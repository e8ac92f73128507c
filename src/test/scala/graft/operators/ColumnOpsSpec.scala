package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Pipeline

class ColumnOpsSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq((1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0))
    .toDF("id", "name", "amount")

  test("include keeps listed columns with expression rewrites") {
    val out = ColumnOps.include("id" -> "id", "twice" -> "amount * 2")(df)
    assert(out.columns.toSeq == Seq("id", "twice"))
    assert(out.orderBy("id").collect().map(_.getDouble(1)).toSeq == Seq(20.0, 40.0, 60.0))
  }

  test("exclude drops columns") {
    assert(ColumnOps.exclude("amount")(df).columns.toSeq == Seq("id", "name"))
  }

  test("rename maps names and preserves order and untouched columns") {
    val out = ColumnOps.rename("name" -> "label")(df)
    assert(out.columns.toSeq == Seq("id", "label", "amount"))
    assert(out.where($"label" === "b").count() == 1)
  }

  test("addFields appends literal columns") {
    val out = ColumnOps.addFields("src" -> lit("x"), "k" -> lit(7))(df)
    assert(out.columns.toSeq == Seq("id", "name", "amount", "src", "k"))
    assert(out.select("src").distinct().as[String].collect().toSeq == Seq("x"))
  }

  test("idKeyOrdered assigns dense 1..n ids by the given order") {
    val out = ColumnOps.idKeyOrdered("rid", $"amount".desc)(df)
    assert(out.orderBy("rid").select("id").as[Int].collect().toSeq == Seq(3, 2, 1))
  }

  test("idKeySnowflake ids are unique, positive, and shuffle-free") {
    val big = spark.range(0, 5000, 1, 4).toDF("v")
    val out = ColumnOps.idKeySnowflake("sid")(big)
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"),
      "snowflake idKey must not shuffle")
    val ids = out.select("sid").collect().map(_.getLong(0))
    assert(ids.length == 5000 && ids.distinct.length == 5000 && ids.forall(_ > 0))
  }

  test("idKeyUnique ids are unique") {
    val out = ColumnOps.idKeyUnique("uid")(df)
    assert(out.select("uid").distinct().count() == 3)
  }

  test("coalesceFallback picks first non-null candidate") {
    val d = Seq((Some("a"), None: Option[String]), (None, Some("b")), (None, None))
      .toDF("x", "y")
    val out = ColumnOps.coalesceFallback("v", col("x"), col("y"))(d)
    assert(out.select("v").as[Option[String]].collect().toSeq ==
      Seq(Some("a"), Some("b"), None))
  }

  test("Pipeline composes left-to-right and include chain collapses to one projection") {
    val p = Pipeline(
      ColumnOps.include("id" -> "id", "amount" -> "amount"),
      ColumnOps.addFields("flag" -> lit(1)),
      ColumnOps.rename("amount" -> "amt"))
    val out = p(df)
    assert(out.columns.toSeq == Seq("id", "amt", "flag"))
    // consecutive projections collapse: at most one Project survives (for a
    // local relation the optimizer folds even that away)
    val plan = out.queryExecution.optimizedPlan.toString()
    assert(plan.split("Project").length <= 2, s"expected <=1 Project in:\n$plan")
  }

  test("the documented eval→expr mapping covers the reference's doc example") {
    // doc/LineParser.md:19 eval snippet `return '20'.explode(' ',$col)[0];`
    // maps to the expr string below (SURVEY.md §7.4 narrowing)
    val d = Seq(Tuple1("24-03-01 rest")).toDF("dt")
    val out = ColumnOps.include("year" -> "concat('20', split(dt, ' ')[0])")(d)
    assert(out.as[String].head() == "2024-03-01")
  }

  test("Pipeline.fanOut applies each branch to the same input") {
    val Seq(a, b) = Pipeline.fanOut(df, ColumnOps.exclude("id"), ColumnOps.exclude("name"))
    assert(a.columns.toSeq == Seq("name", "amount") && b.columns.toSeq == Seq("id", "amount"))
  }

  test("topKPerKey keeps exactly k ranked rows per key") {
    val data = (1 to 30).map(i => (i % 3, i)).toDF("k", "v")
    val out = ColumnOps.topKPerKey(Seq("k"), Seq($"v".desc), k = 2)(data)
      .select("k", "v", "rank_in_key").as[(Int, Int, Long)].collect()
    assert(out.length == 6)
    assert(out.filter(_._1 == 0).map(_._2).sorted.toSeq == Seq(27, 30))
    assert(out.forall(_._3 <= 2))
  }

  test("soundex blocking catches first-char-safe phonetic variants") {
    val l = Seq((1L, "Jon Smith")).toDF("id_l", "name_l")
    val r = Seq((10L, "John Smith")).toDF("id_r", "name_r")
    // a 4-prefix block would separate "Jon " from "John"; soundex doesn't
    val out = Fuzzy.joinByEditDistance(l, r, "name_l", "name_r", maxDist = 2,
      blockKey = Fuzzy.soundexBlock)
      .select("id_l", "id_r").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 10L)))
  }

  test("fuzzy join matches within the edit-distance bound inside blocks") {
    val l = Seq((1L, "spark engine"), (2L, "flink engine")).toDF("id_l", "name_l")
    val r = Seq((10L, "spark enginr"), (20L, "totally different")).toDF("id_r", "name_r")
    val out = Fuzzy.joinByEditDistance(l, r, "name_l", "name_r", maxDist = 2,
      blockKey = org.apache.spark.sql.functions.substring(_, 1, 3))
      .select("id_l", "id_r").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 10L)))   // blocked + thresholded, no cross noise
  }
}
