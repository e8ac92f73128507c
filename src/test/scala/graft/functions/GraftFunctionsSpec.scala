package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkSpec

class GraftFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("SQL-registered functions match the DataFrame-API native expressions") {
    GraftFunctions.register(spark)
    val df = Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("id", "text")
    df.createOrReplaceTempView("gfs_docs")

    val sqlSim = spark.sql("SELECT graft_simhash64(text) AS h FROM gfs_docs")
      .as[Long].head()
    val dslSim = df.select(SimHash64Text.simhash64Native($"text")).as[Long].head()
    assert(sqlSim == dslSim)

    val cos = spark.sql(
      "SELECT graft_cosine(array(1.0D, 2.0D, 3.0D), array(1.0D, 2.0D, 3.0D)) AS c")
      .as[Double].head()
    assert(math.abs(cos - 1.0) < 1e-12)

    val sqlWin = spark.sql("SELECT graft_winnow(text, 10, 4) AS fp FROM gfs_docs")
      .as[Seq[Long]].head()
    val dslWin = df.select(WinnowFingerprints.winnowCol($"text", 10, 4)).as[Seq[Long]].head()
    assert(sqlWin == dslWin)

    val sqlLsh = spark.sql(
      "SELECT graft_sign_lsh_bucket(array(0.5D, -0.25D, 1.0D), 8, 3) AS b").as[Long].head()
    val dslLsh = Seq(Seq(0.5, -0.25, 1.0)).toDF("v")
      .select(SignLshBucketExpr.signLshNative($"v", 8, 3)).as[Long].head()
    assert(sqlLsh == dslLsh)

    assert(spark.sql("SELECT graft_snowflake_id() AS id").as[Long].head() > 0L)
  }

  test("non-literal codegen parameters are rejected with a clear error") {
    GraftFunctions.register(spark)
    Seq((1, "x")).toDF("k", "text").createOrReplaceTempView("gfs_bad")
    val err = intercept[Exception] {
      spark.sql("SELECT graft_winnow(text, k) FROM gfs_bad").collect()
    }
    assert(err.getMessage.contains("integer literal"))
  }

  test("GraftExtensions injects the functions at session build time") {
    // fresh session over the same SparkContext, built with the extensions
    // class. withExtensions exercises the same GraftExtensions.apply a
    // cluster admin triggers via --conf spark.sql.extensions=... (that conf
    // is static — read from the SparkContext at launch — so it can't be
    // flipped on a shared test context).
    val old = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .config(old.sparkContext.getConf)
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(s2 ne old)
      val h = s2.sql("SELECT graft_simhash64('hello world') AS h")
        .collect().head.getLong(0)
      val want = old.range(1)
        .select(SimHash64Text.simhash64Native(lit("hello world"))).collect().head.getLong(0)
      assert(h == want)
    } finally {
      SparkSession.setDefaultSession(old)
      SparkSession.setActiveSession(old)
    }
  }
}
