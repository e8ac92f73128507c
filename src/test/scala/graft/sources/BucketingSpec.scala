package graft.sources

import graft.SparkSpec

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("joining two same-bucketed tables plans no Exchange (co-located join)") {
    // disable auto-broadcast so the join shape (not size) decides the plan
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val facts = (1 to 1000).map(i => (i % 50, s"f$i")).toDF("k", "payload")
      val dims = (0 until 50).map(i => (i, s"dim$i")).toDF("k", "attr")
      Bucketing.writeBucketed(facts, "b_facts", Seq("k"), numBuckets = 4, sortCols = Seq("k"))
      Bucketing.writeBucketed(dims, "b_dims", Seq("k"), numBuckets = 4, sortCols = Seq("k"))

      val joined = Bucketing.bucketedJoin(spark, "b_facts", "b_dims", Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange"), s"expected shuffle-free join plan:\n$plan")
      assert(joined.count() == 1000)

      // contrast: the same join over unbucketed frames DOES shuffle
      val unbucketed = facts.join(dims, Seq("k"))
      assert(unbucketed.queryExecution.executedPlan.toString().contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_facts")
      spark.sql("DROP TABLE IF EXISTS b_dims")
    }
  }
}
