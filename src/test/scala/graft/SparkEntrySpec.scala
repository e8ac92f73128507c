package graft

/** Contract checks over the registered query/oracle surface itself. */
class SparkEntrySpec extends SparkSpec {

  test("every registered query has an oracle, except the documented ANN trio") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // approximate-by-design ANN paths: verified instead via the planted-
    // duplicate retrieval gates (ann_*_recall) and unit/property specs
    assert(rowsOnly == Set("ann_ivf", "ann_knn_bucket", "ann_lsh_topk"),
      s"new rows-only keys appeared without an oracle: $rowsOnly")
  }

  test("no orphan oracles (oracle without a registered query)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("the flagship entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("README quickstart pipeline runs end-to-end on the test corpus") {
    import graft.ext.{Curation, Dedup}
    import graft.functions.{TextFunctions => T}
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("text", T.cleanText(T.redactPii(col("text"))))
      .filter(T.langId(col("text")) === "en" && T.qualityPerMille(col("text")) >= 300)
    val deduped = Dedup.representatives(docs,
      Dedup.connectedComponents(
        Dedup.rescoreJaccard(docs,
          Dedup.minhashCandidatePairs(docs, "doc_id", "text"),
          "doc_id", "text", minJaccard = 0.8)), "doc_id")
    val split = Curation.splitByHash(deduped, "doc_id")
    val n = split.count()
    assert(n > 0 && n <= docs.count())
    assert(split.select("split").distinct().count() <= 3)
  }
}
