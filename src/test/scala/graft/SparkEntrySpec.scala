package graft

/** Contract checks over the registered query/oracle surface itself. */
class SparkEntrySpec extends SparkSpec {

  test("every rows-only query names an oracled companion gate") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // a key may skip the DuckDB oracle ONLY by registering a companion gate
    // (the ANN recall-gate pattern): the pairing below makes a bare
    // rows-only key a structural impossibility, not a convention
    assert(rowsOnly == SparkEntry.rowsOnlyGates.keySet,
      s"rows-only keys ${rowsOnly -- SparkEntry.rowsOnlyGates.keySet} have no " +
        s"companion gate; stale gates: ${SparkEntry.rowsOnlyGates.keySet -- rowsOnly}")
    SparkEntry.rowsOnlyGates.foreach { case (key, gate) =>
      assert(SparkEntry.queries.contains(gate),
        s"gate '$gate' for rows-only '$key' is not a registered query")
      assert(SparkEntry.oracleSql.contains(gate),
        s"gate '$gate' for rows-only '$key' is itself unoracled — gates must " +
          "be hash-verified")
    }
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
