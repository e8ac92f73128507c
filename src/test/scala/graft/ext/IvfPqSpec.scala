package graft.ext

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  // three well-separated clusters around the axes, 16-dim (same corpus
  // shape as PqSpec so cluster membership is checkable)
  private def corpus = {
    val rnd = new scala.util.Random(11)
    val base = Array.tabulate(3, 16)((c, i) => if (i / 5 == c) 10.0f else 0.0f)
    (0 until 120).map { i =>
      (i.toLong, base(i % 3).map(v => v + rnd.nextFloat() * 0.4f).toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("build carries list_id through the encode — no join-back, one code table") {
    val idx = IvfPq.build(corpus, "vec_id", "embedding", dim = 16, m = 4,
      nLists = 3, codes = 16)
    assert(idx.codes.columns.toSeq == Seq("vec_id", "list_id", "code"))
    assert(idx.codes.count() == 120)
    // the three axis clusters land in three distinct cells
    assert(idx.codes.select("list_id").distinct().count() == 3)
  }

  test("writeIndex/readIndex round-trip: identical search results, pruned scan") {
    val dir = Files.createTempDirectory("graft_ivfpq_").toString
    val idx = IvfPq.build(corpus, "vec_id", "embedding", dim = 16, m = 4,
      nLists = 3, codes = 16)
    IvfPq.writeIndex(idx, dir)
    val idx2 = IvfPq.readIndex(spark, dir)
    val qv = corpus.filter($"vec_id" === 7L).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble).toSeq
    val fresh = IvfPq.search(idx, "vec_id", qv, k = 6, nProbe = 1)
      .as[(Long, Double)].collect().toSeq
    val reread = IvfPq.search(idx2, "vec_id", qv, k = 6, nProbe = 1)
      .as[(Long, Double)].collect().toSeq
    assert(fresh == reread)
    // every hit is a member of the query's own cluster (id % 3 == 1)
    assert(fresh.forall(_._1 % 3 == 1), s"cross-cluster hit in $fresh")
    // the probe filter is a parquet PARTITION filter on the persisted layout
    val cells = Ivf.probeCells(idx2.centroids, qv, 1)
    val scan = idx2.codes.filter($"list_id".isin(cells: _*))
      .queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("list_id"),
      s"probe filter is not a partition filter:\n$scan")
  }

  test("searchMany equals per-query search, scoring only probed cells") {
    val idx = IvfPq.build(corpus, "vec_id", "embedding", dim = 16, m = 4,
      nLists = 3, codes = 16)
    val queries = corpus.filter($"vec_id" < 5)
    val batch = IvfPq.searchMany(idx, queries, "vec_id", "embedding",
      k = 4, nProbe = 2).as[(Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(r => (r._3, r._2)).toSeq).toMap
    queries.select("vec_id", "embedding").collect().foreach { r =>
      val qid = r.getLong(0)
      val qv = r.getSeq[Float](1).map(_.toDouble).toSeq
      val single = IvfPq.search(idx, "vec_id", qv, k = 4, nProbe = 2)
        .as[(Long, Double)].collect().toSeq
      assert(batch(qid).map(x => (x._2, x._3)) == single,
        s"query $qid: batch ${batch(qid)} != single $single")
    }
  }

  test("planted duplicates retrieved from the persisted index at nProbe=1") {
    val dir = Files.createTempDirectory("graft_ivfpq_rec_").toString
    val doubled = corpus.unionByName(
      corpus.withColumn("vec_id", $"vec_id" + 1000L))
    val idx = IvfPq.build(doubled, "vec_id", "embedding", dim = 16, m = 4,
      nLists = 3, codes = 16)
    IvfPq.writeIndex(idx, dir)
    val idx2 = IvfPq.readIndex(spark, dir)
    val hits = IvfPq.searchMany(idx2, corpus.filter($"vec_id" < 10),
      "vec_id", "embedding", k = 3, nProbe = 1)
    // a copy shares its original's cell AND its code → globally minimal
    // ADC distance → always in the top-k
    assert(hits.filter($"corpus_id" === $"query_id" + 1000L).count() == 10)
  }
}
