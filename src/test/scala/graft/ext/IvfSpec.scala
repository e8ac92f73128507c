package graft.ext

import java.nio.file.Files

import graft.SparkSpec

class IvfSpec extends SparkSpec {
  import spark.implicits._

  // three well-separated clusters around the axes
  private def corpus = {
    val rnd = new scala.util.Random(7)
    val base = Seq(
      Array(10.0f, 0.0f, 0.0f), Array(0.0f, 10.0f, 0.0f), Array(0.0f, 0.0f, 10.0f))
    (0 until 90).map { i =>
      val c = base(i % 3)
      (i.toLong, c.map(v => v + rnd.nextFloat() * 0.5f).toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("IVF assigns every vector to a cell and search finds same-cluster neighbors") {
    val idx = Ivf.build(corpus, "vec_id", "embedding", nLists = 3)
    assert(idx.assigned.select("list_id").distinct().count() == 3)
    assert(idx.centroids.length == 3)
    // query near the x-axis cluster: all hits must be x-cluster members (id % 3 == 0)
    val hits = Ivf.search(idx.assigned, idx, "vec_id", "embedding",
      queryVec = Seq(10.0, 0.1, 0.1), k = 5, nProbe = 1)
      .as[(Long, Double)].collect()
    assert(hits.length == 5)
    assert(hits.forall(_._1 % 3 == 0))
    assert(hits.forall(_._2 > 0.99))
  }

  test("k-means fit input is capped by fitSampleRows; search results unchanged") {
    // fitSample caps a corpus larger than the cap…
    val feats = corpus.withColumnRenamed("embedding", "__features")
    val sampled = Ivf.fitSample(feats, cap = 30, seed = 42)
    val n = sampled.count()
    assert(n < 90, s"sample must shrink the fit input, got $n of 90")
    // …and passes a corpus at-or-under the cap through untouched
    assert(Ivf.fitSample(feats, cap = 90, seed = 42).count() == 90)

    // a capped fit still separates the three clusters and finds the same
    // neighbors as the uncapped fit on this corpus
    val idx = Ivf.build(corpus, "vec_id", "embedding", nLists = 3, fitSampleRows = 45)
    assert(idx.assigned.select("list_id").distinct().count() == 3)
    val hits = Ivf.search(idx.assigned, idx, "vec_id", "embedding",
      queryVec = Seq(10.0, 0.1, 0.1), k = 5, nProbe = 1)
      .as[(Long, Double)].collect()
    assert(hits.length == 5 && hits.forall(_._1 % 3 == 0) && hits.forall(_._2 > 0.99))
  }

  test("fit-sample cap clamps to a multiple of nLists so KMeans always has k points") {
    assert(Ivf.effectiveCap(fitSampleRows = 2, nLists = 8) == 160L)
    assert(Ivf.effectiveCap(fitSampleRows = 0, nLists = 8) == 80000L)
    assert(Ivf.effectiveCap(fitSampleRows = 500, nLists = 3) == 500L)
    // a pathologically small requested cap still builds a valid index
    val idx = Ivf.build(corpus, "vec_id", "embedding", nLists = 3, fitSampleRows = 1)
    assert(idx.centroids.length == 3)
  }

  test("partitioned index layout prunes to the probed cells") {
    val dir = Files.createTempDirectory("graft_ivf_").toString
    val idx = Ivf.build(corpus, "vec_id", "embedding", nLists = 3)
    Ivf.writeIndex(idx, dir)
    val assigned = spark.read.parquet(dir)
    val cells = Ivf.probeCells(idx, Seq(0.0, 10.0, 0.0), nProbe = 1)
    val plan = Ivf.search(assigned, idx, "vec_id", "embedding",
      Seq(0.0, 10.0, 0.0), k = 3, nProbe = 1)
      .queryExecution.executedPlan.toString()
    // partition filter on list_id reaches the scan (directory-level pruning)
    assert(plan.contains("list_id") && plan.contains(s"${cells.head}"))
    val hits = Ivf.search(assigned, idx, "vec_id", "embedding",
      Seq(0.0, 10.0, 0.0), k = 3, nProbe = 1).as[(Long, Double)].collect()
    assert(hits.forall(_._1 % 3 == 1))
  }
}
