package graft.ext

import graft.SparkSpec

class SearchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "spark spark spark engine"),          // high tf for 'spark'
    (2L, "spark engine"),                      // lower tf, shorter doc
    (3L, "engine tuning guide"),               // no query term
    (4L, "rare spark"),                        // short doc boosts tf weight
    (5L, "")).toDF("id", "text")

  test("bm25: docs containing rarer terms and higher tf rank higher") {
    val out = Search.bm25TopK(docs, "id", "text", Seq("spark", "rare"), k = 10)
      .as[(Long, Double)].collect()
    val ranks = out.map(_._1)
    assert(!ranks.contains(3L) && !ranks.contains(5L))   // no match → absent
    // doc 4 has the only 'rare' (max idf) plus a 'spark' → must rank first
    assert(ranks.head == 4L)
    // among spark-only docs, tf=3 beats tf=1 at equal-ish dl
    assert(ranks.indexOf(1L) < ranks.indexOf(2L))
    assert(out.forall(_._2 > 0.0))
  }

  test("bm25 is deterministic across runs and repartitionings") {
    val a = Search.bm25TopK(docs, "id", "text", Seq("spark", "engine"), k = 10)
      .as[(Long, Double)].collect().toSeq
    val b = Search.bm25TopK(docs.repartition(7), "id", "text",
      Seq("spark", "engine"), k = 10).as[(Long, Double)].collect().toSeq
    assert(a == b)
  }

  test("query terms are case-insensitive and deduplicated") {
    val a = Search.bm25TopK(docs, "id", "text", Seq("SPARK", "spark"), k = 10)
      .as[(Long, Double)].collect().toSeq
    val b = Search.bm25TopK(docs, "id", "text", Seq("spark"), k = 10)
      .as[(Long, Double)].collect().toSeq
    assert(a == b)
  }

  test("rareTokenStats flags gibberish and clears boilerplate") {
    val corpus = Seq(
      (1L, "the quick brown fox the quick brown fox"),   // all tokens common
      (2L, "the quick zxqv9 gibberish8 mojibake7 fox"),  // half unique junk
      (3L, "the quick brown fox"),
      (4L, "")                                           // empty doc
    ).toDF("id", "text")
    val out = Search.rareTokenStats(corpus, "id", "text", maxCount = 1)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // every token of docs 1/3 appears in ≥2 docs → zero rare occurrences
    assert(out(1L) == ((1L, 8L, 0L, 0L)))
    assert(out(3L) == ((3L, 4L, 0L, 0L)))
    // doc 2: zxqv9/gibberish8/mojibake7 are corpus-unique → 3 of 6 = 500‰
    assert(out(2L) == ((2L, 6L, 3L, 500L)))
    // empty doc reports zeros, not null/missing
    assert(out(4L) == ((4L, 0L, 0L, 0L)))
  }
}
