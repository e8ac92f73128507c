package graft.ext

import graft.SparkSpec

class SpansSpec extends SparkSpec {
  import spark.implicits._

  private def spansOf(df: org.apache.spark.sql.DataFrame,
                      n: Int = 3, minCount: Int = 2,
                      maxFreq: Int = Int.MaxValue): Set[(Long, Long, Long)] =
    Spans.duplicateSpans(df, "id", "text", shingleN = n, minCount = minCount,
        maxShingleFreq = maxFreq)
      .as[(Long, Long, Long)].collect().toSet

  test("duplicateSpans locates a shared run at its exact token range in each doc") {
    val docs = Seq(
      (1L, "u1 u2 a b c d e z1"), // shared run "a b c d e" at tokens [2,7)
      (2L, "a b c d e w1 w2"))    // same run at [0,5)
      .toDF("id", "text")
    assert(spansOf(docs) == Set((1L, 2L, 7L), (2L, 0L, 5L)))
  }

  test("duplicateSpans counts within-document repeats (suffix-array semantics)") {
    // "p q r" and "q r s" each occur twice inside ONE doc; the duplicated
    // windows at 0,1,4,5 chain (4 <= 1 + 3) into a single whole-doc span
    val docs = Seq((1L, "p q r s p q r s")).toDF("id", "text")
    assert(spansOf(docs) == Set((1L, 0L, 8L)))
  }

  test("duplicateSpans splits runs separated by more than a window length") {
    val docs = Seq(
      (1L, "a b c x1 x2 x3 x4 d e f"),
      (2L, "a b c y1 y2 y3 y4 d e f"))
      .toDF("id", "text")
    // duplicated windows only at pos 0 ("a b c") and pos 7 ("d e f");
    // 7 > 0 + 3 so they stay two spans per doc
    assert(spansOf(docs) == Set((1L, 0L, 3L), (1L, 7L, 10L),
      (2L, 0L, 3L), (2L, 7L, 10L)))
  }

  test("duplicateSpans honors minCount and the hot-window cap") {
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b c e"), (3L, "a b c f"))
      .toDF("id", "text")
    // "a b c" occurs 3x: present at minCount=2 and 3, gone at 4
    assert(spansOf(docs, minCount = 3) ==
      Set((1L, 0L, 3L), (2L, 0L, 3L), (3L, 0L, 3L)))
    assert(spansOf(docs, minCount = 4) == Set.empty)
    // the cap drops the ultra-hot window before it can mark anything
    assert(spansOf(docs, maxFreq = 2) == Set.empty)
  }

  test("duplicateSpans ignores docs shorter than the window and empty text") {
    val docs = Seq((1L, "a b"), (2L, ""), (3L, "   ")).toDF("id", "text")
    assert(spansOf(docs) == Set.empty)
  }

  test("removeDuplicateSpans strips exactly the duplicated ranges") {
    val docs = Seq(
      (1L, "u1 u2 a b c d e z1"),
      (2L, "a b c d e w1 w2"),
      (3L, "nothing here repeats at all"),
      (4L, ""))
      .toDF("id", "text")
    val m = Spans.removeDuplicateSpans(docs, "id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(m(1L) == (("u1 u2 z1", 5L)))
    assert(m(2L) == (("w1 w2", 5L)))
    assert(m(3L) == (("nothing here repeats at all", 0L)))
    assert(m(4L) == (("", 0L)))
    assert(m.size == 4)
  }

  test("stripDuplicateLines removes corpus-duplicated and self-repeated lines") {
    val docs = Seq(
      (1L, "intro a\nSHARED FOOTER\nbody a"),
      (2L, "intro b\nSHARED FOOTER"),
      (3L, "solo\nsolo"),
      (4L, ""))
      .toDF("id", "text")
    val m = Spans.stripDuplicateLines(docs, "id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(m(1L) == (("intro a\nbody a", 1L)))
    assert(m(2L) == (("intro b", 1L)))
    assert(m(3L) == (("", 2L)))
    assert(m(4L) == (("", 0L)))
    assert(m.size == 4)
    // at minCount=3 the twice-occurring footer survives
    val m3 = Spans.stripDuplicateLines(docs, "id", "text", minCount = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(m3 == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L))
  }

  test("removeDuplicateSpans empties a fully-duplicated document") {
    val docs = Seq((1L, "same exact text here"), (2L, "same exact text here"))
      .toDF("id", "text")
    val m = Spans.removeDuplicateSpans(docs, "id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(m == Map(1L -> (("", 4L)), 2L -> (("", 4L))))
  }
}
