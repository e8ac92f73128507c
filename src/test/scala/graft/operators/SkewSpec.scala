package graft.operators

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin returns the same rows as a plain join") {
    // heavily skewed: 90% of facts share key 1
    val big = ((1 to 90).map(i => (1, s"f$i")) ++ (1 to 10).map(i => (i + 1, s"g$i")))
      .toDF("k", "payload")
    val small = (1 to 11).map(i => (i, s"dim$i")).toDF("k", "attr")
    val plain = big.join(small, Seq("k")).as[(Int, String, String)].collect().sorted.toSeq
    val salted = Skew.saltedJoin(big, small, Seq("k"), factor = 4)
      .as[(Int, String, String)].collect().sorted.toSeq
    assert(salted == plain)
    assert(salted.length == 100)
  }

  test("saltedJoin left join preserves unmatched big-side rows") {
    val big = Seq((1, "a"), (2, "b"), (99, "nomatch")).toDF("k", "v")
    val small = Seq((1, "d1"), (2, "d2")).toDF("k", "attr")
    val out = Skew.saltedJoin(big, small, Seq("k"), factor = 3, joinType = "left")
    assert(out.count() == 3)
    assert(out.filter($"k" === 99).collect().head.isNullAt(2))
  }

  test("saltedSumCount equals the plain group-by aggregate") {
    val df = (1 to 1000).map(i => (if (i % 10 == 0) "cold" else "hot", i.toDouble))
      .toDF("k", "x")
    val salted = Skew.saltedSumCount(df, Seq("k"), "x", factor = 8)
      .as[(String, Double, Long)].collect().sortBy(_._1).toSeq
    val plain = df.groupBy("k")
      .agg(org.apache.spark.sql.functions.sum($"x"),
        org.apache.spark.sql.functions.count($"x"))
      .as[(String, Double, Long)].collect().sortBy(_._1).toSeq
    assert(salted == plain)
  }

  test("keyHistogram surfaces the hot keys") {
    val df = ((1 to 50).map(_ => Tuple1("hot")) ++ Seq(Tuple1("cold"))).toDF("k")
    val top = Skew.keyHistogram(df, Seq("k"), topN = 1).as[(String, Long)].collect()
    assert(top.head == ("hot", 50L))
  }

  /** Set confs for one test body, restoring prior values after. */
  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val prior = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("minhash pre-drops a degenerate bucket (50%-identical corpus) before the exchange") {
    // 3000 of 3010 docs share ONE text → one degenerate bucket per band,
    // E[sampled postings] = 30 per band ≥ the max(3·cap·p, 10) = 10
    // threshold at cap=100 → pre-dropped before the shuffle (seeded sample
    // → deterministic). The 10-doc near-dup group is far below the cap and
    // must survive with exact pairs.
    val spam = (1L to 3000L).map(i => (i, "lorem ipsum dolor sit amet " * 8))
    val real = (4001L to 4010L).map(i => (i, "a genuinely unique snowflake document body here"))
    val df = (spam ++ real).toDF("id", "text")
    val pairs = graft.ext.Dedup.minhashCandidatePairs(df, "id", "text",
      maxBucketSize = 100)
    val got = pairs.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // exact semantics: every pair within the surviving 10-doc bucket, none
    // from the degenerate 3000-doc bucket (same result the post-shuffle
    // exact cap alone would produce — the pre-drop only moves WHERE the
    // drop happens)
    val expected = (for {
      a <- 4001L to 4010L; b <- (a + 1) to 4010L
    } yield (a, b)).toSet
    assert(got == expected, s"got ${got.size} pairs, expected ${expected.size}")
    // and the pre-drop actually fires: the sampled estimate flags the
    // degenerate bucket in every band
    val estFlagged = df.sample(withReplacement = false, 0.01, 42L).count()
    assert(estFlagged >= 10, s"seeded 1% sample drew only $estFlagged spam rows")
  }

  test("salting spreads a hot key holding 50% of rows across ~factor tasks") {
    val factor = 8
    // the pathological shape AQE's skew split cannot fix: ONE key is half
    // the fact table, so however partitions are re-split, every row of that
    // key still hashes to the same reducer without a salt
    val big = ((1 to 5000).map(i => (1, i.toLong)) ++
      (1 to 5000).map(i => (i % 100 + 2, i.toLong))).toDF("k", "v")
    val small = (1 to 101).map(i => (i, s"dim$i")).toDF("k", "attr")
    // force the shuffle join (broadcast would hide the reducer placement)
    // and freeze partitioning so spark_partition_id measures reducers
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.shuffle.partitions" -> "32") {
      import org.apache.spark.sql.functions.spark_partition_id
      def hotSpread(joined: org.apache.spark.sql.DataFrame): Long =
        joined.select($"k", spark_partition_id().as("pid"))
          .filter($"k" === 1).select("pid").distinct().count()
      // unsalted: the hot key funnels into exactly one reduce task
      assert(hotSpread(big.join(small, Seq("k"))) == 1L)
      // salted: the hot key's rows land on ≥ factor/2 distinct tasks (8
      // salt values hash into 32 partitions; a few collisions are expected,
      // a funnel is not) — and the join is still exactly correct
      val salted = Skew.saltedJoin(big, small, Seq("k"), factor)
      assert(hotSpread(salted) >= factor / 2,
        s"salt factor $factor spread the hot key over ${hotSpread(salted)} tasks")
      assert(salted.count() == 10000L)
    }
  }
}
