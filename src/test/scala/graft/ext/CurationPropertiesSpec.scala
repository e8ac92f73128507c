package graft.ext

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property-based checks for the laws the curation operators promise:
  * splits partition, samples nest monotonically, packing respects budgets,
  * components are true equivalence classes.
  */
class CurationPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int = 8): Seq[A] =
    (1 to n).map(i => gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  private val idsGen: Gen[List[Long]] =
    Gen.listOfN(120, Gen.choose(1L, 100000L)).map(_.distinct)

  test("property: splitByHash is a partition — every row in exactly one split") {
    for (ids <- samples(idsGen)) {
      val df = ids.toDF("id")
      val out = Curation.splitByHash(df, "id")
      assert(out.count() == ids.size.toLong)
      assert(out.groupBy("id").count().filter($"count" > 1).isEmpty)
      assert(out.filter(!$"split".isin("train", "val", "test")).isEmpty)
    }
  }

  test("property: sampleToTokenBudget never exceeds a stratum's budget and is prefix-closed") {
    val rowsGen: Gen[List[(Long, String, Long)]] =
      Gen.listOfN(150, for {
        id <- Gen.choose(1L, 100000L)
        s  <- Gen.oneOf("web", "code", "books")
        t  <- Gen.choose(1L, 500L)
      } yield (id, s, t)).map(_.distinctBy(_._1))
    for (rows <- samples(rowsGen)) {
      val df = rows.toDF("id", "strata", "toks")
      val budgets = Map("web" -> 3000L, "code" -> 1000L)
      val kept = Curation.sampleToTokenBudget(df, "id", "strata", "toks",
        budgets, defaultBudget = 500L)
        .as[(Long, String, Long)].collect()
      // budget law: per-stratum token sums stay within their budgets
      kept.groupBy(_._2).foreach { case (s, rs) =>
        assert(rs.map(_._3).sum <= budgets.getOrElse(s, 500L), s"stratum $s over budget")
      }
      // prefix law: the kept set is closed under the deterministic hash
      // order — no kept row comes after a dropped one within its stratum
      val order = df.withColumn("__o",
          Curation.hashBucket(col("id"), 65536)).orderBy("__o", "id")
        .as[(Long, String, Long, Int)].collect()
      val keptIds = kept.map(_._1).toSet
      order.groupBy(_._2).foreach { case (s, rs) =>
        val flags = rs.map(r => keptIds.contains(r._1))
        assert(!flags.dropWhile(identity).contains(true),
          s"stratum $s kept a row after dropping an earlier one")
      }
    }
  }

  test("property: sampleByHash nests monotonically in the rate") {
    for (ids <- samples(idsGen)) {
      val df = ids.toDF("id")
      val lo = Curation.sampleByHash(df, "id", 100).select("id").as[Long].collect().toSet
      val hi = Curation.sampleByHash(df, "id", 400).select("id").as[Long].collect().toSet
      assert(lo.subsetOf(hi))   // raising the rate only ADDS rows
    }
  }

  test("property: packSequences never drops or duplicates a document and " +
    "every non-initial doc starts within its bin's budget") {
    val docsGen = Gen.listOfN(60,
      Gen.zip(Gen.choose(1L, 10000L), Gen.choose(1L, 120L))).map(_.distinctBy(_._1))
    for (docs <- samples(docsGen)) {
      val out = Curation.packSequences(docs.toDF("id", "n"), "id", "n",
        maxTokensPerBin = 256, shards = 4)
        .select("id", "bin_offset").as[(Long, Long)].collect()
      assert(out.map(_._1).toSet == docs.map(_._1).toSet)
      assert(out.length == docs.size)
      assert(out.forall { case (_, off) => off >= 0 && off < 256 })
    }
  }

  test("property: packExamples conserves docs and tokens and agrees with packSequences") {
    val docsGen = Gen.listOfN(50,
      Gen.zip(Gen.choose(1L, 10000L), Gen.choose(1L, 120L))).map(_.distinctBy(_._1))
    for (docs <- samples(docsGen, n = 5) if docs.nonEmpty) {
      val df = docs.map { case (id, n) => (id, s"t$id", n) }.toDF("id", "text", "n")
      val ex = Curation.packExamples(df, "id", "text", "n",
        maxTokensPerBin = 256, shards = 4)
        .as[(Int, Long, Long, Long, String)].collect()
      // conservation: every doc appears in exactly one example, token sums add up
      assert(ex.map(_._3).sum == docs.size.toLong)
      assert(ex.map(_._4).sum == docs.map(_._2).sum)
      val mentioned = ex.flatMap(_._5.split(" ")).toSeq.sorted
      assert(mentioned == docs.map(d => s"t${d._1}").sorted, "doc text lost or duplicated")
      // agreement: each (shard, bin) doc count matches the assignment op
      val assigned = Curation.packSequences(df, "id", "n", 256, 4)
        .groupBy("shard", "bin").count()
        .as[(Int, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
      ex.foreach { case (sh, bin, nDocs, _, _) =>
        assert(assigned((sh, bin)) == nDocs, s"($sh,$bin) doc count mismatch")
      }
    }
  }

  test("property: chunking is lossless — stepped chunk prefixes rebuild the doc") {
    val docGen = Gen.choose(0, 40).map(n => (1 to n).map(i => s"w$i").mkString(" "))
    for ((doc, i) <- samples(docGen, n = 10).zipWithIndex) {
      val df = Seq((1L, doc)).toDF("id", "text")
      val chunks = Curation.chunkByTokens(df, "id", "text",
        chunkTokens = 7, overlapTokens = 2)
        .orderBy("chunk_idx").select("chunk").as[String].collect()
      val step = 5
      val rebuilt = chunks.zipWithIndex.map { case (c, idx) =>
        val toks = c.split(" ").toSeq
        if (idx == chunks.length - 1) toks else toks.take(step)
      }.flatten
      val want = if (doc.isEmpty) Seq.empty else doc.split(" ").toSeq
      assert(rebuilt.toSeq == want, s"case $i: doc of ${want.size} tokens")
    }
  }

  test("property: zvalue is monotone per coordinate (other coordinate fixed)") {
    import graft.sources.ZOrder
    val grid = (for { x <- 0 to 7; y <- 0 to 7 } yield (x, y)).toDF("x", "y")
    val z = grid.withColumn("z", ZOrder.zvalueWith(Seq("x", "y"),
        Seq((0.0, 7.0), (0.0, 7.0)), bits = 3))
      .as[(Int, Int, Long)].collect().map { case (x, y, v) => (x, y) -> v }.toMap
    for (y <- 0 to 7; x <- 0 until 7)
      assert(z((x, y)) < z((x + 1, y)), s"x-monotonicity broke at ($x,$y)")
    for (x <- 0 to 7; y <- 0 until 7)
      assert(z((x, y)) < z((x, y + 1)), s"y-monotonicity broke at ($x,$y)")
  }

  test("property: connectedComponents labels are true equivalence classes") {
    val edgesGen = Gen.listOfN(40,
      Gen.zip(Gen.choose(1L, 30L), Gen.choose(1L, 30L))).map(_.filter(p => p._1 != p._2))
    for (edges <- samples(edgesGen, n = 5) if edges.nonEmpty) {
      val pairs = edges.toDF("id_a", "id_b")
      val comp = Dedup.connectedComponents(pairs).as[(Long, Long)].collect().toMap
      // every edge endpoint is labeled and both ends share a component
      edges.foreach { case (a, b) =>
        assert(comp(a) == comp(b), s"edge ($a,$b) split across components")
      }
      // the label is a member of its own component (canonical representative)
      comp.values.foreach(c => assert(comp(c) == c, s"label $c not canonical"))
    }
  }
}
