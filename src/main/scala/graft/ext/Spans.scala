package graft.ext

import graft.functions.{TextFunctions => T}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Span-level exact substring deduplication (public technique: Lee et al.,
  * "Deduplicating Training Data Makes Language Models Better",
  * arXiv:2107.06499): instead of dropping whole near-duplicate documents,
  * find the exact token RANGES that repeat across the corpus and cut just
  * those. This is the op that removes shared license headers, navigation
  * chrome, and templated boilerplate from documents that are otherwise
  * unique — [[Dedup.spanStats]] measures the per-document amount of such
  * text; this object locates and strips it.
  *
  * The paper builds a corpus-wide suffix array; the Spark-native shape is
  * the positional inverted index: every length-n token window becomes a
  * (doc, position, windowHash) posting, windows whose hash occurs ≥
  * `minCount` times corpus-wide are "duplicated", and per-document runs of
  * duplicated windows merge into maximal spans with one ordered window per
  * document. Same answer for ranges of length ≥ n (a run of duplicated
  * n-windows IS a duplicated substring of that length), at a per-token
  * postings cost identical to the shingle pipelines the engine already
  * runs — no suffix sorting, no global order, nothing all-pairs.
  */
object Spans {

  /** Duplicated token spans: maximal `[span_start, span_end)` 0-based token
    * ranges (end-exclusive) in which EVERY length-`shingleN` token window
    * occurs at least `minCount` times corpus-wide. Occurrences are counted
    * in TOTAL — within-document repeats included — matching the suffix-array
    * semantics of the public technique (which scans the corpus as one
    * concatenated string, so a document repeating its own boilerplate twice
    * is duplicated text). Adjacent and overlapping duplicated windows merge
    * into one span; windows at positions p < q merge iff `q <= p + shingleN`
    * (overlap or contiguity — both mean one uninterrupted duplicated run).
    *
    * Returns (idCol, span_start, span_end), one row per maximal span.
    * Documents with no duplicated window produce no rows.
    *
    * Scale shape: the occurrence count is a partial (map-side) aggregate
    * over the exploded postings — its exchange carries (hash, count) pairs,
    * one per distinct window per mapper, never a posting list — and the
    * duplicated-window set semi-joins back against a second explode of the
    * postings (AQE picks broadcast when the set is small, sort-merge at
    * corpus scale where a minCount=2 set is far too common to broadcast —
    * the same adaptive trade [[Dedup.spanStats]] documents; re-evaluating
    * the explode per side is the accepted price of not funneling, exactly
    * as in [[Dedup.dropHotKeys]]). Then ONE exchange on the document id
    * whose partitioning serves BOTH the run-merge window and the span
    * groupBy (HashPartitioning(id) satisfies the (id, island) clustering).
    * Shuffles carry (id, pos, hash) — never text. The window is
    * per-document, bounded by document length, and `maxShingleFreq`
    * (default off) drops degenerate ultra-hot windows via the broadcast
    * anti-join cap ([[Dedup.dropHotKeys]]) when a corpus-wide stopword run
    * would otherwise mark half the corpus duplicated.
    */
  def duplicateSpans(df: DataFrame, idCol: String, textCol: String,
                     shingleN: Int = 3, minCount: Int = 2,
                     maxShingleFreq: Int = Int.MaxValue): DataFrame = {
    require(shingleN >= 1, s"shingleN must be >= 1 (got $shingleN)")
    require(minCount >= 2, s"minCount < 2 would mark every window duplicated (got $minCount)")
    // tokenize+shingle ONCE (r20, guide §1.2): the exploded postings feed
    // both the corpus-frequency aggregate and the semi-join probe side,
    // and with the frequency table broadcast the two consumers share no
    // exchange — each lazy reference re-ran the full shingle expression
    // over the corpus. The checkpoint stores the compact per-doc hash
    // ARRAY (same bytes buildNearIndex persists); the posexplode itself
    // is cheap and stays lazy on both branches.
    val shArr = df.select(col(idCol).as("id"),
      T.wordShingleHashes(col(textCol), shingleN).as("__sha"))
      .localCheckpoint(true)
    val sh = shArr.select(col("id"),
      posexplode(col("__sha")).as(Seq("pos", "sh_h")))
    val inv2 =
      if (maxShingleFreq == Int.MaxValue) sh
      else Dedup.dropHotKeys(sh, Seq("sh_h"), maxShingleFreq)
    val dup = inv2.groupBy("sh_h").agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= minCount).select("sh_h")
    val hits = inv2.join(dup, Seq("sh_h"), "left_semi").select("id", "pos")
    val w = Window.partitionBy("id").orderBy("pos")
    val runs = hits
      .withColumn("__prev", lag("pos", 1).over(w))
      .withColumn("__brk",
        when(col("__prev").isNull || col("pos") > col("__prev") + shingleN, 1L)
          .otherwise(0L))
      .withColumn("__isl",
        sum("__brk").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    runs.groupBy(col("id"), col("__isl"))
      .agg(min("pos").cast("long").as("span_start"),
        (max("pos") + shingleN).cast("long").as("span_end"))
      .select(col("id").as(idCol), col("span_start"), col("span_end"))
  }

  /** Strip every [[duplicateSpans]] range from each document: returns
    * (idCol, clean_text, n_removed) where `clean_text` rejoins (with single
    * spaces) the tokens outside all duplicated spans and `n_removed` counts
    * the tokens cut. Every input document comes back exactly once — a
    * document that is entirely duplicated text comes back with empty
    * `clean_text`, one with no duplicated span comes back unchanged (modulo
    * whitespace normalization: output tokens are always single-space
    * joined, the same canonicalization [[T.tokens]] applies everywhere).
    *
    * The span list per document is small (bounded by length/shingleN), so
    * the token filter is a per-row nested higher-order function — all
    * codegen, no UDF; the only additions over [[duplicateSpans]] are the
    * per-document span collect (same id partitioning) and the join back to
    * the documents.
    */
  def removeDuplicateSpans(df: DataFrame, idCol: String, textCol: String,
                           shingleN: Int = 3, minCount: Int = 2,
                           maxShingleFreq: Int = Int.MaxValue): DataFrame = {
    val spans = duplicateSpans(df, idCol, textCol, shingleN, minCount, maxShingleFreq)
      .groupBy(col(idCol).as("id"))
      .agg(collect_list(struct(col("span_start").as("s"), col("span_end").as("e")))
        .as("__spans"))
    val joined = df.select(col(idCol).as("id"), col(textCol).as("__text"))
      .join(spans, Seq("id"), "left")
      .withColumn("__spans", coalesce(col("__spans"),
        array().cast("array<struct<s:bigint,e:bigint>>")))
    val out = graft.functions.ExprOps.let(T.tokens(col("__text"))) { t =>
      graft.functions.ExprOps.let(
        when(size(t) === 0, array().cast("array<bigint>"))
          .otherwise(filter(sequence(lit(0L), size(t).cast("long") - 1),
            i => !exists(col("__spans"),
              s => i >= s.getField("s") && i < s.getField("e"))))) { kept =>
        struct(
          array_join(transform(kept, i => element_at(t, (i + 1).cast("int"))), " ")
            .as("clean_text"),
          (size(t) - size(kept)).cast("long").as("n_removed"))
      }
    }
    joined.select(col("id").as(idCol), out.getField("clean_text").as("clean_text"),
      out.getField("n_removed").as("n_removed"))
  }

  /** Corpus-wide duplicate-LINE removal (the C4/RefinedWeb line-dedup rule,
    * public technique: Raffel et al. arXiv:1910.10683 §2.2 drops repeated
    * three-sentence spans; Penedo et al. arXiv:2306.01116 drops repeated
    * lines): delete every non-empty trimmed line whose exact content occurs
    * at least `minCount` times corpus-wide (total occurrences — a doc
    * repeating its own footer counts), then rejoin the surviving lines with
    * single newlines. Returns (idCol, clean_text, n_removed_lines), every
    * input document exactly once; whitespace is normalized the same way
    * [[graft.functions.TextFunctions.linesOf]] normalizes it (lines
    * trimmed, blank lines dropped).
    *
    * Same plan shape as [[removeDuplicateSpans]] minus the run-merge: the
    * occurrence count partial-aggregates 8-byte line hashes, the
    * duplicated-hash set semi-joins back against the positional postings
    * (adaptive broadcast/sort-merge), removed line numbers collect per
    * document on one id exchange, and the rebuild is a codegen'd
    * higher-order filter. Shuffles carry (id, line_no, hash) — never line
    * text.
    */
  def stripDuplicateLines(df: DataFrame, idCol: String, textCol: String,
                          minCount: Int = 2): DataFrame = {
    require(minCount >= 2, s"minCount < 2 would drop every line (got $minCount)")
    val ln = df.select(col(idCol).as("id"),
      posexplode(T.linesOf(col(textCol))).as(Seq("ln_no", "line")))
      .select(col("id"), col("ln_no"), xxhash64(col("line")).as("ln_h"))
    val dup = ln.groupBy("ln_h").agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= minCount).select("ln_h")
    val removed = ln.join(dup, Seq("ln_h"), "left_semi")
      .groupBy("id").agg(collect_list(col("ln_no")).as("__rm"))
    val joined = df.select(col(idCol).as("id"), col(textCol).as("__text"))
      .join(removed, Seq("id"), "left")
      .withColumn("__rm", coalesce(col("__rm"), array().cast("array<int>")))
    val out = graft.functions.ExprOps.let(T.linesOf(col("__text"))) { ls =>
      graft.functions.ExprOps.let(
        when(size(ls) === 0, array().cast("array<int>"))
          .otherwise(filter(sequence(lit(0), size(ls) - 1),
            i => !array_contains(col("__rm"), i)))) { kept =>
        struct(
          array_join(transform(kept, i => element_at(ls, i + 1)), "\n")
            .as("clean_text"),
          (size(ls) - size(kept)).cast("long").as("n_removed_lines"))
      }
    }
    joined.select(col("id").as(idCol),
      out.getField("clean_text").as("clean_text"),
      out.getField("n_removed_lines").as("n_removed_lines"))
  }
}
