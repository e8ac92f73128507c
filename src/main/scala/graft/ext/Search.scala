package graft.ext

import graft.functions.{TextFunctions => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Full-text relevance search over a document corpus — BM25 (Robertson/
  * Sparck Jones; the `+1` idf variant, as in Lucene, keeps idf positive for
  * terms in more than half the corpus).
  *
  * Scale shape for "run a query against 100 TB": the postings explode is
  * filtered to the query's terms AT THE SCAN (an `isin` over a few
  * literals), so the shuffle carries only matching (doc, term) pairs —
  * corpus-linear work happens in one codegen'd pass, everything after is
  * proportional to the hit set. Document frequencies and corpus stats are
  * single-row/`|terms|`-row aggregates that broadcast. Per-document scores
  * sum the per-term contributions in FIXED column order (conditional
  * aggregates, not a double-sum over an unordered group), so results are
  * bit-deterministic and cross-engine verifiable.
  */
object Search {

  /** Top-k TF-IDF terms per document — keyword extraction over the corpus.
    * tf and df are one shuffle each on the term hash; the per-document
    * top-k window partitions on the document id (bounded by vocabulary per
    * doc). Scores are rounded BEFORE ranking so ordering is reproducible
    * cross-engine (ties broken by the term itself).
    */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
                    k: Int): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
      explode(T.tokens(lower(col(textCol)))).as("w"))
    val tf = toks.groupBy("id", "w").agg(count(lit(1)).as("tf"))
    val dft = tf.groupBy("w").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dft, "w").crossJoin(broadcast(n))
      .withColumn("score",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 4))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(desc("score"), col("w"))
    scored.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k)
      .select(col("id").as(idCol), col("w").as("term"), col("score"),
        col("__rn").cast("bigint").as("rank"))
  }

  /** Corpus vocabulary head: the `k` most frequent tokens with term
    * frequency and document frequency — the tokenizer-coverage /
    * stopword-discovery dashboard for a new corpus. One explode →
    * one (token) aggregation (tf sums map-side; df is a distinct-by-doc
    * count on the same key) → TakeOrdered top-k; ties broken by the token
    * so the cut is deterministic cross-engine.
    */
  def topTokens(docs: DataFrame, idCol: String, textCol: String,
                k: Int): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
      explode(T.tokens(lower(col(textCol)))).as("token"))
    toks.groupBy("token")
      .agg(count(lit(1)).as("tf"), countDistinct(col("id")).as("df"))
      .orderBy(desc("tf"), col("token")).limit(k)
  }

  /** Corpus-relative rare-token ratio — the quality signal per-document
    * heuristics (length/punct/stopword) cannot see: a document whose tokens
    * mostly appear ≤ `maxCount` times in the WHOLE corpus is OCR noise,
    * mojibake, or gibberish, while near-zero `rare_pm` flags boilerplate.
    * The poor man's perplexity, in integer math only, so the result is
    * hash-exact cross-engine (an avg-log-likelihood would accumulate
    * floats in engine-dependent order).
    *
    * Output: (id, n_tokens, rare_tokens, rare_pm) — rare_pm = per-mille of
    * token OCCURRENCES whose corpus-wide occurrence count is ≤ maxCount.
    *
    * Scale shape: explode → partial-aggregate to (id, token, count) FIRST —
    * the exchange key is the high-cardinality (id, token) pair, so the
    * hottest token ('the') spreads across reducers instead of funneling
    * every occurrence through one task (the same pre-aggregation shape the
    * dedup tier's df-cap uses; an explicit `repartition(token)` before the
    * count was exactly that funnel, and it also forfeited map-side partial
    * aggregation). The corpus-wide token count then aggregates the REDUCED
    * relation (one row per document per distinct token, partial-agg'd
    * map-side again), and the semi-join back streams it — no operator
    * buffers a hot token's postings, and the straggler scan of a hot
    * token's per-doc rows is bounded by distinct docs, not occurrences.
    */
  def rareTokenStats(docs: DataFrame, idCol: String, textCol: String,
                     maxCount: Long = 2L): DataFrame = {
    require(maxCount >= 1, "maxCount must be at least 1")
    val toks = docs.select(col(idCol).as("id"),
      explode(T.tokens(lower(col(textCol)))).as("w"))
    val perDoc = toks.groupBy("id", "w").agg(count(lit(1)).as("__c"))
    val rare = perDoc.groupBy("w")
      .agg(sum(col("__c")).as("__tf"))
      .filter(col("__tf") <= maxCount).select("w")
    val rareCnt = perDoc.join(rare, Seq("w"), "left_semi")
      .groupBy("id").agg(sum(col("__c")).as("rare_tokens"))
    val nTok = docs.select(col(idCol).as("id"),
      T.tokenCount(col(textCol)).cast("bigint").as("n_tokens"))
    nTok.join(rareCnt, Seq("id"), "left")
      .select(col("id").as(idCol), col("n_tokens"),
        coalesce(col("rare_tokens"), lit(0L)).as("rare_tokens"))
      .withColumn("rare_pm", when(col("n_tokens") === 0, lit(0L)).otherwise(
        floor(col("rare_tokens") * 1000.0 / col("n_tokens") + 0.5).cast("bigint")))
  }

  /** Top-k BM25 matches for `queryTerms`. Returns (doc_id, score). */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "need at least one query term")
    val terms = queryTerms.map(_.toLowerCase).distinct

    val dl = docs.select(col(idCol).as("id"),
      T.tokenCount(col(textCol)).as("dl"))
    // exact corpus stats: sum of bigints, divided once — no double-sum
    // ordering dependence
    val corpus = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))

    val tf = docs.select(col(idCol).as("id"),
        explode(T.tokens(lower(col(textCol)))).as("w"))
      .filter(col("w").isin(terms: _*))
      .groupBy("id", "w").agg(count(lit(1)).as("tf"))
    val dft = tf.groupBy("w").agg(count(lit(1)).as("df"))

    val contrib = tf
      .join(broadcast(dft), "w")
      .join(dl, "id")
      .crossJoin(broadcast(corpus))
      .withColumn("avgdl", col("sum_dl").cast("double") / col("n_docs"))
      .withColumn("idf",
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .withColumn("c", col("idf") * (col("tf") * (k1 + 1)) /
        (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))

    // fixed-order per-term columns → deterministic score assembly
    val perTerm = contrib.groupBy("id")
      .pivot("w", terms).agg(first(col("c")))
    val score = terms.map(t => coalesce(col(s"`$t`"), lit(0.0)))
      .reduce(_ + _)
    perTerm.select(col("id").as(idCol), round(score, 4).as("score"))
      .orderBy(desc("score"), col(idCol))
      .limit(k)
  }

  /** Reciprocal Rank Fusion (Cormack, Clarke & Büttcher, SIGIR 2009) of
    * per-query ranked lists from heterogeneous retrievers — the hybrid
    * lexical + semantic retrieval step of a RAG-style curation pipeline,
    * where BM25 and embedding ranks live on incomparable score scales and
    * only the RANKS are fused: rrf(d) = Σᵣ 1/(kRrf + rankᵣ(d)).
    *
    * Each input frame carries (queryCol, idCol, `rank`) — a 1-based BIGINT
    * rank within its query, as [[SearchIndex.bm25TopKIndexedMany]] emits
    * (rank a semantic list with a query-partitioned `row_number` over its
    * integer scores). Taking ranks rather than scores keeps fusion
    * deterministic by construction: the per-retriever contributions are
    * assembled LEFT-TO-RIGHT through a chain of full-outer joins (fixed
    * float addition order — never an unordered sum aggregate), so the
    * result is hash-reproducible cross-engine.
    *
    * Scale shape: every input is already a top-k list, so all frames are
    * |queries| × k rows — the joins and the final per-query window are
    * bounded by the fused candidate set, never by the corpus.
    */
  def rrfFuse(rankings: Seq[DataFrame], queryCol: String, idCol: String,
              kRrf: Int = 60, topK: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking to fuse")
    require(kRrf > 0 && topK > 0, "kRrf and topK must be positive")
    val prepped = rankings.zipWithIndex.map { case (df, i) =>
      df.select(col(queryCol).cast("long").as("query_id"),
        col(idCol).cast("long").as("id"),
        (lit(1.0) / (lit(kRrf.toDouble) + col("rank").cast("double")))
          .as(s"__rrf_$i"))
    }
    val joined = prepped.reduceLeft((a, b) =>
      a.join(b, Seq("query_id", "id"), "full_outer"))
    val fused = joined.withColumn("rrf",
      round(rankings.indices.map(i => coalesce(col(s"__rrf_$i"), lit(0.0)))
        .reduce(_ + _), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(desc("rrf"), col("id"))
    fused.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= topK)
      .select(col("query_id").as(queryCol), col("id").as(idCol),
        col("rrf"), col("__rn").cast("bigint").as("rank"))
  }
}
