package graft.ext

import graft.functions.{VectorFunctions => V}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k (one codegen'd scan + a k-row
  * TakeOrdered — optimal for a single query vector even at 100 TB because
  * the scan is embarrassingly parallel and nothing shuffles).
  *
  * Scale path: sign-LSH bucketing — probe only same-bucket rows; for batch
  * query sets, bucket both sides and join on bucket, turning an O(N·Q)
  * cross product into a co-partitioned hash join.
  */
object Similarity {

  /** Top-k nearest rows to the embedding of `queryId` within `df` itself.
    * The one-row query side is broadcast; score is rounded to `roundTo`
    * decimals and used as the sort key so ordering is reproducible.
    */
  def cosineTopK(df: DataFrame, idCol: String, vecCol: String,
                 queryId: Long, k: Int, roundTo: Int = 4): DataFrame = {
    val q = df.filter(col(idCol) === queryId).select(col(vecCol).as("__qv"))
    df.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .withColumn("score", round(V.cosine(col(vecCol), col("__qv")), roundTo))
      .select(col(idCol), col("score"))
      .orderBy(desc("score"), col(idCol))
      .limit(k)
  }

  /** Brute-force top-k against an explicit query vector literal. */
  def cosineTopKVec(df: DataFrame, idCol: String, vecCol: String,
                    queryVec: Seq[Double], k: Int): DataFrame = {
    val qv = array(queryVec.map(lit): _*)
    df.withColumn("score", V.cosine(col(vecCol), qv))
      .select(col(idCol), col("score"))
      .orderBy(desc("score"), col(idCol))
      .limit(k)
  }

  /** LSH-bucketed ANN: candidates share the query's sign-LSH bucket (or any
    * bucket within `probes` Hamming-adjacent bit flips), exact cosine only
    * on candidates. Recall/cost tradeoff via `lshBits` and `probes`. At
    * corpus scale prefer 16+ bits: 2^16 buckets keeps each bucket ~1/65k of
    * the corpus, so the probe-side join touches a bounded candidate set
    * (8 bits = 256 global buckets goes quadratic within buckets).
    */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String, dim: Int,
              queryId: Long, k: Int, lshBits: Int = 16, probes: Int = 4): DataFrame = {
    val bucketed = df.withColumn("__b", V.signLshBucket(col(vecCol), lshBits, dim))
    val q = bucketed.filter(col(idCol) === queryId)
      .select(col(vecCol).as("__qv"), col("__b").as("__qb"))
    // query bucket + single-bit-flip neighbors (multi-probe)
    val probeBuckets = explode(array_distinct(concat(
      array(col("__qb")),
      slice(transform(sequence(lit(0), lit(lshBits - 1)),
        i => col("__qb").bitwiseXOR(call_function("shiftleft", lit(1L), i))),
        1, math.max(probes - 1, 0)))))
    val probed = q.select(col("__qv"), probeBuckets.as("__b"))
    bucketed.filter(col(idCol) =!= queryId)
      .join(broadcast(probed), "__b")
      .withColumn("score", round(V.cosine(col(vecCol), col("__qv")), 4))
      .select(col(idCol), col("score"))
      .orderBy(desc("score"), col(idCol))
      .limit(k)
  }

  /** Int8-quantized brute-force top-k: corpus and query vectors are
    * symmetric-int8 quantized ([[VectorFunctions.quantizeInt8]]) and ranked
    * by the INTEGER dot product of the codes. The 100 TB economics: the
    * scan reads 1/4 the bytes of float32 (1/8 of float64) and the hot loop
    * is integer multiply-add; ranking by `dot(q_a, q_b)` is monotone in the
    * reconstructed dot `scale_a·scale_b·dot(q_a,q_b)` for a FIXED query, so
    * per-vector scales only reorder across corpus vectors with different
    * norms — rescore the top `rescoreFactor × k` candidates with exact
    * cosine to restore that precision. Integer scores are bit-exact across
    * engines (no float summation order), so the candidate ranking itself is
    * oracle-checkable.
    */
  def int8TopK(df: DataFrame, idCol: String, vecCol: String,
               queryId: Long, k: Int): DataFrame = {
    val quant = df.select(col(idCol), V.quantizeInt8(col(vecCol)).getField("q").as("__q8"))
    val q = quant.filter(col(idCol) === queryId).select(col("__q8").as("__qq"))
    quant.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .withColumn("iscore",
        aggregate(zip_with(col("__q8"), col("__qq"), (x, y) => (x * y).cast("bigint")),
          lit(0L), (acc, v) => acc + v))
      .select(col(idCol), col("iscore"))
      .orderBy(desc("iscore"), col(idCol))
      .limit(k)
  }

  /** Persist the int8 code table once — the scan side of the 1-byte/element
    * economics [[int8TopK]]'s scaladoc promises (re-quantizing float vectors
    * per query reads the full-width corpus every time). Codes are stored as
    * `array<tinyint>` (true 1-byte parquet elements) plus the per-vector
    * scale for reconstruction; written once, probed by every query via
    * [[int8TopKFromCodes]].
    */
  def writeCodes(df: DataFrame, idCol: String, vecCol: String, path: String): Unit =
    df.select(col(idCol), V.quantizeInt8(col(vecCol)).as("__qs"))
      .select(col(idCol), col("__qs").getField("scale").as("scale"),
        transform(col("__qs").getField("q"), _.cast("byte")).as("code"))
      .write.mode("overwrite").parquet(path)

  /** [[int8TopK]] over a persisted [[writeCodes]] table: same integer dot
    * product, same ranking, but the scan reads 1-byte codes instead of
    * re-quantizing the float corpus. Byte codes are widened to int BEFORE
    * multiplying (byte×byte would wrap at ±127·±127).
    */
  def int8TopKFromCodes(codes: DataFrame, idCol: String,
                        queryId: Long, k: Int): DataFrame = {
    val q = codes.filter(col(idCol) === queryId).select(col("code").as("__qc"))
    codes.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .withColumn("iscore",
        aggregate(zip_with(col("code"), col("__qc"),
          (x, y) => (x.cast("int") * y.cast("int")).cast("bigint")),
          lit(0L), (acc, v) => acc + v))
      .select(col(idCol), col("iscore"))
      .orderBy(desc("iscore"), col(idCol))
      .limit(k)
  }

  /** Batch int8 search over a [[writeCodes]] table: top-k by integer dot
    * product for EVERY query row, in one pass over the code scan. Unlike
    * the LSH/IVF/PQ batch tiers this is EXACT over the quantized codes —
    * integer scores have no summation-order dependence, so the batch
    * ranking carries a full hash oracle, not just a recall gate.
    *
    * Same kernel shape as [[graft.ext.Pq.adcTopKMany]]: query codes
    * collect + broadcast (Q × dim bytes — tiny), each partition keeps a
    * k-capped heap per query and emits ≤ Q·k candidate rows, the only
    * shuffle ranks the Q·k·P survivors — the Q×N score space is never
    * materialized, and the corpus read is the 1-byte code table. With
    * `excludeSelf` (the default — right when queries ARE rows of the code
    * table) a query never matches the corpus row carrying its own id;
    * pass `excludeSelf = false` when query ids live in a DIFFERENT id
    * space than the corpus (ad-hoc query batches), where dropping the
    * corpus row that happens to share a number would silently shrink that
    * query's ranking. Returns (query_id, corpus_id, iscore) with
    * deterministic (iscore desc, id) ranking, equal to per-query
    * [[int8TopKFromCodes]] when `excludeSelf` is on. The byte-code column
    * is `codeCol` on BOTH frames (default `"code"`, what the int8 writers
    * emit) — callers with differently-named columns pass the name instead
    * of renaming (r12 advice).
    */
  def int8TopKMany(codes: DataFrame, idCol: String, queries: DataFrame,
                   queryIdCol: String, k: Int,
                   excludeSelf: Boolean = true,
                   codeCol: String = "code"): DataFrame = {
    require(k > 0)
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val qs = queries.select(col(queryIdCol).cast("long"), col(codeCol)).collect()
      .map(r => (r.getLong(0), r.getSeq[Byte](1).map(_.toInt).toArray))
    require(qs.map(_._1).distinct.length == qs.length,
      "duplicate query ids — per-query top-k would merge their candidates")
    val spark = codes.sparkSession
    val bcastQ = spark.sparkContext.broadcast(qs)
    val exclSelf = excludeSelf
    val in = codes.select(col(idCol).cast("long"), col(codeCol))
    val outSchema = StructType(Seq(
      StructField("query_id", LongType, nullable = false),
      StructField("corpus_id", LongType, nullable = false),
      StructField("iscore", LongType, nullable = false)))
    // heap dequeues its max; make "max" = the WORST kept candidate (lowest
    // iscore, then largest id) so a better candidate replaces the head
    val byWorst = Ordering.Tuple2(Ordering.Long.reverse, Ordering.Long)
    // InternalRow scan + toByteArray: the code column decodes to a
    // primitive byte[] with no per-element boxing (same decode-bound
    // finding as the Hamming kernel — ScaleHamming / SCALING.md r12)
    val candidates = spark.createDataFrame(
      in.queryExecution.toRdd.mapPartitions { rows =>
        if (!rows.hasNext) Iterator.empty
        else {
          val queries = bcastQ.value
          val heaps = Array.fill(queries.length)(
            scala.collection.mutable.PriorityQueue.empty[(Long, Long)](byWorst))
          rows.foreach { r =>
            val id = r.getLong(0); val code = r.getArray(1).toByteArray()
            var qi = 0
            while (qi < queries.length) {
              val (qid, qc) = queries(qi)
              if (!exclSelf || id != qid) {
                var s = 0L; var i = 0
                while (i < qc.length) { s += code(i).toLong * qc(i); i += 1 }
                val h = heaps(qi)
                // keep if better than the current worst: higher score, or
                // equal score with smaller id
                if (h.size < k) h.enqueue((s, id))
                else if (s > h.head._1 || (s == h.head._1 && id < h.head._2)) {
                  h.dequeue(); h.enqueue((s, id))
                }
              }
              qi += 1
            }
          }
          heaps.iterator.zip(queries.iterator).flatMap { case (h, (qid, _)) =>
            h.iterator.map { case (s, id) => Row(qid, id, s) }
          }
        }
      }, outSchema)
    val w = Window.partitionBy("query_id").orderBy(desc("iscore"), col("corpus_id"))
    candidates.withColumn("__rk", row_number().over(w)).filter(col("__rk") <= k)
      .drop("__rk")
  }

  /** [[int8TopKMany]] for FLOAT query vectors (queries that are not already
    * rows of the code table — the ad-hoc search-API shape): queries are
    * quantized by the SAME expression the codes were written with
    * ([[graft.functions.VectorFunctions.quantizeInt8]], so rounding is
    * bit-identical to the corpus side), then searched as codes.
    * `excludeSelf` defaults to FALSE here — ad-hoc query ids live in a
    * caller-chosen id space unrelated to the corpus, so an id collision
    * must not silently drop a legitimate corpus row; flip it on only when
    * the float queries really are re-reads of corpus rows.
    *
    * MIGRATION (round 8): the default used to be `excludeSelf = true`. The
    * signature change is source-compatible, so a pre-round-8 caller whose
    * float queries ARE corpus rows now gets each query's own row back at
    * rank 1 (consuming a top-k slot) unless it passes
    * `excludeSelf = true` explicitly. Callers whose query ids are a
    * separate id space — the documented contract of this method — are
    * unaffected and no longer lose colliding corpus rows.
    */
  def int8TopKManyVecs(codes: DataFrame, idCol: String, queries: DataFrame,
                       queryIdCol: String, queryVecCol: String, k: Int,
                       excludeSelf: Boolean = false): DataFrame = {
    val qcodes = queries.select(col(queryIdCol),
      transform(V.quantizeInt8(col(queryVecCol)).getField("q"),
        _.cast("byte")).as("code"))
    int8TopKMany(codes, idCol, qcodes, queryIdCol, k, excludeSelf)
  }

  /** Int8 scan + exact-cosine rescore: rank the corpus by quantized integer
    * dot product, keep the top `rescoreFactor × k`, then rescore ONLY those
    * candidates with full-precision cosine and return the top k — the
    * precision the per-vector scales drop (int8 ranking is monotone in
    * `scale_a·dot` for a fixed query, so vectors with different norms can
    * swap places near the cut). The rescore side is a broadcast of
    * `rescoreFactor × k` ids probing the float corpus — the 100 TB read is
    * the 1-byte code scan, not the float table.
    */
  def int8TopKRescored(df: DataFrame, idCol: String, vecCol: String,
                       queryId: Long, k: Int, rescoreFactor: Int = 4,
                       roundTo: Int = 4): DataFrame = {
    val cand = int8TopK(df, idCol, vecCol, queryId, k * rescoreFactor)
      .select(col(idCol))
    val q = df.filter(col(idCol) === queryId).select(col(vecCol).as("__qv"))
    df.join(broadcast(cand), Seq(idCol))
      .crossJoin(broadcast(q))
      .withColumn("score", round(V.cosine(col(vecCol), col("__qv")), roundTo))
      .select(col(idCol), col("score"))
      .orderBy(desc("score"), col(idCol))
      .limit(k)
  }

  /** Binary-quantized top-k: corpus and query vectors are collapsed to
    * their SIGN BITS ([[VectorFunctions.packSignBits]] — 1 bit/dim) and
    * ranked by Hamming distance, ascending. For unit-norm-ish embeddings,
    * Hamming distance over sign bits is a monotone estimator of angular
    * distance (each agreeing sign bit is one random-ish half-space both
    * vectors share), so the nearest-by-Hamming set is a high-recall
    * candidate pool for exact rescoring ([[hammingRescoredTopK]]).
    *
    * The 100 TB economics are the whole point of the tier: 64 dims = ONE
    * 8-byte long per row (32× less scan than float32, 8× less than int8),
    * and the distance kernel is `popcount(xor)` — no multiplies at all.
    * Distances are small integers, so the full ranking is bit-exact across
    * engines and carries a complete hash oracle (like the int8 tier,
    * unlike the float-LSH tiers).
    */
  def hammingTopK(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                  queryId: Long, k: Int): DataFrame = {
    val sigs = df.select(col(idCol), V.packSignBits(col(vecCol), dim).as("__sig"))
    val q = sigs.filter(col(idCol) === queryId).select(col("__sig").as("__qs"))
    sigs.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .withColumn("hdist", V.hammingPacked(col("__sig"), col("__qs")))
      .select(col(idCol), col("hdist"))
      .orderBy(col("hdist"), col(idCol))
      .limit(k)
  }

  /** Persist the packed sign-bit signature table once — the 1-bit/dim scan
    * side [[hammingTopK]]'s scaladoc promises (re-packing float vectors per
    * query reads the full-width corpus every time). 64 dims = one BIGINT
    * per row; written once, probed by every query via [[hammingTopKMany]].
    */
  def writeSignBits(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                    path: String): Unit =
    df.select(col(idCol), V.packSignBits(col(vecCol), dim).as("sig"))
      .write.mode("overwrite").parquet(path)

  /** Batch Hamming search over a [[writeSignBits]] table: top-k by Hamming
    * distance for EVERY query row, in one pass over the signature scan.
    * Same kernel shape as [[int8TopKMany]]: query signatures collect +
    * broadcast (Q × words longs — tiny), each partition keeps a k-capped
    * heap per query over a `java.lang.Long.bitCount(xor)` inner loop — the
    * cheapest batch-ANN kernel in the engine (dim/64 xor+popcounts per
    * pair vs dim multiply-adds for int8) — and emits ≤ Q·k candidates; the
    * only shuffle ranks the Q·k·P survivors. Integer distances ⇒ the whole
    * batch ranking is oracle-compared. Ranking is (hdist asc, id asc),
    * equal to per-query [[hammingTopK]] when `excludeSelf` is on; pass
    * `excludeSelf = false` when query ids live in a different id space
    * than the corpus (same contract as [[int8TopKMany]]). The packed
    * signature column is `sigCol` on BOTH frames (default `"sig"`, what
    * [[writeSignBits]] emits) — callers with differently-named columns
    * pass the name instead of renaming (r12 advice).
    */
  def hammingTopKMany(sigs: DataFrame, idCol: String, queries: DataFrame,
                      queryIdCol: String, k: Int,
                      excludeSelf: Boolean = true,
                      sigCol: String = "sig"): DataFrame = {
    require(k > 0)
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val qs = queries.select(col(queryIdCol).cast("long"), col(sigCol)).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    require(qs.map(_._1).distinct.length == qs.length,
      "duplicate query ids — per-query top-k would merge their candidates")
    val spark = sigs.sparkSession
    val bcastQ = spark.sparkContext.broadcast(qs)
    val exclSelf = excludeSelf
    val in = sigs.select(col(idCol).cast("long"), col(sigCol))
    val outSchema = StructType(Seq(
      StructField("query_id", LongType, nullable = false),
      StructField("corpus_id", LongType, nullable = false),
      StructField("hdist", LongType, nullable = false)))
    // heap dequeues its max; "max" = the WORST kept candidate (LARGEST
    // hdist, then largest id) so a closer candidate replaces the head
    val byWorst = Ordering.Tuple2(Ordering.Long, Ordering.Long)
    // InternalRow scan + toLongArray: the signature column is read as a
    // PRIMITIVE long[] with no per-element boxing — at 1-word signatures
    // the row-decode path IS the kernel, and the boxed Row.getSeq form was
    // measured decode-bound (see ScaleHamming / SCALING.md r12)
    val candidates = spark.createDataFrame(
      in.queryExecution.toRdd.mapPartitions { rows =>
        if (!rows.hasNext) Iterator.empty
        else {
          val queries = bcastQ.value
          val heaps = Array.fill(queries.length)(
            scala.collection.mutable.PriorityQueue.empty[(Long, Long)](byWorst))
          rows.foreach { r =>
            val id = r.getLong(0); val sig = r.getArray(1).toLongArray()
            var qi = 0
            while (qi < queries.length) {
              val (qid, qsig) = queries(qi)
              if (!exclSelf || id != qid) {
                var d = 0L; var i = 0
                while (i < qsig.length) {
                  d += java.lang.Long.bitCount(sig(i) ^ qsig(i)); i += 1
                }
                val h = heaps(qi)
                // keep if better than the current worst: lower distance,
                // or equal distance with smaller id
                if (h.size < k) h.enqueue((d, id))
                else if (d < h.head._1 || (d == h.head._1 && id < h.head._2)) {
                  h.dequeue(); h.enqueue((d, id))
                }
              }
              qi += 1
            }
          }
          heaps.iterator.zip(queries.iterator).flatMap { case (h, (qid, _)) =>
            h.iterator.map { case (d, id) => Row(qid, id, d) }
          }
        }
      }, outSchema)
    val w = Window.partitionBy("query_id").orderBy(col("hdist"), col("corpus_id"))
    candidates.withColumn("__rk", row_number().over(w)).filter(col("__rk") <= k)
      .drop("__rk")
  }

  /** Hamming candidate scan + exact-cosine rescore: rank the corpus by
    * sign-bit Hamming distance, keep the top `rescoreFactor × k`
    * (deterministic (hdist asc, id asc) cut), then rescore ONLY those with
    * full-precision cosine and return the top k. The 100 TB read is the
    * 1-bit signature scan; the float table is touched for
    * `rescoreFactor × k` rows via a broadcast semi-join. The whole
    * two-stage pipeline is deterministic, so the oracle replicates BOTH
    * stages (candidate cut included) — no recall assumption.
    */
  def hammingRescoredTopK(df: DataFrame, idCol: String, vecCol: String,
                          dim: Int, queryId: Long, k: Int,
                          rescoreFactor: Int = 4, roundTo: Int = 4): DataFrame = {
    val cand = hammingTopK(df, idCol, vecCol, dim, queryId, k * rescoreFactor)
      .select(col(idCol))
    val q = df.filter(col(idCol) === queryId).select(col(vecCol).as("__qv"))
    df.join(broadcast(cand), Seq(idCol))
      .crossJoin(broadcast(q))
      .withColumn("score", round(V.cosine(col(vecCol), col("__qv")), roundTo))
      .select(col(idCol), col("score"))
      .orderBy(desc("score"), col(idCol))
      .limit(k)
  }

  /** Batch k-NN: for every row of `queries`, its top-k neighbors in `corpus`
    * by cosine, via bucket join + per-query window rank. This is the
    * many-query scale path (no cross product).
    */
  def bucketJoinKnn(corpus: DataFrame, queries: DataFrame, idCol: String,
                    vecCol: String, dim: Int, k: Int, lshBits: Int = 16): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"),
      V.signLshBucket(col(vecCol), lshBits, dim).as("__b"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      V.signLshBucket(col(vecCol), lshBits, dim).as("__b"))
    val scored = c.join(q, Seq("__b"))
      .filter(col("corpus_id") =!= col("query_id"))
      .withColumn("score", round(V.cosine(col("cv"), col("qv")), 4))
    val w = Window.partitionBy("query_id").orderBy(desc("score"), col("corpus_id"))
    scored.withColumn("__rk", row_number().over(w)).filter(col("__rk") <= k)
      .select("query_id", "corpus_id", "score")
  }
}
