package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Bloom-filter membership dedup — the Dolma-pipeline shape (Soldaini et
  * al. arXiv:2402.00159 use exactly this for exact-dedup at web scale):
  * the corpus is summarized once into an m-bit bitmap, the bitmap is
  * BROADCAST, and every incoming batch row tests its k bit positions
  * scan-side. The batch side never shuffles and the corpus is never
  * rescanned — at 100 TB the corpus pass is one linear scan producing a
  * fixed-size artifact, and ingest dedup becomes a map-only job, which is
  * the entire point vs the anti-join (`Dedup.incrementalExact`) when the
  * corpus no longer fits a broadcast hash join or a semi-join is too hot.
  *
  * Trade-off (documented, not hidden): membership is approximate —
  * false POSITIVES at the classic rate (~0.61^(mBits/n) for optimal k),
  * never false negatives, so novel-content loss is bounded and tunable
  * while true duplicates are always caught. Pipelines that cannot accept
  * any loss route "maybe duplicate" rows through an exact rescore
  * (anti-join just the flagged slice — usually a tiny fraction).
  *
  * Determinism: positions derive from md5 of the content via the repo's
  * standard hex-prefix fold (two independent 48-bit values, then
  * Kirsch–Mitzenmacher double hashing `pos_i = (h1 + i·h2) mod m`), so a
  * DuckDB oracle replays every probe exactly — the bitmap-membership test
  * is set-membership of probe positions, which SQL expresses losslessly.
  * No RNG, no JVM-hash dependence; the same corpus always builds the same
  * bitmap on any cluster size.
  *
  * Reference anchor: the reference dedups via ClickHouse flag columns
  * (`src/Sinks/Clickhouse.php` lifecycle) — this is the native replacement
  * for the "have I seen this content" membership question at scales where
  * a DB round-trip per batch is not an option.
  */
object Bloom {

  /** 48-bit deterministic hash of `text` from the md5 hex prefix —
    * `conv` of 12 hex chars, exact in both engines (2^48 < 2^53 keeps the
    * DuckDB double-fold mirror bit-exact). Null text hashes as "".
    */
  private def h48(text: Column, salt: String): Column =
    conv(substring(md5(concat(coalesce(text, lit("")), lit(":" + salt))), 1, 12),
      16, 10).cast("long")

  /** The k probe positions for one row: Kirsch–Mitzenmacher double
    * hashing, h2 forced odd so probes cycle through all residues for any
    * power-of-two m. Pure codegen'd arithmetic — an `array<bigint>` column.
    */
  def probes(text: Column, k: Int, mBits: Long, salt: String = "graft"): Column = {
    require(k >= 1 && k <= 32, s"k must be in [1,32], got $k")
    require(mBits >= 64, s"mBits must be >= 64, got $mBits")
    val h1 = h48(text, salt + ":b1")
    val h2 = h48(text, salt + ":b2").bitwiseOR(lit(1L))
    array((0 until k).map(i => (h1 + h2 * i) % mBits): _*)
  }

  /** Build the m-bit corpus bitmap: one linear scan, per-partition local
    * bitmaps OR-merged on a tree — no shuffle of row data at all; the
    * only traffic is (partitions × m/8) bytes of bitmap. `mBits` is
    * driver/executor memory (m/8 bytes, e.g. 2^30 bits = 128 MB — size at
    * ~10 bits per corpus doc for ~1% FP with k=7); for corpora beyond a
    * single broadcastable bitmap, shard by `hashBucket(content)` and
    * build one bitmap per shard.
    */
  def build(corpus: DataFrame, textCol: String, k: Int, mBits: Long,
            salt: String = "graft"): Array[Long] = {
    require(mBits % 64 == 0 && mBits <= (1L << 33),
      s"mBits must be a multiple of 64 and <= 2^33, got $mBits")
    val words = (mBits / 64).toInt
    corpus.select(probes(col(textCol), k, mBits, salt).as("p"))
      .rdd.treeAggregate(new Array[Long](words))(
        (arr, row) => {
          val ps = row.getSeq[Long](0)
          var i = 0
          while (i < ps.length) {
            val p = ps(i)
            arr((p >> 6).toInt) |= 1L << (p & 63)
            i += 1
          }
          arr
        },
        (a, b) => {
          var i = 0
          while (i < a.length) { a(i) |= b(i); i += 1 }
          a
        })
  }

  /** Flag every batch row whose k probe bits are ALL set in the broadcast
    * bitmap: adds `maybe_dup` (true = seen-or-false-positive, false =
    * definitely novel). Map-only — the bitmap rides the broadcast, the
    * batch never shuffles, and probes are computed in codegen before the
    * single per-partition bit-test pass.
    */
  def flagDuplicates(batch: DataFrame, textCol: String, bits: Array[Long],
                     k: Int, mBits: Long, salt: String = "graft"): DataFrame =
    flagDuplicatesBc(batch, textCol,
      batch.sparkSession.sparkContext.broadcast(bits), k, mBits, salt)

  /** [[flagDuplicates]] against an ALREADY-broadcast bitmap — the form a
    * long-running stream uses so the caller owns the broadcast lifecycle
    * (create once per bitmap version, `destroy()` after the batch that
    * consumed it is fully written; a fresh broadcast per micro-batch that
    * is never destroyed leaks one bitmap-sized block per batch).
    */
  def flagDuplicatesBc(batch: DataFrame, textCol: String,
                       bc: org.apache.spark.broadcast.Broadcast[Array[Long]],
                       k: Int, mBits: Long, salt: String = "graft"): DataFrame = {
    require(bc.value.length.toLong * 64 == mBits,
      s"bitmap has ${bc.value.length * 64L} bits, expected $mBits")
    val spark = batch.sparkSession
    // collision-free temp column: a batch that already carries a column
    // named "__probes" must get it back untouched, and the positional read
    // below must land on OUR appended column, not the caller's
    val probeCol = Iterator.from(0).map(i => s"__graft_bloom_probes_$i")
      .find(n => !batch.columns.contains(n)).get
    val in = batch.withColumn(probeCol, probes(col(textCol), k, mBits, salt))
    val outSchema = StructType(batch.schema.fields :+
      StructField("maybe_dup", BooleanType, nullable = false))
    val nCols = batch.schema.fields.length
    spark.createDataFrame(in.rdd.mapPartitions { rows =>
      val b = bc.value
      rows.map { r =>
        val ps = r.getSeq[Long](nCols)
        var dup = true
        var i = 0
        while (dup && i < ps.length) {
          val p = ps(i)
          dup = (b((p >> 6).toInt) & (1L << (p & 63))) != 0
          i += 1
        }
        Row.fromSeq(r.toSeq.take(nCols) :+ dup)
      }
    }, outSchema)
  }

  /** Keep only definitely-novel batch rows (drops `maybe_dup` rows — the
    * loss-tolerant fast path; route flagged rows through an exact
    * anti-join first if loss is unacceptable).
    */
  def filterNovel(batch: DataFrame, textCol: String, bits: Array[Long],
                  k: Int, mBits: Long, salt: String = "graft"): DataFrame =
    flagDuplicates(batch, textCol, bits, k, mBits, salt)
      .filter(!col("maybe_dup")).drop("maybe_dup")

  /** Persist a bitmap as (idx, word) parquet — the smallest of the
    * persisted index families (fixed m/8 bytes regardless of corpus
    * size). Append = OR-in a batch's bitmap ([[orInto]]); erasure is NOT
    * supported by a plain Bloom filter (bits are shared) — pipelines with
    * right-to-be-forgotten needs rebuild the bitmap from the surviving
    * corpus (one linear scan) or use the exact stamped indexes.
    */
  def writeBits(spark: org.apache.spark.sql.SparkSession, path: String,
                bits: Array[Long]): Unit = {
    // spark.range + a broadcast of the raw long[] — NOT toSeq.toDF, which
    // embeds the whole bitmap as boxed (Int, Long) tuples in a driver-side
    // LocalRelation (at the 2^33-bit ceiling that is ~134M boxed tuples,
    // far heavier than the 1 GiB bitmap itself). Here the driver holds only
    // the primitive array it already had; executors index into the
    // broadcast.
    val bc = spark.sparkContext.broadcast(bits)
    try {
      import spark.implicits._
      spark.range(0, bits.length.toLong, 1, numPartitions = 1)
        .map { i => (i.toInt, bc.value(i.toInt)) }
        .toDF("idx", "word")
        .write.mode("overwrite").parquet(path)
    } finally bc.destroy()
  }

  /** Read a persisted bitmap back into the primitive long[] the driver
    * must hold anyway. The [[writeBits]] counterpart: each partition packs
    * its (idx, word) rows into two PRIMITIVE arrays before collect, so the
    * driver materializes a handful of array chunks (~2.5× the bitmap,
    * transient) instead of one boxed Row per word — at the 2^33-bit
    * ceiling the old Row collect was ~134M boxed Rows (several GB heap)
    * to rebuild a 1 GiB long[].
    */
  def readBits(spark: org.apache.spark.sql.SparkSession, path: String): Array[Long] = {
    import spark.implicits._
    val chunks = spark.read.parquet(path).select("idx", "word")
      .as[(Int, Long)]
      .mapPartitions { it =>
        val idxs = Array.newBuilder[Int]
        val words = Array.newBuilder[Long]
        it.foreach { case (i, w) => idxs += i; words += w }
        Iterator.single((idxs.result(), words.result()))
      }.collect()
    val out = new Array[Long](chunks.iterator.map(_._2.length).sum)
    chunks.foreach { case (is, ws) =>
      var i = 0
      while (i < ws.length) { out(is(i)) = ws(i); i += 1 }
    }
    out
  }

  /** OR `add` into `into` (in place, returned for chaining) — the
    * persisted-index append step: build a bitmap from the new batch only,
    * OR it into the stored corpus bitmap, write back.
    */
  def orInto(into: Array[Long], add: Array[Long]): Array[Long] = {
    require(into.length == add.length,
      s"bitmap size mismatch: ${into.length} vs ${add.length} words")
    var i = 0
    while (i < into.length) { into(i) |= add(i); i += 1 }
    into
  }
}
