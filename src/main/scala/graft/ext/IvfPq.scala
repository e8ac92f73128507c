package graft.ext

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** IVF-PQ — the composed FAISS index architecture (Jégou et al., TPAMI
  * 2011 §IV: "IVFADC"), first-class instead of hand-assembled from [[Ivf]]
  * and [[Pq]]: the coarse quantizer decides WHICH cells a query scans
  * (parquet partition pruning on the persisted layout), product
  * quantization decides how CHEAP scanning each survivor is (m one-byte
  * codes, ADC table lookups, no float math per row).
  *
  * The 100 TB economics multiply: nProbe/nLists of the corpus is read at
  * all, and what is read costs m bytes per vector instead of 4·dim — at
  * dim=64, m=8, nLists=1024, nProbe=8 a query touches 1/128 of the corpus
  * at 1/32 of its bytes ≈ 4000× less IO than a brute-force float scan.
  *
  * Spark shape:
  *  - [[build]] fits BOTH quantizers on capped samples (one distributed
  *    k-means for the cells, m driver-local Lloyd's fits for the
  *    codebooks) and encodes the corpus ONCE, carrying `list_id` through
  *    the encode so no corpus-wide join-back is needed;
  *  - [[writeIndex]] persists codes `partitionBy("list_id")` + the two
  *    tiny driver tables (centroids, codebooks);
  *  - [[search]]/[[searchMany]] read only probed cells. `searchMany`
  *    scores each code row against ONLY the queries that probed its cell
  *    (driver-built cell→queries map, k-capped heap per query — the same
  *    never-materialize-Q×N kernel as [[Pq.adcTopKMany]]).
  */
object IvfPq {

  /** `codes` carries (id, list_id, code); centroids/codebooks are the two
    * driver-held tiny tables (nLists×dim and m×codes×subDim doubles).
    */
  final case class Index(codes: DataFrame, centroids: Array[Array[Double]],
                         cb: Pq.Codebooks)

  /** Fit coarse quantizer + codebooks, encode every row once. Both fits
    * run on capped samples (see [[Ivf.build]] / [[Pq.train]] for why a
    * quantizer needs placement, not convergence).
    */
  def build(df: DataFrame, idCol: String, vecCol: String, dim: Int, m: Int,
            nLists: Int, codes: Int = 256, seed: Long = 42L,
            maxIter: Int = 5): Index = {
    val ivf = Ivf.build(df, idCol, vecCol, nLists, seed, maxIter)
    val cb = Pq.train(df, vecCol, dim, m, codes, seed, maxIter)
    val encoded = Pq.encode(ivf.assigned, idCol, vecCol, cb,
      keep = Seq("list_id"))
    Index(encoded, ivf.centroids, cb)
  }

  /** Layout: `path/codes/list_id=*` (the partition-pruned scan target),
    * `path/centroids`, `path/codebooks`.
    */
  def writeIndex(index: Index, path: String): Unit = {
    index.codes.write.mode(SaveMode.Overwrite)
      .partitionBy("list_id").parquet(s"$path/codes")
    val spark = index.codes.sparkSession
    import spark.implicits._
    index.centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("list_id", "centroid")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/centroids")
    index.cb.books.zipWithIndex.flatMap { case (book, j) =>
      book.zipWithIndex.map { case (c, ci) => (j, ci, c.toSeq) }
    }.toSeq.toDF("subspace", "code", "centroid")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/codebooks")
  }

  /** Reload: codes stay a lazy partition-pruned scan; only the two tiny
    * tables collect to the driver.
    */
  def readIndex(spark: SparkSession, path: String): Index = {
    val codes = spark.read.parquet(s"$path/codes")
    val centroids = spark.read.parquet(s"$path/centroids")
      .select("list_id", "centroid").collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1).map(_._2)
    val rows = spark.read.parquet(s"$path/codebooks")
      .select("subspace", "code", "centroid").collect()
    require(rows.nonEmpty, s"no codebooks at $path/codebooks")
    val m = rows.map(_.getInt(0)).max + 1
    val nCodes = rows.map(_.getInt(1)).max + 1
    val books = Array.ofDim[Array[Double]](m, nCodes)
    rows.foreach(r => books(r.getInt(0))(r.getInt(1)) = r.getSeq[Double](2).toArray)
    require(books.forall(_.forall(_ != null)),
      s"codebooks at $path are not a dense $m x $nCodes table")
    Index(codes, centroids, Pq.Codebooks(books))
  }

  /** Single-query IVF-PQ: probe the `nProbe` nearest cells (driver math
    * over the centroid table → `isin` filter → partition pruning on a
    * persisted index) and ADC-scan only those codes. Returns (idCol,
    * adist) ascending, ties on id — identical semantics to [[Pq.adcTopK]]
    * restricted to the probed cells.
    */
  def search(index: Index, idCol: String, queryVec: Seq[Double], k: Int,
             nProbe: Int): DataFrame = {
    val cells = Ivf.probeCells(index.centroids, queryVec, nProbe)
    Pq.adcTopK(index.codes.filter(col("list_id").isin(cells: _*)),
      index.cb, idCol, queryVec, k)
  }

  /** Batch IVF-PQ: top-k for EVERY query row in one pass over the probed
    * cells' codes. Queries collect + broadcast (same bounded-batch
    * contract as [[Pq.adcTopKMany]]); the scan filter is the UNION of all
    * probe cells (partition pruning still applies), and each code row is
    * scored against only the queries that probed ITS cell via a
    * driver-built cell→queries map — per-row cost is m lookups ×
    * (queries probing that cell) ≈ m·Q·nProbe/nLists, never m·Q. A
    * k-capped heap per query per partition emits ≤ Q·k candidate rows,
    * then one per-query rank over Q·k·P survivors. Deterministic: ties
    * break on (adist, id), equal to per-query [[search]].
    */
  def searchMany(index: Index, queries: DataFrame, queryIdCol: String,
                 queryVecCol: String, k: Int, nProbe: Int): DataFrame = {
    require(k > 0 && nProbe > 0)
    val qs = queries.select(col(queryIdCol).cast("long"),
        col(queryVecCol).cast(ArrayType(DoubleType))).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    require(qs.map(_._1).distinct.length == qs.length,
      "duplicate query ids — per-query top-k would merge their candidates")
    qs.foreach { case (qid, q) => require(q.length == index.cb.dim,
      s"query $qid dim ${q.length} != codebook dim ${index.cb.dim}") }
    val probes: Array[Seq[Int]] =
      qs.map { case (_, q) => Ivf.probeCells(index.centroids, q, nProbe) }
    val cellToQ: Map[Int, Array[Int]] = probes.zipWithIndex
      .flatMap { case (cells, qi) => cells.map(_ -> qi) }
      .groupBy(_._1).map { case (cell, xs) => cell -> xs.map(_._2) }
    val allCells = cellToQ.keys.toSeq

    val spark = index.codes.sparkSession
    val bcastQ = spark.sparkContext.broadcast(qs)
    val bcastCb = spark.sparkContext.broadcast(index.cb)
    val bcastCellQ = spark.sparkContext.broadcast(cellToQ)
    val cacheKey = java.util.UUID.randomUUID().toString
    // the corpus id column is whatever the codes schema carries besides
    // (list_id, code) — build/readIndex preserve it by name
    val idCol = index.codes.columns
      .find(c => c != "list_id" && c != "code")
      .getOrElse(throw new IllegalArgumentException(
        s"cannot find id column in codes schema ${index.codes.columns.mkString(",")}"))
    val scanned = index.codes.filter(col("list_id").isin(allCells: _*))
      .select(col(idCol).cast("long"), col("list_id").cast("int"), col("code"))
    val outSchema = StructType(Seq(
      StructField("query_id", LongType, nullable = false),
      StructField("corpus_id", LongType, nullable = false),
      StructField("adist", DoubleType, nullable = false)))
    val byWorst = Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long)
    val candidates = spark.createDataFrame(
      scanned.rdd.mapPartitions { rows =>
        if (!rows.hasNext) Iterator.empty
        else {
          val ts = Pq.TableCache.get(cacheKey, {
            val book = bcastCb.value
            bcastQ.value.map { case (qid, q) =>
              qid -> book.books.zipWithIndex.map { case (b, j) =>
                b.map(c => Pq.squaredDist(q, j * book.subDim, c))
              }
            }
          })
          val cellQ = bcastCellQ.value
          val heaps = Array.fill(ts.length)(
            scala.collection.mutable.PriorityQueue.empty[(Double, Long)](byWorst))
          rows.foreach { r =>
            val id = r.getLong(0); val cell = r.getInt(1)
            val code = r.getSeq[Byte](2)
            val qis = cellQ.getOrElse(cell, Array.empty[Int])
            var x = 0
            while (x < qis.length) {
              val qi = qis(x); val t = ts(qi)._2
              var s = 0.0; var j = 0
              while (j < t.length) { s += t(j)(code(j) & 0xff); j += 1 }
              val h = heaps(qi)
              if (h.size < k) h.enqueue((s, id))
              else if (byWorst.lt((s, id), h.head)) { h.dequeue(); h.enqueue((s, id)) }
              x += 1
            }
          }
          heaps.iterator.zip(ts.iterator).flatMap { case (h, (qid, _)) =>
            h.iterator.map { case (s, id) => Row(qid, id, s) }
          }
        }
      }, outSchema)
    val w = Window.partitionBy("query_id").orderBy(col("adist"), col("corpus_id"))
    candidates.withColumn("__rk", row_number().over(w)).filter(col("__rk") <= k)
      .drop("__rk")
  }
}
