package graft.ext

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.functions.{VectorFunctions => V}

/** IVF (inverted-file) approximate nearest neighbor — the scale path beyond
  * sign-LSH bucketing: a k-means coarse quantizer assigns every vector to
  * one of `nLists` cells; a query scans only the `nProbe` nearest cells.
  *
  * 100 TB shape: [[build]] is one MLlib k-means fit (sampled, distributed)
  * plus one projection; persisting the assignment `partitionBy("list_id")`
  * makes [[search]] a partition-pruned scan of nProbe/nLists of the corpus
  * — the pruning happens at the parquet-directory level, before any IO.
  * Centroids are tiny (nLists × dim doubles) and live on the driver, so
  * probe selection is free.
  */
object Ivf {

  final case class Index(assigned: DataFrame, centroids: Array[Array[Double]])

  /** Cap the k-means fit input at `cap` rows (uniform sample, deterministic
    * seed). A coarse quantizer placed from ~10k points per cell is
    * indistinguishable from one fitted on the full corpus — and without the
    * cap each k-means iteration is a full pass over 100 TB.
    */
  private[ext] def fitSample(feats: DataFrame, cap: Long, seed: Long): DataFrame = {
    val total = feats.count()
    if (total <= cap) feats
    else feats.sample(withReplacement = false, cap.toDouble / total, seed)
  }

  /** Bernoulli sampling makes the cap an expectation, not a hard limit; a
    * user-supplied cap below k could hand KMeans fewer points than clusters.
    * Clamp to 20×nLists so the sample always dominates k (the over-sampling
    * also absorbs the variance of the fraction-based sample).
    */
  private[ext] def effectiveCap(fitSampleRows: Long, nLists: Int): Long = {
    val want = if (fitSampleRows > 0) fitSampleRows else nLists.toLong * 10000L
    math.max(want, nLists.toLong * 20L)
  }

  /** Fit the coarse quantizer and tag every row with its cell id. A coarse
    * quantizer doesn't need convergence — a few iterations place centroids
    * well enough for cell assignment (recall comes from nProbe, not
    * centroid polish). The fit runs on a `fitSampleRows`-capped uniform
    * sample (default nLists × 10k — one counting pass + one sampled fit
    * instead of `maxIter` full-corpus passes); the cell *assignment*
    * projection still covers every row.
    */
  def build(df: DataFrame, idCol: String, vecCol: String,
            nLists: Int, seed: Long = 42L, maxIter: Int = 5,
            fitSampleRows: Long = 0L): Index = {
    val feats = df.select(col(idCol), col(vecCol),
      array_to_vector(col(vecCol)).as("__features"))
    val cap = effectiveCap(fitSampleRows, nLists)
    val model = new KMeans().setK(nLists).setSeed(seed).setMaxIter(maxIter)
      .setFeaturesCol("__features").setPredictionCol("list_id")
      .fit(fitSample(feats, cap, seed))
    val assigned = model.transform(feats).drop("__features")
    Index(assigned, model.clusterCenters.map(_.toArray))
  }

  /** Persist the index partitioned by cell — the layout that turns probe
    * selection into parquet partition pruning.
    */
  def writeIndex(index: Index, path: String): Unit =
    index.assigned.write.mode(SaveMode.Overwrite)
      .partitionBy("list_id").parquet(path)

  /** The `nProbe` cell ids nearest to the query (driver-side math over the
    * tiny centroid table).
    */
  def probeCells(index: Index, queryVec: Seq[Double], nProbe: Int): Seq[Int] = {
    def dist(c: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < c.length) { val d = c(i) - queryVec(i); s += d * d; i += 1 }
      s
    }
    index.centroids.zipWithIndex.sortBy { case (c, _) => dist(c) }
      .take(nProbe).map(_._2).toSeq
  }

  /** Top-k by cosine among the probed cells only. With a
    * [[writeIndex]]-persisted index, the `isin` filter prunes partitions so
    * only nProbe/nLists of the corpus is read.
    */
  def search(assigned: DataFrame, index: Index, idCol: String, vecCol: String,
             queryVec: Seq[Double], k: Int, nProbe: Int): DataFrame = {
    val cells = probeCells(index, queryVec, nProbe)
    val qv = array(queryVec.map(lit): _*)
    assigned.filter(col("list_id").isin(cells: _*))
      .withColumn("score", round(V.cosine(col(vecCol), qv), 4))
      .select(col(idCol), col("score"))
      .orderBy(desc("score"), col(idCol))
      .limit(k)
  }
}
