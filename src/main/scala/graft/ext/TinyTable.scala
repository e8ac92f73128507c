package graft.ext

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** FS-direct sidecar for the driver-held tiny index tables (IVF centroids,
  * PQ codebooks — nLists×dim / m×codes×subDim doubles).
  *
  * Why (r20 measurement, guide §5 — the driver should do metadata work
  * directly, not schedule jobs): every `readIndex` paid TWO Spark jobs per
  * tiny table (a parquet schema-inference job + a collect job), and the
  * append/recall query shapes read each index 2-3 times — 4-10 pure
  * scheduler-overhead jobs per query at any scale (on a real cluster, a
  * driver→cluster round trip each). The parquet table stays canonical and
  * byte-identical (the DuckDB oracle `read_parquet()`s it; Spark data
  * listings skip `_`-prefixed files); the sidecar is a read OPTIMIZATION
  * written from the same in-memory arrays in the same commit-marker window,
  * and every reader falls back to the parquet when it is absent (pre-r20
  * indexes, external rewrites).
  *
  * Round-trip exactness: doubles serialize via `java.lang.Double.toString`,
  * whose output `parseDouble`s back to the identical bit pattern (the
  * shortest-digits contract), so sidecar and parquet can never disagree on
  * a value they both got from the same array.
  */
private[ext] object TinyTable {

  private val SidecarName = "_sidecar.txt"

  private def fsOf(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeLines(spark: SparkSession, dir: String,
                         lines: Iterator[String]): Unit = {
    val p = new Path(s"$dir/$SidecarName")
    val out = fsOf(spark, p).create(p, true)
    try {
      val w = new java.io.BufferedWriter(
        new java.io.OutputStreamWriter(out, UTF_8))
      lines.foreach { l => w.write(l); w.write('\n') }
      w.flush()
    } finally out.close()
  }

  private def readLines(spark: SparkSession, dir: String): Option[Seq[String]] = {
    val p = new Path(s"$dir/$SidecarName")
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val r = new java.io.BufferedReader(
          new java.io.InputStreamReader(in, UTF_8))
        val buf = scala.collection.mutable.ArrayBuffer.empty[String]
        var l = r.readLine()
        while (l != null) { buf += l; l = r.readLine() }
        Some(buf.toSeq)
      } finally in.close()
    }
  }

  private def fmt(v: Array[Double]): String =
    v.map(java.lang.Double.toString).mkString(",")

  private def parse(s: String): Array[Double] =
    if (s.isEmpty) Array.empty
    else s.split(',').map(java.lang.Double.parseDouble)

  /** Write `dir/_sidecar.txt` mirroring an ordered (index ascending)
    * centroid table — call right after the parquet write of the same dir.
    */
  def writeCentroids(spark: SparkSession, dir: String,
                     centroids: Array[Array[Double]]): Unit =
    writeLines(spark, dir,
      centroids.iterator.zipWithIndex.map { case (c, i) => s"$i\t${fmt(c)}" })

  /** The sidecar's centroid table (index-sorted), or None when absent. */
  def readCentroids(spark: SparkSession, dir: String): Option[Array[Array[Double]]] =
    readLines(spark, dir).map { lines =>
      lines.map { l =>
        val Array(i, vs) = l.split('\t')
        i.toInt -> parse(vs)
      }.sortBy(_._1).map(_._2).toArray
    }

  /** Write `dir/_sidecar.txt` mirroring a (subspace, code, centroid)
    * codebook table — call right after the parquet write of the same dir.
    */
  def writeCodebooks(spark: SparkSession, dir: String,
                     books: Array[Array[Array[Double]]]): Unit =
    writeLines(spark, dir,
      books.iterator.zipWithIndex.flatMap { case (book, j) =>
        book.iterator.zipWithIndex.map { case (c, ci) => s"$j\t$ci\t${fmt(c)}" }
      })

  /** The sidecar's dense m×codes codebook table, or None when absent.
    * Enforces the same denseness invariant as the parquet path.
    */
  def readCodebooks(spark: SparkSession, dir: String): Option[Array[Array[Array[Double]]]] =
    readLines(spark, dir).map { lines =>
      require(lines.nonEmpty, s"empty codebook sidecar at $dir")
      val rows = lines.map { l =>
        val Array(j, ci, vs) = l.split('\t')
        (j.toInt, ci.toInt, parse(vs))
      }
      val m = rows.map(_._1).max + 1
      val nCodes = rows.map(_._2).max + 1
      val books = Array.ofDim[Array[Double]](m, nCodes)
      rows.foreach { case (j, ci, c) => books(j)(ci) = c }
      require(books.forall(_.forall(_ != null)),
        s"codebook sidecar at $dir is not a dense $m x $nCodes table")
      books
    }
}
