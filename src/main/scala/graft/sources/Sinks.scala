package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/** Remaining delivery targets from the reference's sink inventory. */
object Sinks {

  /** Debug/console sink (`/root/reference/src/Sinks/Console.php:40-86`:
    * echo in json|html|xml|text). Batch: show or print rendered rows.
    */
  def console(df: DataFrame, numRows: Int = 20, asJson: Boolean = false): Unit =
    console(df, numRows, if (asJson) "json" else "text")

  def console(df: DataFrame, numRows: Int, encoding: String): Unit =
    encoding match {
      case "json" => df.toJSON.show(numRows, truncate = false)
      case "xml"  => renderXml(df, numRows = numRows).foreach(println)
      case "html" => println(renderHtml(df, numRows))
      case _      => df.show(numRows, truncate = false)
    }

  /** Rows rendered as XML strings (the reference's `XmlHelper::format`
    * branch, `Console.php:64-76`) — the same formatter as the XML file
    * sink, so console output round-trips through the XML parser.
    */
  def renderXml(df: DataFrame, rowTag: String = "row", numRows: Int = 20): Seq[String] = {
    val cols = df.columns.map(col)
    df.select(graft.operators.Parse.xmlFormat(struct(cols.toIndexedSeq: _*), rowTag).as("x"))
      .take(numRows).toIndexedSeq.map(_.getString(0))
  }

  /** Rows rendered as one escaped HTML table (`Console.php:53-63`). */
  def renderHtml(df: DataFrame, numRows: Int = 20): String = {
    def esc(s: String): String = s
      .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    val head = df.columns.map(c => s"<th>${esc(c)}</th>").mkString
    val body = df.take(numRows).map { r =>
      df.columns.indices
        .map(i => s"<td>${esc(Option(r.get(i)).map(_.toString).getOrElse(""))}</td>")
        .mkString("<tr>", "", "</tr>")
    }.mkString
    s"<table><tr>$head</tr>$body</table>"
  }

  /** Streaming console sink for pipeline debugging. */
  def consoleStream(df: DataFrame, trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    df.writeStream.format("console").trigger(trigger).start()

  /** Kafka producer (`/root/reference/src/Sinks/RdKafka.php:64-69`). Spark's
    * Kafka sink needs the spark-sql-kafka connector jar; this build runs in
    * an offline image without it, so fail fast with a clear message instead
    * of an opaque ClassNotFound at runtime (jar-presence check).
    */
  def kafkaAvailable: Boolean =
    try { Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider"); true }
    catch { case _: ClassNotFoundException => false }

  private val kafkaJarHint =
    "requires the spark-sql-kafka-0-10_2.13 connector jar (plus " +
      "kafka-clients) on the classpath — drop them in the Spark jars dir " +
      "and this wiring works unchanged"

  def kafka(df: DataFrame, bootstrapServers: String, topic: String): Unit = {
    require(kafkaAvailable, s"Kafka sink $kafkaJarHint")
    df.selectExpr("CAST(key AS STRING) AS key", "CAST(value AS STRING) AS value")
      .write.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .save()
  }

  def kafkaStream(df: DataFrame, bootstrapServers: String, topic: String,
                  checkpoint: String): StreamingQuery = {
    require(kafkaAvailable, s"Kafka sink $kafkaJarHint")
    df.writeStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)
      .start()
  }

  /** Kafka consumer source, the readStream mirror of [[kafkaStream]]
    * (reference consumes real brokers the same way its RdKafka sink
    * produces to them). Jar-guarded like the sink: the wiring is complete
    * and fails fast naming the missing connector, so binding a real
    * cluster is a classpath change, not a code change.
    */
  def kafkaSource(spark: org.apache.spark.sql.SparkSession,
                  bootstrapServers: String, topic: String,
                  startingOffsets: String = "earliest"): DataFrame = {
    require(kafkaAvailable, s"Kafka source $kafkaJarHint")
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load()
  }

  /** Generic per-partition publisher — the shape of the AMQP/NSQ sinks
    * (`/root/reference/src/Sinks/Amqp.php:89-95`, `Nsq.php:60-69`): one
    * producer per partition, publish every row, close. AMQP/NSQ client libs
    * are not in this image; the publisher function is injected (tests use an
    * accumulator, production wires the real client).
    */
  def foreachPublisher[C](df: DataFrame)(mkProducer: () => C)
                         (publish: (C, Row) => Unit)(close: C => Unit): Unit =
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) {
        val p = mkProducer()
        try rows.foreach(r => publish(p, r)) finally close(p)
      }
    }

  /** AMQP/NSQ delivery through the transport seam: one
    * [[graft.streaming.AmqpPublishApi]] channel per partition, every row's
    * `bodyCol` string published, close on completion — the reference's
    * `basic_publish` / `publishMulti` loop, distributed (one producer per
    * partition is the NSQ `publishMulti` batching shape). `mkPublisher`
    * must be a serializable factory (capture names/addresses, not
    * clients); the real binding is the one-class adapter described at
    * [[graft.streaming.AmqpPublishApi]].
    */
  def amqpPublish(df: DataFrame, bodyCol: String)
                 (mkPublisher: () => graft.streaming.AmqpPublishApi): Unit =
    foreachPublisher(df.select(col(bodyCol)))(mkPublisher)(
      (p, r) => p.publish(r.getString(0)))(_.close())

  /** NSQ delivery through the transport seam: one
    * [[graft.streaming.NsqPublishApi]] connection per partition, rows
    * batched into `MPUB` frames of `mpubBatch` bodies — the reference's
    * `publishMulti` (`/root/reference/src/Sinks/Nsq.php:60-69`),
    * distributed. One wire frame per batch instead of one per row is the
    * point of MPUB; the batch bound keeps a frame under nsqd's default
    * max-msg-size even with wide rows.
    */
  def nsqPublish(df: DataFrame, bodyCol: String, mpubBatch: Int = 200)
                (mkPublisher: () => graft.streaming.NsqPublishApi): Unit = {
    require(mpubBatch > 0, "mpubBatch must be positive")
    df.select(col(bodyCol)).foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) {
        val p = mkPublisher()
        try rows.grouped(mpubBatch).foreach { g =>
          p.mpublish(g.map(_.getString(0)).toSeq)
        } finally p.close()
      }
    }
  }
}

/** TTL result cache — the reference's `duration` source cache
  * (`/root/reference/src/Sources/Pdo.php:100`, `doc/Pdo.md:53`: -1 off,
  * 0 forever, N seconds). Spark-native: `persist` + a timestamp; reads
  * after expiry unpersist and rebuild lazily.
  */
final class TtlCache(ttlSeconds: Long,
                     clock: () => Long = () => System.currentTimeMillis() / 1000) {
  private var cached: Option[(DataFrame, Long)] = None

  def get(build: => DataFrame): DataFrame = synchronized {
    val now = clock()
    cached match {
      case Some((df, at)) if ttlSeconds == 0 || now - at < ttlSeconds => df
      case other =>
        other.foreach(_._1.unpersist())
        val df = build.persist()
        cached = Some((df, now))
        df
    }
  }

  def invalidate(): Unit = synchronized {
    cached.foreach(_._1.unpersist()); cached = None
  }
}
