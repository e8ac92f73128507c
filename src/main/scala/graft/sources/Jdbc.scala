package graft.sources

import java.sql.{Connection, DriverManager, SQLException}
import java.util.Properties

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}

/** JDBC ingest/delivery — the reference's workhorse `Sources\Pdo`
  * (`/root/reference/src/Sources/Pdo.php:81-138`: raw SQL + bound params,
  * batched cursor, pooled connections) and `Sinks\Pdo`
  * (`/root/reference/src/Sinks/Pdo.php:80-136`: batch insert, predicated
  * update, model upsert, retry-on-SQLSTATE).
  *
  * Spark-native mapping:
  *  - the `batch(n)` cursor generator → a *partitioned* JDBC read
  *    (`partitionColumn`/`lowerBound`/`upperBound`/`numPartitions`): N
  *    executors each stream their slice with `fetchsize` rows per round
  *    trip, instead of one coroutine pulling chunks;
  *  - the connection pool (min 10/max 12, `Pdo.php:35`) → one connection per
  *    partition task, opened in `foreachPartition` and reused for every row
  *    in that partition — executor-side pooling without a pool library;
  *  - retry-on-SQLSTATE with sleep (`Sinks/Pdo.php:87-107`) → per-batch
  *    retry in the writer below, on top of Spark's own task retries.
  */
object JdbcSource {

  final case class Partitioning(column: String, lower: Long, upper: Long, num: Int)

  /** Scan a table or push an arbitrary SQL query down to the database
    * (`Sources\Pdo` mode (a): raw SQL string, `Pdo.php:95-100`). When
    * `partitioning` is given the read is split into `num` range slices — the
    * scale path for big tables (the reference's `batch(n)` cursor,
    * `Pdo.php:87-93`, parallelized).
    */
  def read(spark: SparkSession, url: String, tableOrQuery: String,
           partitioning: Option[Partitioning] = None,
           fetchSize: Int = 1000,
           driver: Option[String] = None,
           props: Map[String, String] = Map.empty): DataFrame = {
    val reader0 = spark.read.format("jdbc")
      .option("url", url)
      .option(if (tableOrQuery.trim.toLowerCase.startsWith("select")) "query" else "dbtable",
        tableOrQuery)
      .option("fetchsize", fetchSize.toString)
    val reader1 = driver.fold(reader0)(d => reader0.option("driver", d))
    val reader2 = partitioning.fold(reader1) { p =>
      reader1.option("partitionColumn", p.column)
        .option("lowerBound", p.lower.toString)
        .option("upperBound", p.upper.toString)
        .option("numPartitions", p.num.toString)
    }
    props.foldLeft(reader2) { case (r, (k, v)) => r.option(k, v) }.load()
  }
}

object JdbcSink {

  /** Batch insert (`Sinks\Pdo` mode (a) `batchInsert`, `Pdo.php:110-115`):
    * Spark's JDBC writer already batches `batchsize` rows per statement per
    * partition — the multi-row INSERT the reference hand-builds.
    */
  def append(df: DataFrame, url: String, table: String,
             batchSize: Int = 1000, driver: Option[String] = None,
             mode: SaveMode = SaveMode.Append): Unit = {
    val props = new Properties()
    driver.foreach(props.setProperty("driver", _))
    props.setProperty("batchsize", batchSize.toString)
    df.write.mode(mode).jdbc(url, table, props)
  }

  /** Distributed upsert writer — `Sinks\Pdo` mode (c) (`ARHelper::create/
    * update`, `Pdo.php:130-136`) and `SynToMysql`'s `ON DUPLICATE KEY UPDATE`
    * (`SynToMysql.php:62-64`). One connection per partition (executor-side
    * "pool"), `batchSize` rows per `executeBatch`, retry with sleep on the
    * configured SQLSTATE prefixes (`Pdo.php:87-107` retries listed codes).
    *
    * `sqlTemplate` renders the dialect-specific upsert for one row, with `?`
    * placeholders in column order, e.g. for MySQL:
    *   INSERT INTO t (a,b) VALUES (?,?) ON DUPLICATE KEY UPDATE b=VALUES(b)
    * and for standard MERGE dialects the caller builds the MERGE text. Kept
    * a template (not an AST) deliberately: this is the one place dialect SQL
    * belongs, everything upstream is engine-native.
    */
  def upsert(df: DataFrame, url: String, sqlTemplate: String,
             batchSize: Int = 1000, maxRetries: Int = 3,
             retrySqlStates: Set[String] = Set("40001", "40P01"),
             retrySleepMs: Long = 100L,
             connProps: Map[String, String] = Map.empty): Unit = {
    val schema = df.schema
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) {
        val props = new Properties()
        connProps.foreach { case (k, v) => props.setProperty(k, v) }
        val conn: Connection = DriverManager.getConnection(url, props)
        try {
          conn.setAutoCommit(false)
          val stmt = conn.prepareStatement(sqlTemplate)
          var inBatch = 0
          def flush(): Unit = if (inBatch > 0) {
            var attempt = 0
            var done = false
            while (!done) {
              try { stmt.executeBatch(); conn.commit(); done = true }
              catch {
                case e: SQLException
                    if attempt < maxRetries &&
                      Option(e.getSQLState).exists(retrySqlStates.contains) =>
                  attempt += 1
                  conn.rollback()
                  Thread.sleep(retrySleepMs * attempt)
                case e: Throwable => conn.rollback(); throw e
              }
            }
            inBatch = 0
          }
          rows.foreach { row =>
            var i = 0
            while (i < schema.length) {
              stmt.setObject(i + 1, row.get(i)); i += 1
            }
            stmt.addBatch(); inBatch += 1
            if (inBatch >= batchSize) flush()
          }
          flush()
        } finally conn.close()
      }
    }
  }

  /** Predicated UPDATE — `Sinks\Pdo` mode (b) `saveWithCondition`
    * (`/root/reference/src/Sinks/Pdo.php:117-126`: `updateAll(updates,
    * condition)`). Distributed form: every row of `df` drives one batched
    * `UPDATE table SET set...=? WHERE key...=? [AND extraCond]` — the set
    * values and the predicate values both come from the row, with an
    * optional static SQL condition appended (the reference's array
    * condition). Runs on the same per-partition batched/retrying writer as
    * [[upsert]].
    *
    * `setCols`/`keyCols` are the TARGET table's column names (quote them for
    * case-sensitive dialects); `df`'s columns supply the values positionally
    * — set values first, then key values, same convention as [[upsert]]'s
    * template.
    */
  def update(df: DataFrame, url: String, table: String,
             setCols: Seq[String], keyCols: Seq[String],
             extraCondSql: Option[String] = None,
             batchSize: Int = 1000, maxRetries: Int = 3,
             retrySqlStates: Set[String] = Set("40001", "40P01"),
             connProps: Map[String, String] = Map.empty): Unit = {
    require(df.schema.length == setCols.length + keyCols.length,
      s"update: df has ${df.schema.length} columns, template needs " +
        s"${setCols.length} set + ${keyCols.length} key values")
    upsert(df, url, updateSql(table, setCols, keyCols, extraCondSql),
      batchSize, maxRetries, retrySqlStates, connProps = connProps)
  }

  /** The one-row UPDATE template behind [[update]]; `?` order is setCols
    * then keyCols.
    */
  def updateSql(table: String, setCols: Seq[String], keyCols: Seq[String],
                extraCondSql: Option[String] = None): String = {
    val sets = setCols.map(c => s"$c=?").mkString(", ")
    val where = keyCols.map(c => s"$c=?").mkString(" AND ")
    val extra = extraCondSql.fold("")(c => s" AND ($c)")
    s"UPDATE $table SET $sets WHERE $where$extra"
  }

  /** MySQL-dialect upsert template (`SynToMysql.php:62-64`: update-set
    * excludes the primary/excluded columns).
    */
  def mysqlUpsertSql(table: String, columns: Seq[String], keys: Seq[String],
                     exclude: Set[String] = Set.empty): String = {
    val collist = columns.mkString(", ")
    val qs = columns.map(_ => "?").mkString(", ")
    val sets = columns.filterNot(c => keys.contains(c) || exclude(c))
      .map(c => s"$c=VALUES($c)").mkString(", ")
    s"INSERT INTO $table ($collist) VALUES ($qs) ON DUPLICATE KEY UPDATE $sets"
  }
}
