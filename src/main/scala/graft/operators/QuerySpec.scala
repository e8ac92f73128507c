package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

/** Declarative query-array ingestion — `Sources\Pdo` mode (b)
  * (`/root/reference/src/Sources/Pdo.php:95-97`: `DBHelper::PubSearch`
  * interprets an array spec of select/where/group/having/order/limit into a
  * query). The Spark-native form is a data-held description applied to any
  * DataFrame — the piece that lets a YAML task declare its query without
  * writing code, while everything still lands in one Catalyst plan (so
  * pushdown/pruning apply exactly as if the user had chained the calls).
  *
  * Clause values are SQL expression strings (Spark SQL dialect), mirroring
  * the reference's raw-fragment arrays.
  */
final case class QuerySpec(
    select: Seq[(String, String)] = Nil,   // output name -> expression
    where: Option[String] = None,
    groupBy: Seq[String] = Nil,
    agg: Seq[(String, String)] = Nil,      // output name -> aggregate expression
    having: Option[String] = None,
    orderBy: Seq[String] = Nil,            // expressions, "x DESC" supported
    limit: Option[Int] = None) {

  def apply(df: DataFrame): DataFrame = {
    val filtered = where.fold(df)(w => df.filter(expr(w)))
    val grouped =
      if (groupBy.nonEmpty || agg.nonEmpty) {
        val aggCols = agg.map { case (n, e) => expr(e).as(n) }
        require(aggCols.nonEmpty, "QuerySpec: groupBy requires agg expressions")
        filtered.groupBy(groupBy.map(expr): _*)
          .agg(aggCols.head, aggCols.tail: _*)
      } else filtered
    val had = having.fold(grouped)(h => grouped.filter(expr(h)))
    val projected =
      if (select.nonEmpty) had.select(select.map { case (n, e) => expr(e).as(n) }: _*)
      else had
    val ordered =
      if (orderBy.nonEmpty) projected.orderBy(orderBy.map { o =>
        val t = o.trim
        if (t.toLowerCase.endsWith(" desc")) expr(t.dropRight(5)).desc
        else if (t.toLowerCase.endsWith(" asc")) expr(t.dropRight(4)).asc
        else expr(t).asc
      }: _*)
      else projected
    limit.fold(ordered)(ordered.limit)
  }
}
