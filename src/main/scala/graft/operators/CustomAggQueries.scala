package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.{QueryPack, Tables}
import graft.functions.GeoMean

/** Custom typed UDAF surface (SURVEY.md §2.2): a geometric-mean
  * `Aggregator` registered via `udaf(...)`, oracle'd against the algebraic
  * identity exp(avg(ln(x))) in DuckDB.
  */
object CustomAggQueries extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_udaf_geomean" -> ((s, d) => {
      val geomean = udaf(GeoMean)
      Tables.lineitem(s, d)
        .withColumn("markup", lit(1.0) + col("l_tax"))
        .groupBy(col("l_returnflag"))
        .agg(round(geomean(col("markup")), 6).as("geo_markup"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    })
  )

  def oracle: Map[String, String] = Map(
    "q_udaf_geomean" ->
      """SELECT l_returnflag,
        |  round(exp(avg(ln(1.0 + l_tax))), 6) AS geo_markup,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin
  )
}
