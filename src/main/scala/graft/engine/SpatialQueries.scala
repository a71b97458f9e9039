package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Spatial engine queries registered with the harness. Filled in as the
  * engine layers land (extraction, candidate join, refinement, aggregation).
  * WKT-predicate results are fixture-verified in ScalaTest; entries here are
  * rows-only checks unless a plain-SQL oracle exists.
  */
object SpatialQueries {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  def oracles: Map[String, String] = Map()
}
