package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator names to runnable DataFrame builders over the
  * driver's parquet tables at `dir`; `oracleSql` holds the DuckDB twin of
  * each SQL-expressible query. Spatial WKT operators (graft.engine) are
  * verified against the reference fixtures in ScalaTest and additionally
  * registered here (rows-only check where plain SQL can't express them).
  */
object SparkEntry {

  /** Flagship: the spatial self-join on the README example fixture
    * (pages table -> WKT extraction -> cell join -> exact refinement ->
    * relation aggregation). Driver smoke-checks rows>0 at sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    queries("sp_join_example")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.QueryPack.queries ++
      graft.engine.SpatialQueries.queries ++
      graft.ops.TextSim.queries ++
      graft.ops.Ann.queries ++
      graft.ops.Multimodal.queries

  /** DuckDB twins for the SQL-expressible queries. */
  def oracleSql: Map[String, String] =
    graft.queries.QueryPack.oracles ++
      graft.engine.SpatialQueries.oracles ++
      graft.ops.TextSim.oracles ++
      graft.ops.Ann.oracles ++
      graft.ops.Multimodal.oracles
}
