package graft.sql

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration of the `st_*` geometry functions — the Spark-first
  * answer to the reference's library entry point (§3.2): instead of linking
  * against a C++ `Sweeper`, a Spark user gets the same predicate semantics
  * as native SQL functions usable in `spark.sql`, `Dataset.filter(expr)`,
  * and view definitions, while [[graft.engine.SpatialJoin]] remains the
  * join-shaped scale path.
  *
  * Two ways in:
  *  - config: `--conf spark.sql.extensions=graft.sql.GraftSqlExtensions`
  *  - runtime: `GraftFunctions.register(spark)` (idempotent)
  */
object GraftFunctions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[StPredicate].getName, null, name, usage,
      "", "", "", "", "", "", "")

  private def binary(name: String, mk: (Expression, Expression) => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      info(name, s"$name(wkt_a, wkt_b)"),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"$name expects 2 arguments, got ${args.length}")
        mk(args(0), args(1))
      })

  private def unary(name: String, mk: Expression => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      info(name, s"$name(arg)"),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"$name expects 1 argument, got ${args.length}")
        mk(args(0))
      })

  private val predicates = Seq(
    "st_intersects" -> GeoFuns.INTERSECTS,
    "st_equals" -> GeoFuns.EQUALS,
    "st_covers" -> GeoFuns.COVERS,
    "st_contains" -> GeoFuns.CONTAINS,
    "st_touches" -> GeoFuns.TOUCHES,
    "st_crosses" -> GeoFuns.CROSSES,
    "st_overlaps" -> GeoFuns.OVERLAPS)

  /** All function descriptions, in registration form. */
  val all: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] =
    predicates.map { case (n, p) =>
      binary(n, (a, b) => StPredicate(a, b, p, n))
    } ++ Seq(
      binary("st_relate", StRelate(_, _)),
      binary("st_distance", StDistance(_, _)),
      unary("st_area", StArea(_)),
      unary("st_length", StLength(_)),
      unary("st_merc_x", StMercator(_, xAxis = true)),
      unary("st_merc_y", StMercator(_, xAxis = false)))

  /** Register into an existing session (replaces prior registrations, so
    * calling twice is safe). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    all.foreach { case (id, inf, builder) =>
      reg.registerFunction(id, inf, builder)
    }
  }
}

/** `spark.sql.extensions` entry point. */
class GraftSqlExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(ext.injectFunction)
}
