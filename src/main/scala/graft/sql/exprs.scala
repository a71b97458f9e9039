package graft.sql

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType, IntegerType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.geom.Geo

/** Catalyst expressions behind the `st_*` SQL functions (see
  * [[GraftFunctions]] for registration). All of them codegen to one static
  * [[GeoFuns]] call, so a query using them stays inside whole-stage codegen
  * (asserted by SqlFunctionsSpec under CODEGEN_ONLY factory mode).
  *
  * When the right argument is foldable — the overwhelmingly common
  * `st_intersects(geom, 'POLYGON(...)')` filter shape — the literal WKT is
  * parsed ONCE at plan time and shipped as a codegen reference object, so
  * the per-row work is one parse (the row's own geometry) instead of two.
  */
private[sql] object ArgCheck {
  /** AbstractDataType is private[sql], so ExpectsInputTypes is out of
    * reach here — a plain checkInputDataTypes covers the same ground.
    * NullType is accepted wherever a value type is (ImplicitTypeCasts
    * would have widened a NULL literal the same way). */
  def expect(name: String, ok: Boolean, want: String): TypeCheckResult =
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$name expects $want")

  def strOrNull(t: DataType): Boolean =
    t == StringType || t == NullType
}

private[sql] trait RightFoldable { self: BinaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult =
    ArgCheck.expect(prettyName,
      ArgCheck.strOrNull(left.dataType) && ArgCheck.strOrNull(right.dataType),
      "(STRING wkt, STRING wkt)")

  /** Lazily-parsed right side when it is a non-null foldable WKT; null
    * otherwise (fall back to parsing per row). */
  @transient protected lazy val rightPre: ParsedWkt =
    if (right.foldable) {
      val v = right.eval(null)
      if (v == null) null else new ParsedWkt(v.toString)
    } else null

  /** Codegen fragment for the pre-parsed right side. */
  protected def preRef(ctx: CodegenContext): String =
    ctx.addReferenceObj("preWkt", rightPre, classOf[ParsedWkt].getName)
}

/** st_intersects / st_equals / st_covers / st_contains / st_touches /
  * st_crosses / st_overlaps over two WKT strings. Directional predicates
  * read A-to-B (st_covers(a, b) = a covers b; st_crosses = line-side
  * first), matching the engine's writeRel discipline. Invalid WKT or a
  * non-intersecting pair => false; null input => null. */
case class StPredicate(left: Expression, right: Expression, predIdx: Int,
    name: String) extends BinaryExpression with RightFoldable {

  override def dataType: DataType = BooleanType
  override def prettyName: String = name

  override protected def nullSafeEval(a: Any, b: Any): Any =
    if (rightPre != null)
      GeoFuns.predPre(a.asInstanceOf[UTF8String], rightPre, predIdx)
    else GeoFuns.pred(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String],
      predIdx)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    if (rightPre != null) {
      val ref = preRef(ctx)
      defineCodeGen(ctx, ev,
        (a, _) => s"graft.sql.GeoFuns.predPre($a, $ref, $predIdx)")
    } else defineCodeGen(ctx, ev,
      (a, b) => s"graft.sql.GeoFuns.pred($a, $b, $predIdx)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): StPredicate =
    copy(left = newLeft, right = newRight)
}

/** st_relate(a, b): merged DE-9IM matrix string (engine de9im-mode
  * semantics for intersecting pairs; all-pair merge for disjoint ones).
  * Invalid WKT => null. */
case class StRelate(left: Expression, right: Expression)
    extends BinaryExpression with RightFoldable {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "st_relate"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    if (rightPre != null)
      GeoFuns.relatePre(a.asInstanceOf[UTF8String], rightPre)
    else GeoFuns.relate(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val call =
      if (rightPre != null) {
        val ref = preRef(ctx)
        (a: String, _: String) => s"graft.sql.GeoFuns.relatePre($a, $ref)"
      } else (a: String, b: String) => s"graft.sql.GeoFuns.relate($a, $b)"
    // the static call itself returns null for invalid WKT, so isNull must
    // be re-derived from the value (defineCodeGen would leave it false)
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      ${ev.value} = ${call(a, b)};
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): StRelate =
    copy(left = newLeft, right = newRight)
}

/** st_distance(a, b): minimum meter distance between the two geometries
  * (0 when intersecting) under the engine's distance-mode rule
  * ([[graft.geom.Dist.geomDist]]). Invalid WKT => NaN. */
case class StDistance(left: Expression, right: Expression)
    extends BinaryExpression with RightFoldable {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "st_distance"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    if (rightPre != null)
      GeoFuns.distancePre(a.asInstanceOf[UTF8String], rightPre)
    else GeoFuns.distance(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    if (rightPre != null) {
      val ref = preRef(ctx)
      defineCodeGen(ctx, ev,
        (a, _) => s"graft.sql.GeoFuns.distancePre($a, $ref)")
    } else defineCodeGen(ctx, ev,
      (a, b) => s"graft.sql.GeoFuns.distance($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): StDistance =
    copy(left = newLeft, right = newRight)
}

/** st_area(wkt): summed polygon area in web-mercator units² (the engine's
  * P8 area measure). Invalid WKT => NaN. */
case class StArea(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    ArgCheck.expect(prettyName, ArgCheck.strOrNull(child.dataType),
      "(STRING wkt)")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "st_area"
  override protected def nullSafeEval(a: Any): Any =
    GeoFuns.area(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.sql.GeoFuns.area($a)")
  override protected def withNewChildInternal(c: Expression): StArea =
    copy(child = c)
}

/** st_length(wkt): summed line length in web-mercator units. */
case class StLength(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    ArgCheck.expect(prettyName, ArgCheck.strOrNull(child.dataType),
      "(STRING wkt)")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "st_length"
  override protected def nullSafeEval(a: Any): Any =
    GeoFuns.length(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.sql.GeoFuns.length($a)")
  override protected def withNewChildInternal(c: Expression): StLength =
    copy(child = c)
}

/** st_merc_x(lon) / st_merc_y(lat): the engine's int32 web-mercator
  * projection (reference WKTParse.h:107-111, trunc toward zero). */
case class StMercator(child: Expression, xAxis: Boolean)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    ArgCheck.expect(prettyName,
      child.dataType == DoubleType || child.dataType == NullType, "(DOUBLE)")
  override def dataType: DataType = IntegerType
  override def prettyName: String = if (xAxis) "st_merc_x" else "st_merc_y"
  override protected def nullSafeEval(a: Any): Any =
    if (xAxis) Geo.projX(a.asInstanceOf[Double])
    else Geo.projY(a.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val m = if (xAxis) "projX" else "projY"
    defineCodeGen(ctx, ev, a => s"graft.geom.Geo.$m($a)")
  }
  override protected def withNewChildInternal(c: Expression): StMercator =
    copy(child = c)
}
