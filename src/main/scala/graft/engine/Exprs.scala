package graft.engine

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{BinaryType, DataType}

/** `CoordCodec.encodeAD(coords, ringEnds)` as a native Catalyst expression
  * WITH codegen: the delta-varint packing then runs inside the cover
  * stage's whole-stage-codegen projection right before the exchange write
  * (a Scala UDF here would box every coordinate and break the codegen
  * span). */
case class EncodeGeom(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BinaryType

  override protected def nullSafeEval(c: Any, r: Any): Any =
    graft.geom.CoordCodec.encodeAD(
      c.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (c, r) => s"graft.geom.CoordCodec.encodeAD($c, $r)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): EncodeGeom =
    copy(left = newLeft, right = newRight)
}
