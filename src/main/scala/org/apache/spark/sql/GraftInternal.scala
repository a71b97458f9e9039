package org.apache.spark.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** Bridge to the private[sql] InternalRow DataFrame constructor.
  *
  * The refinement kernel (graft.engine.SpatialJoin.refine) emits UnsafeRows
  * directly from a reused projection buffer; routing them through a
  * case-class Encoder would re-introduce one object graph per candidate
  * pair (the dominant GC load at 32 mutator threads, see BASELINE.md).
  */
object GraftInternal {
  def internalDf(spark: SparkSession, rdd: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = false)

  /** Block until the async listener bus has delivered all queued events —
    * lets instrumentation (QProbe) attribute job metrics to the query that
    * produced them instead of racing the bus. */
  def drainListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()

  /** Column <-> Expression bridge for custom Catalyst expressions. */
  def exprOf(c: Column): catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)

  def colOf(e: catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)
}
