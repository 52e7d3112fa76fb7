package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made these conversions
  * `private[sql]` (columnNodeSupport.scala), so the one line that needs
  * them lives in the org.apache.spark.sql namespace — the standard
  * technique for Catalyst extension libraries.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Re-plan a streaming micro-batch DataFrame as a batch DataFrame over
    * the same (already-executed-for-this-trigger) physical rows — the
    * standard Sink.addBatch technique (the incoming frame is tagged
    * `isStreaming` and cannot be fed to batch writers directly).
    */
  def asBatch(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    spark.internalCreateDataFrame(
      df.asInstanceOf[org.apache.spark.sql.classic.DataFrame]
        .queryExecution.toRdd, df.schema, isStreaming = false)
  }
}
