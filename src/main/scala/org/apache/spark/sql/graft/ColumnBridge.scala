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

  /** The inverse direction, for a v1 streaming Source's getBatch: wrap a
    * batch-planned DataFrame as a streaming-tagged frame whose leaf is
    * the batch plan's RDD (the KafkaSource shape). The inner plan stays a
    * BATCH plan — crucially, any aggregates inside it are planned by the
    * batch planner, not turned into state-store streaming aggregations by
    * IncrementalExecution.
    */
  def asStreamBatch(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    spark.internalCreateDataFrame(
      df.asInstanceOf[org.apache.spark.sql.classic.DataFrame]
        .queryExecution.toRdd, df.schema, isStreaming = true)
  }
}
