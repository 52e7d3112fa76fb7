package org.apache.spark.sql.graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.hadoop.mapreduce.{Job, JobID, TaskAttemptContext, TaskAttemptID, TaskID, TaskType}
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.catalyst.expressions.{Alias, BindReferences, Expression}
import org.apache.spark.sql.catalyst.plans.logical.Project
import org.apache.spark.sql.execution.datasources.OutputWriterFactory
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.util.SerializableConfiguration

/** Task-level write plumbing for the row-level-operation path. Spark's
  * parquet `OutputWriterFactory` machinery and the Column→bound-Expression
  * conversion are `private[sql]`/internal, so the few lines that need them
  * live in the org.apache.spark.sql namespace — same technique as
  * [[ColumnBridge]].
  */
object TaskWriteBridge {

  /** A serializable parquet writer factory for `schema`, plus the hadoop
    * configuration it was prepared against (the parquet write support
    * reads its row schema from that configuration on the executor).
    */
  def parquetFactory(spark: SparkSession, schema: StructType,
      options: Map[String, String] = Map.empty)
      : (OutputWriterFactory, SerializableConfiguration) = {
    val job = Job.getInstance(spark.sessionState.newHadoopConf())
    // parquet.* writer knobs (e.g. the record-key bloom filters) travel
    // via the job configuration, same as DataFrameWriter options do
    options.foreach { case (k, v) => job.getConfiguration.set(k, v) }
    val factory = new ParquetFileFormat()
      .prepareWrite(spark, job, Map.empty[String, String], schema)
    (factory, new SerializableConfiguration(job.getConfiguration))
  }

  /** A per-task TaskAttemptContext over the prepared configuration — what
    * `OutputWriterFactory.newInstance` needs on the executor.
    */
  def taskAttemptContext(conf: Configuration, partitionId: Int,
      taskId: Long): TaskAttemptContext = {
    val attempt = new TaskAttemptID(
      new TaskID(new JobID("graft-rowlevel", 0), TaskType.MAP, partitionId),
      (taskId & Int.MaxValue).toInt)
    new TaskAttemptContextImpl(conf, attempt)
  }

  /** Analyze `c` against `schema` and bind it to the schema's attribute
    * order: the result is a serializable, executor-evaluable expression
    * (time zones resolved by the analyzer, ordinals bound by position) —
    * how the row-level writers evaluate the table's key expression per
    * incoming row without duplicating its semantics.
    */
  def bind(spark: SparkSession, c: Column, schema: StructType): Expression = {
    val empty = spark.createDataFrame(
      new java.util.ArrayList[Row](), schema)
    val analyzed = empty.select(c)
      .queryExecution.analyzed.asInstanceOf[Project]
    val expr = analyzed.projectList.head match {
      case a: Alias => a.child
      case e        => e
    }
    BindReferences.bindReference(expr, analyzed.child.output)
  }

  /** `col=value` hive partition-path fragment with Spark's own escaping
    * (null/empty → `__HIVE_DEFAULT_PARTITION__`).
    */
  def partitionPathFragment(colName: String, value: String): String =
    ExternalCatalogUtils.getPartitionPathString(colName, value)
}
