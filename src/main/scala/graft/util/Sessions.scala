package graft.util

import org.apache.spark.sql.SparkSession

/** SparkSession factory — the reference's util/SparkHelper.scala:9-53
  * (Kryo, CBO on, dev/prod master switch), re-expressed for Spark 4:
  * AQE is default-on; we pin shuffle partitions to the local core count
  * (the reference used a `repartition(16)` knob instead,
  * Config.scala:20) and let AQE coalesce from there.
  */
object Sessions {

  def local(appName: String = "graft", cores: String = "32"): SparkSession =
    builder(appName).master(s"local[$cores]").getOrCreate()

  def builder(appName: String): SparkSession.Builder =
    SparkSession
      .builder()
      .appName(appName)
      .withExtensions(new graft.GraftExtensions)
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // r16 optimization: let AQE re-optimize (coalesce partitions, fix
      // skew) INSIDE cached plans too. The default (false) pins every
      // persisted frame at the full spark.sql.shuffle.partitions width to
      // preserve output-partitioning reuse — but the query pack's cached
      // intermediates are re-read many times per plan, so every consumer
      // stage inherited that width regardless of data size (measured:
      // curate_centrality 1167 tasks → 60, 6.4 s → 2.5 s at sf0.1). At
      // cluster scale the same setting is what lets a cached frame's
      // partitioning track its actual size instead of a global constant.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      // Some fixture generations write events.ts as TIMESTAMP(NANOS),
      // which Spark 4 rejects by default; with this flag it surfaces as
      // an epoch-nanos long that Relational.events converts explicitly.
      // Harmless for MICROS-encoded fixtures (the flag only affects NANOS).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
}
