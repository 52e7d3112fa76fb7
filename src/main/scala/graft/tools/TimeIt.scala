package graft.tools

import graft.queries.{Dedup, Relational, Similarity}
import graft.functions.TextFunctions._
import graft.util.Sessions
import org.apache.spark.sql.functions._

/** Scratch profiling harness for stage-level timing (not part of the
  * driver contract). Usage: runMain graft.tools.TimeIt <sfDir>
  */
object TimeIt {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = Sessions.local("timeit", "32")
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[timeit] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
    }

    val docs = Relational.t(spark, dir, "documents")
      .repartition(spark.sparkContext.defaultParallelism)
    val sh = docs.select(col("doc_id"), shingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    time("warm scan")(docs.count())
    time("shingle (32-way)")(sh.select(sum(size(col("sh")))).count())
    time("shingle again")(sh.select(sum(size(col("sh")))).count())
    time("sigs k=8")(Dedup.minhashSignatures(sh, 8).count())
    time("sigs k=64")(Dedup.minhashSignatures(sh, 64).count())
    time("sigs k=64 again")(Dedup.minhashSignatures(sh, 64).count())
    time("full minhashLsh")(Dedup.minhashLsh(spark, dir).count())
    time("full minhashLsh again")(Dedup.minhashLsh(spark, dir).count())
    time("full jaccardPairs")(Dedup.jaccardPairs(spark, dir).count())
    time("full simhashPairs")(Dedup.simhashPairs(spark, dir).count())
    time("lshTopK")(Similarity.lshTopK(spark, dir).count())

    // jaccard stage breakdown
    {
      import org.apache.spark.sql.expressions.Window
      val docs = Relational.t(spark, dir, "documents")
        .repartition(spark.sparkContext.defaultParallelism)
        .select(col("doc_id"), shingles(col("text"), 3).as("sh"))
        .filter(size(col("sh")) > 0).persist()
      time("jac: docs cache")(docs.count())
      val ex = docs.select(col("doc_id"), size(col("sh")).as("n"), explode(col("sh")).as("s")).persist()
      time("jac: ex cache")(ex.count())
      val dfreq = ex.groupBy("s").agg(count(lit(1)).as("df"))
      time("jac: dfreq")(dfreq.count())
      val prefix = ex.join(dfreq, "s")
        .withColumn("rk", row_number().over(Window.partitionBy("doc_id").orderBy(col("df"), col("s"))))
        .filter(col("rk") <= col("n") - ceil(lit(0.8) * col("n")) + 1)
        .select("doc_id", "n", "s").persist()
      time("jac: prefix")(prefix.count())
      val cands = prefix.alias("a").join(prefix.alias("b"),
          col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id") &&
          col("b.n") >= ceil(lit(0.8) * col("a.n")) && col("b.n") <= floor(col("a.n") / lit(0.8)))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b")).distinct().persist()
      time("jac: cands")(cands.count())
      val ver = cands
        .join(ex.select(col("doc_id").as("id_a"), col("n").as("na"), col("s")), "id_a")
        .join(ex.select(col("doc_id").as("id_b"), col("n").as("nb"), col("s")), Seq("id_b", "s"))
        .groupBy("id_a", "id_b", "na", "nb").agg(count(lit(1)).as("shared"))
        .withColumn("jaccard", col("shared") / (col("na") + col("nb") - col("shared")))
        .filter(col("jaccard") >= 0.8)
      time("jac: verify")(ver.count())
      docs.unpersist(); ex.unpersist(); prefix.unpersist(); cands.unpersist()
    }

    // lake_delete step breakdown
    {
      import graft.lake.{LakeTable, TableMeta}
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("l_orderkey", "l_linenumber")
        .orderBy(col("l_shipdate").desc, col("l_partkey").desc,
          col("l_suppkey").desc, col("l_quantity").desc, col("l_extendedprice").desc)
      val b1 = Relational.t(spark, dir, "lineitem")
        .withColumn("created_ts", col("l_shipdate").cast("timestamp_ltz").cast("long"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
        .persist()
      time("b1 materialize")(b1.count())
      val work = java.nio.file.Files.createTempDirectory("lt").toString
      val t = LakeTable.create(spark, s"$work/t",
        TableMeta("x", Seq("l_orderkey", "l_linenumber"), "created_ts", Seq("l_returnflag")))
      time("upsert b1")({ t.upsert(b1, combine = false); 0L })
      time("delete slice")({ t.delete(b1.filter(col("l_orderkey").between(100, 199))); 0L })
      time("snapshot agg")(t.snapshot().groupBy("l_returnflag").count().count())
      b1.unpersist()
    }
    spark.stop()
  }
}
