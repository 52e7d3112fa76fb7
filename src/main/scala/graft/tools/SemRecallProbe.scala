package graft.tools

import graft.queries.Similarity
import graft.util.Sessions

/** Diagnostic: recall of the IVF multi-assign semantic candidate path
  * ([[Similarity.semanticPairs]]) against the all-pairs baseline
  * ([[Similarity.cosinePairsExact]]) at a given sf dir. The driver's hash gate
  * needs recall 1.0 at its gate scale — run this after any fixture
  * regeneration or candidate-knob change.
  *
  * Usage: runMain graft.tools.SemRecallProbe /root/testdata/sf0.01
  */
object SemRecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("sem-recall-probe", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("WARN")
    try args.foreach { dir =>
      val exact = Similarity.cosinePairsExact(spark, dir)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val cand = Similarity.semanticPairs(spark, dir)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val hit = exact.count(cand.contains)
      println(s"[sem-recall] $dir exact=${exact.size} cand=${cand.size} " +
        s"hit=$hit recall=${if (exact.isEmpty) 1.0 else hit.toDouble / exact.size} " +
        s"missing=${(exact -- cand).toSeq.sorted.take(20)}")
    } finally spark.stop()
  }
}
