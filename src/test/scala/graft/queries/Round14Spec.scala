package graft.queries

import graft.util.Sessions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 pins: convergence-safe `sim_components` (the shared
  * connected-components harness replaces the fixed 8-round loop), the
  * all-pairs cosine baseline demoted to a guarded spec-only cross-check,
  * and the BM25 empty-corpus / overflow fixes.
  */
class Round14Spec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Sessions.local("round14-test", "4")
  val sf = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  test("components harness converges on a >8-diameter chain (propagation path)") {
    val s = spark
    import s.implicits._
    // a 30-hop chain: diameter 29 — the old fixed-8-rounds loop would
    // return torn labels here; the harness iterates to convergence
    val pairs = (0L until 29L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = Dedup.connectedComponents(s, pairs, "vec_id").collect()
    assert(out.length == 30)
    assert(out.forall(_.getLong(1) == 0L), "all nodes must join component 0")
    assert(out.forall(_.getLong(2) == 30L))
  }

  test("components harness converges on the same chain via the star path") {
    val s = spark
    import s.implicits._
    spark.conf.set(Dedup.StarEdgesConf, "1")
    try {
      val pairs = (0L until 29L).map(i => (i, i + 1)).toDF("id_a", "id_b")
      val out = Dedup.connectedComponents(s, pairs, "vec_id").collect()
      assert(out.length == 30 && out.forall(_.getLong(1) == 0L))
    } finally spark.conf.unset(Dedup.StarEdgesConf)
  }

  test("sim_components output equals a driver-side union-find of the staged graph") {
    val edges = Similarity.knnGraph(spark, sf)
      .select("vec_id", "nbr_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val truth = nodes.map(n => n -> find(n)).toMap
    val got = Similarity.components(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    val sizes = truth.values.groupBy(identity).map { case (c, m) => c -> m.size }
    got.foreach { case (v, (comp, size)) =>
      assert(comp == truth(v), s"node $v: comp $comp vs truth ${truth(v)}")
      assert(size == sizes(comp).toLong)
    }
  }

  test("cosinePairs is the IVF candidate path; the exact baseline refuses big inputs") {
    // gated entry == candidate path == exact baseline at this SF
    val gated = Similarity.cosinePairs(spark, sf)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.cosinePairsExact(spark, sf)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gated == exact && gated.nonEmpty)
    // no cartesian product in the gated plan
    val plan = Similarity.cosinePairs(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    // the all-pairs baseline refuses above the guard
    spark.conf.set(Similarity.AllPairsMaxConf, "3")
    try intercept[IllegalArgumentException] {
      Similarity.cosinePairsExact(spark, sf).collect()
    } finally spark.conf.unset(Similarity.AllPairsMaxConf)
  }

  test("IVF delete: tombstone mask, index files untouched, sidecar appends") {
    val s = spark
    val stage = java.nio.file.Files.createTempDirectory("ivfdel").toString
    spark.conf.set(Dedup.StageDirConf, stage)
    try {
      def files(prefix: String): Map[String, (Long, Long)] = {
        val dirs = new java.io.File(stage).listFiles()
          .filter(_.getName.startsWith(prefix))
        dirs.flatMap(d => d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => f.getAbsolutePath -> (f.length(), f.lastModified()))).toMap
      }
      val got = Similarity.ivfDeleteTopK(s, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
      assert(got.nonEmpty)
      // no deleted id ever surfaces
      assert(got.forall { case (_, v, _) => v % 10 != 7 })
      // the index artifacts are byte-untouched by delete registration
      val idxFiles = files("ivf_corpus_") ++ files("ivf_cent_")
      assert(idxFiles.nonEmpty, "staged index expected")
      val delFiles = files("ivf_del_")
      assert(delFiles.nonEmpty, "tombstone sidecar expected")
      // masking candidates at probe time equals probing the corpus with
      // the deleted rows filtered out before assignment-partitioning
      val e = Relational.t(s, sf, "embeddings")
      val cent = Similarity.ivfCentFor(s, sf, e)
      val corpus = Similarity.ivfCorpusFor(s, sf, e, cent)
      val want = Similarity.ivfProbeTopK(cent,
        corpus.filter(col("vec_id") % 10 =!= 7), Similarity.IvfProbe)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
      assert(got.toSeq == want.toSeq)
      // a re-run reads the staged sidecar without rewriting anything
      Similarity.ivfDeleteTopK(s, sf).collect()
      assert(files("ivf_del_") == delFiles, "sidecar rewritten on re-run")
      assert((files("ivf_corpus_") ++ files("ivf_cent_")) == idxFiles,
        "index rewritten by delete maintenance")
    } finally {
      spark.conf.unset(Dedup.StageDirConf)
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(stage))
    }
  }

  test("bm25Incremental returns empty on an empty corpus (no NPE)") {
    val s = spark
    val work = java.nio.file.Files.createTempDirectory("bm25empty").toString
    Relational.t(s, sf, "documents").limit(0)
      .write.parquet(s"$work/documents.parquet")
    val out = Curation.bm25Incremental(s, work)
    assert(out.isEmpty)
    assert(out.columns.toSeq ==
      Seq("query_id", "doc_id", "score_u", "n_terms", "rk"))
  }

  test("bm25 saturation survives corpus token counts past the old Long bound") {
    // 44e6·l·tf with l = 1e12 would overflow BIGINT (4.4e30); the
    // decimal form must keep the exact floor quotient
    val r = spark.sql(
      """SELECT (CAST(44000000 AS DECIMAL(38,0)) * l * tf) DIV
        |  (CAST(20 AS DECIMAL(38,0)) * l * tf + 6 * l + 18 * dl * n) AS satu
        |FROM VALUES (CAST(1000000000000 AS BIGINT), CAST(5 AS BIGINT),
        |  CAST(1000 AS BIGINT), CAST(100000000 AS BIGINT)) t(l, tf, dl, n)
        |""".stripMargin).head()
    // exact: 44e6·5e12 / (20·5e12 + 6e12 + 18·1000·1e8) = 2.2e20/1.078e14
    val expect = (BigInt("220000000000000000000") /
      BigInt("107800000000000")).toLong
    assert(r.getLong(0) == expect, s"got ${r.getLong(0)}, want $expect")
  }
}
