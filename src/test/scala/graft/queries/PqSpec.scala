package graft.queries

import graft.util.Sessions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class PqSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Sessions.local("pq-test", "4")

  override def afterAll(): Unit = spark.stop()

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq

  // the oracle-sharing contract: PQ shortlist recall is 1 at the gate
  // SFs, so the exact-rescored output EQUALS brute force bit-for-bit
  for (sf <- Seq("sf0.001", "sf0.01")) {
    test(s"pqTopK equals brute force at $sf") {
      val dir = s"/root/testdata/$sf"
      assert(rows(Similarity.pqTopK(spark, dir)) ==
        rows(Similarity.topKBruteForce(spark, dir)))
    }
  }

  // the IVFPQ oracle-sharing contract: at the gate SFs the ADC rerank
  // depth covers every probed candidate, so the exact-rescored output
  // EQUALS the probed IVF search bit-for-bit (both also run under a
  // stage dir in Verify; staged and fresh paths agree by determinism)
  for (sf <- Seq("sf0.001", "sf0.01")) {
    test(s"ivfPqTopK equals probed IVF at $sf") {
      val dir = s"/root/testdata/$sf"
      assert(rows(Similarity.ivfPqTopK(spark, dir)) ==
        rows(Similarity.ivfTopK(spark, dir)))
    }
  }

  test("knn graph: full probe equals the exact brute-force graph") {
    val dir = "/root/testdata/sf0.001"
    val e = Relational.t(spark, dir, "embeddings")
    val a = e.select(col("vec_id"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("nbr_id"), col("embedding").as("vb"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("vec_id")
      .orderBy(col("sim").desc, col("nbr_id").asc)
    val brute = a.crossJoin(b).filter(col("vec_id") =!= col("nbr_id"))
      .select(col("vec_id"), col("nbr_id"),
        Similarity.cosine(col("va"), col("vb")).as("sim"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .orderBy("vec_id", "rk")
    assert(rows(Similarity.knnGraph(spark, dir,
        probe = Similarity.IvfCells)) == rows(brute))
    // default probe: a deterministic subgraph contract — every vector
    // present, k neighbors each, edges scored exactly
    val g = Similarity.knnGraph(spark, dir).collect()
    val n = e.count()
    assert(g.length == 3 * n)
    assert(g.map(_.getLong(0)).distinct.length == n)
  }

  test("ivfPqTopK staged layout equals the fresh path") {
    val dir = "/root/testdata/sf0.001"
    val fresh = rows(Similarity.ivfPqTopK(spark, dir))
    val stage = java.nio.file.Files.createTempDirectory("ivfpq").toString
    spark.conf.set(Dedup.StageDirConf, stage)
    try {
      val staged1 = rows(Similarity.ivfPqTopK(spark, dir)) // builds stage
      val staged2 = rows(Similarity.ivfPqTopK(spark, dir)) // reads stage
      assert(staged1 == fresh && staged2 == fresh)
      // the composed artifact exists: cell-partitioned codes
      val sub = new java.io.File(stage).listFiles()
        .find(_.getName.startsWith("ivfpq_codes_"))
      assert(sub.nonEmpty, "ivfpq_codes_* staged")
      assert(sub.get.listFiles().exists(_.getName.startsWith("cell=")),
        "codes are hive-partitioned by cell")
      // probing the staged codes layout must be dynamic partition
      // pruning on the codes scan (the 'touch only probed cells' lever)
      assert(Similarity.ivfPqTopK(spark, dir).queryExecution.executedPlan
        .toString.toLowerCase.contains("dynamicpruning"),
        "ADC candidate scan must prune cell partitions dynamically")
    } finally {
      spark.conf.unset(Dedup.StageDirConf)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(stage))
    }
  }

  test("native PqEncode matches the HOF argmin formulation bit-for-bit") {
    val dir = "/root/testdata/sf0.001"
    val e = Relational.t(spark, dir, "embeddings")
    val cb = Similarity.pqCodebooks(e)
    val m = cb.length; val k = cb(0).length; val sd = cb(0)(0).length
    val native = graft.functions.PqEncode(col("embedding"), cb)
    val cbLit = typedLit(cb.map(_.map(_.toSeq).toSeq).toSeq)
    val hof = expr(
      s"""transform(sequence(0, ${m - 1}), mm ->
         |  cast(array_position(
         |    transform(sequence(0, ${k - 1}), kk ->
         |      aggregate(sequence(0, ${sd - 1}), cast(0 as double), (a, j) ->
         |        a + (cast(element_at(embedding, mm*$sd + j + 1) as double)
         |              - cast(_cb[mm][kk][j] as double))
         |          * (cast(element_at(embedding, mm*$sd + j + 1) as double)
         |              - cast(_cb[mm][kk][j] as double)))),
         |    array_min(transform(sequence(0, ${k - 1}), kk ->
         |      aggregate(sequence(0, ${sd - 1}), cast(0 as double), (a, j) ->
         |        a + (cast(element_at(embedding, mm*$sd + j + 1) as double)
         |              - cast(_cb[mm][kk][j] as double))
         |          * (cast(element_at(embedding, mm*$sd + j + 1) as double)
         |              - cast(_cb[mm][kk][j] as double)))))) - 1 as int))"""
        .stripMargin)
    val both = e.withColumn("_cb", cbLit)
      .select(native.as("n"), hof.as("h"))
    assert(both.filter(col("n") =!= col("h")).count() == 0)
    assert(both.count() > 0)
  }

  test("PqEncode fails loudly on short and null-element vectors") {
    val dir = "/root/testdata/sf0.001"
    val e = Relational.t(spark, dir, "embeddings")
    val cb = Similarity.pqCodebooks(e)
    val mSd = cb.length * cb(0)(0).length
    // a too-short vector must raise (not read past the element region);
    // checked in BOTH execution modes — codegen and interpreted eval
    for (codegenConf <- Seq("CODEGEN_ONLY", "NO_CODEGEN")) {
      spark.conf.set("spark.sql.codegen.factoryMode", codegenConf)
      try {
        val short = intercept[org.apache.spark.SparkException] {
          e.select(graft.functions.PqEncode(
            slice(col("embedding"), 1, mSd - 1), cb)).collect()
        }
        assert(short.getMessage.contains("elements") ||
          Option(short.getCause).exists(_.getMessage.contains("elements")),
          s"short-vector failure not the length contract: $short")
        val nul = intercept[org.apache.spark.SparkException] {
          e.select(graft.functions.PqEncode(
            expr(s"transform(embedding, (v, i) -> if(i = 3, null, v))"), cb))
            .collect()
        }
        assert(nul.getMessage.contains("null element") ||
          Option(nul.getCause).exists(_.getMessage.contains("null element")),
          s"null-element failure not the null contract: $nul")
      } finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("codebooks and codes have the declared PQ shape") {
    val dir = "/root/testdata/sf0.001"
    val e = Relational.t(spark, dir, "embeddings")
    val cb = Similarity.pqCodebooks(e)
    assert(cb.length == Similarity.PqM)
    assert(cb.forall(_.length == Similarity.PqK))
    val d = e.select(size(col("embedding"))).first.getInt(0)
    assert(cb.forall(_.forall(_.length == d / Similarity.PqM)))
    // codebooks are finite numbers (no NaN poisoning from empty cells)
    assert(cb.flatten.flatten.forall(f => !f.isNaN && !f.isInfinite))
  }
}
