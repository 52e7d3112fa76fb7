package graft.queries

import graft.util.Sessions
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class Bm25Spec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Sessions.local("bm25-test", "4")

  override def afterAll(): Unit = spark.stop()

  for (sf <- Seq("sf0.001", "sf0.01")) {
    test(s"incremental impact index converges to the batch build at $sf") {
      val dir = s"/root/testdata/$sf"
      val batch = Curation.bm25TopK(spark, dir).collect().map(_.toSeq).toSeq
      val incr = Curation.bm25Incremental(spark, dir)
        .collect().map(_.toSeq).toSeq
      assert(incr == batch)
      assert(batch.nonEmpty)
    }
  }

  /** A corpus with SKEWED term impacts (the distribution block-max
    * exists for): docs 0..11 carry three rare high-tf "hot" terms, every
    * doc carries 50 of 60 common tf=1 "cold" terms. Hot impacts dwarf
    * the summed cold bound, so the shortlist can prove most cold
    * postings irrelevant without joining them.
    */
  private lazy val skewedDir: String = {
    val s2 = spark
    import s2.implicits._
    val work = Files.createTempDirectory("bm25skew").toString
    val docs = (0 until 400).map { d =>
      val hot = if (d < 12) Seq.fill(20)(Seq("hota", "hotb", "hotc"))
        .flatten else Seq.empty
      val cold = (0 until 50).map(i => s"cold${(d + i) % 60}")
      (d.toLong, (hot ++ cold).mkString(" "), "en", "syn",
        (hot.size + cold.size).toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.coalesce(1).write.parquet(s"$work/documents.parquet")
    work
  }

  test("block-max shortlist cuts the low-posting candidates on a skewed corpus") {
    // the fixture's low frame is small; lift the volume floor to reach
    // the engaged path (production crosses it through query count)
    spark.conf.set(Curation.Bm25BlockMaxMinLowConf, "0")
    try {
      val plan = Curation.bm25TopKPlan(spark, skewedDir)
      val (all, kept) = (plan.lowAll.count(), plan.lowKept.count())
      assert(all > 500, s"need a real low frame: $all")
      // the whole point: most low-impact postings are never joined
      assert(kept < all / 2,
        s"block-max should cut the low candidate frame: kept $kept of $all")
    } finally spark.conf.unset(Curation.Bm25BlockMaxMinLowConf)
  }

  test("a prunable-but-tiny candidate frame stays on the naive plan") {
    // same skewed corpus, default volume floor: the bound could fire,
    // but the volume can't repay the two-phase overhead — the gate must
    // choose the one-join plan (lowKept == lowAll, nothing pruned)
    val plan = Curation.bm25TopKPlan(spark, skewedDir)
    assert(plan.lowKept.count() == plan.lowAll.count(),
      "default floor should keep small corpora on the naive path")
  }

  for ((sf, dir) <- Seq("sf0.001" -> "/root/testdata/sf0.001",
    "sf0.01" -> "/root/testdata/sf0.01", "skewed" -> null)) {
    test(s"block-max is exact: identical top-10 with the cut disabled ($sf)") {
      val d = Option(dir).getOrElse(skewedDir)
      // uniform-impact corpora (the gate SFs) are block-max's worst
      // case: the bound can't prove much, the plan degrades to the
      // naive candidate frame, and the answer must STILL be identical
      spark.conf.set(Curation.Bm25HighTermsConf, "1000000") // all high
      try {
        val noCut = Curation.bm25TopK(spark, d).collect().map(_.toSeq).toSeq
        spark.conf.unset(Curation.Bm25HighTermsConf)
        val cut = Curation.bm25TopK(spark, d).collect().map(_.toSeq).toSeq
        assert(cut == noCut && cut.nonEmpty)
      } finally spark.conf.unset(Curation.Bm25HighTermsConf)
    }
  }

  test("the corpus index is staged once and reused across batches") {
    val dir = "/root/testdata/sf0.001"
    val stage = Files.createTempDirectory("bm25stage").toString
    spark.conf.set(Dedup.StageDirConf, stage)
    try {
      val first = Curation.bm25Incremental(spark, dir)
        .collect().map(_.toSeq).toSeq
      val staged = new java.io.File(stage).listFiles()
        .filter(_.getName.startsWith("bm25")).map(_.getName).sorted.toSeq
      assert(staged.size == 3, s"postings+df+dl expected, got $staged")
      val mtimes = staged.map(n =>
        new java.io.File(stage, n).lastModified()).toSeq
      // a second batch run hits the staged artifacts — no rewrite —
      // and returns the same (batch-equal) answer
      val second = Curation.bm25Incremental(spark, dir)
        .collect().map(_.toSeq).toSeq
      assert(second == first)
      assert(staged.map(n =>
        new java.io.File(stage, n).lastModified()).toSeq == mtimes)
    } finally spark.conf.unset(Dedup.StageDirConf)
  }
}
