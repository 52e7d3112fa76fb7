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
