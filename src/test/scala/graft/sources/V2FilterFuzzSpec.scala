package graft.sources

import graft.util.Sessions
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import scala.util.Random

/** Adversarial parity check: random predicate trees evaluated through the
  * v1 relation, the v2 scan (pushdown + residual re-evaluation), and a
  * plain in-memory DataFrame must agree row-for-row. Catches both filter
  * translation bugs and pushdown over-pruning — on every shape the
  * translator claims to handle AND the ones it must pass through
  * untranslated.
  */
class V2FilterFuzzSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Sessions.local("v2fuzz-test", "4")

  override def afterAll(): Unit = spark.stop()

  private val rnd = new Random(20260812L) // deterministic fuzz

  /** Random predicate over (id INT, ts BIGINT, part STRING, v DOUBLE) —
    * leaves include translatable comparisons, IN/NULL/LIKE-prefix shapes,
    * and deliberately untranslatable ones (arithmetic, substring) that
    * must survive as residual filters.
    */
  private def randomPred(depth: Int): Column = {
    def leaf(): Column = rnd.nextInt(8) match {
      case 0 => col("id") > rnd.nextInt(30)
      case 1 => col("v") <= rnd.nextDouble() * 30
      case 2 => col("part") === s"p${rnd.nextInt(4)}"
      case 3 => col("id").isInCollection(Seq.fill(3)(rnd.nextInt(30)))
      case 4 => col("part").startsWith("p")
      case 5 => col("ts").isNotNull
      case 6 => (col("id") % 7) === rnd.nextInt(7) // untranslatable leaf
      case _ => substring(col("part"), 2, 1) === s"${rnd.nextInt(4)}" // untranslatable
    }
    if (depth == 0) leaf()
    else rnd.nextInt(4) match {
      case 0 => randomPred(depth - 1) && randomPred(depth - 1)
      case 1 => randomPred(depth - 1) || randomPred(depth - 1)
      case 2 => !randomPred(depth - 1)
      case _ => leaf()
    }
  }

  test("random predicates agree across v1 scan, v2 scan, and reference frame") {
    val s = spark
    import s.implicits._
    val ref = (0 until 400).map { i =>
      (i, (i * 13 % 97).toLong, s"p${i % 4}", (i % 50) / 3.0)
    }.toDF("id", "ts", "part", "v")
    val p = Files.createTempDirectory("v2fuzz").toString + "/t"
    ref.write.format("graft-lake")
      .option("recordkey.field", "id")
      .option("precombine.field", "ts")
      .option("partition.fields", "part")
      .mode(SaveMode.Append).save(p)

    val v1 = spark.read.format("graft-lake").load(p)
    val v2 = spark.read.format("graft-lake-v2").load(p)
    def key(df: DataFrame, pred: Column): Seq[Int] =
      df.filter(pred).select("id").collect().map(_.getInt(0)).sorted.toSeq

    for (round <- 1 to 60) {
      val pred = randomPred(2 + rnd.nextInt(2))
      val expected = key(ref, pred)
      assert(key(v1, pred) == expected, s"v1 mismatch round $round: $pred")
      assert(key(v2, pred) == expected, s"v2 mismatch round $round: $pred")
    }
  }

  test("partition-only predicates: metadata answers equal the real scan") {
    val s = spark
    import s.implicits._
    // two-level partitioning (grp INT / part STRING with nulls) so the
    // fuzz covers multi-segment dirs, the null partition, and int ranges
    val ref = (0 until 300).map { i =>
      (i, (i * 7 % 89).toLong, i % 5,
        if (i % 11 == 0) None else Some(s"p${i % 4}"), i / 2.0)
    }.toDF("id", "ts", "grp", "part", "v")
    val p = Files.createTempDirectory("v2fuzz3").toString + "/t"
    ref.write.format("graft-lake-v2")
      .option("recordkey.field", "id")
      .option("precombine.field", "ts")
      .option("partition.fields", "grp,part")
      .mode(SaveMode.Append).save(p)
    val v2 = spark.read.format("graft-lake-v2").load(p)

    def partPred(depth: Int): Column = {
      def leaf(): Column = rnd.nextInt(9) match {
        case 0 => col("part") === s"p${rnd.nextInt(5)}" // p4 never exists
        case 1 => col("part").isNull
        case 2 => col("part").isNotNull
        case 3 => col("part") <=> (if (rnd.nextBoolean()) lit(null)
                                   else lit(s"p${rnd.nextInt(4)}"))
        case 4 => col("part").isInCollection(
          Seq.fill(2)(s"p${rnd.nextInt(5)}"))
        case 5 => col("part").startsWith(if (rnd.nextBoolean()) "p" else "q")
        case 6 => col("grp") >= rnd.nextInt(6)
        case 7 => col("grp") < rnd.nextInt(6)
        case _ => col("grp").isInCollection(Seq.fill(2)(rnd.nextInt(6)))
      }
      if (depth == 0) leaf()
      else rnd.nextInt(4) match {
        case 0 => partPred(depth - 1) && partPred(depth - 1)
        case 1 => partPred(depth - 1) || partPred(depth - 1)
        case 2 => !partPred(depth - 1)
        case _ => leaf()
      }
    }

    var metaRounds = 0
    for (round <- 1 to 40) {
      val pred = partPred(1 + rnd.nextInt(2))
      // row parity through the claimed (fully pushed) filter
      val expIds = ref.filter(pred).select("id")
        .collect().map(_.getInt(0)).sorted.toSeq
      val gotIds = v2.filter(pred).select("id")
        .collect().map(_.getInt(0)).sorted.toSeq
      assert(gotIds == expIds, s"rows round $round: $pred")
      // global COUNT: metadata-answered whenever the tree is claimable
      val cq = v2.filter(pred).selectExpr("count(*)")
      if (cq.queryExecution.executedPlan.toString
          .contains("LakeV2MetaAggScan")) metaRounds += 1
      assert(cq.collect().head.getLong(0) == expIds.length,
        s"count round $round: $pred")
      // grouped metadata answer vs the real grouped aggregate
      val expG = ref.filter(pred).groupBy("grp").count()
        .collect().map(r => (r.getInt(0), r.getLong(1))).sorted.toSeq
      val gotG = v2.filter(pred).groupBy("grp").count()
        .collect().map(r => (r.getInt(0), r.getLong(1))).sorted.toSeq
      assert(gotG == expG, s"group round $round: $pred")
    }
    // the fuzz must actually exercise the metadata path, not skip it
    assert(metaRounds >= 10, s"only $metaRounds metadata-answered rounds")
  }

  test("pruned projections under filters stay consistent on v2") {
    val s = spark
    import s.implicits._
    val ref = (0 until 200).map(i => (i, i.toLong, s"p${i % 3}", i / 2.0))
      .toDF("id", "ts", "part", "v")
    val p = Files.createTempDirectory("v2fuzz2").toString + "/t"
    ref.write.format("graft-lake-v2")
      .option("recordkey.field", "id")
      .option("precombine.field", "ts")
      .option("partition.fields", "part")
      .mode(SaveMode.Append).save(p)
    val v2 = spark.read.format("graft-lake-v2").load(p)
    for (round <- 1 to 20) {
      val pred = randomPred(2)
      val expected = ref.filter(pred)
        .select("v").collect().map(_.getDouble(0)).sorted.toSeq
      val got = v2.filter(pred)
        .select("v").collect().map(_.getDouble(0)).sorted.toSeq
      assert(got == expected, s"projection round $round: $pred")
    }
  }
}
