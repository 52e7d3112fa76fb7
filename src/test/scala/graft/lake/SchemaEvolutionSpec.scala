package graft.lake

import graft.util.Sessions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class SchemaEvolutionSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Sessions.local("evo-test", "4")

  override def afterAll(): Unit = spark.stop()

  def mk(): LakeTable = LakeTable.create(spark,
    Files.createTempDirectory("evo").toString + "/t",
    TableMeta("e", Seq("id"), "ts", Seq("part")))

  test("new column appends to schema; old rows read as null") {
    val s = spark
    import s.implicits._
    val t = mk()
    t.upsert(Seq((1, 10L, "p1", 1.0)).toDF("id", "ts", "part", "v"))
    // second batch carries an extra column
    t.upsert(Seq((2, 10L, "p1", 2.0, "hello"))
      .toDF("id", "ts", "part", "v", "note"))
    val snap = t.snapshot().orderBy("id")
    assert(snap.columns.contains("note"))
    assert(snap.filter(col("id") === 1).head().getAs[String]("note") == null)
    assert(snap.filter(col("id") === 2).head().getAs[String]("note") == "hello")
    // reloaded table sees the evolved schema
    val t2 = LakeTable.load(spark, t.path)
    assert(t2.userSchema.get.fieldNames.contains("note"))
  }

  test("batch missing an optional column is null-filled; update still merges") {
    val s = spark
    import s.implicits._
    val t = mk()
    t.upsert(Seq((1, 10L, "p1", 1.0, "x")).toDF("id", "ts", "part", "v", "note"))
    t.upsert(Seq((1, 20L, "p1", 9.0)).toDF("id", "ts", "part", "v")) // no note
    val r = t.snapshot().head()
    assert(r.getAs[Double]("v") == 9.0)
    assert(r.getAs[String]("note") == null) // newest version wins wholesale
  }

  test("type widening: int→long and float→double evolve the schema in place") {
    val s = spark
    import s.implicits._
    val t = mk()
    t.upsert(Seq((1, 10L, "p1", 1, 1.5f)).toDF("id", "ts", "part", "n", "x"))
    assert(t.userSchema.get("n").dataType.typeName == "integer")
    // a later batch carries wider types — schema widens, old files stay
    // readable through the parquet widening reader
    t.upsert(Seq((2, 10L, "p1", 5000000000L, 2.5d))
      .toDF("id", "ts", "part", "n", "x"))
    val t2 = LakeTable.load(spark, t.path)
    assert(t2.userSchema.get("n").dataType.typeName == "long")
    assert(t2.userSchema.get("x").dataType.typeName == "double")
    val snap = t2.snapshot().orderBy("id").collect()
    assert(snap.map(_.getAs[Long]("n")).toSeq == Seq(1L, 5000000000L))
    assert(snap(0).getAs[Double]("x") == 1.5 && snap(1).getAs[Double]("x") == 2.5)
    // and the widened table still merges updates on old keys
    t2.upsert(Seq((1, 20L, "p1", 7L, 9.0d)).toDF("id", "ts", "part", "n", "x"))
    assert(t2.snapshot().filter(col("id") === 1).head().getAs[Long]("n") == 7L)
  }

  test("narrowing does NOT drift the schema (incoming cast down)") {
    val s = spark
    import s.implicits._
    val t = mk()
    t.upsert(Seq((1, 10L, "p1", 10L)).toDF("id", "ts", "part", "n"))
    t.upsert(Seq((2, 10L, "p1", 3)).toDF("id", "ts", "part", "n")) // int batch
    assert(t.userSchema.get("n").dataType.typeName == "long")
    assert(t.snapshot().filter(col("id") === 2).head().getAs[Long]("n") == 3L)
  }

  test("rename column: old files readable, writes use new name, old name maps") {
    val s = spark
    import s.implicits._
    val t = mk()
    t.upsert(Seq((1, 10L, "p1", 1.0)).toDF("id", "ts", "part", "v"))
    t.renameColumn("v", "value")
    // metadata-only: old file still holds physical "v", read as "value"
    assert(t.userSchema.get.fieldNames.toSeq == Seq("id", "ts", "part", "value"))
    assert(t.snapshot().filter(col("id") === 1).head().getAs[Double]("value") == 1.0)
    // new writes under the new name merge with pre-rename rows
    t.upsert(Seq((2, 10L, "p1", 2.0)).toDF("id", "ts", "part", "value"))
    assert(t.snapshot().orderBy("id").collect()
      .map(_.getAs[Double]("value")).toSeq == Seq(1.0, 2.0))
    // a lagging producer still using the OLD name writes into the new one
    t.upsert(Seq((3, 10L, "p1", 3.0)).toDF("id", "ts", "part", "v"))
    val r3 = t.snapshot().filter(col("id") === 3).head()
    assert(r3.getAs[Double]("value") == 3.0)
    assert(!t.snapshot().columns.contains("v"))
    // reload sees the evolved schema; updates across the rename merge by key
    val t2 = LakeTable.load(spark, t.path)
    t2.upsert(Seq((1, 20L, "p1", 11.0)).toDF("id", "ts", "part", "value"))
    assert(t2.snapshot().filter(col("id") === 1).head().getAs[Double]("value") == 11.0)
    // compaction-equivalent rewrite (cluster) retires the ghost physically
    t2.cluster(Seq("id"))
    assert(t2.snapshot().orderBy("id").collect()
      .map(_.getAs[Double]("value")).toSeq == Seq(11.0, 2.0, 3.0))
    // renaming a partition column is rejected
    assertThrows[IllegalArgumentException](t2.renameColumn("part", "pt"))
  }

  test("rename a precombine column keeps merge semantics") {
    val s = spark
    import s.implicits._
    val t = mk()
    t.upsert(Seq((1, 10L, "p1", 1.0)).toDF("id", "ts", "part", "v"))
    t.renameColumn("ts", "updated_at")
    assert(LakeTable.load(spark, t.path).meta.precombineField == "updated_at")
    // stale update loses against the pre-rename version's precombine
    t.upsert(Seq((1, 5L, "p1", 99.0)).toDF("id", "updated_at", "part", "v"))
    assert(t.snapshot().head().getAs[Double]("v") == 1.0)
    t.upsert(Seq((1, 20L, "p1", 2.0)).toDF("id", "updated_at", "part", "v"))
    assert(t.snapshot().head().getAs[Double]("v") == 2.0)
  }

  test("drop column: disappears from reads, tombstoned against re-add") {
    val s = spark
    import s.implicits._
    val t = mk()
    t.upsert(Seq((1, 10L, "p1", 1.0, "secret"))
      .toDF("id", "ts", "part", "v", "note"))
    t.dropColumn("note")
    assert(!t.snapshot().columns.contains("note"))
    assert(!LakeTable.load(spark, t.path).userSchema.get.fieldNames.contains("note"))
    // a batch still carrying the dropped column does NOT resurrect it
    t.upsert(Seq((2, 10L, "p1", 2.0, "zombie"))
      .toDF("id", "ts", "part", "v", "note"))
    assert(!t.snapshot().columns.contains("note"))
    assert(t.snapshot().count() == 2)
    // required columns cannot be dropped
    assertThrows[IllegalArgumentException](t.dropColumn("id"))
    assertThrows[IllegalArgumentException](t.dropColumn("ts"))
    assertThrows[IllegalArgumentException](t.dropColumn("part"))
  }

  test("batch missing a required column fails loudly") {
    val s = spark
    import s.implicits._
    val t = mk()
    t.upsert(Seq((1, 10L, "p1", 1.0)).toDF("id", "ts", "part", "v"))
    val bad = Seq((2, "p1", 2.0)).toDF("id", "part", "v") // no ts (precombine)
    assertThrows[IllegalArgumentException](t.upsert(bad))
  }
}
