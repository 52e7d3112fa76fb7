package graft.sources

import graft.lake.LakeTable
import graft.util.Sessions
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The `format("graft-lake")` surface — read/write option parity with the
  * reference's `format("hudi")` usage (ODS2DWD.scala:51-56,
  * package.scala:71-73).
  */
class LakeDataSourceSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Sessions.local("dsv1-test", "4")

  override def afterAll(): Unit = spark.stop()

  def tmp(): String = Files.createTempDirectory("lakedsv").toString + "/t"

  def df(rows: (Int, Long, String, Double)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("id", "ts", "part", "v")
  }

  test("write creates table from options; read round-trips snapshot") {
    val p = tmp()
    df((1, 10L, "p1", 1.0), (2, 10L, "p2", 2.0))
      .write.format("graft-lake")
      .option("recordkey.field", "id")
      .option("precombine.field", "ts")
      .option("partition.fields", "part")
      .mode(SaveMode.Append)
      .save(p)
    val back = spark.read.format("graft-lake").load(p)
    assert(back.count() == 2)
    assert(back.columns.contains("_record_key"))
    // upsert through the format API merges by key
    df((2, 20L, "p2", 22.0)).write.format("graft-lake")
      .mode(SaveMode.Append).save(p)
    val merged = spark.read.format("graft-lake").load(p)
    assert(merged.count() == 2)
    assert(merged.filter(col("id") === 2).head().getAs[Double]("v") == 22.0)
  }

  test("incremental and time-travel query options") {
    val p = tmp()
    val t = LakeTable.create(spark, p,
      graft.lake.TableMeta("x", Seq("id"), "ts", Seq("part")))
    val c1 = t.upsert(df((1, 10L, "p1", 1.0), (2, 10L, "p1", 2.0)))
    val c2 = t.upsert(df((2, 20L, "p1", 22.0), (3, 20L, "p2", 3.0)))
    val inc = spark.read.format("graft-lake")
      .option("query.type", "incremental")
      .option("begin", c1).option("end", c2)
      .load(p)
    assert(inc.select("id").collect().map(_.getInt(0)).toSet == Set(2, 3))
    val asOf = spark.read.format("graft-lake")
      .option("as.of", c1).load(p)
    assert(asOf.count() == 2)
    assert(asOf.filter(col("id") === 2).head().getAs[Double]("v") == 2.0)
    // CDC feed through the same option surface (v1 and v2 share queryDf)
    for (fmt <- Seq("graft-lake", "graft-lake-v2")) {
      val cdc = spark.read.format(fmt)
        .option("query.type", "changes")
        .option("begin", c1)
        .load(p)
      assert(cdc.columns.contains("_change_type"))
      val got = cdc.select("id", "_change_type").collect()
        .map(r => (r.getInt(0), r.getString(1))).toSet
      assert(got == Set((2, "update_preimage"), (2, "update_postimage"),
        (3, "insert")))
    }
  }

  test("writeStream.format(graft-lake): keyed streaming sink with batch watermark") {
    val work = Files.createTempDirectory("lakesink").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$work/inbox"))
    Files.write(java.nio.file.Paths.get(s"$work/inbox/b1.json"),
      Seq("""{"id":1,"ts":10,"part":"p1","v":1.0}""",
        """{"id":2,"ts":10,"part":"p1","v":2.0}""").mkString("\n").getBytes)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id INT, ts BIGINT, part STRING, v DOUBLE")
    val q = spark.readStream.schema(schema).json(s"$work/inbox")
      .writeStream.format("graft-lake")
      .option("checkpointLocation", s"$work/ckpt")
      .option("path", s"$work/t")
      .option("recordkey.field", "id")
      .option("precombine.field", "ts")
      .option("partition.fields", "part")
      .start()
    q.processAllAvailable()
    // second batch: update id=2, insert id=3 — keyed convergence
    Files.write(java.nio.file.Paths.get(s"$work/inbox/b2.json"),
      Seq("""{"id":2,"ts":20,"part":"p1","v":22.0}""",
        """{"id":3,"ts":20,"part":"p2","v":3.0}""").mkString("\n").getBytes)
    q.processAllAvailable()
    q.stop()
    val t = LakeTable.load(spark, s"$work/t")
    assert(t.snapshot().count() == 3)
    assert(t.snapshot().filter(col("id") === 2).head().getAs[Double]("v") == 22.0)
    // each applied micro-batch recorded its id with the commit, under a
    // key namespaced by the owning query's id
    val extras = t.timeline.instants().map(t.timeline.read).flatMap(_.extra)
    val batchKeys = extras.filter(_._1.startsWith("stream.batch.id."))
    assert(batchKeys.map(_._2) == Seq("0", "1"))
    assert(batchKeys.map(_._1).distinct.size == 1) // one query, one key
  }

  test("sink watermark is per-query: second stream and checkpoint reset keep writing") {
    val work = Files.createTempDirectory("lakesink2").toString
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id INT, ts BIGINT, part STRING, v DOUBLE")
    def write(inbox: String, name: String, rows: String*): Unit = {
      Files.createDirectories(java.nio.file.Paths.get(inbox))
      Files.write(java.nio.file.Paths.get(s"$inbox/$name"),
        rows.mkString("\n").getBytes)
    }
    def stream(inbox: String, ckpt: String) =
      spark.readStream.schema(schema).json(inbox)
        .writeStream.format("graft-lake")
        .option("checkpointLocation", ckpt)
        .option("path", s"$work/t")
        .option("recordkey.field", "id")
        .option("precombine.field", "ts")
        .option("partition.fields", "part")
        .start()

    // stream A applies its batches 0..1
    write(s"$work/inA", "a1.json", """{"id":1,"ts":10,"part":"p1","v":1.0}""")
    val qa = stream(s"$work/inA", s"$work/ckptA")
    qa.processAllAvailable()
    write(s"$work/inA", "a2.json", """{"id":2,"ts":10,"part":"p1","v":2.0}""")
    qa.processAllAvailable()
    qa.stop()

    // stream B into the SAME table starts at batch 0 — a global watermark
    // (already at 1) would silently swallow it
    write(s"$work/inB", "b1.json", """{"id":3,"ts":10,"part":"p2","v":3.0}""")
    val qb = stream(s"$work/inB", s"$work/ckptB")
    qb.processAllAvailable()
    qb.stop()
    val t = LakeTable.load(spark, s"$work/t")
    assert(t.snapshot().count() == 3)

    // checkpoint reset of stream A: batch ids restart at 0 under a FRESH
    // query id — its rows must land, not be treated as replays
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(s"$work/ckptA"))
    write(s"$work/inA", "a3.json", """{"id":4,"ts":10,"part":"p1","v":4.0}""")
    val qa2 = stream(s"$work/inA", s"$work/ckptA")
    qa2.processAllAvailable()
    qa2.stop()
    // the reset query re-reads the whole inbox (ids 1,2,4) — keyed
    // convergence dedups 1 and 2, and the new id=4 row must be present
    assert(t.snapshot().count() == 4)
    assert(t.snapshot().filter(col("id") === 4).count() == 1)
    // and a genuine replay within ONE query is still skipped: the applied
    // batch-id watermarks are monotonic per query key
    val perKey = t.timeline.instants().map(t.timeline.read).flatMap(_.extra)
      .filter(_._1.startsWith("stream.batch.id."))
      .groupBy(_._1).view.mapValues(_.map(_._2.toLong)).toMap
    assert(perKey.size == 3) // three distinct query ids
    perKey.values.foreach(ids => assert(ids == ids.sorted && ids.distinct == ids))
  }

  test("SQL catalog: CREATE TABLE USING graft-lake, query, drop") {
    val p = tmp()
    df((1, 10L, "p1", 1.0), (2, 20L, "p2", 2.0))
      .write.format("graft-lake")
      .option("recordkey.field", "id")
      .option("precombine.field", "ts")
      .mode(SaveMode.Append).save(p)
    // the catalog analog of the reference's Hive meta sync (K4): a real
    // catalog table over the lake path, queryable by name in SQL
    spark.sql(s"CREATE TABLE lake_sql_t USING `graft-lake` OPTIONS (path '$p')")
    try {
      val rows = spark.sql(
        "SELECT id, v FROM lake_sql_t WHERE part = 'p2'").collect()
      assert(rows.length == 1 && rows(0).getInt(0) == 2)
      // writes through the library become visible after REFRESH TABLE —
      // the standard external-table contract (the catalog caches the
      // resolved relation, exactly as it does for parquet/Hudi tables)
      LakeTable.load(spark, p).upsert(df((3, 30L, "p1", 3.0)))
      spark.sql("REFRESH TABLE lake_sql_t")
      assert(spark.sql("SELECT COUNT(*) FROM lake_sql_t").head().getLong(0) == 3)
    } finally spark.sql("DROP TABLE lake_sql_t")
  }

  test("readStream.format(graft-lake): commit-incremental streaming source") {
    val work = Files.createTempDirectory("lakesrc").toString
    val t = LakeTable.create(spark, s"$work/t",
      graft.lake.TableMeta("src", Seq("id"), "ts", Seq("part")))
    t.upsert(df((1, 10L, "p1", 1.0), (2, 10L, "p1", 2.0)))
    // a file sink: the only kind that supports checkpoint RECOVERY, which
    // the restart half of this test exercises
    def start() = spark.readStream.format("graft-lake").load(s"$work/t")
      .writeStream.format("parquet")
      .option("path", s"$work/feed")
      .option("checkpointLocation", s"$work/ckpt")
      .outputMode("append")
      .start()
    def feed() = spark.read.schema(t.fullSchema).parquet(s"$work/feed")
    val q = start()
    q.processAllAvailable()
    // initial batch replays the timeline from earliest
    assert(feed().count() == 2)
    // a new commit (1 update + 1 insert) flows through as a change feed
    t.upsert(df((2, 20L, "p1", 22.0), (3, 20L, "p2", 3.0)))
    q.processAllAvailable()
    assert(feed().count() == 4)
    assert(feed().filter(col("id") === 2).count() == 2) // both versions appended
    assert(feed().filter(col("id") === 3).head().getAs[Double]("v") == 3.0)
    q.stop()
    // commits made while the stream is DOWN are picked up from the
    // checkpointed offset on restart — no replay, no loss
    t.upsert(df((4, 30L, "p2", 4.0)))
    val q2 = start()
    q2.processAllAvailable()
    assert(feed().count() == 5)
    assert(feed().filter(col("id") === 4).count() == 1)
    q2.stop()
  }

  test("readStream query.type=changes: streaming CDC source") {
    val work = Files.createTempDirectory("lakecdc").toString
    val t = LakeTable.create(spark, s"$work/t",
      graft.lake.TableMeta("cdc", Seq("id"), "ts", Seq("part")))
    val c1 = t.upsert(df((1, 10L, "p1", 1.0), (2, 10L, "p1", 2.0)))
    val q = spark.readStream.format("graft-lake")
      .option("query.type", "changes")
      .option("start.at", c1) // CDC from the current state onward
      .load(s"$work/t")
      .writeStream.format("parquet")
      .option("path", s"$work/feed")
      .option("checkpointLocation", s"$work/ckpt")
      .outputMode("append")
      .start()
    q.processAllAvailable()
    t.upsert(df((2, 20L, "p1", 22.0), (3, 20L, "p2", 3.0)))
    t.delete(df((1, 99L, "p1", 0.0)))
    q.processAllAvailable()
    q.stop()
    val feed = spark.read.schema(t.changesSchema).parquet(s"$work/feed")
    val got = feed.select("id", "v", "_change_type").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getString(2))).toSet
    // two micro-batches: (update 2 + insert 3), then (delete 1)
    assert(got == Set(
      (2, 2.0, "update_preimage"), (2, 22.0, "update_postimage"),
      (3, 3.0, "insert"), (1, 1.0, "delete")))
  }

  test("table-to-table streaming: lake source → transform → lake sink") {
    val work = Files.createTempDirectory("lake2lake").toString
    val ods = LakeTable.create(spark, s"$work/ods",
      graft.lake.TableMeta("ods", Seq("id"), "ts", Seq("part")))
    ods.upsert(df((1, 10L, "p1", 1.0), (2, 10L, "p1", 2.0)))
    // one Structured Streaming query wires the medallion hop: the ODS
    // change feed, a projection, and the keyed DWD sink — checkpointed
    // end to end, replacing the reference's poll-loop ODS→DWD program
    val q = spark.readStream.format("graft-lake").load(s"$work/ods")
      .select(col("id"), col("ts"), col("part"),
        (col("v") * 10).as("v10"))
      .writeStream.format("graft-lake")
      .option("checkpointLocation", s"$work/ckpt")
      .option("path", s"$work/dwd")
      .option("recordkey.field", "id")
      .option("precombine.field", "ts")
      .option("partition.fields", "part")
      .start()
    q.processAllAvailable()
    val dwd = LakeTable.load(spark, s"$work/dwd")
    assert(dwd.snapshot().count() == 2)
    // upstream update + insert converge downstream BY KEY (not append)
    ods.upsert(df((2, 20L, "p1", 22.0), (3, 20L, "p2", 3.0)))
    q.processAllAvailable()
    q.stop()
    val snap = dwd.snapshot().orderBy("id").collect()
    assert(snap.length == 3)
    assert(snap(1).getAs[Double]("v10") == 220.0) // updated, not duplicated
    assert(snap(2).getAs[Double]("v10") == 30.0)
  }

  test("streaming source start.at=latest skips history") {
    val work = Files.createTempDirectory("lakesrc2").toString
    val t = LakeTable.create(spark, s"$work/t",
      graft.lake.TableMeta("src2", Seq("id"), "ts", Seq("part")))
    t.upsert(df((1, 10L, "p1", 1.0)))
    val q = spark.readStream.format("graft-lake")
      .option("start.at", "latest").load(s"$work/t")
      .writeStream.format("memory").queryName("lake_feed_latest")
      .option("checkpointLocation", s"$work/ckpt")
      .outputMode("append")
      .start()
    q.processAllAvailable()
    assert(spark.table("lake_feed_latest").count() == 0) // history skipped
    t.upsert(df((2, 20L, "p1", 2.0)))
    q.processAllAvailable()
    val rows = spark.table("lake_feed_latest").collect()
    assert(rows.length == 1 && rows(0).getAs[Int]("id") == 2)
    q.stop()
  }

  test("pure SQL lifecycle: CREATE TABLE with schema, INSERT, SELECT, OVERWRITE") {
    val p = tmp()
    spark.sql(
      s"""CREATE TABLE lake_sql_full (id INT, ts BIGINT, part STRING, v DOUBLE)
         |USING `graft-lake`
         |OPTIONS (path '$p', 'recordkey.field' 'id',
         |         'precombine.field' 'ts', 'partition.fields' 'part')""".stripMargin)
    try {
      // SQL-managed table exposes exactly the declared columns
      assert(spark.table("lake_sql_full").columns.toSeq ==
        Seq("id", "ts", "part", "v"))
      spark.sql(
        "INSERT INTO lake_sql_full VALUES (1, 10, 'p1', 1.0), (2, 10, 'p2', 2.0)")
      assert(spark.sql("SELECT count(*) FROM lake_sql_full").head().getLong(0) == 2)
      // INSERT is a keyed upsert: same key with greater ts replaces
      spark.sql("INSERT INTO lake_sql_full VALUES (2, 20, 'p2', 22.0)")
      val r2 = spark.sql(
        "SELECT v FROM lake_sql_full WHERE id = 2").collect()
      assert(r2.length == 1 && r2(0).getDouble(0) == 22.0)
      // and the library API sees the same table
      val t = LakeTable.load(spark, p)
      assert(t.snapshot().count() == 2)
      // INSERT OVERWRITE atomically replaces the content
      spark.sql("INSERT OVERWRITE lake_sql_full VALUES (9, 90, 'p1', 9.0)")
      val all = spark.sql(
        "SELECT id, v FROM lake_sql_full ORDER BY id").collect()
      assert(all.length == 1 && all(0).getInt(0) == 9 && all(0).getDouble(1) == 9.0)
      assert(t.timeline.read(t.latestCommit.get).operation == "overwrite")
      // pre-overwrite time travel still works through the library
      val instants = t.timeline.instants()
      assert(t.snapshotAsOf(instants(instants.size - 2)).count() == 2)
    } finally spark.sql("DROP TABLE lake_sql_full")
  }

  test("delete operation; filters and pruning pass through") {
    val p = tmp()
    df((1, 10L, "p1", 1.0), (2, 10L, "p1", 2.0), (3, 10L, "p2", 3.0))
      .write.format("graft-lake")
      .option("recordkey.field", "id")
      .option("precombine.field", "ts")
      .option("partition.fields", "part")
      .mode(SaveMode.Append).save(p)
    df((2, 0L, "p1", 0.0)).write.format("graft-lake")
      .option("operation", "delete")
      .mode(SaveMode.Append).save(p)
    val back = spark.read.format("graft-lake").load(p)
    assert(back.select("id").collect().map(_.getInt(0)).toSet == Set(1, 3))
    // pruned + filtered scan returns correct values
    val one = back.filter(col("part") === "p2").select("id", "v").collect()
    assert(one.length == 1 && one(0).getInt(0) == 3 && one(0).getDouble(1) == 3.0)
  }
}
