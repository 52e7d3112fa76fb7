package graft.sources

import graft.lake.LakeTable
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** SQL row-level operations over catalog lake tables: MERGE INTO (all
  * clause kinds), UPDATE, and subquery DELETE, on COW and MOR, partitioned
  * and not. The delta-based path stages MOR delta/tombstone files from
  * task-level writers and publishes them as one commit; COW tables
  * compact inline so their no-deltas contract holds.
  */
class RowLevelSqlSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val warehouse =
    java.nio.file.Files.createTempDirectory("rowlevel-wh").toString

  lazy val spark: SparkSession = graft.util.Sessions
    .builder("rowlevel-test")
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.catalog.lake", classOf[LakeCatalog].getName)
    .config("spark.sql.catalog.lake.warehouse", warehouse)
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def rows(sql: String): Seq[Seq[Any]] =
    spark.sql(sql).collect().toSeq.map(_.toSeq)

  test("MERGE INTO: matched update, matched delete, not matched insert") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.m")
    spark.sql(
      """CREATE TABLE lake.m.t (id INT, ts BIGINT, v DOUBLE)
        |OPTIONS ('recordkey.field' 'id', 'precombine.field' 'ts')""".stripMargin)
    spark.sql(
      "INSERT INTO lake.m.t VALUES (1, 10, 1.0), (2, 10, 2.0), (3, 10, 3.0)")
    spark.sql(
      """MERGE INTO lake.m.t t
        |USING (SELECT * FROM VALUES
        |  (2, 20, 22.0), (3, 20, -1.0), (4, 20, 4.0) AS s(id, ts, v)) s
        |ON t.id = s.id
        |WHEN MATCHED AND s.v < 0 THEN DELETE
        |WHEN MATCHED THEN UPDATE SET t.v = s.v, t.ts = s.ts
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(rows("SELECT id, v FROM lake.m.t ORDER BY id") ==
      Seq(Seq(1, 1.0), Seq(2, 22.0), Seq(4, 4.0)))
    // COW contract: no outstanding deltas after the row-level op
    val t = LakeTable.load(spark, s"$warehouse/m/t")
    assert(!t.timeline.liveFiles().exists(_.isDelta))
    // time travel still sees the pre-merge state
    val commits = t.timeline.instants()
    assert(t.snapshotAsOf(commits.head).count() == 3)
  }

  test("MERGE INTO with NOT MATCHED BY SOURCE clauses") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.m2")
    spark.sql(
      """CREATE TABLE lake.m2.t (id INT, ts BIGINT, v DOUBLE)
        |OPTIONS ('recordkey.field' 'id', 'precombine.field' 'ts')""".stripMargin)
    spark.sql(
      "INSERT INTO lake.m2.t VALUES (1, 10, 1.0), (2, 10, 2.0), (3, 10, 3.0)")
    spark.sql(
      """MERGE INTO lake.m2.t t
        |USING (SELECT * FROM VALUES (1, 20, 11.0) AS s(id, ts, v)) s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET t.v = s.v, t.ts = s.ts
        |WHEN NOT MATCHED BY SOURCE AND t.id = 3 THEN DELETE
        |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET t.v = 0.0""".stripMargin)
    assert(rows("SELECT id, v FROM lake.m2.t ORDER BY id") ==
      Seq(Seq(1, 11.0), Seq(2, 0.0)))
  }

  test("UPDATE with expression assignments") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.u")
    spark.sql(
      """CREATE TABLE lake.u.t (id INT, ts BIGINT, v DOUBLE)
        |OPTIONS ('recordkey.field' 'id', 'precombine.field' 'ts')""".stripMargin)
    spark.sql(
      "INSERT INTO lake.u.t VALUES (1, 10, 1.0), (2, 10, 2.0), (3, 10, 3.0)")
    spark.sql("UPDATE lake.u.t SET v = v * 10 WHERE id >= 2")
    assert(rows("SELECT id, v FROM lake.u.t ORDER BY id") ==
      Seq(Seq(1, 1.0), Seq(2, 20.0), Seq(3, 30.0)))
  }

  test("DELETE with a subquery takes the row-level path") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.d")
    spark.sql(
      """CREATE TABLE lake.d.t (id INT, ts BIGINT, v DOUBLE)
        |OPTIONS ('recordkey.field' 'id', 'precombine.field' 'ts')""".stripMargin)
    spark.sql(
      "INSERT INTO lake.d.t VALUES (1, 10, 1.0), (2, 10, 2.0), (3, 10, 3.0)")
    spark.sql(
      """DELETE FROM lake.d.t
        |WHERE id IN (SELECT id FROM lake.d.t WHERE v > 1.5)""".stripMargin)
    assert(rows("SELECT id FROM lake.d.t ORDER BY id") == Seq(Seq(1)))
  }

  test("MERGE on a partitioned MOR table writes deltas, resolves on read") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.p")
    spark.sql(
      """CREATE TABLE lake.p.t (id INT, ts BIGINT, part STRING, v DOUBLE)
        |PARTITIONED BY (part)
        |OPTIONS ('recordkey.field' 'id', 'precombine.field' 'ts',
        |         'table.type' 'mor')""".stripMargin)
    spark.sql(
      """INSERT INTO lake.p.t VALUES
        |(1, 10, 'a', 1.0), (2, 10, 'a', 2.0), (3, 10, 'b', 3.0)""".stripMargin)
    spark.sql(
      """MERGE INTO lake.p.t t
        |USING (SELECT * FROM VALUES
        |  (2, 20, 'a', 22.0), (3, 20, 'b', -1.0),
        |  (9, 20, 'b', 9.0) AS s(id, ts, part, v)) s
        |ON t.id = s.id
        |WHEN MATCHED AND s.v < 0 THEN DELETE
        |WHEN MATCHED THEN UPDATE SET t.v = s.v, t.ts = s.ts
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(rows("SELECT id, part, v FROM lake.p.t ORDER BY id") ==
      Seq(Seq(1, "a", 1.0), Seq(2, "a", 22.0), Seq(9, "b", 9.0)))
    // MOR: the merge appended deltas (cheap write), not a rewrite
    val t = LakeTable.load(spark, s"$warehouse/p/t")
    assert(t.timeline.liveFiles().exists(_.isDelta))
    // update rows landed in their partition dir; the delete tombstone in
    // the null-partition dir
    val added = t.timeline.read(t.timeline.instants().last).added
    assert(added.exists(_.partition == "part=a"))
    assert(added.filter(_.tombstones > 0)
      .forall(_.partition == "part=__HIVE_DEFAULT_PARTITION__"))
    assert(added.exists(_.tombstones > 0)) // the MATCHED DELETE
    // compaction folds the merge in; read-optimized then serves it
    t.compact()
    assert(t.readOptimized().count() == 3)
    assert(rows("SELECT id, part, v FROM lake.p.t ORDER BY id") ==
      Seq(Seq(1, "a", 1.0), Seq(2, "a", 22.0), Seq(9, "b", 9.0)))
  }

  test("UPDATE that moves a row across partitions relocates it") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.mv")
    spark.sql(
      """CREATE TABLE lake.mv.t (id INT, ts BIGINT, part STRING, v DOUBLE)
        |PARTITIONED BY (part)
        |OPTIONS ('recordkey.field' 'id', 'precombine.field' 'ts')""".stripMargin)
    spark.sql(
      "INSERT INTO lake.mv.t VALUES (1, 10, 'a', 1.0), (2, 10, 'a', 2.0)")
    spark.sql("UPDATE lake.mv.t SET part = 'b' WHERE id = 2")
    assert(rows("SELECT id, part FROM lake.mv.t ORDER BY id") ==
      Seq(Seq(1, "a"), Seq(2, "b")))
    assert(rows("SELECT id FROM lake.mv.t WHERE part = 'b'") == Seq(Seq(2)))
  }

  test("merged rows keep upsert versioning (newer stored precombine wins)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.pc")
    spark.sql(
      """CREATE TABLE lake.pc.t (id INT, ts BIGINT, v DOUBLE)
        |OPTIONS ('recordkey.field' 'id', 'precombine.field' 'ts',
        |         'table.type' 'mor')""".stripMargin)
    spark.sql("INSERT INTO lake.pc.t VALUES (1, 100, 1.0), (2, 10, 2.0)")
    // id=1: assignment carries OLDER ts than stored -> stored row survives
    // id=2: newer ts -> update wins
    spark.sql(
      """MERGE INTO lake.pc.t t
        |USING (SELECT * FROM VALUES
        |  (1, 50, 111.0), (2, 20, 22.0) AS s(id, ts, v)) s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET t.v = s.v, t.ts = s.ts""".stripMargin)
    assert(rows("SELECT id, v FROM lake.pc.t ORDER BY id") ==
      Seq(Seq(1, 1.0), Seq(2, 22.0)))
  }

  test("MERGE on an indexScope=partition table handles partition moves") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.is")
    spark.sql(
      """CREATE TABLE lake.is.t (id INT, ts BIGINT, part STRING, v DOUBLE)
        |PARTITIONED BY (part)
        |OPTIONS ('recordkey.field' 'id', 'precombine.field' 'ts',
        |         'index.scope' 'partition')""".stripMargin)
    spark.sql(
      "INSERT INTO lake.is.t VALUES (1, 10, 'a', 1.0), (2, 10, 'a', 2.0)")
    // partition-scoped identity: moving id=2 to part b = new identity;
    // the old (a, 2) identity must die via the update's tombstone half
    spark.sql(
      """MERGE INTO lake.is.t t
        |USING (SELECT * FROM VALUES (2, 20, 'b', 22.0) AS s(id, ts, part, v)) s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET
        |  t.part = s.part, t.v = s.v, t.ts = s.ts""".stripMargin)
    assert(rows("SELECT id, part, v FROM lake.is.t ORDER BY id") ==
      Seq(Seq(1, "a", 1.0), Seq(2, "b", 22.0)))
  }

  test("static partition predicate in the ON clause scopes the merge") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.sp")
    spark.sql(
      """CREATE TABLE lake.sp.t (id INT, ts BIGINT, part STRING, v DOUBLE)
        |PARTITIONED BY (part)
        |OPTIONS ('recordkey.field' 'id', 'precombine.field' 'ts')""".stripMargin)
    spark.sql(
      "INSERT INTO lake.sp.t VALUES (1, 10, 'a', 1.0), (2, 10, 'b', 9.0)")
    // the partition guard keeps the merge from touching part=b even
    // though the source carries a matching id there — the documented
    // scoping pattern for huge targets (static ON predicates push into
    // the target scan and prune partitions/files)
    spark.sql(
      """MERGE INTO lake.sp.t t
        |USING (SELECT * FROM VALUES
        |  (1, 20, 111.0), (2, 20, 222.0) AS s(id, ts, v)) s
        |ON t.id = s.id AND t.part = 'a'
        |WHEN MATCHED THEN UPDATE SET t.v = s.v, t.ts = s.ts""".stripMargin)
    assert(rows("SELECT id, part, v FROM lake.sp.t ORDER BY id") ==
      Seq(Seq(1, "a", 111.0), Seq(2, "b", 9.0)))
  }

  test("merge plan prunes the target scan to the referenced columns") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.bp")
    spark.sql(
      """CREATE TABLE lake.bp.t (id INT, ts BIGINT, v DOUBLE)
        |OPTIONS ('recordkey.field' 'id', 'precombine.field' 'ts')""".stripMargin)
    spark.sql("INSERT INTO lake.bp.t VALUES (1, 10, 1.0), (2, 10, 2.0)")
    val plan = spark.sql(
      """EXPLAIN FORMATTED MERGE INTO lake.bp.t t
        |USING (SELECT * FROM VALUES (1, 20, 11.0) AS s(id, ts, v)) s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET t.v = s.v, t.ts = s.ts
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin).head().getString(0)
    assert(plan.contains("WriteDelta"), s"expected delta write, got:\n$plan")
    // the 100 TB property of the delta rewrite: since every assigned
    // value comes from the source, the target scan reads ONLY the join
    // key + rowId — not the full row. (The join itself is a RightOuter
    // on the source — NOT MATCHED needs all source rows, and a right
    // outer can only broadcast the target side, so a small source can
    // never broadcast here; scan pruning is the lever that matters.)
    assert(plan.contains("ReadSchema: struct<id:int,_record_key:string>"),
      s"expected a key+rowId-only target scan, got:\n$plan")
  }

  test("MERGE WITH SCHEMA EVOLUTION adds the source's new column") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.se")
    spark.sql(
      """CREATE TABLE lake.se.t (id INT, ts BIGINT, v DOUBLE)
        |OPTIONS ('recordkey.field' 'id', 'precombine.field' 'ts')""".stripMargin)
    spark.sql("INSERT INTO lake.se.t VALUES (1, 10, 1.0), (2, 10, 2.0)")
    // source columns carry the table's exact types (20L, 22.0D): Spark
    // diffs atomic types exactly here — a 22.0 decimal literal would
    // demand narrowing double→decimal(3,1), which the catalog refuses
    spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO lake.se.t t
        |USING (SELECT * FROM VALUES
        |  (2, 20L, 22.0D, 'hot'), (3, 20L, 3.0D, 'new') AS s(id, ts, v, tag)) s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(rows("SELECT id, v, tag FROM lake.se.t ORDER BY id") ==
      Seq(Seq(1, 1.0, null), Seq(2, 22.0, "hot"), Seq(3, 3.0, "new")))
  }

  test("failed merge commits nothing and leaves no staging residue") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.fx")
    spark.sql(
      """CREATE TABLE lake.fx.t (id INT, ts BIGINT, v DOUBLE)
        |OPTIONS ('recordkey.field' 'id', 'precombine.field' 'ts')""".stripMargin)
    spark.sql("INSERT INTO lake.fx.t VALUES (1, 10, 1.0), (2, 10, 2.0)")
    val t = LakeTable.load(spark, s"$warehouse/fx/t")
    val commitsBefore = t.timeline.instants()
    // the source blows up mid-scan AFTER some rows may already have been
    // written by task writers — the write must abort cleanly
    val e = intercept[Exception] {
      spark.sql(
        """MERGE INTO lake.fx.t t
          |USING (SELECT id, ts,
          |         CASE WHEN id = 2 THEN raise_error('boom') ELSE 'x' END AS tag,
          |         v FROM VALUES (1, 20, 11.0), (2, 20, 22.0) AS s(id, ts, v)) s
          |ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET t.v = s.v, t.ts = s.ts""".stripMargin)
    }
    assert(e.getMessage.contains("boom") ||
      (e.getCause != null && e.getCause.getMessage.contains("boom")))
    // no commit, table unchanged
    assert(t.timeline.instants() == commitsBefore)
    assert(spark.sql("SELECT v FROM lake.fx.t ORDER BY id").collect()
      .map(_.getDouble(0)).toSeq == Seq(1.0, 2.0))
    // abort removed the staging dir
    val stagingRoot = new java.io.File(s"$warehouse/fx/t/_lake/staging")
    assert(!stagingRoot.exists() || stagingRoot.listFiles().isEmpty)
  }

  /** Stage delta rows the way a task writer would (physical schema =
    * user cols + meta cols, flat layout on an unpartitioned table) and
    * return the staged parquet paths.
    */
  private def stageDelta(staging: org.apache.hadoop.fs.Path,
      rows: Seq[(Int, Long, Double, String, String, Boolean)]):
      Seq[org.apache.hadoop.fs.Path] = {
    val s = spark
    import s.implicits._
    rows.toDF("id", "ts", "v", "_record_key", "_commit_time", "_deleted")
      .coalesce(1).write.parquet(staging.toString)
    val fs = staging.getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(staging).toSeq.map(_.getPath)
      .filter(_.getName.endsWith(".parquet"))
  }

  test("concurrent OVERLAPPING commit aborts the merge at publish") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.cc")
    spark.sql(
      """CREATE TABLE lake.cc.t (id INT, ts BIGINT, v DOUBLE)
        |OPTIONS ('recordkey.field' 'id', 'precombine.field' 'ts')""".stripMargin)
    spark.sql("INSERT INTO lake.cc.t VALUES (1, 10, 1.0)")
    val t = LakeTable.load(spark, s"$warehouse/cc/t")
    val visible = t.committedInstants()
    val instant = t.rowLevelBegin()
    val staging = t.rowLevelStaging(instant)
    // someone else lands key 2 first; our statement also wrote key 2
    val s = spark
    import s.implicits._
    t.upsert(Seq((2, 10L, 2.0)).toDF("id", "ts", "v"))
    val files = stageDelta(staging,
      Seq((2, 20L, 9.0, "2", instant, false)))
    intercept[java.util.ConcurrentModificationException] {
      t.rowLevelCommit(instant, staging, files, "merge", visible)
    }
    // the abort released the reservation (consumers are not capped) and
    // left no trace: the concurrent writer's row is intact
    assert(t.latestCommit.isDefined)
    assert(spark.sql("SELECT v FROM lake.cc.t WHERE id = 2").head()
      .getDouble(0) == 2.0)
  }

  test("concurrent DISJOINT commit publishes: multi-writer OCC") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.cd")
    spark.sql(
      """CREATE TABLE lake.cd.t (id INT, ts BIGINT, v DOUBLE)
        |OPTIONS ('recordkey.field' 'id', 'precombine.field' 'ts')""".stripMargin)
    spark.sql("INSERT INTO lake.cd.t VALUES (1, 10, 1.0)")
    val t = LakeTable.load(spark, s"$warehouse/cd/t")
    val visible = t.committedInstants()
    val instant = t.rowLevelBegin()
    val staging = t.rowLevelStaging(instant)
    val s = spark
    import s.implicits._
    // concurrent writer lands key 2; our write-set is key 3 — disjoint
    t.upsert(Seq((2, 10L, 2.0)).toDF("id", "ts", "v"))
    val files = stageDelta(staging,
      Seq((3, 10L, 3.0, "3", instant, false)))
    t.rowLevelCommit(instant, staging, files, "merge", visible)
    assert(spark.sql("SELECT id, v FROM lake.cd.t ORDER BY id").collect()
      .map(r => (r.getInt(0), r.getDouble(1))).toSeq ==
      Seq((1, 1.0), (2, 2.0), (3, 3.0)))
  }
}
