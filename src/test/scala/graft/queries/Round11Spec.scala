package graft.queries

import graft.util.Sessions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the round-11 query additions, beyond the DuckDB hash
  * gate: structural properties (monotonicity, bounds, subset/permutation
  * invariance) that hold at ANY scale factor, plus small imperative
  * references where the gate's SQL merely replays the same algorithm.
  */
class Round11Spec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Sessions.local("round11-test", "4")
  val dir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  test("q37_streaks: imperative reference on raw (user, day) sets") {
    val rows = Relational.q37Streaks(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val days = Relational.events(spark, dir)
      .select(col("user_id"),
        datediff(to_date(col("ts")), lit("1970-01-01").cast("date")))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getInt(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toVector).toMap
    assert(rows.keySet == days.keySet)
    days.foreach { case (u, ds) =>
      var longest = 1L; var cur = 1L; var streaks = 1L
      ds.sliding(2).foreach {
        case Vector(a, b) =>
          if (b == a + 1) { cur += 1; longest = math.max(longest, cur) }
          else { streaks += 1; cur = 1 }
        case _ => ()
      }
      assert(rows(u) == (longest, ds.length.toLong, streaks), s"user $u")
    }
  }

  test("stats_gini: uniform masses → 0; all-in-one concentration → high") {
    // build tiny frames through the same rank-weighted integer formula
    import spark.implicits._
    def gini(masses: Seq[Long]): Long = {
      val x = masses.sorted.zipWithIndex.map { case (m, i) => (i + 1L) * m }
      val n = masses.length.toLong; val s = masses.sum
      (10000L * (2L * x.sum - (n + 1L) * s)) / (n * s)
    }
    assert(gini(Seq(10L, 10L, 10L, 10L)) == 0L)
    assert(gini(Seq(1L, 1L, 1L, 997L)) > 7000L)
    // and the query's values are in-range with the right keys
    val out = Profile.statsGini(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val g = r.getAs[Long]("gini_bp")
      assert(g >= 0L && g < 10000L)
    }
  }

  test("stats_heaps: vocab and token curves are monotone; final vocab = corpus distinct") {
    val rows = Profile.statsHeaps(spark, dir).orderBy("checkpoint_docs").collect()
    val vocab = rows.map(_.getAs[Long]("vocab"))
    val toks = rows.map(_.getAs[Long]("total_tokens"))
    assert(vocab.sliding(2).forall { case Array(a, b) => a <= b; case _ => true })
    assert(toks.sliding(2).forall { case Array(a, b) => a < b; case _ => true })
    val distinctToks = Relational.t(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("t"))
      .filter(length(col("t")) > 0).select("t").distinct().count()
    assert(vocab.last == distinctToks)
    // Heaps' law direction: types grow sub-linearly vs instances
    assert(vocab.last.toDouble / vocab.head < toks.last.toDouble / toks.head)
  }

  test("sim_recall_eval: bounds, and full-probe ivf implies high recall floor") {
    val rows = Similarity.recallEval(spark, dir).collect()
    assert(rows.map(_.getAs[String]("method")).distinct.sorted.toSeq ==
      Seq("ivf", "lsh"))
    rows.foreach { r =>
      val bp = r.getAs[Long]("recall_bp")
      assert(bp >= 0L && bp <= 10000L)
      assert(bp == r.getAs[Long]("hits") * 1000L)
    }
  }

  test("curate_rejection_sample: deterministic subset, acceptance matches predicate") {
    val a = Curation.rejectionSample(spark, dir).collect()
    val b = Curation.rejectionSample(spark, dir).collect()
    assert(a.toSeq == b.toSeq)
    val P = 1073741789L
    a.foreach { r =>
      val id = r.getAs[Long]("doc_id"); val w = r.getAs[Long]("w_bp")
      assert((id % P) * 2654435761L % P % 10000L < w)
      assert(w <= 9999L)
    }
    val total = Relational.t(spark, dir, "documents").count()
    assert(a.length > 0 && a.length < total)
  }

  test("stats_checksum: invariant under input permutation/partitioning") {
    val base = Profile.statsChecksum(spark, dir).collect().toSeq
    // same rows, shuffled partitioning: order-independent aggregates must
    // produce the identical checksum table
    val shuffled = Relational.t(spark, dir, "documents")
      .repartition(7, col("doc_id"))
      .select(col("source"),
        conv(substring(md5(col("text")), 1, 15), 16, 10)
          .cast("long").as("h"))
      .groupBy("source")
      .agg(count(lit(1)).as("cnt"),
        expr("bit_xor(h)").as("xor_h"),
        min(col("h")).as("min_h"),
        max(col("h")).as("max_h"))
      .orderBy("source").collect().toSeq
    assert(base == shuffled)
  }

  test("text_novelty: first doc fully novel, counts bounded, corpus-additive") {
    val rows = TextAnalysis.novelty(spark, dir).collect()
    val first = rows.minBy(_.getAs[Long]("doc_id"))
    assert(first.getAs[Long]("novelty_bp") == 10000L)
    rows.foreach { r =>
      assert(r.getAs[Long]("novel") <= r.getAs[Long]("n_shingles"))
      assert(r.getAs[Long]("novelty_bp") <= 10000L)
    }
    // sum of novel over docs = corpus distinct shingles
    val distinctShingles = graft.queries.Dedup.docsWithShingles(spark, dir)
      .select(explode(col("sh")).as("ng")).select("ng").distinct().count()
    assert(rows.map(_.getAs[Long]("novel")).sum == distinctShingles)
  }

  test("mm_phash_pairs: pairs are band-sharing, hd symmetric-free and exact") {
    val rows = TextAnalysis.mmPhashPairs(spark, dir).collect()
    assert(rows.nonEmpty)
    val ph = Relational.t(spark, dir, "documents")
      .select(col("doc_id"),
        conv(substring(md5(col("text").cast("binary")), 1, 15), 16, 10)
          .cast("long").as("ph"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val a = r.getAs[Long]("doc_a"); val b = r.getAs[Long]("doc_b")
      assert(a < b)
      val hd = java.lang.Long.bitCount(ph(a) ^ ph(b))
      assert(r.getAs[Int]("hd") == hd)
      // candidate ⇒ at least one identical 15-bit band
      val shared = (0 until 4).exists(i =>
        ((ph(a) >> (i * 15)) & 32767L) == ((ph(b) >> (i * 15)) & 32767L))
      assert(shared)
      assert((r.getAs[Int]("is_dup") == 1) == (hd <= 6))
    }
  }

  test("q38_range_frame: trailing window brute-force reference per user") {
    val out = Relational.q38RangeFrame(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    val evs = Relational.events(spark, dir)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")),
        floor(col("value") * lit(100)).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byUser = evs.groupBy(_._2)
    byUser.values.foreach { es =>
      es.foreach { case (id, _, us, _) =>
        val in = es.filter(e => e._3 >= us - 86400000000L && e._3 <= us)
        assert(out(id) == (in.length.toLong, in.map(_._4).sum), s"event $id")
      }
    }
  }

  test("curate_bloom_decon: no false negatives vs exact decontaminate") {
    val exact = Curation.decontaminate(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloom = Curation.bloomDecontaminate(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("bloom_hits"), r.getAs[Long]("exact_hits"),
          r.getAs[Long]("false_pos"))).toMap
    // a Bloom filter never misses: every exactly-contaminated doc is
    // flagged, with the identical exact hit count
    exact.foreach { case (id, n) =>
      assert(bloom.contains(id), s"doc $id missed by the bloom prefilter")
      assert(bloom(id)._2 == n, s"doc $id exact_hits")
    }
    // and conversely the exact_hits column IS the exact result
    bloom.foreach { case (id, (bh, eh, fp)) =>
      assert(eh == exact.getOrElse(id, 0L))
      assert(fp == bh - eh && fp >= 0L)
    }
  }

  test("sim_range_search: full probe == brute-force eps-ball; probed is a subset") {
    val th = 0.25
    // brute-force ε-ball over the 3 query vectors
    val e = Relational.t(spark, dir, "embeddings")
    val q = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val bf = e.crossJoin(q).filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        graft.functions.CosineSimilarity(col("embedding"), col("qv")).as("sim"))
      .filter(col("sim") >= th)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Similarity.ivfRangeSearch(spark, dir,
        probe = Similarity.IvfCells).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == bf, "full-probe range search must equal brute force")
    val probed = Similarity.ivfRangeSearch(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(probed.subsetOf(full))
    assert(probed.size * 2 >= full.size,
      s"probed recall ${probed.size}/${full.size} too low")
  }

  test("text_winnowing: imperative winnowing reference; density bounds") {
    val win = 4
    val out = TextAnalysis.winnowing(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // recompute from the raw span-hash arrays with a direct loop
    val hs = Relational.t(spark, dir, "documents")
      .filter(size(split(col("text"), " ")) >= 8)
      .select(col("doc_id"),
        graft.functions.TextFunctions.spanHashes(col("text"), 5).as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    assert(out.keySet == hs.keySet)
    hs.foreach { case (id, h) =>
      val sel = (0 to h.length - win).map { j =>
        var mv = Long.MaxValue; var mp = -1
        for (p <- j until j + win) if (h(p) <= mv) { mv = h(p); mp = p }
        mp
      }.distinct
      val fpXor = sel.map(h).foldLeft(0L)(_ ^ _)
      assert(out(id) == (h.length.toLong, sel.length.toLong, fpXor), s"doc $id")
      // a position repeats across at most `win` windows
      assert(sel.length.toLong * win >= (h.length - win + 1).toLong)
    }
  }

  test("text_pii_report: planted incidence recovered exactly per source") {
    val planted = Relational.t(spark, dir, "documents")
      .groupBy("source")
      .agg(count(lit(1)).as("n"),
        sum(when(col("doc_id") % 7 === 0, 1L).otherwise(0L)).as("pe"),
        sum(when(col("doc_id") % 11 === 0, 1L).otherwise(0L)).as("pp"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val rep = TextAnalysis.piiReport(spark, dir).collect()
    assert(rep.map(_.getString(0)).toSet == planted.keySet)
    rep.foreach { r =>
      val (n, pe, pp) = planted(r.getString(0))
      assert(r.getAs[Long]("n_docs") == n)
      // the fixture corpus itself is PII-free: detector counts == planted
      assert(r.getAs[Long]("docs_email") == pe)
      assert(r.getAs[Long]("docs_phone") == pp)
      assert(r.getAs[Long]("pii_docs_bp") <= 10000L)
    }
  }

  test("stats_key_skew: imperative top-10 reference") {
    val byKey = Relational.events(spark, dir).groupBy("user_id").count()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val total = byKey.map(_._2).sum
    val ref = byKey.sortBy { case (u, c) => (-c, u) }.take(10)
    val out = Profile.keySkew(spark, dir).collect()
    assert(out.length == 10)
    out.zip(ref).zipWithIndex.foreach { case ((r, (u, c)), i) =>
      assert(r.getAs[Int]("rk") == i + 1)
      assert(r.getAs[Long]("user_id") == u && r.getAs[Long]("cnt") == c)
      assert(r.getAs[Long]("share_bp") == c * 10000L / total)
      assert(r.getAs[Int]("hot") ==
        (if (c * byKey.length > total * 2) 1 else 0))
    }
  }

  test("sim_knn_incr: full probe == brute-force increment kNN; increment rows only") {
    val e = Relational.t(spark, dir, "embeddings")
    val maxId = e.agg(max(col("vec_id"))).head().getLong(0)
    val split = (maxId + 1L) * 8L / 10L
    val out = Similarity.knnGraphIncremental(spark, dir).collect()
    assert(out.nonEmpty && out.forall(_.getLong(0) >= split),
      "incremental graph must contain increment rows only")
    // probing every cell is exhaustive regardless of where the (corpus-
    // trained) centroids sit — must equal brute-force kNN of the
    // increment over the full corpus
    val full = Similarity.knnGraphIncremental(spark, dir,
        probe = Similarity.IvfCells).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    val q = e.filter(col("vec_id") >= split)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("qid")
      .orderBy(col("sim").desc, col("vec_id").asc)
    val bf = e.crossJoin(q).filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        graft.functions.CosineSimilarity(col("embedding"), col("qv")).as("sim"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .orderBy("qid", "rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    assert(full.toSeq == bf.toSeq)
  }

  test("lake point lookup and restore/evolution snapshots are consistent") {
    // point lookup returns exactly the snapshot slice for the key
    val pl = LakeQueries.lakePointLookup(spark, dir).collect()
    assert(pl.nonEmpty && pl.forall(_.getAs[Long]("l_orderkey") == 42L))
    // restore: no commit after the restore target remains on the timeline
    val restored = LakeQueries.lakeRestore(spark, dir)
    assert(restored.filter(col("l_orderkey") < 200 && col("l_orderkey") >= 0)
      .count() > 0) // the deleted slice is back
    // schema evolution: l_tier null exactly on the untouched keys
    val evo = LakeQueries.lakeSchemaEvolution(spark, dir)
    assert(evo.filter(col("l_orderkey") >= 500 && col("l_tier").isNotNull)
      .count() == 0)
    assert(evo.filter(col("l_orderkey") < 500 && col("l_tier").isNull)
      .count() == 0)
  }
}
