package graft.queries

import graft.util.Sessions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Corpus-selection pack: determinism, stratum bounds, budget invariants,
  * and the plan shapes that matter at 100 TB (decontamination must
  * broadcast the benchmark side, never shuffle the corpus shingles).
  */
class CurationSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Sessions.local("curation-test", "4")
  val dir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  test("hash sample is deterministic and ~1/16") {
    val a = Curation.hashSample(spark, dir).collect()
    val b = Curation.hashSample(spark, dir).collect()
    assert(a.toSeq == b.toSeq) // pure function of the rows
    val total = Relational.t(spark, dir, "documents").count()
    assert(a.length > 0 && a.length < total / 4)
    assert(a.forall(_.getAs[String]("bucket") < "1000"))
  }

  test("stratified sample: at most 20 per language, every language present") {
    val rows = Curation.stratifiedSample(spark, dir).collect()
    val perLang = rows.groupBy(_.getAs[String]("lang")).view.mapValues(_.length)
    val langs = Relational.t(spark, dir, "documents")
      .select("lang").distinct().count()
    assert(perLang.size == langs)
    assert(perLang.values.forall(_ <= 20))
    // ranks are 1..k contiguous per stratum
    rows.groupBy(_.getAs[String]("lang")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Int]("rk")).sorted.toSeq == (1 to rs.length))
    }
  }

  test("token budget: per-language running totals stay within budget") {
    val rows = Curation.tokenBudget(spark, dir, budget = 5000L).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("lang")).foreach { case (_, rs) =>
      val cums = rs.map(r => (r.getAs[Long]("cum_tokens"), r.getAs[Long]("n_tokens")))
      assert(cums.forall(_._1 <= 5000L))
      // cum is the running sum of the selected prefix
      assert(cums.map(_._1).max == cums.map(_._2).sum)
    }
    // the budget actually binds: fewer docs than the corpus
    assert(rows.length < Relational.t(spark, dir, "documents").count())
  }

  test("sequence packing: budget respected, every doc packed exactly once") {
    val budget = 512L
    val packed = Curation.packSequences(spark, dir, budget)
    // a multi-doc sequence never exceeds the budget; an over-budget
    // sequence can only be a single over-budget document
    assert(packed.filter(col("seq_tokens") > budget &&
      col("n_docs") > 1).count() == 0)
    // conservation: every document lands in exactly one sequence
    val docs = Relational.t(spark, dir, "documents")
    assert(packed.agg(sum("n_docs")).head().getLong(0) == docs.count())
    val tokenTotal = docs
      .select(sum(size(split(col("text"), " ")).cast("long"))).head().getLong(0)
    assert(packed.agg(sum("seq_tokens")).head().getLong(0) == tokenTotal)
    // determinism across runs (repartition + per-partition scan)
    assert(Curation.packSequences(spark, dir, budget).collect().toSeq ==
      packed.collect().toSeq)
  }

  test("quantile bins: monotone in length, near-equal sizes, broadcast plan") {
    val df = Curation.quantileBins(spark, dir)
    // boundary row reaches the corpus scan via broadcast, and the corpus
    // itself is never globally sorted for the assignment (only the final
    // presentation orderBy sorts, on the already-binned rows)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), s"plan was:\n$plan")
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val total = Relational.t(spark, dir, "documents").count()
    assert(rows.length == total)
    // bin is a monotone function of n_chars
    rows.sortBy(_._2).sliding(2).foreach {
      case Array((_, _, b1), (_, v2, b2)) => assert(b1 <= b2, s"bin drop at $v2")
      case _ => ()
    }
    assert(rows.map(_._3).min == 0 && rows.map(_._3).max == 9)
    // deciles from a ≤1/16-granular histogram: sizes near n/10 (loose 2x)
    rows.groupBy(_._3).values.foreach(g =>
      assert(g.size <= total / 5, s"bin of ${g.size} docs"))
  }

  test("quantization of an all-zero embedding yields scale 0, not NaN codes") {
    val s = spark
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("quant-zero").toString
    Seq((1L, Array(0f, 0f, 0f), 0), (2L, Array(1f, -2f, 0.5f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val rows = Curation.quantizeEmbeddings(spark, tmp).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Double]("scale"), r.getAs[Long]("qsum"), r.getAs[Long]("qabs"))).toMap
    assert(rows(1L) == ((0.0, 0L, 0L))) // pinned, engine-portable
    assert(rows(2L)._1 == 127.0 / 2.0 && rows(2L)._3 > 0L)
  }

  test("decontamination broadcasts the benchmark side and flags real overlaps") {
    // run via the staged-shingle path: nothing is persisted, so
    // releaseAfter is a lazy pass-through and the join plan is
    // inspectable (the cached path eagerly checkpoints the drop list,
    // leaving only a checkpoint scan behind)
    val stage = java.nio.file.Files.createTempDirectory("decon-stage").toString
    spark.conf.set(Dedup.StageDirConf, stage)
    try {
      val df = Curation.decontaminate(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
        s"benchmark join must broadcast, got:\n$plan")
      val flagged = df.collect()
      assert(flagged.forall(_.getAs[Long]("n_hits") > 0))
      assert(flagged.forall(_.getAs[Long]("doc_id") % 97 != 0)) // benchmark excluded
      // cached path: same rows, and the shingle cache is released after
      spark.conf.unset(Dedup.StageDirConf)
      val cached = Curation.decontaminate(spark, dir).collect()
      assert(cached.toSeq == flagged.toSeq)
      assert(spark.sharedState.cacheManager.isEmpty,
        "decontaminate must not leave cached intermediates behind")
    } finally spark.conf.unset(Dedup.StageDirConf)
  }

  test("tfidf top terms: ranks contiguous, tf dominates ordering") {
    val rows = Curation.tfidfTopTerms(spark, dir).collect()
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rk"))
      assert(sorted.map(_.getAs[Int]("rk")).toSeq == (1 to rs.length))
      // tf never increases as rank worsens
      val tfs = sorted.map(_.getAs[Long]("tf"))
      assert(tfs.zip(tfs.tail).forall { case (hi, lo) => hi >= lo })
    }
  }

  test("int8 quantization: codes bounded, reconstruction error within half a step") {
    val rows = Curation.quantizeEmbeddings(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val scale = r.getAs[Double]("scale")
      assert(scale > 0.0 && !scale.isInfinite)
      // |sum of codes| <= sum of |codes| <= dims * 127
      val qsum = r.getAs[Long]("qsum"); val qabs = r.getAs[Long]("qabs")
      assert(math.abs(qsum) <= qabs && qabs <= 64L * 127L)
      assert(qabs > 0L) // a real vector quantizes to something
    }
    // spot-check one vector end to end against a scalar reimplementation
    val direct = Relational.t(spark, dir, "embeddings").head()
    val emb = direct.getSeq[Float](direct.fieldIndex("embedding"))
    val scale = 127.0 / emb.map(x => math.abs(x.toDouble)).max
    val q = emb.map(x => math.floor(x.toDouble * scale + 0.5).toLong)
    val got = rows.find(_.getAs[Long]("vec_id") == direct.getAs[Long]("vec_id")).get
    assert(got.getAs[Long]("qsum") == q.sum)
    assert(got.getAs[Long]("qabs") == q.map(math.abs).sum)
    assert(q.forall(v => v >= -127L && v <= 127L))
  }

  test("embedding norms are positive and match a direct computation") {
    val rows = Curation.embeddingNorms(spark, dir).collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[Double]("norm") > 0.0))
    val direct = Relational.t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).head()
    val exp = math.sqrt(direct.getAs[Seq[Float]]("embedding")
      .foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble))
    val got = rows.find(_.getAs[Long]("vec_id") == direct.getAs[Long]("vec_id")).get
      .getAs[Double]("norm")
    assert(got == exp) // bit-identical left fold
  }

  test("sqrt-temperature mix: exact arithmetic, monotone, ratio-compressing") {
    val sf = "/root/testdata/sf0.001"
    val rows = Curation.mixTemperature(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // exact replication of the declared integer plan (independent of the
    // Spark expression tree): w = floor(sqrt(n)*1e6), target = B*w/Σw
    val wsum = rows.map(r => math.sqrt(r._2.toDouble).*(1e6).toLong).sum
    rows.foreach { case (_, nd, wUs, tgt) =>
      assert(wUs == (math.sqrt(nd.toDouble) * 1e6).toLong)
      assert(tgt == Curation.MixBudget * wUs / wsum)
    }
    // monotone in the count, and sqrt COMPRESSES the spread: the
    // target-share ratio of any two domains is ~sqrt of their raw ratio,
    // so it never exceeds the raw ratio (floor slack absorbed via +1)
    for (a <- rows; b <- rows if a._2 > b._2) {
      assert(a._4 >= b._4, s"$a not >= $b")
      assert(a._4.toDouble / (b._4 + 1) <= a._2.toDouble / b._2 + 1e-9,
        s"spread not compressed: $a vs $b")
    }
    // floors never exceed the budget
    assert(rows.map(_._4).sum <= Curation.MixBudget)
    assert(rows.forall(_._3 > 0))
  }

  test("FIM split: boundaries in range, segments reconstruct the text, " +
      "rerun identical") {
    val sf = "/root/testdata/sf0.001"
    val a = Curation.fimSplit(spark, sf).collect()
    val b = Curation.fimSplit(spark, sf).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.nonEmpty)
    a.foreach { r =>
      val (n, p, m) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(p >= 1 && p < m && m < n, s"bad boundaries $p $m $n")
    }
    // joining the three segments back with single spaces reproduces the
    // original text (split/slice/join round-trip, incl. empty tokens)
    val docs = Relational.t(spark, sf, "documents")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    def m5(s: String) = md.digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    a.take(50).foreach { r =>
      val toks = docs(r.getLong(0)).split(" ", -1)
      val (p, m) = (r.getLong(2).toInt, r.getLong(3).toInt)
      assert(r.getString(4) == m5(toks.slice(0, p).mkString(" ")))
      assert(r.getString(5) == m5(toks.slice(p, m).mkString(" ")))
      assert(r.getString(6) == m5(toks.slice(m, toks.length).mkString(" ")))
    }
  }

  test("deterministic shuffle: every doc placed once, shards balanced, " +
      "positions contiguous, rerun identical") {
    val sf = "/root/testdata/sf0.001"
    val a = Curation.shuffleShards(spark, sf).collect()
    val b = Curation.shuffleShards(spark, sf).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq) // pure function
    val n = Relational.t(spark, sf, "documents").count()
    assert(a.length == n)
    assert(a.map(_.getLong(0)).distinct.length == n)
    val byShard = a.groupBy(_.getInt(1))
    assert(byShard.keySet.subsetOf((0 until Curation.ShuffleShards).toSet))
    // contiguous 1..size positions inside each shard
    byShard.foreach { case (_, rows) =>
      assert(rows.map(_.getLong(2)).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // hash balance: no shard hoards the corpus (loose 3x-of-even bound)
    val maxShare = byShard.values.map(_.length).max.toDouble / n
    assert(maxShare < 3.0 / Curation.ShuffleShards)
  }

  test("diversity sample: budget filled round-robin, every live cell covered first") {
    val rows = Curation.diversitySample(spark, dir).collect()
    assert(rows.length == Curation.DiversityK)
    assert(rows.map(_.getLong(0)).distinct.length == rows.length, "no repeats")
    // deterministic rerun
    assert(Curation.diversitySample(spark, dir).collect().toSeq == rows.toSeq)
    // round-robin: before ANY cell contributes its (r+1)-th member,
    // every live cell has contributed r — so per-cell counts differ by
    // at most 1 across cells still alive at the cut
    val perCell = rows.groupBy(_.getInt(1)).view.mapValues(_.length).toMap
    val cellSizes = {
      val e = Relational.t(spark, dir, "embeddings")
      val cent = Similarity.ivfCentFor(spark, dir, e)
      Similarity.assignCells(e, cent).groupBy("cell").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
    }
    val unexhausted = perCell.filter { case (c, n) => n < cellSizes(c) }
    if (unexhausted.nonEmpty)
      assert(unexhausted.values.max - unexhausted.values.min <= 1,
        s"round-robin balance violated: $perCell vs sizes $cellSizes")
    // the first picks are each cell's most prototypical member (crank 1)
    val firstRanks = rows.sortBy(r => (r.getInt(2), r.getInt(1)))
      .take(perCell.size).map(_.getInt(2))
    assert(firstRanks.forall(_ == 1))
  }

  test("DSIR weights: target-domain docs score higher, keep is the top decile") {
    val rows = Curation.dsirWeights(spark, dir).collect()
    val docs = Relational.t(spark, dir, "documents")
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length == docs.size, "one weight per document")
    // the selector's whole point: documents FROM the target domain are
    // more likely under the target model, so the mean weight of 'en'
    // docs must exceed the mean of every other language's
    val byLang = rows.groupBy(r => docs(r.getLong(0)))
      .view.mapValues(rs => rs.map(_.getLong(2).toDouble).sum / rs.length)
      .toMap
    byLang.filterKeys(_ != "en").foreach { case (l, m) =>
      assert(byLang("en") > m, s"en mean ${byLang("en")} not above $l mean $m")
    }
    // keep = weight >= the HDR-sketch 90th-percentile boundary after
    // the min-shift — replay the bucket arithmetic exactly
    def bucketLo(v: Long): Long = {
      val bl = math.max(1, 64 - java.lang.Long.numberOfLeadingZeros(v))
      if (bl <= 5) v else (v >> (bl - 5)) << (bl - 5)
    }
    val ws = rows.map(_.getLong(2))
    val minv = ws.min
    val shifted = ws.map(_ - minv).sorted
    val rank = (9L * shifted.length + 9) / 10
    val b9 = bucketLo(shifted(rank.toInt - 1))
    rows.foreach { r =>
      assert(r.getBoolean(3) == (r.getLong(2) - minv >= b9),
        s"keep mismatch for doc ${r.getLong(0)}")
    }
    val kept = rows.filter(_.getBoolean(3))
    // top decile up to boundary granularity: at least n/10 kept, and the
    // cut is a pure value threshold (every kept weight >= every dropped)
    assert(kept.length >= docs.size / 10)
    assert(kept.map(_.getLong(2)).min >=
      rows.filterNot(_.getBoolean(3)).map(_.getLong(2)).max)
    // deterministic rerun
    assert(Curation.dsirWeights(spark, dir).collect().toSeq == rows.toSeq)
    // and the target language is actually enriched in the kept slice
    val keptEnShare = kept.count(r => docs(r.getLong(0)) == "en").toDouble /
      kept.length
    val corpusEnShare = docs.values.count(_ == "en").toDouble / docs.size
    assert(keptEnShare > corpusEnShare,
      s"kept en share $keptEnShare not above corpus share $corpusEnShare")
  }

  test("centrality equals an imperative integer PageRank on the same graph") {
    val rows = Curation.centrality(spark, dir).collect()
    val edges = Similarity.stagedKnnGraph(spark, dir)
      .select("vec_id", "nbr_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // independent reference: same integer micro-unit recurrence
    val nodes = edges.map(_._1).distinct.sorted
    val outd = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    var rank = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to Curation.CentralityIters) {
      val in = scala.collection.mutable.Map[Long, Long]()
      edges.foreach { case (src, dst) =>
        in(dst) = in.getOrElse(dst, 0L) + rank(src) / outd(src)
      }
      rank = nodes.map(v => v -> (150000L + in.getOrElse(v, 0L) * 85 / 100)).toMap
    }
    assert(rows.length == nodes.length)
    rows.foreach(r => assert(r.getLong(1) == rank(r.getLong(0)),
      s"rank drifted for node ${r.getLong(0)}"))
    // leaderboard: the top-K by (rank desc, id asc) carry positions
    // 1..K; everyone else has a null crank (no global rank window)
    val order = rows.sortBy(r => (-r.getLong(1), r.getLong(0)))
    val k = math.min(Curation.CentralityTopK, rows.length)
    order.take(k).zipWithIndex.foreach { case (r, i) =>
      assert(!r.isNullAt(2) && r.getInt(2) == i + 1,
        s"leaderboard position ${i + 1} wrong for node ${r.getLong(0)}")
    }
    order.drop(k).foreach(r =>
      assert(r.isNullAt(2), s"node ${r.getLong(0)} ranked off-leaderboard"))
    // no node falls below the damping floor; someone rises above it
    assert(rows.forall(_.getLong(1) >= 150000L))
    assert(rows.exists(_.getLong(1) > 1000000L),
      "a central node should exceed the uniform initial mass")
  }
}
