package graft.queries

import graft.multimodal.{MediaRecord, Multimodal}
import graft.util.Sessions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class ExtensionSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Sessions.local("ext-test", "4")
  val sf = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  test("minhash LSH finds every exact-jaccard pair (recall 1.0 here)") {
    val exact = Dedup.jaccardPairs(spark, sf).select("id_a", "id_b").collect().toSet
    val lsh = Dedup.minhashLsh(spark, sf).select("id_a", "id_b").collect().toSet
    assert(exact.nonEmpty)
    assert(lsh == exact)
  }

  test("dedup clusters: pairs co-clustered, canonical is the min member") {
    val pairs = Dedup.jaccardPairs(spark, sf)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byDoc = Dedup.dedupClusters(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(pairs.nonEmpty && byDoc.nonEmpty)
    // every near-dup pair ends up in one family
    pairs.foreach { case (a, b) => assert(byDoc(a)._1 == byDoc(b)._1) }
    // the canonical member is the family's min doc_id, exactly one per
    // family, and sizes are consistent
    byDoc.groupBy(_._2._1).foreach { case (cid, members) =>
      assert(members.keys.min == cid)
      assert(members.count(_._2._3) == 1 && members(cid)._3)
      assert(members.values.forall(_._2 == members.size))
    }
  }

  test("star CC equals propagation on random graphs and the real pair graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    def run(pairsDf: org.apache.spark.sql.DataFrame, star: Boolean) = {
      if (star) spark.conf.set(Dedup.StarEdgesConf, "0")
      try Dedup.connectedComponents(spark, pairsDf, "doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getBoolean(3))).toSet
      finally if (star) spark.conf.unset(Dedup.StarEdgesConf)
    }
    for (trial <- 1 to 5) {
      val n = 60 + rnd.nextInt(40)
      val pairs = Seq.fill(150)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .toDF("id_a", "id_b")
      assert(run(pairs, star = true) == run(pairs, star = false),
        s"trial $trial diverged")
    }
    val real = Dedup.jaccardPairs(spark, sf).select("id_a", "id_b")
    assert(run(real, star = true) == run(real, star = false))
  }

  test("star CC collapses a high-diameter chain in logarithmic rounds") {
    import spark.implicits._
    // a 3000-hop path: propagation pays one round per hop (3000 rounds);
    // the star alternation collapses it within starLabels' 64-round
    // bound, which this test exercises as the O(log n) guarantee
    val chain = (0L until 3000L).map(i => (i + 7L, i + 8L))
      .toDF("id_a", "id_b")
    spark.conf.set(Dedup.StarEdgesConf, "0")
    try {
      val out = Dedup.connectedComponents(spark, chain, "doc_id").collect()
      assert(out.length == 3001)
      assert(out.forall(_.getLong(1) == 7L), "cluster id must be the min node")
      assert(out.count(_.getBoolean(3)) == 1)
      assert(out.forall(_.getLong(2) == 3001L))
    } finally spark.conf.unset(Dedup.StarEdgesConf)
  }

  test("semantic candidate pairs equal the all-pairs baseline (recall 1.0 here)") {
    // the IVF multi-assign candidate path must find EVERY pair the
    // all-pairs scan finds on this corpus — the driver's hash gate
    // compares semanticClusters against a DuckDB all-pairs oracle, so
    // recall < 1 here means a red round, not a soft metric
    val exact = Similarity.cosinePairsExact(spark, sf)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = Similarity.semanticPairs(spark, sf)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    assert(cand == exact,
      s"candidate path diverged: missing=${exact -- cand} extra=${cand -- exact}")
  }

  test("semantic clusters: cosine pairs co-clustered, canonical is min member") {
    val pairs = Similarity.cosinePairsExact(spark, sf)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byVec = Similarity.semanticClusters(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(pairs.nonEmpty && byVec.nonEmpty)
    pairs.foreach { case (a, b) => assert(byVec(a)._1 == byVec(b)._1) }
    byVec.groupBy(_._2._1).foreach { case (cid, members) =>
      assert(members.keys.min == cid)
      assert(members.count(_._2._3) == 1 && members(cid)._3)
      assert(members.values.forall(_._2 == members.size))
    }
  }

  test("incremental dedup equals the cross-split slice of the exact pairs") {
    val maxId = graft.queries.Relational.t(spark, sf, "documents")
      .agg(max(col("doc_id"))).head().getLong(0)
    val split = (maxId + 1L) * 8L / 10L
    val exact = Dedup.jaccardPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => a < split && b >= split }.toSet
    val inc = Dedup.incrementalDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inc == exact, s"banded incremental dedup diverged: " +
      s"missing=${exact -- inc} extra=${inc -- exact}")
    // and it NEVER emits corpus-corpus or increment-increment pairs
    inc.foreach { case (a, b) => assert(a < split && b >= split) }
  }

  test("band index append: batch 2 reads the absorbed index, equals from-scratch") {
    val maxId = graft.queries.Relational.t(spark, sf, "documents")
      .agg(max(col("doc_id"))).head().getLong(0)
    val s1 = (maxId + 1L) * 7L / 10L
    val s2 = (maxId + 1L) * 8L / 10L
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val fresh2 = pairs(Dedup.incrementalDedupAt(spark, sf, s2)) // unstaged
    val stage = java.nio.file.Files.createTempDirectory("bandappend").toString
    spark.conf.set(Dedup.StageDirConf, stage)
    try {
      Dedup.incrementalDedupAt(spark, sf, s1).collect() // stages the s1 index
      assert(new java.io.File(
        s"$stage/${Dedup.bandIndexName(spark, sf, s1)}/_SUCCESS").exists())
      // ttl 0: the old split's index is superseded and swept immediately
      Dedup.absorbIncrement(spark, sf, s1, s2, sweepTtlMs = 0L)
      val idxPath = s"$stage/${Dedup.bandIndexName(spark, sf, s2)}"
      assert(new java.io.File(s"$idxPath/_SUCCESS").exists(),
        "appended index published")
      assert(!new java.io.File(s"$stage/${Dedup.bandIndexName(spark, sf, s1)}").exists(),
        "superseded index must be swept")
      // batch 2 consumes the appended index and equals the from-scratch run
      assert(pairs(Dedup.incrementalDedupAt(spark, sf, s2)) == fresh2)
      // the appended index is row-identical to banding [0, s2) from scratch
      val appended = spark.read.parquet(idxPath).collect().toSet
      val scratch = Dedup.bandedDocs(Dedup.docsWithShingles(spark, sf))
        .filter(col("doc_id") < s2).collect().toSet
      assert(appended == scratch, "append drifted from a fresh corpus banding")
      // successful publishes leave no claim residue behind
      val claims = new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".claim")).map(_.getName)
      assert(claims.isEmpty, s"claim residue: ${claims.mkString(", ")}")
    } finally spark.conf.unset(Dedup.StageDirConf)
  }

  test("simhash near-dup pairs overlap heavily with jaccard pairs") {
    val jac = Dedup.jaccardPairs(spark, sf)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = Dedup.simhashPairs(spark, sf)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // near-identical docs (j≥0.95 in this corpus) should be hamming-close
    val found = jac.count(sim.contains)
    assert(found >= jac.size / 2,
      s"simhash found only $found of ${jac.size} jaccard pairs")
  }

  test("LSH ANN top-k: decent recall vs brute force, and exact sims agree") {
    val bf = Similarity.topKBruteForce(spark, sf)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.lshTopK(spark, sf).collect()
    val annSet = ann.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = bf.count(annSet.contains).toDouble / bf.size
    assert(recall >= 0.2, s"ANN recall $recall too low") // random vectors: LSH
    // buckets prune hard; recall target is modest by design at 64-dim random
    assert(ann.forall(_.getDouble(2) <= 1.0 + 1e-9))
  }

  test("IVF ANN: full probe == brute force exactly; default probe has recall") {
    val bf = Similarity.topKBruteForce(spark, sf).collect()
    // probing every cell degenerates to exhaustive search — results must
    // be IDENTICAL (same rows, same order, same sims)
    val full = Similarity.ivfTopK(spark, sf, probe = Similarity.IvfCells).collect()
    assert(full.length == bf.length)
    assert(full.zip(bf).forall { case (a, b) =>
      a.getLong(0) == b.getLong(0) && a.getLong(1) == b.getLong(1) &&
        math.abs(a.getDouble(2) - b.getDouble(2)) < 1e-12 })
    // the default probe touches probe/cells of the corpus; recall floor is
    // modest because these synthetic vectors are isotropic (no clusters)
    val bfSet = bf.map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.ivfTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = bfSet.count(ann.contains).toDouble / bfSet.size
    assert(recall >= 0.2, s"IVF recall $recall too low")
  }

  test("leak-free split: near-dup pairs never straddle train/val; covers all docs") {
    val split = Curation.leakFreeSplit(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val nDocs = graft.queries.Relational.t(spark, sf, "documents").count()
    assert(split.size == nDocs, "every doc gets a split")
    // the contamination invariant: both ends of every near-dup pair land
    // on the same side
    Dedup.jaccardPairs(spark, sf).select("id_a", "id_b").collect()
      .foreach { r =>
        assert(split(r.getLong(0))._2 == split(r.getLong(1))._2,
          s"pair (${r.getLong(0)}, ${r.getLong(1)}) straddles the split")
      }
    // and the scramble actually produces both sides at a sane ratio
    val frac = split.values.count(_._2 == "val").toDouble / split.size
    assert(frac > 0.02 && frac < 0.3, s"val fraction $frac out of range")
  }

  test("quantized ANN: int8 shortlist + float re-score recovers the exact top-k") {
    val bf = Similarity.topKBruteForce(spark, sf).collect()
    val bfSet = bf.map(r => (r.getLong(0), r.getLong(1))).toSet
    val qt = Similarity.quantizedTopK(spark, sf).collect()
    val qSet = qt.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = bfSet.count(qSet.contains).toDouble / bfSet.size
    assert(recall >= 0.9, s"quantized recall $recall too low")
    // the re-score is the EXACT cosine: rows shared with brute force
    // must carry bit-identical sims
    val bfSims = bf.map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    qt.foreach { r =>
      bfSims.get((r.getLong(0), r.getLong(1))).foreach { s0 =>
        assert(r.getDouble(2) == s0,
          s"re-scored sim drifted for (${r.getLong(0)}, ${r.getLong(1)})")
      }
    }
  }

  test("IVF incremental add: appended vectors are probed; index grows in place") {
    val stage = java.nio.file.Files.createTempDirectory("ivfadd").toString
    spark.conf.set(Dedup.StageDirConf, stage)
    try {
      Similarity.ivfTopK(spark, sf).collect() // builds the staged index
      val tag = Dedup.stageTag(spark, sf)
      val corpusPath = s"$stage/ivf_corpus_$tag"
      val before = spark.read.parquet(corpusPath).count()
      val e = spark.read.parquet(s"$sf/embeddings.parquet")
      val maxId = e.agg(max(col("vec_id"))).head().getLong(0)
      // clones of the query vectors under fresh ids: their nearest
      // neighbor is their original at sim ~ 1.0, and they assign to the
      // query's own rank-1-probed cell — a sharp expectation
      val clones = e.filter(col("vec_id") < 3)
        .select((col("vec_id") + maxId + 1L).as("vec_id"), col("embedding"),
          col("label"))
      Similarity.ivfAdd(spark, sf, clones)
      val corpusAfter = spark.read.parquet(corpusPath)
      assert(corpusAfter.count() == before + 3, "index must grow in place")
      assert(new java.io.File(s"$corpusPath/_SUCCESS").exists())
      val after = Similarity.ivfTopK(spark, sf).collect()
      (0L until 3L).foreach { q =>
        val r1 = after.find(r => r.getLong(0) == q && r.getInt(3) == 1).get
        assert(r1.getLong(1) == q + maxId + 1L, s"clone of query $q not rank 1")
        assert(math.abs(r1.getDouble(2) - 1.0) < 1e-9)
      }
      // and the post-add result equals an in-plan probe over the union
      // with the SAME (untouched) centroids — append ≡ assign-and-union
      val cent = spark.read.parquet(s"$stage/ivf_cent_$tag")
      val union = e.union(clones)
      val expected = Similarity.ivfProbeTopK(cent,
        union.join(Similarity.assignCells(union, cent), "vec_id"),
        Similarity.IvfProbe).collect()
      assert(after.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).toSeq ==
        expected.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getInt(3))).toSeq)
    } finally spark.conf.unset(Dedup.StageDirConf)
  }

  test("IVF add maintains the IVFPQ codes layout: added vectors are ADC-visible") {
    val stage = java.nio.file.Files.createTempDirectory("ivfpqadd").toString
    spark.conf.set(Dedup.StageDirConf, stage)
    try {
      Similarity.ivfTopK(spark, sf).collect()   // stages cent + corpus
      Similarity.ivfPqTopK(spark, sf).collect() // stages codebooks + codes
      val e = spark.read.parquet(s"$sf/embeddings.parquet")
      val maxId = e.agg(max(col("vec_id"))).head().getLong(0)
      val clones = e.filter(col("vec_id") < 3)
        .select((col("vec_id") + maxId + 1L).as("vec_id"), col("embedding"),
          col("label"))
      Similarity.ivfAdd(spark, sf, clones)
      val codesDir = new java.io.File(stage).listFiles()
        .find(_.getName.startsWith("ivfpq_codes_")).get
      val codes = spark.read.parquet(codesDir.getPath)
      assert(codes.count() == e.count() + 3, "codes layout must grow with the add")
      // the added clones surface through the CODES path at rank 1: the
      // ADC scan reads the appended cell files, never the float corpus
      val after = Similarity.ivfPqTopK(spark, sf).collect()
      (0L until 3L).foreach { q =>
        val r1 = after.find(r => r.getLong(0) == q && r.getInt(3) == 1).get
        assert(r1.getLong(1) == q + maxId + 1L,
          s"clone of query $q not ADC-visible at rank 1")
        assert(math.abs(r1.getDouble(2) - 1.0) < 1e-9)
      }
    } finally spark.conf.unset(Dedup.StageDirConf)
  }

  test("IVFPQ codes built AFTER an add still encode the added vectors") {
    // the add-before-first-build order: ivfAdd appends to the staged
    // corpus while no codes artifact exists yet; the codes layout must
    // be built FROM that corpus (base ∪ adds), not the base table, or
    // the added vectors never enter ADC candidacy
    val stage = java.nio.file.Files.createTempDirectory("ivfpqlate").toString
    spark.conf.set(Dedup.StageDirConf, stage)
    try {
      Similarity.ivfTopK(spark, sf).collect() // stages cent + corpus only
      val e = spark.read.parquet(s"$sf/embeddings.parquet")
      val maxId = e.agg(max(col("vec_id"))).head().getLong(0)
      val clones = e.filter(col("vec_id") < 3)
        .select((col("vec_id") + maxId + 1L).as("vec_id"), col("embedding"),
          col("label"))
      Similarity.ivfAdd(spark, sf, clones)
      assert(!new java.io.File(stage).listFiles()
        .exists(_.getName.startsWith("ivfpq_codes_")),
        "precondition: no codes artifact before the first ivfPqTopK")
      val after = Similarity.ivfPqTopK(spark, sf).collect() // first build
      val codesDir = new java.io.File(stage).listFiles()
        .find(_.getName.startsWith("ivfpq_codes_")).get
      assert(spark.read.parquet(codesDir.getPath).count() == e.count() + 3,
        "codes artifact must encode the indexed corpus incl. prior adds")
      (0L until 3L).foreach { q =>
        val r1 = after.find(r => r.getLong(0) == q && r.getInt(3) == 1).get
        assert(r1.getLong(1) == q + maxId + 1L,
          s"pre-build-added clone of query $q not ADC-visible at rank 1")
        assert(math.abs(r1.getDouble(2) - 1.0) < 1e-9)
      }
    } finally spark.conf.unset(Dedup.StageDirConf)
  }

  test("hybrid RRF equals an independent two-leg fusion reference") {
    val rows = Similarity.hybridTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1 else r.getInt(3),
        if (r.isNullAt(4)) -1 else r.getInt(4), r.getInt(5)))
    // reference: tokenize + cosine re-done imperatively, same tie rules
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val docs = Relational.t(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
      .filter { case (id, _) => emb.contains(id) }
    def toks(t: String) = t.split(" ").filter(_.nonEmpty).toSet
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = (0L until 3L).flatMap { qid =>
      val qt = toks(docs(qid))
      val lex = docs.toSeq.filter(_._1 != qid)
        .map { case (id, t) => (id, (toks(t) & qt).size) }
        .filter(_._2 > 0)
        .sortBy { case (id, sh) => (-sh, id) }.take(20).zipWithIndex
        .map { case ((id, _), i) => id -> (i + 1) }.toMap
      val vec = emb.toSeq.filter(_._1 != qid)
        .map { case (id, v) => (id, cos(v, emb(qid))) }
        .sortBy { case (id, s) => (-s, id) }.take(20).zipWithIndex
        .map { case ((id, _), i) => id -> (i + 1) }.toMap
      (lex.keySet ++ vec.keySet).toSeq
        .map { id =>
          val rrf = lex.get(id).map(r => 1000000L / (60 + r)).getOrElse(0L) +
            vec.get(id).map(r => 1000000L / (60 + r)).getOrElse(0L)
          (qid, id, rrf, lex.getOrElse(id, -1), vec.getOrElse(id, -1))
        }
        .sortBy { case (_, id, rrf, _, _) => (-rrf, id) }.take(10).zipWithIndex
        .map { case ((q, id, rrf, lr, vr), i) => (q, id, rrf, lr, vr, i + 1) }
    }
    assert(rows.toSeq == expected,
      s"fusion drifted: got=${rows.take(5).toSeq} want=${expected.take(5)}")
    // and both legs actually contribute somewhere in the fused top-10
    assert(rows.exists(_._4 == -1) || rows.exists(_._5 == -1) ||
      rows.forall(r => r._4 > 0 && r._5 > 0))
    assert(rows.exists(_._4 > 0) && rows.exists(_._5 > 0))
  }

  test("MMR rerank equals a greedy reference and actually diversifies") {
    val rows = Similarity.mmrRerank(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getInt(4)))
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = (0L until 3L).flatMap { qid =>
      val cand = emb.toSeq.filter(_._1 != qid)
        .map { case (id, v) => (id, cos(v, emb(qid))) }
        .sortBy { case (id, s) => (-s, id) }.take(20)
      val sel = scala.collection.mutable.ArrayBuffer[(Long, Double, Double)]()
      sel += ((cand.head._1, cand.head._2, cand.head._2))
      while (sel.length < 10) {
        val pick = cand.filter(c => !sel.exists(_._1 == c._1))
          .map { case (id, rel) =>
            val msim = sel.map(s => cos(emb(id), emb(s._1))).max
            (id, rel, rel * 0.5 - msim * 0.5)
          }
          .minBy { case (id, _, mmr) => (-mmr, id) }
        sel += pick
      }
      sel.zipWithIndex.map { case ((id, rel, mmr), i) =>
        (qid, id, rel, mmr, i + 1) }
    }
    assert(rows.toSeq == expected,
      s"greedy trajectory drifted: got=${rows.take(4).toSeq} want=${expected.take(4)}")
    // the rerank's purpose: the selected set is more spread out than
    // the pure-relevance top-10 (lower mean pairwise similarity)
    def meanPairSim(ids: Seq[Long]): Double = {
      val ps = for (a <- ids; b <- ids if a < b) yield cos(emb(a), emb(b))
      ps.sum / ps.size
    }
    (0L until 3L).foreach { qid =>
      val mmrIds = rows.filter(_._1 == qid).map(_._2).toSeq
      val relIds = emb.toSeq.filter(_._1 != qid)
        .map { case (id, v) => (id, cos(v, emb(qid))) }
        .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1)
      assert(meanPairSim(mmrIds) < meanPairSim(relIds),
        s"query $qid: MMR set not more diverse than relevance top-10")
    }
  }

  test("funnel and retention equal imperative references on raw events") {
    val ev = Relational.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), to_date(col("ts")).as("d"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDate(3).toLocalDate))
    // funnel reference: earliest view, first click after, first purchase after
    def firstAfter(u: Long, tpe: String, after: Long): Option[Long] = {
      val ts = ev.filter(e => e._1 == u && e._2 == tpe && e._3 > after)
      if (ts.isEmpty) None else Some(ts.map(_._3).min)
    }
    val users = ev.map(_._1).distinct
    val vUsers = users.flatMap { u =>
      val vs = ev.filter(e => e._1 == u && e._2 == "view")
      if (vs.isEmpty) None else Some(u -> vs.map(_._3).min)
    }.toMap
    val cUsers = vUsers.flatMap { case (u, v) =>
      firstAfter(u, "click", v).map(u -> _) }
    val pUsers = cUsers.flatMap { case (u, c) =>
      firstAfter(u, "purchase", c).map(u -> _) }
    val fun = Relational.q31Funnel(spark, sf).collect()
      .map(r => r.getInt(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(fun(1)._2 == vUsers.size && fun(2)._2 == cUsers.size &&
      fun(3)._2 == pUsers.size)
    assert(fun(1)._3 == 10000L)
    assert(fun(2)._3 == cUsers.size.toLong * 10000 / vUsers.size)
    assert(fun(1)._2 >= fun(2)._2 && fun(2)._2 >= fun(3)._2)
    assert(fun(3)._2 > 0, "fixture should carry completed funnels")
    // retention reference: first-seen cohort, distinct users per offset
    val cohort = ev.groupBy(_._1).view
      .mapValues(_.map(_._4).min).toMap
    val refCells = ev.map(e => ((cohort(e._1), java.time.temporal.ChronoUnit
        .DAYS.between(cohort(e._1), e._4).toInt), e._1))
      .distinct.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val ret = Relational.q32Retention(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd")
    assert(ret == refCells.map { case ((cd, off), n) =>
      (cd.format(fmt), off) -> n })
    // day-0 cell of each cohort is exactly the cohort's size
    cohort.groupBy(_._2).foreach { case (cd, members) =>
      assert(ret((cd.format(fmt), 0)) == members.size.toLong)
    }
  }

  test("KS drift equals an integer reference over the doc-id halves") {
    val rows = Profile.ksDrift(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getLong(5), r.getLong(6)))
    val d = Relational.t(spark, sf, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val split = (d.map(_._1).max + 1) / 2
    val xs = d.map(_._2).distinct.sorted
    val n1 = d.count(_._1 < split).toLong
    val n2 = d.count(_._1 >= split).toLong
    val scored = xs.map { x =>
      val f1 = d.count(e => e._1 < split && e._2 <= x).toLong
      val f2 = d.count(e => e._1 >= split && e._2 <= x).toLong
      (x, f1, f2, math.abs(n2 * f1 - n1 * f2))
    }
    val want = scored.sortBy { case (x, _, _, dn) => (-dn, x) }.take(10)
      .zipWithIndex
      .map { case ((x, f1, f2, dn), i) => (x, f1, f2, dn, i + 1, n1, n2) }
    assert(rows.toSeq == want.toSeq,
      s"KS drift drifted: got=${rows.take(3).toSeq} want=${want.take(3)}")
    // both empirical CDFs are complete at the top value
    assert(scored.last._2 == n1 && scored.last._3 == n2)
  }

  test("triangle stats equal a brute-force reference on the kNN graph") {
    val rows = Similarity.triangleStats(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    val und = Similarity.stagedKnnGraph(spark, sf)
      .select("vec_id", "nbr_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val adj = und.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val triPerNode = scala.collection.mutable.Map[Long, Long]()
    var total = 0L
    und.foreach { case (a, b) =>
      (adj(a) & adj(b)).filter(c => c > b).foreach { c =>
        total += 1
        Seq(a, b, c).foreach(v =>
          triPerNode(v) = triPerNode.getOrElse(v, 0L) + 1)
      }
    }
    assert(rows.map(_._3).sum == 3 * total, "corner sum = 3x triangles")
    rows.foreach { case (v, deg, tri, bp) =>
      assert(deg == adj(v).size.toLong, s"degree of $v")
      assert(tri == triPerNode.getOrElse(v, 0L), s"triangles of $v")
      val expBp = if (deg < 2) -1L else tri * 2 * 10000 / (deg * (deg - 1))
      assert(bp == expBp, s"coefficient of $v")
    }
    assert(total > 0, "a kNN graph over clustered data must close triangles")
  }

  test("multimodal: batched stub decode through typed Dataset plumbing") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(100)
    val media = docs.select(col("doc_id"), col("text"), col("source")).as[(Long, String, String)]
      .map { case (id, text, source) =>
        MediaRecord(id, "image", text.getBytes("UTF-8"),
          Map("source" -> source, "codec" -> "stub"))
      }
    val feats = Multimodal.extractFeatures(media, batchSize = 16)
    val rows = feats.collect()
    assert(rows.length == 100)
    assert(rows.forall(_.features.length == Multimodal.FeatureDim))
    assert(rows.forall(f => f.features.forall(v => v >= -1.0f && v <= 1.0f)))
    // deterministic: same payload → same signature/features
    val again = Multimodal.extractFeatures(media, batchSize = 7).collect()
    assert(rows.sortBy(_.media_id).map(_.content_sig).toSeq ==
      again.sortBy(_.media_id).map(_.content_sig).toSeq)
    // features feed similarity search (downstream composition)
    val fdf = feats.toDF()
    val sims = fdf.alias("a").crossJoin(fdf.alias("b"))
      .filter(col("a.media_id") < col("b.media_id"))
      .select(Similarity.cosine(col("a.features"), col("b.features")).as("sim"))
    assert(sims.agg(max("sim")).head().getDouble(0) <= 1.0 + 1e-9)
  }

  test("dup spans agree with a brute-force string-level reference") {
    val rows = TextAnalysis.dupSpans(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(rows.nonEmpty)
    // driver-side reference over the raw STRINGS (no hashing): per doc
    // the distinct 10-token windows, dup = window present in another doc
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
      .filter(_._2.length >= 10)
    val winsByDoc = texts.map { case (id, toks) =>
      id -> toks.sliding(10).map(_.mkString(" ")).toSet
    }.toMap
    val docCount = winsByDoc.values.flatten.toSeq
      .groupBy(identity).map { case (w, xs) => w -> xs.size }
    assert(rows.keySet == winsByDoc.keySet)
    winsByDoc.foreach { case (id, wins) =>
      val dup = wins.count(w => docCount(w) >= 2)
      val (n, d, f) = rows(id)
      assert(n == wins.size, s"doc $id n_spans $n != ${wins.size}")
      assert(d == dup, s"doc $id dup_spans $d != $dup")
      assert(math.abs(f - dup.toDouble / wins.size) < 1e-12)
    }
    assert(winsByDoc.exists { case (id, wins) =>
      wins.exists(w => docCount(w) >= 2) }, "no dup-span signal at this sf")
  }

  test("incremental dup spans: staged span index equals the fresh path") {
    val fresh = TextAnalysis.dupSpansIncremental(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(fresh.nonEmpty)
    // consistency with the full query: an increment doc's dup count vs
    // the corpus can only be ≤ its all-corpus dup count
    val full = TextAnalysis.dupSpans(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    fresh.foreach { case (id, _, dup) => assert(dup <= full(id)) }
    val stage = java.nio.file.Files.createTempDirectory("spanidx").toString
    spark.conf.set(Dedup.StageDirConf, stage)
    try {
      val staged1 = TextAnalysis.dupSpansIncremental(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(staged1 == fresh) // first call stages the corpus index
      assert(new java.io.File(stage).listFiles()
        .exists(_.getName.startsWith("spanidx_")))
      val staged2 = TextAnalysis.dupSpansIncremental(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(staged2 == fresh) // second call reads the staged index back
    } finally spark.conf.unset(Dedup.StageDirConf)
  }

  test("df-capped jaccard scores exactly over capped sets; cap=max is exact") {
    // brute-force reference over the capped shingle sets
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .map { case (id, t) =>
        // split(-1) keeps trailing empty tokens, matching Spark/DuckDB
        val w = t.split(" ", -1)
        id -> (if (w.length >= 3) w.sliding(3).map(_.mkString(" ")).toSet
               else Set.empty[String])
      }.filter(_._2.nonEmpty)
    val dfreq = docs.flatMap(_._2).groupBy(identity).map {
      case (k, v) => k -> v.length }
    val capped = docs.map { case (id, sh) =>
      id -> sh.filter(dfreq(_) <= 3) }.filter(_._2.nonEmpty).toMap
    // iterate the map as a Seq — a for over a Map would yield a Map and
    // collapse pairs sharing the same left id
    val expect = (for {
      (a, sa) <- capped.toSeq; (b, sb) <- capped.toSeq if a < b
      inter = (sa & sb).size
      j = inter.toDouble / (sa.size + sb.size - inter) if j >= 0.8
    } yield (a, b)).toSet
    val got = Dedup.jaccardPairsDfCap(spark, sf)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expect, s"missing=${expect -- got} extra=${got -- expect}")
    assert(got.nonEmpty)
    // a cap above the max df disables the knob: identical to exact
    val exact = Dedup.jaccardPairs(spark, sf)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = Dedup.jaccardPairsDfCap(spark, sf, cap = 1000000L)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped == exact)
  }

  test("span-index append: absorbed index equals from-scratch at the new split") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    val (s1, s2) = ((maxId + 1L) * 6L / 10L, (maxId + 1L) * 8L / 10L)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // ground truth at split2, computed with no staging at all
    val fresh = rows(TextAnalysis.dupSpansIncrementalAt(spark, sf, s2))
    val stage = java.nio.file.Files.createTempDirectory("spanabsorb").toString
    spark.conf.set(Dedup.StageDirConf, stage)
    try {
      // batch 1 stages the corpus index at split1…
      TextAnalysis.dupSpansIncrementalAt(spark, sf, s1).collect()
      assert(new java.io.File(stage).listFiles()
        .exists(_.getName.endsWith(s"_$s1")))
      // …absorb batch 1's spans: the split2 index is published by APPEND
      TextAnalysis.absorbSpanIncrement(spark, sf, s1, s2, sweepTtlMs = 0L)
      val idx2 = new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(s"_$s2"))
      assert(idx2.nonEmpty)
      // the superseded split1 index was swept (TTL 0)
      assert(!new java.io.File(stage).listFiles()
        .exists(f => f.getName.endsWith(s"_$s1") && f.isDirectory))
      // batch 2 reads the appended index and equals the from-scratch run
      val mtime = idx2.head.lastModified()
      assert(rows(TextAnalysis.dupSpansIncrementalAt(spark, sf, s2)) == fresh)
      assert(idx2.head.lastModified() == mtime) // read, not rebuilt
    } finally spark.conf.unset(Dedup.StageDirConf)
  }

  test("portable HLL estimates distinct orderkeys within the m=256 error") {
    val row = Sketches.hllDistinct(spark, sf).head()
    val est = row.getDouble(row.fieldIndex("est_distinct"))
    val truth = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(countDistinct(col("l_orderkey"))).head().getLong(0)
    // raw HLL std err at m=256 is ~6.5%; 3σ envelope
    assert(math.abs(est - truth) / truth < 0.20,
      s"HLL est $est vs true $truth")
    assert(row.getLong(row.fieldIndex("zero_buckets")) == 0) // n >> 2.5m
  }

  test("HLL sketches merge: union of half-sketches equals the whole") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val whole = Sketches.hllEstimate(spark,
      Sketches.hllBuckets(li, col("l_orderkey"))).head()
    val merged = Sketches.hllEstimate(spark,
      Sketches.hllBuckets(li.filter(col("l_orderkey") % 2 === 0), col("l_orderkey")),
      Sketches.hllBuckets(li.filter(col("l_orderkey") % 2 =!= 0), col("l_orderkey")))
      .head()
    assert(whole == merged) // bit-identical, estimate included
  }

  test("HLL accuracy holds on a controlled cardinality (grouped regime)") {
    // synthetic frame with KNOWN distinct count well above 2.5m
    val n = 20000L
    val df = spark.range(n).select(col("id"))
    val est = Sketches.hllEstimate(spark, Sketches.hllBuckets(df, col("id")))
      .head().getDouble(3)
    assert(math.abs(est - n) / n < 0.20, s"est $est vs $n")
  }

  test("HLL overlap: exact identity on the query, accuracy on a controlled set") {
    // query invariants (sf0.001 cardinalities sit below the raw-HLL
    // regime, so accuracy is pinned on the controlled set below)
    val row = Sketches.hllOverlap(spark, sf).head()
    val (ea, eb, eu, ei) = (row.getDouble(0), row.getDouble(1),
      row.getDouble(2), row.getDouble(3))
    assert(ei == ea + eb - eu) // inclusion–exclusion, exact arithmetic
    assert(eu <= ea + eb && eu >= math.max(ea, eb) - 1e-9)
    // controlled overlap: |A|=|B|=20000, |A∩B|=10000 — well inside the
    // estimator regime; three compounded estimators, loose 35% pin
    val a = spark.range(0, 20000).select(col("id"))
    val b = spark.range(10000, 30000).select(col("id"))
    val sa = Sketches.hllBuckets(a, col("id"))
    val sb = Sketches.hllBuckets(b, col("id"))
    val estA = Sketches.hllEstimate(spark, sa).head().getDouble(3)
    val estB = Sketches.hllEstimate(spark, sb).head().getDouble(3)
    val estU = Sketches.hllEstimate(spark, sa, sb).head().getDouble(3)
    val est = estA + estB - estU
    assert(math.abs(est - 10000) / 10000 < 0.35, s"est $est vs 10000")
  }

  test("HDR quantile sketch: ≤1/16 relative error and mergeable state") {
    val row = Sketches.hdrOrderQuantiles(spark, sf).head()
    val n = row.getLong(row.fieldIndex("n_rows"))
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    assert(n == orders.count())
    // exact quantiles (ceil-rank definition, matching the sketch)
    val cents = orders
      .select(round(col("o_totalprice") * 100).cast("long").as("v"))
      .orderBy("v").collect().map(_.getLong(0))
    def exact(qn: Long, qd: Long): Long =
      cents(((n * qn + qd - 1) / qd - 1).toInt)
    Seq(("p50_cents", 1L, 2L), ("p90_cents", 9L, 10L),
        ("p99_cents", 99L, 100L)).foreach { case (c, qn, qd) =>
      val est = row.getLong(row.fieldIndex(c))
      val ex = exact(qn, qd)
      // est is the bucket LOWER bound containing the exact value:
      // est <= exact < est * (1 + 1/16)
      assert(est <= ex && ex < est + (est >> 4) + 1,
        s"$c: est $est vs exact $ex")
    }
    // mergeability: per-half histograms re-summed == whole-input sketch
    val centsCol = round(col("o_totalprice") * 100).cast("long")
    val whole = Sketches.hdrQuantiles(
      Sketches.hdrHistogram(orders, centsCol)).head()
    val merged = Sketches.hdrQuantiles(
      Sketches.hdrHistogram(orders.filter(col("o_orderkey") % 2 === 0), centsCol),
      Sketches.hdrHistogram(orders.filter(col("o_orderkey") % 2 =!= 0), centsCol))
      .head()
    assert(whole == merged)
  }

  test("grouped HDR quantiles: per-group error bound, counts partition") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val rows = Sketches.hdrGroupQuantiles(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum == orders.count())
    val byGrp = orders
      .select(col("o_orderpriority"),
        round(col("o_totalprice") * 100).cast("long").as("v"))
      .collect().groupBy(_.getString(0))
      .map { case (g, rs) => g -> rs.map(_.getLong(1)).sorted }
    rows.foreach { r =>
      val (g, n) = (r.getString(0), r.getLong(1))
      val cents = byGrp(g)
      assert(n == cents.length)
      Seq(("p50_cents", 1L, 2L), ("p90_cents", 9L, 10L),
          ("p99_cents", 99L, 100L)).foreach { case (c, qn, qd) =>
        val est = r.getLong(r.fieldIndex(c))
        val ex = cents(((n * qn + qd - 1) / qd - 1).toInt)
        assert(est <= ex && ex < est + (est >> 4) + 1,
          s"$g/$c: est $est vs exact $ex")
      }
    }
  }

  test("normalize: idempotent, variant-tolerant, catches case variants") {
    import spark.implicits._
    val out = TextAnalysis.normalize(spark, sf).collect()
    assert(out.length ==
      spark.read.parquet(s"$sf/documents.parquet").count())
    // normalization is idempotent: hashing a normalized corpus again
    // yields the same signatures (norm of norm == norm)
    val docs = Seq(
      (1L, "Hello, World!  foo"), (2L, "hello world foo"),
      (3L, "HELLO   world; FOO")).toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text"))) // schema parity unused
    val dir = java.nio.file.Files.createTempDirectory("normspec").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val sigs = TextAnalysis.normalize(spark, dir)
      .select("doc_id", "sig", "changed").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    // all three are the same doc after normalization; 1 and 3 changed
    assert(sigs(1L)._1 == sigs(2L)._1 && sigs(2L)._1 == sigs(3L)._1)
    assert(sigs(1L)._2 == 1 && sigs(2L)._2 == 0 && sigs(3L)._2 == 1)
  }

  test("common ngrams: df counts docs once each, descending, plan is top-k") {
    // release=false keeps the lazy plan inspectable (the default
    // checkpoints the 20-row result when the shingle cache is live)
    val df = TextAnalysis.commonNgrams(spark, sf, release = false)
    // global top-k must plan as TakeOrderedAndProject (per-partition
    // heads), not a full global sort
    assert(df.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"))
    val rows = df.collect().map(r => r.getString(0) -> r.getLong(1))
    assert(rows.length == 20)
    assert(rows.map(_._2).sliding(2).forall(p => p(0) >= p(1)))
    // spot-check: reported df equals the number of docs containing it
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect().map(r => r.getString(1))
    rows.take(3).foreach { case (ng, cnt) =>
      val direct = docs.count(_.sliding(ng.length).contains(ng))
      // sliding-substring overcounts only if the ngram crosses word
      // boundaries oddly; exact check via tokenized windows
      val exact = docs.count { t =>
        val w = t.split(" ")
        w.length >= 3 && w.sliding(3).map(_.mkString(" ")).contains(ng)
      }
      assert(cnt == exact, s"'$ng': reported $cnt vs exact $exact ($direct)")
    }
  }

  test("corpus drift: integer cross-multiplied shift matches a direct count") {
    val rows = TextAnalysis.corpusDrift(spark, sf).collect()
    assert(rows.length == 20)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val split = (docs.map(_._1).max + 1) / 2
    def toks(half: Int) = docs
      .filter(d => (if (half == 0) d._1 < split else d._1 >= split))
      .flatMap(_._2.split(" ")).filter(_.nonEmpty)
    val (ta, tb) = (toks(0), toks(1))
    val (na, nb) = (ta.length.toLong, tb.length.toLong)
    val ca = ta.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val cb = tb.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    rows.foreach { r =>
      val (tok, a, b, x) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(a == ca.getOrElse(tok, 0L) && b == cb.getOrElse(tok, 0L))
      assert(x == math.abs(a * nb - b * na))
    }
    // ranked by shift, descending
    assert(rows.map(_.getLong(3)).sliding(2).forall(p => p(0) >= p(1)))
  }

  test("group top-k plans a WindowGroupLimit (partial per-group limit)") {
    val df = Relational.q27GroupTopK(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"plan was:\n$plan")
    // every group has exactly min(3, group size) rows, ranked 1..k
    val rows = df.collect()
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getInt(3)).sorted.toSeq == (1 to rs.length))
      assert(rs.length <= 3)
    }
    assert(rows.nonEmpty)
  }

  test("count-min never underestimates and is tight when items << width") {
    val rows = Sketches.cmHeavyHitters(spark, sf).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val exact = r.getLong(r.fieldIndex("exact_cnt"))
      val est = r.getLong(r.fieldIndex("cm_est"))
      assert(est >= exact, s"CM underestimated: $est < $exact")
      // 150 items in 4x512 cells: collisions are rare; allow a few
      assert(est <= exact * 3)
    }
    // top-10 really is the exact top-10
    val exactTop = spark.read.parquet(s"$sf/events.parquet")
      .groupBy("user_id").count()
      .orderBy(col("count").desc, col("user_id")).limit(10)
      .collect().map(_.getLong(0)).toSeq
    assert(rows.map(_.getLong(0)).toSeq == exactTop)
  }

  test("multimodal: frame sampling slices payload byte ranges per plan") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(50)
    val media = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        // pad so every "video" has at least a few frames of 32 bytes
        val payload = (text + ("x" * 256)).getBytes("UTF-8")
        MediaRecord(id, "video", payload, Map("frame_bytes" -> "32"))
      }
    val slices = Multimodal.sampleFrames(media, k = 8).collect()
    val byId = media.collect().map(r => r.media_id -> r.payload).toMap
    assert(slices.nonEmpty)
    slices.foreach { s =>
      val payload = byId(s.media_id)
      val n = math.max(1L, payload.length.toLong / 32)
      assert(s.frame_no >= 0 && s.frame_no < n)
      assert(s.byte_offset == s.frame_no * 32)
      // the slice is the actual payload bytes at the planned range
      assert(s.bytes.sameElements(payload.slice(s.byte_offset.toInt,
        s.byte_offset.toInt + 32)))
    }
    // ≤ 8 distinct frames per video, evenly spread (first frame always 0)
    val per = slices.groupBy(_.media_id)
    assert(per.values.forall(v => v.length <= 8 &&
      v.map(_.frame_no).distinct.length == v.length))
    assert(per.values.forall(_.map(_.frame_no).min == 0))
  }

  test("dedup staged-shingle path produces identical pairs to the cached path") {
    val cached = Dedup.jaccardPairs(spark, sf)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val clustersFresh = Dedup.dedupClusters(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toSet
    val ivfFresh = Similarity.ivfTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq
    val semFresh = Similarity.semanticClusters(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toSet
    val stage = java.nio.file.Files.createTempDirectory("dedupstage").toString
    spark.conf.set(Dedup.StageDirConf, stage)
    try {
      val staged = Dedup.jaccardPairs(spark, sf)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(staged == cached)
      // the stage materialized and is reused on a second run
      assert(new java.io.File(stage).listFiles().nonEmpty)
      val again = Dedup.minhashLsh(spark, sf)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(again == cached) // recall 1.0 on this corpus, staged input
      // incremental dedup with the PERSISTED corpus band index yields
      // the same pairs as the in-plan path, and the index materialized
      val incCached = Dedup.incrementalDedup(spark, sf)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(new java.io.File(stage).listFiles()
        .exists(_.getName.startsWith("bands_")), "band index staged")
      val incStaged = Dedup.incrementalDedup(spark, sf) // reads the index
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(incStaged == incCached)
      // cluster formation consumes the staged pair ARTIFACT (first call
      // writes it, second reads it) — both equal the unstaged run
      val clustersStaged = Dedup.dedupClusters(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getBoolean(3))).toSet
      assert(clustersStaged == clustersFresh)
      assert(new java.io.File(stage).listFiles()
        .exists(_.getName.startsWith("pairs_")), "pair artifact staged")
      val clustersAgain = Dedup.dedupClusters(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getBoolean(3))).toSet
      assert(clustersAgain == clustersFresh)
      // the IVF index stages (centroids + corpus partitioned BY CELL);
      // training is deterministic so results are identical, and the
      // probed read prunes cell partitions dynamically via the
      // broadcast cell join
      val ivfStaged1 = Similarity.ivfTopK(spark, sf) // writes the index
      assert(ivfStaged1.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getInt(3))).toSeq == ivfFresh)
      assert(new java.io.File(stage).listFiles()
        .exists(_.getName.startsWith("ivf_corpus_")), "IVF index staged")
      val ivfStaged2 = Similarity.ivfTopK(spark, sf) // reads the index
      assert(ivfStaged2.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getInt(3))).toSeq == ivfFresh)
      assert(ivfStaged2.queryExecution.executedPlan.toString
        .toLowerCase.contains("dynamicpruning"),
        "probing the staged index must prune cell partitions dynamically")
      // semantic clusters consume the staged semantic-pair artifact
      // (candidate centroids stage too, under the same protocol)
      val semStaged = Similarity.semanticClusters(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getBoolean(3))).toSet
      assert(semStaged == semFresh)
      val semAgain = Similarity.semanticClusters(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getBoolean(3))).toSet
      assert(semAgain == semFresh)
      assert(new java.io.File(stage).listFiles()
        .exists(_.getName.startsWith("sempairs_")), "semantic pairs staged")
      assert(new java.io.File(stage).listFiles()
        .exists(_.getName.startsWith("sem_cent_")), "semantic centroids staged")
      // every producer above published successfully → no claim residue
      val claims = new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".claim")).map(_.getName)
      assert(claims.isEmpty, s"claim residue: ${claims.mkString(", ")}")
    } finally spark.conf.unset(Dedup.StageDirConf)
  }

  test("stage tags: distinct dirs never collide; regenerated content re-keys") {
    def mkdir(): java.io.File = {
      val d = java.nio.file.Files.createTempDirectory("tagspec").toFile
      val f = new java.io.File(d, "data.parquet")
      java.nio.file.Files.writeString(f.toPath, "payload-a")
      d
    }
    val d1 = mkdir(); val d2 = mkdir()
    try {
      val t1 = Dedup.computeTag(spark, d1.getPath)
      val t2 = Dedup.computeTag(spark, d2.getPath)
      assert(t1 != t2, "distinct dirs must never share a stage key")
      // regenerate the fixture in place: same path, new content/mtime
      val f = new java.io.File(d1, "data.parquet")
      java.nio.file.Files.writeString(f.toPath, "payload-b-regenerated")
      assert(f.setLastModified(f.lastModified() + 5000))
      val t1b = Dedup.computeTag(spark, d1.getPath)
      assert(t1b != t1, "a regenerated fixture must be a clean stage miss")
      // and the tag is stable when nothing changed
      assert(Dedup.computeTag(spark, d2.getPath) == t2)
      // NESTED regeneration: rewriting a file inside a subdirectory
      // without touching any top-level entry's name/len/mtime must
      // still re-key (the one-level-deep part of the fingerprint)
      val sub = new java.io.File(d2, "table")
      assert(sub.mkdir())
      val nf = new java.io.File(sub, "part-0.parquet")
      java.nio.file.Files.writeString(nf.toPath, "nested-a")
      val dirMtime = sub.lastModified()
      val t2b = Dedup.computeTag(spark, d2.getPath)
      java.nio.file.Files.writeString(nf.toPath, "nested-b-regenerated!")
      assert(nf.setLastModified(nf.lastModified() + 5000))
      assert(sub.setLastModified(dirMtime)) // pin the top-level entry
      val t2c = Dedup.computeTag(spark, d2.getPath)
      assert(t2c != t2b,
        "in-place nested content regeneration must be a stage miss")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(d1)
      org.apache.commons.io.FileUtils.deleteDirectory(d2)
    }
  }

  test("stagedOrFresh: racing producers never mix output; losers stay correct") {
    val stage = java.nio.file.Files.createTempDirectory("racestage").toString
    val sub = s"$stage/artifact"
    import spark.implicits._
    val expected = (1 to 100).map(i => (i.toLong, i * 2L)).toSet
    def df = expected.toSeq.toDF("k", "v")
    val results =
      new java.util.concurrent.ConcurrentLinkedQueue[Set[(Long, Long)]]()
    val threads = (1 to 4).map { _ =>
      new Thread(() => {
        val r = Dedup.stagedOrFresh(spark, sub,
          out => { Thread.sleep(200); df.write.mode("overwrite").parquet(out) },
          () => df)
        results.add(r.collect().map(x => (x.getLong(0), x.getLong(1))).toSet)
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    // every caller — the claim winner, stage readers, AND fresh-path
    // losers — sees the full correct result
    assert(results.size == 4)
    results.forEach(rs => assert(rs == expected))
    // exactly one producer published; the artifact is complete and clean
    assert(new java.io.File(s"$sub/_SUCCESS").exists())
    assert(spark.read.parquet(sub).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet == expected)
    assert(!new java.io.File(s"$sub.claim").exists(),
      "no claim residue after the write finishes")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(stage))
  }
  test("label audit flags a planted mislabel, clears consistent labels") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    // two tight geometric groups; vec 3 sits in group A but carries
    // group B's label — the planted mislabel the audit must flag
    def va(eps: Float) = Array(1f, eps, 0f, 0f)
    def vb(eps: Float) = Array(eps, 1f, 0f, 0f)
    val e = Seq(
      (0L, va(0.01f), 0), (1L, va(0.02f), 0), (2L, va(0.03f), 0),
      (3L, va(0.04f), 1), // mislabeled
      (4L, vb(0.01f), 1), (5L, vb(0.02f), 1), (6L, vb(0.03f), 1),
      (7L, vb(0.04f), 1)
    ).toDF("vec_id", "embedding", "label")
    // brute-force 3-NN graph (the graph path has its own specs)
    val pairs = e.select(col("vec_id"), col("embedding"))
      .crossJoin(e.select(col("vec_id").as("nbr_id"),
        col("embedding").as("nv")))
      .filter(col("vec_id") =!= col("nbr_id"))
      .select(col("vec_id"), col("nbr_id"),
        Similarity.cosine(col("embedding"), col("nv")).as("sim"))
    val w = Window.partitionBy("vec_id").orderBy(col("sim").desc, col("nbr_id").asc)
    val g = pairs.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
    val audit = Similarity.labelAuditFromGraph(g,
      e.select(col("vec_id"), col("label"))).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getBoolean(4))).toMap
    // the planted mislabel: all 3 neighbors are true group A -> 0 agree
    assert(audit(3L) == (0L, true))
    // group A members see the mislabeled vector but keep majority
    assert(audit(0L)._1 == 2L && !audit(0L)._2)
    // pure group B: full agreement
    Seq(4L, 5L, 6L, 7L).foreach(id => assert(audit(id) == (3L, false)))
  }
  test("embedding outliers: per-cell bottom-5% flag, worst fit ranked first") {
    val rows = Similarity.embeddingOutliers(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getInt(3),
        r.getLong(4), r.getBoolean(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (_, cell) =>
      val n = cell.length
      // n_cell is the real group size; flags are exactly the bottom 5%
      assert(cell.forall(_._5 == n))
      assert(cell.count(_._6) == n / 20)
      // ranks are a permutation of 1..n and ascend with csim
      val byRank = cell.sortBy(_._4)
      assert(byRank.map(_._4).toSeq == (1 to n))
      assert(byRank.map(_._3).toSeq == byRank.map(_._3).sorted.toSeq)
      // the flagged set is a prefix of the rank order (worst fits)
      assert(byRank.takeWhile(_._6).length == n / 20)
      assert(byRank.drop(n / 20).forall(!_._6))
    }
  }
  test("text chunks tile each document: coverage, overlap, stable hashes") {
    val docs = Relational.t(spark, sf, "documents")
      .selectExpr("doc_id", "split(text, ' ') AS toks").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val chunks = TextAnalysis.chunks(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getString(5)))
    assert(chunks.nonEmpty)
    chunks.groupBy(_._1).foreach { case (docId, cs) =>
      val n = docs(docId).length
      val sorted = cs.sortBy(_._2)
      // ids are 0..k; geometry: starts step by the stride, first chunk
      // begins the doc, last chunk ends it, windows cap at 64 tokens
      assert(sorted.map(_._2).toSeq == sorted.indices.toSeq)
      assert(sorted.head._3 == 0 && sorted.last._4 == n)
      sorted.foreach { c =>
        assert(c._3 == c._2 * 48 && c._4 <= c._3 + 64 && c._5 == c._4 - c._3)
      }
      // every token position is covered (overlap makes gaps impossible)
      val covered = sorted.flatMap(c => c._3 until c._4).toSet
      assert(covered == (0 until n).toSet)
      // the hash is the md5 of exactly the sliced tokens
      val c0 = sorted.head
      val expect = java.security.MessageDigest.getInstance("MD5")
        .digest(docs(docId).slice(c0._3, c0._4).mkString(" ")
          .getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(c0._6 == expect)
    }
  }
  test("BPE merges equal an independent reference trainer") {
    val s = spark
    import s.implicits._
    // independent imperative reference: same contract (pair counts
    // weighted by word frequency, argmax with count-desc / byte-order
    // ties, greedy left-to-right merge)
    def refBpe(wf: Map[String, Long], rounds: Int): Seq[(String, String, Long)] = {
      var words: Map[Vector[String], Long] =
        wf.map { case (w, c) => (w.map(_.toString).toVector, c) }
      val out = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
      var r = 0
      var done = false
      while (r < rounds && !done) {
        val pc = scala.collection.mutable.Map[(String, String), Long]()
        for ((syms, c) <- words; i <- 0 until syms.length - 1)
          pc((syms(i), syms(i + 1))) = pc.getOrElse((syms(i), syms(i + 1)), 0L) + c
        if (pc.isEmpty) done = true
        else {
          // byte-order ties (UTF8String/DuckDB order), not UTF-16
          def bytes(x: String) = x.getBytes("UTF-8").map(_ & 0xff).toSeq
          implicit val byteOrd: Ordering[Seq[Int]] = Ordering.Implicits.seqOrdering
          val ((l, rr), n) = pc.toSeq.minBy { case ((a, b), c) =>
            (-c, bytes(a), bytes(b)) }
          out += ((l, rr, n))
          words = words.toSeq.map { case (syms, c) =>
            val b = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == rr) {
                b += (l + rr); i += 2
              } else { b += syms(i); i += 1 }
            }
            (b.result(), c)
          }.groupMapReduce(_._1)(_._2)(_ + _)
        }
        r += 1
      }
      out.toSeq
    }
    // the classic sennrich-shaped corpus plus repeat-heavy edge words
    // ("aaaa" exercises the greedy non-overlap order)
    // classic sennrich corpus + repeat-heavy edges + the rhs-prefix
    // trap: after (a,b) merges, 'cab' is [c, ab] — a boundary-unsafe
    // rewrite of a later (c,a) merge would glue it to one symbol
    for (wf <- Seq(
      Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L,
        "widest" -> 3L, "aaaa" -> 4L, "banana" -> 2L),
      Map("ab" -> 10L, "ca" -> 6L, "cab" -> 1L))) {
      val wordsDf = wf.toSeq.flatMap { case (w, c) =>
        Seq.fill(c.toInt)(w) }.toDF("w")
      val got = TextAnalysis.bpeMergesFromWords(spark, wordsDf, 8).collect()
        .map(r => (r.getString(1), r.getString(2), r.getLong(4))).toSeq
      val want = refBpe(wf, 8)
      assert(got == want, s"got=$got want=$want for $wf")
    }
    val wf = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L,
      "widest" -> 3L, "aaaa" -> 4L, "banana" -> 2L)
    val wordsDf = wf.toSeq.flatMap { case (w, c) =>
      Seq.fill(c.toInt)(w) }.toDF("w")
    // merged column is the concatenation; ranks are 1..n
    val full = TextAnalysis.bpeMergesFromWords(spark, wordsDf, 8).collect()
    assert(full.map(_.getInt(0)).toSeq == (1 to full.length))
    full.foreach(r => assert(r.getString(3) == r.getString(1) + r.getString(2)))
    // sentinel-bearing words are excluded from training (U+0001 is the
    // in-band symbol separator, U+0002 the oracle's no-op marker): the
    // trainer over the tainted stream equals the reference over the
    // clean subset instead of corrupting its own symbolization
    val tainted = (wf.toSeq.flatMap { case (w, c) =>
      Seq.fill(c.toInt)(w) } ++
      Seq("bad\u0001word", "\u0002", "a\u0001", "\u0002b")).toDF("w")
    val gotTainted = TextAnalysis.bpeMergesFromWords(spark, tainted, 8)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(4))).toSeq
    assert(gotTainted == refBpe(wf, 8),
      "sentinel-bearing words must not influence training")
  }
  test("BPE tokenize: pieces shrink with merges, never below word count") {
    def byDoc(rounds: Int): Map[Long, (Long, Long)] =
      TextAnalysis.bpeTokenize(spark, sf, rounds).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val chars = byDoc(0)   // zero merges: every piece is one character
    val merged = byDoc(10)
    assert(chars.keySet == merged.keySet && chars.nonEmpty)
    chars.foreach { case (doc, (c0, w0)) =>
      val (c10, w10) = merged(doc)
      assert(w10 == w0)          // word structure untouched by merges
      assert(c10 <= c0)          // merges only ever shrink piece counts
      assert(c10 >= w10)         // a word is never fewer than one piece
    }
    // merges must actually fire somewhere on this corpus
    assert(merged.values.map(_._1).sum < chars.values.map(_._1).sum)
  }
}
