package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  * The dot product / norms are sequential folds over the vector arrays in
  * DOUBLE — bit-identical to the DuckDB oracle's list_reduce fold, so the
  * brute-force results hash-match exactly.
  *
  * Scale design: [[topKBruteForce]] broadcasts the (tiny) query-vector set
  * against the big side — a map-only scan, no shuffle of the corpus; the
  * per-query top-k runs as a window over k·Q rows. The LSH-bucketed
  * variant ([[lshTopK]]) is the sub-linear path: sign-bit buckets of
  * deterministic pseudo-random hyperplanes prune the corpus before exact
  * re-scoring (recall measured in the spec against brute force, no SQL
  * oracle — the hyperplane hashes are Spark-specific).
  */
object Similarity {

  /** dot(a, b) in double via zip_with + sequential fold (the composed-
    * built-ins baseline; kept for reference and cross-checking the native
    * expression).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, z) => acc + z)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosineHof(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine via the native codegen'd expression — bit-identical to
    * [[cosineHof]] (same accumulation order) but inside whole-stage
    * codegen.
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSimilarity(a, b)

  /** Exact top-k cosine neighbors for each query vector (vec_id < 3),
    * excluding self. Output fully ordered; ties broken by vec_id.
    */
  def topKBruteForce(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Relational.t(s, dir, "embeddings")
    val q = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val scored = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosine(col("embedding"), col("qv")).as("sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("vec_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 10)
      .select("query_id", "vec_id", "sim", "rk")
      .orderBy("query_id", "rk")
  }

  /** Embedding-cosine near-duplicate pairs: all (a, b) with
    * cosine ≥ threshold. Brute-force all-pairs through the native
    * codegen'd expression — at N embeddings this is N²/2 fused
    * 64-multiply loops, the right baseline below ~10⁵ vectors; beyond
    * that the LSH-bucketed candidate path ([[lshTopK]]'s bucketing)
    * bounds the pair space. Threshold is tuned to the corpus (isotropic
    * random vectors cluster near sim≈0.33).
    */
  def cosinePairs(s: SparkSession, dir: String): DataFrame = {
    val e = Relational.t(s, dir, "embeddings")
      .repartition(s.sparkContext.defaultParallelism)
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cosine(col("va"), col("vb")).as("sim"))
      .filter(col("sim") >= 0.45)
      .orderBy("id_a", "id_b")
  }

  /** Deterministic pseudo-random hyperplane component for (plane p, dim i):
    * a fixed-seed hash mapped to [-1, 1). Engine-internal (xxhash64) — the
    * LSH path has no SQL oracle by design.
    */
  private def planeComponent(p: Column, i: Column): Column =
    (pmod(xxhash64(p, i), lit(2000001L)) - lit(1000000L)).cast("double") / 1000000.0

  /** Sign-bit LSH bucket id over `nPlanes` hyperplanes. */
  def lshBucket(vec: Column, nPlanes: Int): Column =
    aggregate(sequence(lit(0), lit(nPlanes - 1)), lit(0L),
      (acc, p) => acc * 2 + when(
        aggregate(zip_with(vec, sequence(lit(0), lit(63)),
          (x, i) => x.cast("double") * planeComponent(p, i)),
          lit(0.0), (a, z) => a + z) >= 0, 1L).otherwise(0L))

  /** ANN top-k: candidates = same LSH bucket under any of 8 independent
    * 4-plane tables, exact cosine re-score, top-10 per query.
    *
    * Plane count per table trades recall vs selectivity: these synthetic
    * embeddings are isotropic random (no cluster structure, neighbor sims
    * ≈ 0.35), so shallow 4-plane buckets are needed for useful recall
    * (~0.6-0.7 here). Clustered real-world embeddings support deeper
    * buckets — the knob is [[PlanesPerTable]].
    */
  val PlanesPerTable = 4
  val NumTables = 8

  def lshTopK(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Relational.t(s, dir, "embeddings")
      .repartition(s.sparkContext.defaultParallelism) // bucket calc is CPU-bound
    val bucketed = e.select(col("vec_id"), col("embedding"),
      posexplode(expr(s"sequence(0, ${NumTables - 1})")).as(Seq("tbl", "toff")))
      .withColumn("bucket", lshBucketOffset(col("embedding"), col("toff")))
      .select(col("vec_id"), col("embedding"), col("tbl"), col("bucket"))
    val q = bucketed.join(
      e.filter(col("vec_id") < 3).select(col("vec_id").as("query_id")),
      col("vec_id") === col("query_id"))
      .select(col("query_id"), col("tbl").as("qtbl"), col("bucket").as("qbucket"),
        col("embedding").as("qv"))
    val cands = bucketed.join(broadcast(q),
      col("tbl") === col("qtbl") && col("bucket") === col("qbucket") &&
        col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("embedding"), col("qv"))
      .distinct()
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("vec_id").asc)
    cands.withColumn("sim", cosine(col("embedding"), col("qv")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 10)
      .select("query_id", "vec_id", "sim", "rk")
      .orderBy("query_id", "rk")
  }

  /** Bucket of `vec` under table `tbl`'s plane set. */
  private def lshBucketOffset(vec: Column, tbl: Column): Column =
    aggregate(sequence(lit(0), lit(PlanesPerTable - 1)), lit(0L),
      (acc, p) => acc * 2 + when(
        aggregate(zip_with(vec, sequence(lit(0), lit(63)),
          (x, i) => x.cast("double") * planeComponent(p + tbl * PlanesPerTable, i)),
          lit(0.0), (a, z) => a + z) >= 0, 1L).otherwise(0L))
}
