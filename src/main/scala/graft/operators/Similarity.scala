package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate nearest-neighbor search over an `array<float>` embedding
  * column (builder brief: similarity search as a first-class operator;
  * generalizes the reference's exact hash_search, web.py:202–216, from
  * exact binary identity to vector similarity).
  *
  * Two paths share the same scoring code:
  *  - brute force (EmbeddingsQ.q24): exact, O(Q·N), broadcast+scan —
  *    the correctness baseline;
  *  - random-hyperplane LSH (here): sign-bit signature per vector,
  *    candidates only within matching buckets → O(N) bucketing shuffle
  *    plus small within-bucket scoring. At 100 TB the bucketed table is
  *    written once (partitioned by bucket) and each query touches one
  *    partition.
  *
  * The hyperplanes are pseudo-random but fully deterministic: component
  * j of plane p is ±1 by xxhash64(p, j) parity — reproducible across
  * runs and engines with no RNG state.
  */
object Similarity {

  /** Double-promoted dot product, folded in index order (native
    * expression — bit-identical to the zip_with+aggregate fold the
    * oracle mirrors, ~20× faster than interpreted HOFs). */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorOps.dotProduct(a, b)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** ±1 pseudo-random hyperplane component for (plane, dim). */
  private def planeComponent(plane: Column, dim: Column): Column =
    when(pmod(xxhash64(plane, dim), lit(2)) === 0, 1.0).otherwise(-1.0)

  /** Engine-portable ±1 hyperplane component: a small integer mixer
    * ((p·379 + j·607 + p·j·131) mod 1009 < 504) any SQL engine can
    * evaluate exactly — this is what makes the LSH-ANN *answer*
    * oracle-checkable end to end (the DuckDB oracle replays the same
    * planes, buckets, and ranking). The p·j cross term breaks the
    * shift-correlation a purely linear mixer would have between
    * planes; xxhash64 remains the default for production bucketing. */
  private def portablePlaneComponent(plane: Column, dim: Column): Column =
    when(pmod(plane * lit(379) + dim * lit(607) + plane * dim * lit(131),
      lit(1009)) < 504, 1.0).otherwise(-1.0)

  /** Deterministic random-projection dimensionality reduction
    * (Achlioptas-style ±1 projections / Johnson–Lindenstrauss):
    * feature p = Σ_j vec[j] · w(p, j) with the same ±1 plane family
    * the LSH bucketing uses. Reduces a d-dim embedding to `outDims`
    * signed sums — the standard 100 TB compression step before
    * storage or coarse ANN — with no RNG state: projections are
    * reproducible across runs, engines (the oracle replays them), and
    * backfills. Per-row narrow compute; no shuffle. */
  def randomProjection(vec: Column, outDims: Int,
      portablePlanes: Boolean = false): Column =
    transform(sequence(lit(0), lit(outDims - 1)), p =>
      aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, j) => x.cast("double") *
            (if (portablePlanes) portablePlaneComponent(p, j)
             else planeComponent(p, j))),
        lit(0.0), (acc, x) => acc + x))

  /** Sign-bit LSH bucket id from `nPlanes` random hyperplanes. */
  def lshBucket(vec: Column, nPlanes: Int = 8,
      portablePlanes: Boolean = false): Column =
    aggregate(
      transform(sequence(lit(0), lit(nPlanes - 1)), p => {
        val proj = aggregate(
          zip_with(vec, sequence(lit(0), size(vec) - 1),
            (x, j) => x.cast("double") *
              (if (portablePlanes) portablePlaneComponent(p, j)
               else planeComponent(p, j))),
          lit(0.0), (acc, x) => acc + x)
        when(proj > 0, call_function("shiftleft", lit(1L), p)).otherwise(lit(0L))
      }),
      lit(0L), (acc, x) => acc.bitwiseOR(x))

  /** Bucketed ANN: top-k by cosine among candidates sharing the query's
    * LSH bucket. Returns (qid, rank, nid, approx=true rows only for
    * queries whose bucket has candidates).
    */
  def annLsh(
      embeddings: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, k: Int = 3, nPlanes: Int = 8,
      portablePlanes: Boolean = false): DataFrame = {
    val cands = embeddings.select(
      col(idCol).as("nid"), col(vecCol).as("nv"),
      lshBucket(col(vecCol), nPlanes, portablePlanes).as("bucket"))
    val qs = queries.select(
      col(idCol).as("qid"), col(vecCol).as("qv"),
      lshBucket(col(vecCol), nPlanes, portablePlanes).as("bucket"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)
    cands.join(broadcast(qs), Seq("bucket"))
      .filter(col("nid") =!= col("qid"))
      .withColumn("cos", cosine(col("qv"), col("nv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("nid"),
        round(col("cos"), 6).as("cos"))
  }
}

/** IVF-style ANN (inverted file index): assign every vector to its
  * nearest of C deterministic centroids (a uniform hash-sample of the
  * corpus — a k-means pass would slot in here unchanged); queries
  * probe only their `nprobe` nearest centroid cells. Complements the
  * hyperplane-LSH path: IVF adapts to the data distribution, LSH is
  * data-independent.
  *
  * 100 TB: the assignment table is written partitioned by `centroid`,
  * so each query touches nprobe partitions; centroids broadcast.
  */
object IvfAnn {
  import org.apache.spark.sql.expressions.Window
  import org.apache.spark.sql.{DataFrame}

  /** Deterministic centroid sample: the `c` vectors with the smallest
    * xxhash64(id) — a uniform pseudo-random sample with no RNG state.
    * orderBy+limit compiles to TakeOrderedAndProject (each partition
    * keeps its local top-c, the driver merges c-sized heaps), so there
    * is no global sort, no single-partition Exchange, and no eager
    * count() action — scale-safe at any corpus size. */
  def centroids(embeddings: DataFrame, idCol: String, vecCol: String,
      c: Int): DataFrame =
    embeddings.select(col(idCol), col(vecCol))
      .orderBy(xxhash64(col(idCol)).asc, col(idCol).asc)
      .limit(c)
      .select(col(idCol).as("centroid_id"), col(vecCol).as("centroid_vec"))

  /** Assign each vector to its nearest centroid by cosine. */
  def assign(embeddings: DataFrame, idCol: String, vecCol: String,
      cents: DataFrame): DataFrame = {
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("cos_c").desc, col("centroid_id").asc)
    embeddings.crossJoin(broadcast(cents))
      .withColumn("cos_c", Similarity.cosine(col(vecCol), col("centroid_vec")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col(idCol), col(vecCol), col("centroid_id").as("centroid"))
  }

  /** Top-k search probing the query's `nprobe` nearest cells. */
  def search(assigned: DataFrame, idCol: String, vecCol: String,
      cents: DataFrame, queries: DataFrame, k: Int = 3,
      nprobe: Int = 2): DataFrame = {
    val wProbe = Window.partitionBy(col("qid"))
      .orderBy(col("cos_c").desc, col("centroid_id").asc)
    val probes = queries
      .select(col(idCol).as("qid"), col(vecCol).as("qv"))
      .crossJoin(broadcast(cents))
      .withColumn("cos_c", Similarity.cosine(col("qv"), col("centroid_vec")))
      .withColumn("rk", row_number().over(wProbe))
      .filter(col("rk") <= nprobe)
      .select(col("qid"), col("qv"), col("centroid_id").as("centroid"))
    val wRank = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid").asc)
    assigned
      .select(col(idCol).as("nid"), col(vecCol).as("nv"), col("centroid"))
      .join(broadcast(probes), Seq("centroid"))
      .filter(col("nid") =!= col("qid"))
      .withColumn("cos", Similarity.cosine(col("qv"), col("nv")))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("nid"),
        round(col("cos"), 6).as("cos"))
  }
}

/** Embedding-cosine near-duplicate pairs (builder brief: the
  * embedding-space member of the dedup family): exact all-pairs above a
  * cosine threshold. The brute-force form is the oracle baseline; at
  * scale the same scoring runs inside IVF cells or LSH buckets instead
  * of the full cross join.
  */
object EmbeddingDedup {
  import org.apache.spark.sql.DataFrame

  def cosinePairs(embeddings: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val a = embeddings.select(col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val b = embeddings.select(col(idCol).as("id_b"), col(vecCol).as("v_b"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", Similarity.cosine(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
  }
}

/** Near-duplicate search over the reference's stored perceptual-hash
  * bytes (SURVEY §7.1.8: generalize Q7 hash_search from exact equality
  * to Hamming proximity over dhash/phash columns). The 8-byte
  * `hash_value` binaries become longs; candidate generation reuses the
  * pigeonhole chunk-LSH (any pair within Hamming < chunks shares an
  * exact 16-bit chunk), so a query probes `chunks` bucket lookups
  * instead of scanning every stored hash.
  */
object HammingSearch {
  import org.apache.spark.sql.{DataFrame}

  /** Index stored hashes for Hamming search: one row per (chunk_idx,
    * chunk_value, file_id). Works directly on the binary column —
    * chunks are 2-byte slices, exact-matchable without any long
    * conversion. */
  def chunkedIndex(fileHashes: DataFrame, algoId: Long, chunks: Int = 4): DataFrame =
    fileHashes.filter(col("algo_id") === algoId)
      .select(col("file_id"), col("hash_value"),
        explode(transform(sequence(lit(0), lit(chunks - 1)), c => struct(
          c.as("chunk_idx"),
          substring(col("hash_value"), c * 2 + 1, lit(2)).as("chunk_value")))).as("ch"))
      .select(col("file_id"), col("hash_value"),
        col("ch.chunk_idx").as("chunk_idx"), col("ch.chunk_value").as("chunk_value"))

  /** Hamming distance between two equal-length binary columns
    * (native xor-popcount expression). */
  def hammingBytes(a: Column, b: Column): Column =
    graft.functions.VectorOps.hammingBytes(a, b)

  /** Find stored hashes within `maxHamming` of the query bytes
    * (maxHamming < chunks guaranteed complete by pigeonhole). */
  def search(fileHashes: DataFrame, algoId: Long, query: Array[Byte],
      maxHamming: Int = 3, chunks: Int = 4): DataFrame = {
    val idx = chunkedIndex(fileHashes, algoId, chunks)
    val qChunks = query.grouped(2).zipWithIndex
      .map { case (bs, i) => (i, bs) }.toSeq
    val s = fileHashes.sparkSession
    import s.implicits._
    val probe = qChunks.toDF("chunk_idx", "chunk_value")
    idx.join(broadcast(probe), Seq("chunk_idx", "chunk_value"))
      .select(col("file_id"), col("hash_value")).distinct()
      .withColumn("hamming", hammingBytes(col("hash_value"), lit(query)))
      .filter(col("hamming") <= maxHamming)
  }
}
