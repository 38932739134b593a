package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.operators.{Dedup, Multimodal, Similarity}

/** LLM-data-pipeline operator queries (builder brief: dedup, similarity
  * search, multimodal columns as first-class 100 TB components).
  * n-gram Jaccard and the multimodal byte pipeline are fully
  * oracle-checked; MinHash/SimHash/LSH-ANN depend on Spark's xxhash64
  * (not reproducible in DuckDB) and get rows-only checks, with their
  * internal consistency covered by ScalaTest (DedupSpec).
  */
object LlmOps {

  type Q = (SparkSession, String) => DataFrame

  /** n-gram Jaccard similarity for consecutive doc pairs — exact,
    * engine-agnostic (no hashing), hence oracle-checkable. */
  private val q26NgramJaccard: Q = (s, d) => {
    import s.implicits._
    val sh = t(s, d, "documents").filter($"doc_id" < 101)
      .select($"doc_id", Dedup.shingles($"text").as("sh"))
    val a = sh.select($"doc_id".as("doc_a"), $"sh".as("sh_a"))
    val b = sh.select($"doc_id".as("doc_b"), $"sh".as("sh_b"))
    a.join(b, $"doc_b" === $"doc_a" + 1)
      .filter($"doc_a" < 100)
      .select($"doc_a", $"doc_b",
        round(Dedup.jaccard($"sh_a", $"sh_b"), 6).as("jaccard"),
        size($"sh_a").cast("long").as("n_shingles_a"))
  }

  /** SimHash fingerprints + Hamming distance to the next doc
    * (xxhash64-based → rows-only check; determinism tested in
    * DedupSpec). */
  private val q27Simhash: Q = (s, d) => {
    import s.implicits._
    val sh = t(s, d, "documents")
      .select($"doc_id", Dedup.simhash($"text").as("simhash"))
    val nxt = sh.select($"doc_id".as("doc_b"), $"simhash".as("simhash_b"))
    sh.join(nxt, $"doc_b" === $"doc_id" + 1, "left")
      .select($"doc_id", $"simhash",
        Dedup.hamming($"simhash", coalesce($"simhash_b", lit(0L))).as("hamming_next"))
  }

  /** MinHash+LSH near-dup sweep: per-doc signature/bucket summary plus
    * its verified candidate count (rows-only — xxhash64).
    *
    * Band tuning: 4 bands × 8 rows targets the 0.8-Jaccard near-dup
    * regime ((1/b)^(1/r) ≈ 0.84). The synthetic corpus has a small
    * vocabulary, so looser banding (8×4) floods the candidate stage
    * with moderately-similar pairs — 250s→2s at sf0.1. */
  private val q28MinhashLsh: Q = (s, d) => {
    import s.implicits._
    val k = 32; val bands = 4
    // shingles+signatures computed ONCE and persisted — the summary,
    // banding, and both sides of the candidate join all reuse it
    // (at corpus scale this is the materialized signature table every
    // LSH pipeline keeps)
    val sig = t(s, d, "documents")
      .select($"doc_id", Dedup.shingles($"text").as("sh"))
      .withColumn("sig", Dedup.minhashSignature($"sh", k))
      .persist()
    val banded = sig.select($"doc_id", $"sh",
      explode(Dedup.bandKeys($"sig", k, bands)).as("band"))
      .select($"doc_id", $"sh", $"band.band_id", $"band.band_hash")
    val pairs = banded.select($"band_id", $"band_hash", $"doc_id".as("doc_a"), $"sh".as("sh_a"))
      .join(banded.select($"band_id", $"band_hash", $"doc_id".as("doc_b"), $"sh".as("sh_b")),
        Seq("band_id", "band_hash"))
      .filter($"doc_a" < $"doc_b")
      .select($"doc_a", $"doc_b", $"sh_a", $"sh_b").distinct()
      .withColumn("jaccard", Dedup.jaccard($"sh_a", $"sh_b"))
      .filter($"jaccard" >= 0.8)
    val perDocPairs = pairs.select($"doc_a".as("doc_id"))
      .union(pairs.select($"doc_b".as("doc_id")))
      .groupBy("doc_id").agg(count(lit(1)).as("n_near_dups"))
    sig.select($"doc_id",
      element_at($"sig", 1).as("minhash0"),
      xxhash64($"sig").as("sig_hash"))
      .join(perDocPairs, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_near_dups"))
  }

  /** LSH-bucketed ANN vs the brute-force baseline (q24): rows-only
    * (hyperplanes derive from xxhash64); recall measured in DedupSpec. */
  private val q29AnnLsh: Q = (s, d) => {
    import s.implicits._
    val emb = t(s, d, "embeddings")
    Similarity.annLsh(emb, "vec_id", "embedding",
      emb.filter($"vec_id" < 20), k = 3)
  }

  /** Multimodal byte pipeline: synthetic binary payloads →
    * partition-wise stub decode → feature vectors. Oracle rebuilds the
    * md5 payload bytes hex-digit-wise in DuckDB, so the mapPartitions
    * path is hash-checked end to end. */
  private val q35Multimodal: Q = (s, d) => {
    import s.implicits._
    val ids = t(s, d, "embeddings").select($"vec_id").filter($"vec_id" < 100)
    val media = Multimodal.syntheticMedia(s, ids, "vec_id")
    Multimodal.extractFeatures(media, dim = 4).toDF()
      .select($"media_id", $"kind", $"n_bytes", $"checksum",
        round(element_at($"features", 1).cast("double") * 255).cast("long").as("b0"),
        round(element_at($"features", 2).cast("double") * 255).cast("long").as("b2"),
        round(element_at($"features", 3).cast("double") * 255).cast("long").as("b4"),
        round(element_at($"features", 4).cast("double") * 255).cast("long").as("b6"))
  }

  /** Embedding-cosine near-dup pairs — exact, double-promoted math on
    * both engines, hence oracle-checkable. */
  private val q50EmbeddingNeardup: Q = (s, d) => {
    import graft.operators.EmbeddingDedup
    EmbeddingDedup.cosinePairs(t(s, d, "embeddings"), "vec_id", "embedding",
      threshold = 0.4)
  }

  /** IVF ANN over the same queries as q24/q29 (rows-only: centroid
    * assignment chains double comparisons too deep for a readable
    * oracle; recall vs brute force is asserted in DedupSpec). */
  private val q51IvfAnn: Q = (s, d) => {
    import s.implicits._
    import graft.operators.IvfAnn
    val emb = t(s, d, "embeddings")
    val cents = IvfAnn.centroids(emb, "vec_id", "embedding", c = 16)
    val assigned = IvfAnn.assign(emb, "vec_id", "embedding", cents)
    IvfAnn.search(assigned, "vec_id", "embedding", cents,
      emb.filter($"vec_id" < 20), k = 3, nprobe = 4)
  }

  val queries: Map[String, Q] = Map(
    "q26_ngram_jaccard" -> q26NgramJaccard,
    "q27_simhash" -> q27Simhash,
    "q28_minhash_lsh" -> q28MinhashLsh,
    "q29_ann_lsh" -> q29AnnLsh,
    "q35_multimodal" -> q35Multimodal,
    "q50_embedding_neardup" -> q50EmbeddingNeardup,
    "q51_ivf_ann" -> q51IvfAnn)

  val oracles: Map[String, String] = Map(
    "q26_ngram_jaccard" ->
      """WITH tk AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
        |  FROM documents WHERE doc_id < 101),
        |sh AS (
        |  SELECT doc_id,
        |    CASE WHEN length(t) >= 3 THEN
        |      list_distinct(list_transform(range(0, length(t) - 2),
        |        i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]))
        |    ELSE [array_to_string(t, ' ')] END AS s
        |  FROM tk)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  round(CAST(length(list_intersect(a.s, b.s)) AS DOUBLE)
        |        / length(list_distinct(list_concat(a.s, b.s))), 6) AS jaccard,
        |  length(a.s) AS n_shingles_a
        |FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
        |WHERE a.doc_id < 100""".stripMargin,
    "q35_multimodal" ->
      """WITH m AS (
        |  SELECT vec_id AS media_id, md5(CAST(vec_id AS VARCHAR)) AS h
        |  FROM embeddings WHERE vec_id < 100),
        |b AS (
        |  SELECT media_id, list_transform(range(0, 16),
        |    i -> (instr('0123456789abcdef', substring(h, 2*i+1, 1)) - 1) * 16
        |       + (instr('0123456789abcdef', substring(h, 2*i+2, 1)) - 1)) AS bytes
        |  FROM m)
        |SELECT media_id,
        |  CASE WHEN media_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
        |  CAST(16 AS BIGINT) AS n_bytes,
        |  CAST(list_sum(bytes) AS BIGINT) AS checksum,
        |  CAST(bytes[1] AS BIGINT) AS b0,
        |  CAST(bytes[3] AS BIGINT) AS b2,
        |  CAST(bytes[5] AS BIGINT) AS b4,
        |  CAST(bytes[7] AS BIGINT) AS b6
        |FROM b""".stripMargin,
    "q50_embedding_neardup" ->
      """SELECT id_a, id_b, round(c, 6) AS cos FROM (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    list_sum(list_transform(list_zip(a.embedding, b.embedding),
        |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
        |    AS c
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
        |WHERE c >= 0.4""".stripMargin)
}
