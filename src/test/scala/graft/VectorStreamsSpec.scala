package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity
import graft.streaming.VectorStreams

/** Streaming embedding near-dup: cross-batch bucket state, one
  * emission per pair across L tables, and the FIFO eviction-miss /
  * batch-backstop contract — the vector mirror of the text stream's
  * StreamingSpec coverage. */
class VectorStreamsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Deterministic pseudo-random unit-ish vector. */
  private def vec(seed: Int, dim: Int = 16): Seq[Float] = {
    val r = new scala.util.Random(seed)
    Seq.fill(dim)((r.nextGaussian() / math.sqrt(dim)).toFloat)
  }

  private def writeBatch(dir: String, rows: Seq[(Long, Seq[Float])]): Unit = {
    val s = spark
    import s.implicits._
    rows.toDF("vec_id", "embedding").write.mode("append").parquet(s"$dir/in")
  }

  private def startStream(dir: String, name: String, tables: Int,
      maxPerBucket: Int = 64) = {
    val schema = spark.read.parquet(s"$dir/in").schema
    VectorStreams.nearDupVecStream(
      spark.readStream.schema(schema).parquet(s"$dir/in"),
      threshold = 0.9, tables = tables, nPlanes = 8,
      maxPerBucket = maxPerBucket)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").option("checkpointLocation", s"$dir/ckpt").start()
  }

  test("cross-batch dup caught once across 8 tables; unrelated vector clean") {
    val dir = Files.createTempDirectory("graft_vecstream").toString
    new java.io.File(s"$dir/in").mkdirs()
    val v1 = vec(1)
    writeBatch(dir, Seq((1L, v1), (2L, vec(2))))
    val q = startStream(dir, "vec_dups", tables = 8)
    q.processAllAvailable()
    // exact dup of vec 1 arrives in a LATER micro-batch: only bucket
    // STATE can link it back; it collides in ALL 8 tables and must
    // still emit exactly once (lowest-table suppression)
    writeBatch(dir, Seq((3L, v1)))
    q.processAllAvailable(); q.stop()
    val hits = spark.table("vec_dups")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(hits.count(h => h._1 == 3L && h._2 == 1L && h._3 == 1.0) === 1,
      s"expected exactly one (3,1,1.0) emission: ${hits.toSeq}")
    assert(!hits.exists(h => Set(h._1, h._2).contains(2L)),
      s"unrelated vector flagged: ${hits.toSeq}")
  }

  test("near twin above threshold is caught through at least one table") {
    val dir = Files.createTempDirectory("graft_vecstream2").toString
    new java.io.File(s"$dir/in").mkdirs()
    val v1 = vec(10)
    val twin = v1.map(x => x * 1.001f + 1e-4f) // cos ≈ 0.99998
    assert(Similarity.cosineJvm(v1, twin) > 0.99)
    writeBatch(dir, Seq((1L, v1)))
    val q = startStream(dir, "vec_dups_twin", tables = 8)
    q.processAllAvailable()
    writeBatch(dir, Seq((2L, twin)))
    q.processAllAvailable(); q.stop()
    val hits = spark.table("vec_dups_twin")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(hits.contains((2L, 1L)), s"near twin missed: ${hits.toSeq}")
  }

  test("FIFO eviction misses the pair in-stream; the batch job recovers it") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft_vecstream3").toString
    new java.io.File(s"$dir/in").mkdirs()
    val v1 = vec(20)
    val b0 = Similarity.portableLshBucketJvm(v1, 8, 0)
    // deterministically FIND two same-bucket fillers that are NOT
    // near-dups of v1 (bucket = 8 sign bits, so ~1/256 of random
    // vectors land in any bucket)
    val fillers = Iterator.from(1000).map(i => vec(i))
      .filter(w => Similarity.portableLshBucketJvm(w, 8, 0) == b0 &&
        Similarity.cosineJvm(v1, w) < 0.9)
      .take(2).toSeq
    writeBatch(dir, Seq((1L, v1)))
    val q = startStream(dir, "vec_dups_evict", tables = 1, maxPerBucket = 2)
    q.processAllAvailable()
    // two same-bucket arrivals push v1 out of the FIFO…
    writeBatch(dir, Seq((2L, fillers(0)), (3L, fillers(1))))
    q.processAllAvailable()
    // …so its later exact dup is missed in-stream
    writeBatch(dir, Seq((4L, v1)))
    q.processAllAvailable(); q.stop()
    val hits = spark.table("vec_dups_evict")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(!hits.contains((4L, 1L)),
      s"evicted pair should be missed in-stream: ${hits.toSeq}")
    // batch backstop: brute cosine pairs over everything streamed
    val all = Seq((1L, v1), (2L, fillers(0)), (3L, fillers(1)), (4L, v1))
      .toDF("vec_id", "embedding")
    val recovered = graft.operators.EmbeddingDedup
      .cosinePairs(all, "vec_id", "embedding", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(recovered.contains((1L, 4L)),
      s"batch backstop did not recover the pair: ${recovered.toSeq}")
  }

  test("drift stream flags out-of-coverage vectors, stateless, across batches") {
    val s = spark
    import s.implicits._
    graft.engine.CacheRegistry.withRetained {
      val dir = Files.createTempDirectory("graft_drift_stream").toString
      // corpus hugs one direction; its landmark radii define coverage
      val corpus = Seq(
        (0L, Seq(1f, 0f)), (1L, Seq(0.95f, 0.1f)),
        (2L, Seq(0.9f, -0.2f)), (3L, Seq(0.85f, 0.3f)))
        .toDF("vec_id", "v")
      val lms = graft.operators.Coreset
        .landmarksWithRadius(corpus, "vec_id", "v", k = 2)
        .persist()
      lms.count()
      writeBatch(dir, Seq((100L, Seq(0.97f, 0.05f)))) // in-distribution
      val schema = spark.read.parquet(s"$dir/in").schema
      val q = VectorStreams.driftStream(
        spark.readStream.schema(schema).parquet(s"$dir/in"), lms)
        .writeStream.format("memory").queryName("drift_hits")
        .outputMode("append").option("checkpointLocation", s"$dir/ckpt")
        .start()
      q.processAllAvailable()
      writeBatch(dir, Seq((101L, Seq(0f, 1f)))) // drifted, later batch
      q.processAllAvailable(); q.stop()
      val out = spark.table("drift_hits").collect()
        .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("novel")).toMap
      assert(out === Map(100L -> 0L, 101L -> 1L))
      lms.unpersist()
    }
  }
}
