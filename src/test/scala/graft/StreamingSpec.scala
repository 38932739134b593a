package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams
import graft.streaming.EventStreams.EntityEvent

/** Streaming analytics: batch/stream parity of the windowed aggregate,
  * and incremental merge state across micro-batches. */
class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("streaming exact-dedup: one emission per distinct body, watermark-bounded state") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      ("2024-01-01 00:00:00", 1L, "Hello   world"),
      ("2024-01-01 00:01:00", 2L, "hello world"), // canonical dup of 1
      ("2024-01-01 00:02:00", 3L, "something else"),
      ("2024-01-01 00:03:00", 4L, "HELLO WORLD")) // dup again
    val dir = Files.createTempDirectory("graft_dedup_stream").toString
    rows.toDF("ts_s", "doc_id", "text")
      .select(to_timestamp($"ts_s").as("ts"), $"doc_id", $"text")
      .write.parquet(s"$dir/in")
    val schema = s.read.parquet(s"$dir/in").schema
    val q = EventStreams.dedupDocStream(
      s.readStream.schema(schema).parquet(s"$dir/in"))
      .writeStream.format("memory").queryName("dedup_docs")
      .outputMode("append").option("checkpointLocation", s"$dir/ckpt").start()
    q.processAllAvailable(); q.stop()
    val out = s.table("dedup_docs").select("doc_id")
      .collect().map(_.getLong(0)).sorted
    assert(out.length === 2)
    assert(out.contains(3L)) // the distinct body survives
    assert(out.count(id => Set(1L, 2L, 4L).contains(id)) === 1) // dups collapse to one
  }

  test("windowed counts: streaming result equals batch result") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      ("2024-01-01 00:10:00", "click", 1.0),
      ("2024-01-01 00:40:00", "click", 2.0),
      ("2024-01-01 01:10:00", "view", 3.0),
      ("2024-01-01 01:20:00", "click", 4.0))
    val dir = Files.createTempDirectory("graft_stream").toString
    rows.toDF("ts_s", "event_type", "value")
      .select(to_timestamp($"ts_s").as("ts"), $"event_type", $"value")
      .write.parquet(s"$dir/in")
    val batchDf = s.read.parquet(s"$dir/in")
    val batchResult = EventStreams.windowedTypeCounts(batchDf)
      .orderBy("window_start", "event_type").collect().map(_.toString)

    val streamDf = s.readStream.schema(batchDf.schema).parquet(s"$dir/in")
    val q = EventStreams.windowedTypeCounts(streamDf)
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("append").option("checkpointLocation", s"$dir/ckpt").start()
    q.processAllAvailable(); q.stop()
    // append mode only emits closed windows; compare the closed subset
    val streamed = s.table("win_counts")
      .orderBy("window_start", "event_type").collect().map(_.toString)
    assert(streamed.toSet.subsetOf(batchResult.toSet))
    assert(batchResult.length === 3)
  }

  test("streaming near-dup: LSH bucket state catches dups across micro-batches") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft_neardup_stream").toString
    new java.io.File(s"$dir/in").mkdirs()
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    def writeBatch(rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text").write.mode("append").parquet(s"$dir/in")
    writeBatch(Seq(
      (1L, base),
      (2L, "completely different content about spark shuffles and parquet pruning")))
    val schema = s.read.parquet(s"$dir/in").schema
    val q = EventStreams.nearDupDocStream(
      s.readStream.schema(schema).parquet(s"$dir/in"), bands = 16)
      .writeStream.format("memory").queryName("near_dups")
      .outputMode("append").option("checkpointLocation", s"$dir/ckpt").start()
    q.processAllAvailable()
    // exact dup of doc 1 arrives in a LATER micro-batch: only bucket
    // STATE (not the batch itself) can link it back
    writeBatch(Seq((3L, base)))
    q.processAllAvailable(); q.stop()
    val hits = s.table("near_dups")
      .select("doc_id", "dup_of", "est_jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(hits.exists(h => h._1 == 3L && h._2 == 1L && h._3 == 1.0),
      s"cross-batch dup not caught: ${hits.toSeq}")
    assert(!hits.exists(h => Set(h._1, h._2).contains(2L))) // unrelated doc clean
  }

  test("incremental latest-entity state across micro-batches (mapGroupsWithState)") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft_stream2").toString
    new java.io.File(s"$dir/in").mkdirs()
    def writeBatch(name: String, rows: Seq[EntityEvent]): Unit =
      rows.toDS().write.mode("append").parquet(s"$dir/in")
    writeBatch("b1", Seq(
      EntityEvent(1L, 100L, "click", 1.0),
      EntityEvent(1L, 200L, "purchase", 9.0),
      EntityEvent(2L, 50L, "view", 0.5)))
    val src = s.readStream.schema(Seq.empty[EntityEvent].toDS().schema)
      .parquet(s"$dir/in").as[EntityEvent]
    val q = EventStreams.latestEntityState(src)
      .writeStream.format("memory").queryName("entity_state")
      .outputMode(EventStreams.latestEntityOutputMode)
      .option("checkpointLocation", s"$dir/ckpt").start()
    q.processAllAvailable()
    // late row (ts 150 < 200) + new user in a second micro-batch
    writeBatch("b2", Seq(
      EntityEvent(1L, 150L, "view", 2.0),
      EntityEvent(3L, 10L, "signup", 0.0)))
    q.processAllAvailable(); q.stop()
    val state = s.table("entity_state")
      .groupBy($"user_id")
      .agg(max(struct($"n_events", $"last_ts", $"last_type")).as("st"))
      .select($"user_id", $"st.last_ts", $"st.last_type", $"st.n_events")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2), r.getLong(3)))).toMap
    assert(state(1L) === ((200L, "purchase", 3L))) // late row counted, not promoted
    assert(state(2L) === ((50L, "view", 1L)))
    assert(state(3L) === ((10L, "signup", 1L)))
  }
}
