package graft

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.HttpServer
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.Enrichment

/** S7 rate-limited HTTP enrichment over the REAL client path: an
  * in-JVM localhost HTTP server plays the user API (no egress
  * needed), so the JDK-HTTP lookup, per-partition rate limiter,
  * broadcast cache, and per-partition memo are all exercised
  * end to end. */
class EnrichmentSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def withServer(f: (String, AtomicInteger) => Unit): Unit = {
    val hits = new AtomicInteger(0)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/api/users/", { exchange =>
      hits.incrementAndGet()
      val guess = exchange.getRequestURI.getPath
        .stripPrefix("/api/users/").stripSuffix("/view")
      // canned identities: username echoes the guess (so canonical
      // displays round-trip, mixed-case ones get rejected); "ghost"
      // has no record
      val (code, body) =
        if (guess == "ghost") (404, """{"error":{"name":"userRecordMissing"}}""")
        else (200, s"""{"login_name":"u_$guess","username":"$guess"}""")
      val bytes = body.getBytes("UTF-8")
      exchange.sendResponseHeaders(code, bytes.length)
      exchange.getResponseBody.write(bytes)
      exchange.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}", hits)
    finally server.stop(0)
  }

  test("httpUserLookup: round-trip match, mismatch, and missing user") {
    withServer { (base, _) =>
      val lookup = Enrichment.httpUserLookup(base)
      assert(lookup("alice") === Some("u_alice"))
      // display name does not round-trip -> rejected
      assert(lookup("Someone Else") === None)
      assert(lookup("ghost") === None)
    }
  }

  test("enrichUsernames drives the real client: cache first, memo dedup, rate limit") {
    withServer { (base, hits) =>
      val s = spark
      import s.implicits._
      val df = Seq("alice", "alice", "bob", "Cached carol")
        .toDF("display_name").coalesce(1)
      val t0 = System.nanoTime()
      val out = Enrichment.enrichUsernames(
        df, "display_name",
        cache = Map("Cached carol" -> "carol_cached"),
        minIntervalMs = 150L,
        lookup = Enrichment.httpUserLookup(base))
        .collect().map(r => r.getString(0) -> r.getString(1))
      val elapsedMs = (System.nanoTime() - t0) / 1e6
      assert(out.toSet === Set(
        "alice" -> "u_alice",
        "bob" -> "u_bob",
        "Cached carol" -> "carol_cached"))
      // memo: alice appears twice but is fetched once; carol is cache-only
      assert(hits.get() === 2)
      // rate limiter: two HTTP calls at >=150ms spacing
      assert(elapsedMs >= 150.0, s"elapsed ${elapsedMs}ms")
    }
  }

  test("global rate cap holds across a multi-partition input (default on)") {
    val s = spark
    import s.implicits._
    EnrichmentSpec.callTimes.clear()
    val df = (1 to 6).map(i => s"user$i").toDF("display_name").repartition(8)
    assert(df.rdd.getNumPartitions === 8)
    val out = Enrichment.enrichUsernames(
      df, "display_name", cache = Map.empty, minIntervalMs = 80L,
      lookup = EnrichmentSpec.recordingLookup)
      .collect()
    assert(out.length === 6)
    val times = EnrichmentSpec.callTimes.toSeq.sorted
    assert(times.size === 6) // memo still deduplicates
    // the cap is GLOBAL: every consecutive pair of calls — regardless
    // of which input partition the rows came from — is spaced by the
    // interval (70ms bound absorbs currentTimeMillis/nanoTime skew)
    val gaps = times.zip(times.tail).map { case (a, b) => (b - a) / 1e6 }
    assert(gaps.forall(_ >= 70.0),
      s"call gaps ${gaps.map(_.round)}ms must all be >= ~80ms")
  }

  test("global cap serializes ONLY the rate-limited map: upstream stages stay wide") {
    val s = spark
    import s.implicits._
    EnrichmentSpec.upstreamParts.clear()
    // a recording upstream transform over 8 partitions: with the cap
    // implemented as repartition(1) (a real exchange) this stage keeps
    // all 8 tasks; a coalesce(1) cap would collapse it to ONE task and
    // this test would see a single partition id
    val df = (1 to 64).map(i => s"user${i % 8}").toDF("display_name")
      .repartition(8)
      .as[String]
      .mapPartitions { it =>
        EnrichmentSpec.upstreamParts.add(
          org.apache.spark.TaskContext.getPartitionId().toLong)
        it
      }
      .toDF("display_name")
    val out = Enrichment.enrichUsernames(
      df, "display_name", cache = Map.empty, minIntervalMs = 1L,
      lookup = d => Some(d.toUpperCase))
    // the capped stage itself is one partition (the global limiter)...
    assert(out.rdd.getNumPartitions === 1)
    assert(out.collect().length === 64)
    // ...but the upstream map ran across all 8 input partitions
    assert(EnrichmentSpec.upstreamParts.toSeq.distinct.size === 8,
      s"upstream ran in partitions ${EnrichmentSpec.upstreamParts.toSeq.distinct.sorted}; " +
        "expected 8 — the global cap must not collapse upstream stages")
  }

  test("globalRateCap=false opts out and preserves input parallelism") {
    val s = spark
    import s.implicits._
    val df = (1 to 6).map(i => s"user$i").toDF("display_name").repartition(8)
    val out = Enrichment.enrichUsernames(
      df, "display_name", cache = Map.empty, minIntervalMs = 1L,
      lookup = d => Some(d.toUpperCase), globalRateCap = false)
    assert(out.rdd.getNumPartitions === 8)
    assert(out.collect().length === 6)
  }
}

/** JVM-global call-time sink: closures are serialized per task even in
  * local mode, so a captured buffer would be a per-task copy — a
  * static object reached by class reference is the same instance for
  * every task in the test JVM. */
object EnrichmentSpec {
  object callTimes {
    private val buf = scala.collection.mutable.ArrayBuffer[Long]()
    def add(t: Long): Unit = synchronized { buf += t }
    def clear(): Unit = synchronized { buf.clear() }
    def toSeq: Seq[Long] = synchronized { buf.toSeq }
  }
  def recordingLookup: String => Option[String] = { d =>
    callTimes.add(System.nanoTime()); Some(d.toUpperCase)
  }
  object upstreamParts {
    private val buf = scala.collection.mutable.ArrayBuffer[Long]()
    def add(t: Long): Unit = synchronized { buf += t }
    def clear(): Unit = synchronized { buf.clear() }
    def toSeq: Seq[Long] = synchronized { buf.toSeq }
  }
}
