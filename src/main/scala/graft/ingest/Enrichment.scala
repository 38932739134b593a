package graft.ingest

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** S7 — rate-limited side-effecting enrichment
  * (scripts/ingest/fuzzysearch/user_lookup.py:102–206): the reference
  * calls the Weasyl API at 1 req/s under a lock with a file-backed memo
  * cache. Spark shape: `mapPartitions` with a lazily-initialized
  * rate-limited client per partition and the memo cache as a broadcast
  * side-input. [[httpUserLookup]] is the real client (JDK HTTP +
  * Jackson, mirroring user_lookup.py:110–141: guess the username,
  * GET /api/users/{guess}/view, accept login_name when the display
  * name round-trips) — exercised in EnrichmentSpec against a
  * local in-JVM HTTP server; point it at the real host in production.
  *
  * Rate limiting defaults to a HARD GLOBAL CAP: the enrichment stage
  * runs on a single partition (repartition(1)), so the total request
  * rate is 1/minIntervalMs regardless of the input's partitioning —
  * exact parity with the reference's single process
  * (user_lookup.py:114). An accidentally 200-partition input must not
  * hammer the remote API at 200 req/s, so spreading is OPT-IN
  * (`globalRateCap = false`), for callers who own the remote quota and
  * accept interval × parallelism as the aggregate rate. Enrichment
  * throughput is gated by the remote API either way — parallelism buys
  * nothing a larger quota doesn't.
  *
  * The cap MUST be `repartition(1)`, not `coalesce(1)`: coalesce has
  * no stage boundary, so it would collapse the ENTIRE upstream
  * pipeline of `df` into one task — at scale, a heavy upstream
  * transform would silently lose all its parallelism whenever the
  * (default-on) cap is active. repartition inserts an exchange:
  * upstream stages keep their width and only the rate-limited map
  * serializes. The extra shuffle is the price of the cap, and it is
  * tiny next to the 1 req/s network wait it guards
  * (reference analog: the 1 req/s lock is on the HTTP call, not the
  * whole job — user_lookup.py:114).
  */
object Enrichment {

  /** Real HTTP lookup: display name → canonical login_name via
    * `GET {baseUrl}/api/users/{guess}/view` (user_lookup.py:119–141).
    * Returns None on non-200, parse failure, or display-name mismatch
    * (the reference then falls back to the submission view; callers
    * chain lookups with `orElse`). */
  def httpUserLookup(baseUrl: String, apiKey: Option[String] = None)
      : String => Option[String] = { display =>
    try {
      val guess = guessUsername(display)
      val conn = new java.net.URL(s"$baseUrl/api/users/$guess/view")
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestProperty("User-Agent", "graft enrichment")
      apiKey.foreach(conn.setRequestProperty("X-Weasyl-API-Key", _))
      conn.setConnectTimeout(10000)
      conn.setReadTimeout(10000)
      try {
        if (conn.getResponseCode != 200) None
        else {
          val node = new com.fasterxml.jackson.databind.ObjectMapper()
            .readTree(conn.getInputStream)
          val login = Option(node.get("login_name")).map(_.asText())
          val siteDisplay = Option(node.get("username")).map(_.asText())
          // accept only when the display name round-trips
          // (user_lookup.py:138–139)
          login.filter(_ => siteDisplay.contains(display))
        }
      } finally conn.disconnect()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** F15 — the reference's username guess: lowercase, strip everything
    * outside [a-z0-9] (user_lookup.py:225, 135). */
  def guessUsername(display: String): String =
    display.toLowerCase.replaceAll("[^a-z0-9]", "")

  /** Add a `canonical_username` column by consulting the broadcast
    * cache first, then the (stubbed) rate-limited lookup.
    *
    * @param lookup the remote call stand-in; deterministic default =
    *               the F15 username guess (a real Weasyl client goes
    *               here, initialized once per partition)
    * @param globalRateCap when true (the default), run the stage on ONE
    *               partition so the per-partition limiter IS the global
    *               limiter (total rate ≤ 1/minIntervalMs, reference
    *               parity). Opt out only when the remote quota allows
    *               interval × parallelism requests per second.
    */
  def enrichUsernames(
      df: DataFrame,
      usernameCol: String,
      cache: Map[String, String],
      minIntervalMs: Long = 1000L,
      lookup: String => Option[String] = d => Some(guessUsername(d)),
      globalRateCap: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    val bcCache = spark.sparkContext.broadcast(cache)
    val outSchema = StructType(df.schema.fields :+
      StructField("canonical_username", StringType, nullable = true))
    val idx = df.schema.fieldIndex(usernameCol)
    // repartition, NOT coalesce: keep upstream stages wide (see class doc)
    val in = if (globalRateCap) df.repartition(1) else df
    val rdd = in.rdd.mapPartitions { it =>
      // per-partition init: client + local rate-limiter state
      var lastCall = 0L
      val memo = scala.collection.mutable.Map.empty[String, Option[String]]
      it.map { row =>
        val name = row.getString(idx)
        val canonical: Option[String] =
          if (name == null) None
          else bcCache.value.get(name).map(Option(_)).getOrElse {
            memo.getOrElseUpdate(name, {
              val wait = minIntervalMs - (System.currentTimeMillis() - lastCall)
              if (wait > 0) Thread.sleep(wait) // token-bucket stand-in
              lastCall = System.currentTimeMillis()
              lookup(name)
            })
          }
        Row.fromSeq(row.toSeq :+ canonical.orNull)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
