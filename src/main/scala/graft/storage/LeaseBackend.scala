package graft.storage

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}

/** One observation of a writer lease: the holder's token (None when
  * the lease exists but is unreadable), its age, and an opaque
  * `version` tag a conditional replacement can be predicated on — the
  * file mtime rendered as a string for the FS backend, the ETag for
  * the HTTP backend. */
final case class LeaseObservation(
    token: Option[String], ageMs: Long, version: String)

/** What one heartbeat renewal saw. */
sealed trait RenewOutcome
object RenewOutcome {
  /** The lease still held our token and its freshness was bumped. */
  case object Renewed extends RenewOutcome
  /** The lease now holds ANOTHER writer's token — it was taken over;
    * the holder must fence (stop publishing) immediately. */
  final case class Foreign(token: String) extends RenewOutcome
  /** The renewal could not complete (absent/unreadable lease, IO
    * error, a connector without the needed primitive) — counted, and
    * loud after repeated failures, because persistent failure means
    * the anti-preemption guarantee is gone. */
  final case class Failed(why: String) extends RenewOutcome
}

/** The conditional-write surface [[DurableStores.withWriterLease]]
  * needs, extracted (round 16) so the lease can live somewhere with
  * REAL atomic primitives when the store root itself does not have
  * them. Two implementations:
  *
  *  - [[FsLeaseBackend]] (default): the lease file next to the store
  *    manifest — atomic create-new where the filesystem provides it
  *    (HDFS, local, ABFS), with the stale-takeover race narrowed to a
  *    stat→delete syscall window and re-verified (see
  *    [[DurableStores.takeOverStaleLease]]).
  *  - [[HttpLeaseBackend]]: a conditional-write HTTP endpoint
  *    (`If-None-Match: *` create, `If-Match: <etag>` renew / replace /
  *    delete — the S3-style precondition-PUT protocol), where create,
  *    renewal, takeover, and release are all genuine compare-and-swap.
  *    This is the real lease for object-store deployments whose store
  *    root has no atomic create-new: point
  *    `spark.graft.store.lease.backend=http` +
  *    `spark.graft.store.lease.http.url` at any conditional-write
  *    store and the s3a/s3n advisory-lock fallback is never needed.
  *
  * Every method is crash-tolerant in the same direction as the FS
  * protocol: an unreachable backend makes acquisition FAIL (no verb
  * runs unprotected) and renewal report Failed (the fence aborts
  * publishes after repeated failures).
  */
trait LeaseBackend {
  /** Atomically create the lease holding `token`; false when a lease
    * already exists (or the backend errored — the caller then observes
    * and decides between fail-fast and stale takeover). */
  def tryCreate(token: String): Boolean

  /** The current holder's token, or None when absent/unreadable. */
  def read(): Option[String]

  /** The current lease with age + version, or None when absent. */
  def observe(): Option[LeaseObservation]

  /** Refresh the lease's freshness iff it still holds `token`. */
  def renew(token: String): RenewOutcome

  /** Replace the lease observed as `obs` (stale — older than the
    * configured horizon) with a NEW token this method generates, and
    * return that token. Throws IllegalStateException when a contender
    * won the race — takeover is for dead holders, and a raced takeover
    * means a live contender to back off from. */
  def takeOver(obs: LeaseObservation, store: String): String

  /** Delete the lease iff it still holds `token` (a lease taken over
    * by a new holder is never destroyed). Errors are swallowed — the
    * lease then ages out via the stale horizon. */
  def release(token: String): Unit

  /** Human-readable locator for error messages. */
  def where: String
}

/** The historical file-lease protocol behind the trait — all logic
  * stays in [[DurableStores]]' private methods (token-verified
  * heartbeat, conditional-delete + verified-create + settle takeover),
  * this class only adapts the signatures. */
private[storage] final class FsLeaseBackend(
    s: org.apache.spark.sql.SparkSession, f: FileSystem, lp: Path)
    extends LeaseBackend {
  def tryCreate(token: String): Boolean = {
    f.mkdirs(lp.getParent)
    DurableStores.createLeaseFile(f, lp, token)
  }
  def read(): Option[String] = DurableStores.readLeaseFirstLine(f, lp)
  def observe(): Option[LeaseObservation] =
    try {
      val st = f.getFileStatus(lp)
      Some(LeaseObservation(read(),
        System.currentTimeMillis() - st.getModificationTime,
        st.getModificationTime.toString))
    } catch { case _: java.io.FileNotFoundException => None }
  def renew(token: String): RenewOutcome =
    try {
      read() match {
        case Some(tok) if tok == token =>
          f.setTimes(lp, System.currentTimeMillis(), -1)
          RenewOutcome.Renewed
        case Some(foreign) => RenewOutcome.Foreign(foreign)
        case None =>
          // absent or unreadable: do NOT touch (a foreign create could
          // be landing right now)
          RenewOutcome.Failed("the lease file is absent or unreadable")
      }
    } catch {
      case e: Exception =>
        RenewOutcome.Failed(s"${e.getClass.getName}: ${e.getMessage}")
    }
  def takeOver(obs: LeaseObservation, store: String): String =
    DurableStores.takeOverStaleLease(s, f, lp, store, obs.version.toLong)
  def release(token: String): Unit =
    try { if (read().contains(token)) f.delete(lp, false) }
    catch { case _: java.io.IOException => () }
  def where: String = lp.toString
}

/** A lease on a conditional-write HTTP endpoint. Protocol (the
  * S3-conditional-request shape, expressible by any object store or
  * tiny sidecar service with compare-and-swap):
  *
  *  - create:  `PUT <url> If-None-Match: *` body = token → 2xx created,
  *             412 = already held.
  *  - read:    `GET <url>` → 200 body = token + `ETag` header +
  *             freshness (`X-Lease-Mtime-Ms` millis, else
  *             `Last-Modified`); 404 = absent.
  *  - renew:   `PUT <url> If-Match: <etag>` body = token → 2xx bumps
  *             freshness; 412 = the lease changed under us (foreign).
  *  - replace: the same `If-Match` PUT with the NEW token — the
  *             takeover is a single CAS, no settle window needed.
  *  - release: `DELETE <url> If-Match: <etag>` after verifying the
  *             body is still ours; 412 losses are swallowed (the new
  *             holder keeps its lease).
  *
  * All calls use short timeouts SCALED TO THE LEASE PERIOD (round 17
  * — the r16 advisor's heartbeat-starvation finding): renewals share
  * a small daemon pool with every other held lease, so one hung
  * endpoint must release its thread well inside the staleMs/3 renewal
  * period instead of holding it for a fixed 15 s while OTHER stores'
  * renewals queue toward their stale horizon. The caps keep the
  * 30-minute default at the historical 5 s/10 s; a spec-sized
  * staleMs shrinks them proportionally.
  *
  * A 200 that carries neither `X-Lease-Mtime-Ms` nor `Last-Modified`,
  * or no `ETag`, is a PROTOCOL ERROR, not a fresh lease: synthesizing
  * age 0 would make a dead holder's lease immortal (never crosses the
  * stale horizon) and an empty-ETag `If-Match` can never succeed — the
  * store would wedge with a misleading "age 0 ms" contention error
  * until an operator deleted the lease by hand. [[observe]] throws
  * with the missing header's name; [[renew]] reports the tick Failed.
  *
  * Renewals retry with SHORT BOUNDED BACKOFF + JITTER inside a
  * per-tick budget before reporting Failed (round 18, r17 verdict
  * item 4 — the r17 single immediate retry still let a correlated
  * 2–3-call outage shorter than the stale horizon fence a healthy
  * holder): each Failed tick counts toward the 3-consecutive-failure
  * fence arm, so an endpoint dropping a few consecutive calls per
  * tick must never produce a Failed tick, while a sustained outage
  * exhausts the budget and fails the tick exactly as before (StoreSpec
  * pins both directions). The retry budget derives from the REMAINING
  * tick allowance against the OBSERVED attempt cost (ADVICE r17's
  * floor-dominated regime): a hung endpoint whose first attempt burned
  * its scaled timeouts gets NO retry — the tick can never outgrow its
  * staleMs/3 period and queue other leases' renewals on the shared
  * heartbeat pool — while a fast-failing endpoint (503s, connection
  * refused) retries several times within the budget. Jitter
  * decorrelates many leases' retries against one endpoint blip.
  * Foreign outcomes are never retried — a foreign token is
  * definitive, not transient. */
private[graft] final class HttpLeaseBackend(base: String, key: String,
    connectTimeoutMs: Int = 5000, readTimeoutMs: Int = 10000,
    renewRetryBudgetMs: Long = 2000L)
    extends LeaseBackend {
  private val url = new java.net.URL(base.stripSuffix("/") + "/" +
    java.net.URLEncoder.encode(key, "UTF-8"))
  def where: String = url.toString

  private final case class Resp(code: Int, body: String,
      etag: Option[String], mtimeMs: Option[Long])

  private def call(method: String, headers: Seq[(String, String)],
      body: Option[String]): Resp = {
    val c = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
    try {
      c.setRequestMethod(method)
      c.setConnectTimeout(connectTimeoutMs)
      c.setReadTimeout(readTimeoutMs)
      headers.foreach { case (k, v) => c.setRequestProperty(k, v) }
      body.foreach { b =>
        c.setDoOutput(true)
        val out = c.getOutputStream
        try out.write(b.getBytes(StandardCharsets.UTF_8)) finally out.close()
      }
      val code = c.getResponseCode
      val in = if (code >= 400) c.getErrorStream else c.getInputStream
      val text =
        if (in == null) ""
        else try new String(in.readAllBytes(), StandardCharsets.UTF_8)
        finally in.close()
      val mtime = Option(c.getHeaderField("X-Lease-Mtime-Ms"))
        .flatMap(v => scala.util.Try(v.toLong).toOption)
        .orElse(Option(c.getLastModified).filter(_ > 0))
      Resp(code, text, Option(c.getHeaderField("ETag")), mtime)
    } finally c.disconnect()
  }

  def tryCreate(token: String): Boolean =
    try {
      val r = call("PUT", Seq("If-None-Match" -> "*"), Some(token))
      r.code >= 200 && r.code < 300
    } catch { case _: java.io.IOException => false }

  def read(): Option[String] =
    try {
      val r = call("GET", Nil, None)
      if (r.code == 200) Some(r.body) else None
    } catch { case _: java.io.IOException => None }

  /** Throws (does not return a perpetually-fresh observation) when the
    * endpoint answered 200 without a freshness header or without an
    * ETag — see the class doc's protocol-error rationale. */
  def observe(): Option[LeaseObservation] =
    try {
      val r = call("GET", Nil, None)
      if (r.code != 200) None
      else {
        val age = r.mtimeMs.map(System.currentTimeMillis() - _)
          .getOrElse(throw new IllegalStateException(
            s"lease endpoint $where answered 200 without X-Lease-Mtime-Ms " +
              "or Last-Modified — refusing to synthesize age 0 (the lease " +
              "would never cross the stale horizon); the endpoint must " +
              "report lease freshness"))
        val etag = r.etag.getOrElse(throw new IllegalStateException(
          s"lease endpoint $where answered 200 without an ETag — a " +
            "conditional takeover (If-Match) is impossible against it; " +
            "the endpoint must version the lease"))
        Some(LeaseObservation(Some(r.body), age, etag))
      }
    } catch { case _: java.io.IOException => None }

  def renew(token: String): RenewOutcome = {
    val deadlineNs = System.nanoTime() + renewRetryBudgetMs * 1000000L
    var delayMs = 50L
    var t0 = System.nanoTime()
    var out = renewOnce(token)
    // conservative running bound on one attempt's cost: the max seen
    // this tick — a hung endpoint's timeout-bounded attempt makes the
    // fit check below refuse further retries (floor-dominated regime)
    var attemptMs = math.max(1L, (System.nanoTime() - t0) / 1000000L)
    def retryFits: Boolean = {
      val remainMs = (deadlineNs - System.nanoTime()) / 1000000L
      // the next attempt is budgeted at twice the worst observed cost
      // plus the backoff sleep — only retry when it provably fits
      remainMs > delayMs + 2 * attemptMs + 20L
    }
    while (out.isInstanceOf[RenewOutcome.Failed] && retryFits) {
      val jitter = java.util.concurrent.ThreadLocalRandom.current()
        .nextLong(delayMs / 2 + 1)
      Thread.sleep(delayMs + jitter)
      delayMs = math.min(delayMs * 2, 400L)
      t0 = System.nanoTime()
      out = renewOnce(token)
      attemptMs = math.max(attemptMs, (System.nanoTime() - t0) / 1000000L)
    }
    out
  }

  private def renewOnce(token: String): RenewOutcome =
    try {
      val cur = call("GET", Nil, None)
      if (cur.code == 404)
        RenewOutcome.Failed("the lease is absent")
      else if (cur.code != 200)
        RenewOutcome.Failed(s"GET returned ${cur.code}")
      else if (cur.body != token)
        RenewOutcome.Foreign(cur.body)
      else if (cur.etag.isEmpty)
        RenewOutcome.Failed(
          s"GET answered 200 without an ETag — cannot renew conditionally")
      else {
        val put = call("PUT",
          Seq("If-Match" -> cur.etag.get), Some(token))
        if (put.code >= 200 && put.code < 300) RenewOutcome.Renewed
        else read() match {
          // the CAS lost: whoever changed it owns the lease now
          case Some(foreign) if foreign != token =>
            RenewOutcome.Foreign(foreign)
          case _ => RenewOutcome.Failed(s"renewal PUT returned ${put.code}")
        }
      }
    } catch {
      case e: java.io.IOException =>
        RenewOutcome.Failed(s"${e.getClass.getName}: ${e.getMessage}")
    }

  def takeOver(obs: LeaseObservation, store: String): String = {
    val token = DurableStores.newLeaseToken()
    // one conditional PUT: lands only if the lease is byte-identical
    // to the stale observation — a racing winner's new lease has a new
    // ETag and the precondition fails
    val r = call("PUT", Seq("If-Match" -> obs.version), Some(token))
    if (r.code < 200 || r.code >= 300)
      throw new IllegalStateException(
        s"lost the stale-lease takeover race for store '$store' at " +
          s"$where (HTTP ${r.code}, lease now " +
          s"${read().getOrElse("<absent>")}) — retry after it finishes")
    // verify the read-back (a 2xx from a non-conforming server that
    // ignored the precondition must not grant two writers)
    if (!read().contains(token))
      throw new IllegalStateException(
        s"stale-lease takeover verification failed for store '$store' " +
          s"at $where: lease now held by " +
          s"${read().getOrElse("<absent>")} — backing off")
    token
  }

  def release(token: String): Unit =
    try {
      val cur = call("GET", Nil, None)
      // a 200 without an ETag is the class-doc protocol error — skip
      // the conditional delete rather than issue an If-Match: "" that
      // can never match (errors here are swallowed by contract)
      if (cur.code == 200 && cur.body == token && cur.etag.nonEmpty)
        call("DELETE", Seq("If-Match" -> cur.etag.get), None)
    } catch { case _: java.io.IOException => () }
}
