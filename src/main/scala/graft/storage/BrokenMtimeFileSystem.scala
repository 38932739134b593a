package graft.storage

import java.io.IOException
import java.net.URI

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

/** A local filesystem whose `setTimes` always fails — the faithful
  * simulation of a connector WITHOUT mtime renewal (object-store
  * gateways, some FUSE mounts), which is the production failure mode
  * the commit-marker fence defends against: the heartbeat runs but
  * every renewal fails, the lease ages past the stale horizon, a
  * contender legitimately takes it over, and the preempted verb's
  * publish must abort FENCED.
  *
  * Used by the STORE_DURABILITY jvm6 evidence phase
  * ([[graft.StoreChain]] `fencehold`) via
  * `spark.hadoop.fs.brokenmtime.impl` + a `brokenmtime://` store root
  * — replacing the round-15 `disableHeartbeatForTesting` session conf,
  * which was a production-reachable kill switch that silently stopped
  * renewals (round-15 ADVICE). This class does nothing unless a
  * deployment explicitly registers the scheme, and the failure it
  * injects is LOUD (the heartbeat's repeated-failure warning fires,
  * then the fence).
  *
  * Everything except `setTimes` is the ordinary local filesystem, so
  * the same store files are shared with plain `file://` processes —
  * exactly how the two-process jvm6 evidence overlaps a broken-renewal
  * holder with a healthy contender on one store root. */
final class BrokenMtimeFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "brokenmtime"
  override def getUri: URI = URI.create("brokenmtime:///")
  override def setTimes(p: Path, mtime: Long, atime: Long): Unit =
    throw new IOException(
      s"setTimes($p) is disabled on brokenmtime:// — simulating a " +
        "connector without mtime renewal")
}
