#!/usr/bin/env python3
"""Tiny conditional-write (CAS) lease endpoint for the durability
chain's jvm7 evidence (tools/durchain.sh): serves the exact protocol
graft.storage.HttpLeaseBackend speaks — `PUT If-None-Match: *` create,
`PUT If-Match: <etag>` replace/renew, `DELETE If-Match: <etag>`,
`GET` with `ETag` + `X-Lease-Mtime-Ms` — i.e. the primitives an object
store's conditional requests give a deployment.

Fault injection (the jvm7 "holder partitioned from the endpoint"
scenario): POST /__control/drop-renewals with the holder's token as
body makes every subsequent PUT whose BODY equals that token answer
503 — renewals from that holder fail (its lease ages out), while GETs
and other writers' PUTs (the contender's takeover CAS) keep working.
POST /__control/clear resets. This is evidence tooling (driver-side
python3, like selfcheck.py), not part of the Spark library.
"""
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

LOCK = threading.Lock()
STATE = {"leases": {}, "etag_n": 0, "dropped_tokens": set()}


def new_etag():
    STATE["etag_n"] += 1
    return "e%d" % STATE["etag_n"]


class Handler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"

    def log_message(self, fmt, *args):  # quiet
        sys.stderr.write("[cas] " + fmt % args + "\n")

    def _body(self):
        n = int(self.headers.get("Content-Length") or 0)
        return self.rfile.read(n).decode("utf-8") if n else ""

    def _respond(self, code, body="", lease=None):
        data = body.encode("utf-8")
        self.send_response(code)
        if lease is not None:
            self.send_header("ETag", lease["etag"])
            self.send_header("X-Lease-Mtime-Ms", str(lease["mtime_ms"]))
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        if data:
            self.wfile.write(data)

    def do_GET(self):
        with LOCK:
            lease = STATE["leases"].get(self.path)
            if lease is None:
                self._respond(404)
            else:
                self._respond(200, lease["body"], lease)

    def do_POST(self):
        body = self._body()
        with LOCK:
            if self.path == "/__control/drop-renewals":
                STATE["dropped_tokens"].add(body)
                self._respond(200, "dropping")
            elif self.path == "/__control/clear":
                STATE["dropped_tokens"].clear()
                self._respond(200, "cleared")
            else:
                self._respond(404)

    def do_PUT(self):
        body = self._body()
        with LOCK:
            if body in STATE["dropped_tokens"]:
                self._respond(503, "injected partition: renewals dropped")
                return
            lease = STATE["leases"].get(self.path)
            if_none = self.headers.get("If-None-Match")
            if_match = self.headers.get("If-Match")
            if if_none == "*":
                if lease is not None:
                    self._respond(412)
                    return
                lease = {"body": body, "etag": new_etag(),
                         "mtime_ms": int(time.time() * 1000)}
                STATE["leases"][self.path] = lease
                self._respond(201, "", lease)
            elif if_match is not None:
                if lease is None or lease["etag"] != if_match:
                    self._respond(412)
                    return
                lease = {"body": body, "etag": new_etag(),
                         "mtime_ms": int(time.time() * 1000)}
                STATE["leases"][self.path] = lease
                self._respond(200, "", lease)
            else:
                self._respond(400, "unconditional writes are not served")

    def do_DELETE(self):
        with LOCK:
            lease = STATE["leases"].get(self.path)
            if_match = self.headers.get("If-Match")
            if lease is None or if_match is None or lease["etag"] != if_match:
                self._respond(412)
                return
            del STATE["leases"][self.path]
            self._respond(204)


def main():
    port = int(sys.argv[1]) if len(sys.argv) > 1 else 8089
    srv = ThreadingHTTPServer(("127.0.0.1", port), Handler)
    sys.stderr.write("[cas] serving on 127.0.0.1:%d\n" % port)
    srv.serve_forever()


if __name__ == "__main__":
    main()
