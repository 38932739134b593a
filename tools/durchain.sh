#!/bin/bash
# Four-JVM durability chain: build -> accept -> probe+gates -> compact.
# Produces the inputs recorded in STORE_DURABILITY.json (snapshots of
# the store root between phases, per-phase probe JSON, oracle checks).
set -e
export GRAFT_STORE_ROOT=/tmp/graft_dur_root
export SPARK_GRAFT_CPUS=16
D=/root/testdata/sf0.01
OUT=/tmp/durchain; rm -rf $OUT $GRAFT_STORE_ROOT; mkdir -p $OUT
cd /root/repo
snap() { find $GRAFT_STORE_ROOT -type f -printf "%P %s %T@\n" | sort > $OUT/snap_$1.txt; wc -l < $OUT/snap_$1.txt > $OUT/count_$1.txt; }
echo "=== JVM1 build"
sbt -batch "runMain graft.StoreAdmin build $D" > $OUT/jvm1.log 2>&1
snap 1
echo "=== JVM2 accept"
sbt -batch "runMain graft.StoreChain accept $D" > $OUT/jvm2.log 2>&1
grep -h '{"phase"' $OUT/jvm2.log | tail -1 > $OUT/jvm2.json
snap 2
echo "=== JVM3 probe + gates"
sbt -batch "runMain graft.StoreChain probe $D" > $OUT/jvm3.log 2>&1
grep -h '{"phase"' $OUT/jvm3.log | tail -1 > $OUT/jvm3.json
rm -rf /tmp/dur_verify
SPARK_GRAFT_SF_DIR=$D SPARK_GRAFT_OUT_DIR=/tmp/dur_verify sbt -batch "runMain graft.VerifyOne q83_merge_scale_bucketed q91_incremental_dedup_stored q92_embedding_incremental_stored q112_batch_drift q115_sparse_topk_stored q117_incremental_merge_stored q119_curation_stored q120_semantic_dedup_stored q121_sketch_accept_probe q122_cosine_accept_probe q123_incremental_clusters q124_cluster_accept_probe q125_merge_accept_probe q128_asof_join_stored q129_asof_accept_probe" > $OUT/jvm3b.log 2>&1
python3 tools/selfcheck.py $D /tmp/dur_verify > $OUT/jvm3_selfcheck.txt 2>&1
snap 3
echo "=== JVM4 compact + probe"
sbt -batch "runMain graft.StoreChain compact $D" > $OUT/jvm4.log 2>&1
grep -h '{"phase"' $OUT/jvm4.log | tail -1 > $OUT/jvm4.json
snap 4
echo "=== JVM5 writer-lease contention (two overlapped processes)"
# staleMs (30 s) << hold (180 s): the contender stays out ONLY because
# the holder's heartbeat keeps the lease mtime fresh — without it the
# contender's stale takeover would double-grant mid-hold
export GRAFT_LEASE_STALE_MS=30000
GRAFT_LEASE_HOLD_SECS=180 sbt -batch "runMain graft.StoreChain leasehold $D" > $OUT/jvm5a.log 2>&1 &
HOLDPID=$!
for i in $(seq 1 120); do
  ls $GRAFT_STORE_ROOT/_meta/sketch_accept_*.lease >/dev/null 2>&1 && break
  sleep 2
done
# wait PAST the stale horizon before contending: the evidence is only
# about the heartbeat if the lease is older than staleMs when the
# contender stats it — without the delay a warm sbt gets there in ~15 s
# and the ordinary live-holder path would fire regardless of heartbeat
sleep 45
sbt -batch "runMain graft.StoreChain leasetry $D" > $OUT/jvm5b.log 2>&1 || true
grep -h '{"phase"' $OUT/jvm5b.log | tail -1 > $OUT/jvm5b.json
wait $HOLDPID || true
grep -h '{"phase"' $OUT/jvm5a.log | head -1 > $OUT/jvm5a.json
sbt -batch "runMain graft.StoreChain leasetry $D" > $OUT/jvm5c.log 2>&1
grep -h '{"phase"' $OUT/jvm5c.log | tail -1 > $OUT/jvm5c.json
echo "=== JVM6 commit-marker fence (mid-verb takeover, two processes)"
# fencehold's store root rides brokenmtime:// (a local FS whose
# setTimes always throws — the real connector-without-mtime-renewal
# failure mode, replacing the r15 heartbeat kill-switch conf): its
# heartbeat RUNS but every renewal fails, the lease ages past the 8 s
# horizon, the fencetake contender legitimately stale-takes it and
# commits its OWN marker, and the preempted holder's publish must
# abort FENCED with no marker landing — the cross-process form of
# StoreSpec's fence pins. fencehold exits nonzero unless the fence
# actually fired, so set -e catches a falsified run.
export GRAFT_LEASE_STALE_MS=8000
rm -f $GRAFT_STORE_ROOT/_meta/fence_takeover.sync
sbt -batch "runMain graft.StoreChain fencehold $D" > $OUT/jvm6a.log 2>&1 &
FENCEPID=$!
for i in $(seq 1 120); do
  ls $GRAFT_STORE_ROOT/_meta/fence_evidence_*.lease >/dev/null 2>&1 && break
  sleep 2
done
sleep 10  # let the un-renewed lease cross the stale horizon
sbt -batch "runMain graft.StoreChain fencetake $D" > $OUT/jvm6b.log 2>&1
grep -h '{"phase"' $OUT/jvm6b.log | head -1 > $OUT/jvm6b.json
# no `|| true`: fencehold exits nonzero when the fence did NOT fire
# (marker landed, or the contender never arrived) — set -e then fails
# the whole evidence run instead of leaving a falsified jvm6a.json
wait $FENCEPID
grep -h '"phase":"fencehold","fenced"' $OUT/jvm6a.log | tail -1 > $OUT/jvm6a.json
echo "=== JVM7 http lease backend (real CAS endpoint, two processes)"
# The pluggable http lease across REAL processes (r16 verdict item 4):
# a local conditional-write endpoint (tools/cas_server.py — the
# If-None-Match/If-Match primitives an object store gives you), a
# holder, a live contender that must fail fast, then the endpoint
# starts 503ing the HOLDER's renewals (a real network-partition
# failure, injected at the server — no client-side switch), its lease
# ages past the 8 s horizon, the contender stale-takes it with ONE
# conditional PUT, and the preempted holder's publish aborts FENCED.
# httphold exits nonzero unless the fence fired (set -e catches it).
export GRAFT_LEASE_STALE_MS=8000
CASPORT=18089
python3 tools/cas_server.py $CASPORT > $OUT/jvm7_cas.log 2>&1 &
CASPID=$!
# the CAS server must die with the script even when set -e aborts a
# falsified run mid-phase — otherwise it squats the port (and its
# dropped-token state) for the next chain run
trap 'kill $CASPID 2>/dev/null || true' EXIT
sleep 2
export GRAFT_LEASE_HTTP_URL="http://127.0.0.1:$CASPORT/lease"
rm -f $GRAFT_STORE_ROOT/_meta/http_held.sync $GRAFT_STORE_ROOT/_meta/http_takeover.sync
sbt -batch "runMain graft.StoreChain httphold $D" > $OUT/jvm7a.log 2>&1 &
HTTPPID=$!
for i in $(seq 1 120); do
  [ -f $GRAFT_STORE_ROOT/_meta/http_held.sync ] && break
  sleep 2
done
# live contention while renewals are healthy: must fail fast with the
# holder's identity and a sub-horizon observed age
sbt -batch "runMain graft.StoreChain httptry $D" > $OUT/jvm7b.log 2>&1 || true
grep -h '{"phase"' $OUT/jvm7b.log | tail -1 > $OUT/jvm7b.json
# the contender must have FAILED against the live, healthy holder — an
# acquisition here is a mutual-exclusion violation, the very property
# this evidence exists to prove, and falsifies the run exactly like a
# missing fence (ADVICE r17: this phase ran under '|| true' with its
# JSON never asserted). The observed age must also be sub-horizon:
# the holder was alive and renewing when the contender probed.
grep -q '"acquired":false' $OUT/jvm7b.json
python3 - $OUT/jvm7b.json <<'PYEOF'
import json, os, sys
line = open(sys.argv[1]).read()
# the distilled line keeps sbt's "[info] " prefix — parse from the brace
j = json.loads(line[line.index("{"):])
age = j["observed_lease_age_ms"]
assert 0 <= age < int(os.environ["GRAFT_LEASE_STALE_MS"]), \
    f"live-contention observed age {age} ms is not sub-horizon"
PYEOF
# partition the holder from the endpoint: read its token off the
# lease, then tell the server to 503 that token's PUTs (renewals)
python3 - <<'PYEOF' > $OUT/jvm7_partition.log 2>&1
import os, urllib.request, urllib.parse
root = os.environ["GRAFT_STORE_ROOT"]
base = os.environ["GRAFT_LEASE_HTTP_URL"]
key = open(os.path.join(root, "_meta", "http_held.sync")).read().strip()
url = base + "/" + urllib.parse.quote(key, safe="")
token = urllib.request.urlopen(url).read().decode()
ctrl = base.rsplit("/", 1)[0] + "/__control/drop-renewals"
req = urllib.request.Request(ctrl, data=token.encode(), method="POST")
print(urllib.request.urlopen(req).read().decode())
print("dropped renewals for:", token)
PYEOF
sleep 12  # the un-renewed lease crosses the 8 s stale horizon
sbt -batch "runMain graft.StoreChain httptake $D" > $OUT/jvm7c.log 2>&1
grep -h '{"phase"' $OUT/jvm7c.log | head -1 > $OUT/jvm7c.json
# distill the holder's evidence BEFORE asserting its exit code, so a
# falsified run still leaves jvm7a.json for the post-mortem; the
# assertion itself stays — the chain must fail unless the fence fired
set +e; wait $HTTPPID; HTTPRC=$?; set -e
grep -h '"phase":"httphold","fenced"' $OUT/jvm7a.log | tail -1 > $OUT/jvm7a.json
[ $HTTPRC -eq 0 ]
kill $CASPID 2>/dev/null || true
trap - EXIT
echo DONE
