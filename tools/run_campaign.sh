#!/bin/bash
# Round-4 pre-registered scaling campaign loop (BENCH/BASELINE.md
# "Round-4 kernel change"): pinned interleaved 1->4 pairs on the x64
# replicate, one pair per bench_scaling.py invocation (REPEATS=1),
# accumulated onto BENCH/scaling_result.json, committed per pair.
# Stop by touching BENCH/.stop_campaign (checked between pairs).
set -u
cd /root/repo
export SPARK_GRAFT_PIN=1
export SPARK_GRAFT_N=1
export SPARK_GRAFT_REPLICATE=64
export SPARK_GRAFT_REPEATS=1
export SPARK_GRAFT_ACCUMULATE=1
PAIR=0
while [ ! -f BENCH/.stop_campaign ]; do
  PAIR=$((PAIR + 1))
  echo "=== campaign pair $PAIR starting $(date -u +%H:%M:%S) ==="
  python tools/bench_scaling.py > /tmp/campaign_pair.log 2>&1
  rc=$?
  if [ $rc -ne 0 ]; then
    echo "pair $PAIR FAILED rc=$rc"; tail -20 /tmp/campaign_pair.log
    # transient failure: wait and retry unless stopped
    sleep 60
    continue
  fi
  eff=$(python -c "import json;print(json.load(open('BENCH/scaling_result.json'))['efficiency'])")
  git add BENCH/scaling_result.json BENCH/BASELINE.md
  git commit -q -m "Record round-4 scaling campaign pair: accumulated min-based efficiency $eff" || true
  echo "=== pair $PAIR done $(date -u +%H:%M:%S) eff=$eff ==="
done
echo "campaign stopped after $PAIR pairs"
