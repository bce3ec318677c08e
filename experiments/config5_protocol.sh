#!/bin/sh
# BASELINE config 5 drift protocol: >=5 fresh-process runs, report all;
# median taken over runs 2..N (first run pays compile + clock ramp -
# BASELINE.md "measurement hazard").  Run alone on the TPU.
set -u
N=${1:-5}
OUT=${2:-/tmp/config5_runs.jsonl}
: > "$OUT"
i=1
while [ "$i" -le "$N" ]; do
  echo "[config5 protocol] run $i/$N $(date +%H:%M:%S)" >&2
  timeout 2400 python benchmarks/baseline_configs.py --configs 5 \
    > /tmp/config5_run_$i.out 2> /tmp/config5_run_$i.err
  rc=$?
  line=$(grep -o '"config5_full_isp_jpeg_stream": {[^}]*}' /tmp/config5_run_$i.out | tail -1)
  echo "{\"run\": $i, \"rc\": $rc, \"result\": \"$line\"}" | tee -a "$OUT" >&2
  i=$((i + 1))
done
