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
  # Splice the run's report in as a JSON OBJECT (ADVICE r4: quoting it as
  # a string embedded unescaped double quotes - malformed JSONL).
  python - "$i" "$rc" /tmp/config5_run_$i.out >> "$OUT" <<'EOF'
import json, sys
run, rc, path = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
result = None
try:
    for line in open(path):
        line = line.strip()
        if line.startswith('{'):
            result = json.loads(line).get('config5_full_isp_jpeg_stream')
except (OSError, json.JSONDecodeError):
    pass
print(json.dumps({'run': run, 'rc': rc, 'result': result}))
EOF
  tail -1 "$OUT" >&2
  i=$((i + 1))
done
