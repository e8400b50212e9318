#!/bin/bash
# Unattended scaling-window hunt: relaunch `bench.py --scaling-until 3`
# back-to-back (each invocation caps at 12 pairs), appending every pair and
# summary to one JSONL, until an at-grade quiet pair count is reached or
# max rounds elapse.  Run from /root/repo, ideally while the session is
# otherwise idle (concurrent CPU work deflates legs).
#
# Usage: nohup bash tools/hunt_loop.sh /tmp/scaling_r04_hunt7.jsonl 4 &
OUT="${1:-/tmp/scaling_hunt.jsonl}"
ROUNDS="${2:-4}"
cd /root/repo || exit 1
for i in $(seq 1 "$ROUNDS"); do
    echo "{\"hunt_round\": $i}" >> "$OUT"
    python bench.py --scaling-until 3 >> "$OUT" 2>> "${OUT%.jsonl}.err"
    # stop early once this invocation banked >=3 at-grade quiet pairs
    n=$(python - "$OUT" <<'EOF'
import json, sys
n = 0
for line in open(sys.argv[1]):
    try: d = json.loads(line)
    except Exception: continue
    p = d.get("pair")
    if p and p.get("quiet") and not p.get("host_degraded"):
        n += 1
print(n)
EOF
)
    if [ "$n" -ge 3 ]; then
        echo "{\"hunt_done\": true, \"at_grade_quiet\": $n}" >> "$OUT"
        break
    fi
done
