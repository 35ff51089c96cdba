#!/usr/bin/env bash
# Dump .explain("formatted") for a gate list into per-gate files.
# Usage: scripts/dump_plans.sh <outdir> <suffix> <gate1,gate2,...>
# (runs graft.PlanAudit with the gate list; splits on the ===== markers)
set -e
OUT="$1"; SUF="$2"; GATES="$3"
mkdir -p "$OUT"
TMP=$(mktemp)
sbt -batch "runMain graft.PlanAudit ${GATES//,/ }" 2>/dev/null \
  | sed 's/^\[info\] //' > "$TMP"
python3 - "$TMP" "$OUT" "$SUF" <<'EOF'
import sys, re
tmp, out, suf = sys.argv[1:4]
cur, buf = None, []
def flush():
    if cur:
        open(f"{out}/{cur}_{suf}.txt", "w").write("".join(buf))
for line in open(tmp):
    m = re.match(r"===== (\S+) =====", line)
    if m:
        flush(); cur, buf = m.group(1), []
    elif cur:
        buf.append(line)
flush()
EOF
rm -f "$TMP"
ls "$OUT" | grep "_${SUF}.txt" | wc -l
