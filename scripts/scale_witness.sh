#!/bin/bash
# Witness-mode re-verification of the sf1/sf10 oracle stragglers — the
# 11 + 4 gates whose FULL-result DuckDB oracle replay exceeds the box
# (recursive-CTE OOMs at 20+ GiB, interrupts, spill-disk exhaustion;
# every one is green on the engine side at sf0.01-0.1 and green in the
# exact compare at smaller scale). oracle_check --witness compares
# schema (DESCRIBE), row count, and a full-content order-independent
# digest computed IN-DATABASE on both sides — no client buffering, no
# insertion-order preservation, no 95 GB DuckDB instances.
#
# Every worker is hard-bounded by an outer `timeout` (the r15 lesson: a
# stuck oracle worker squatted 75 GB into the next session).
set -u
WALL=${WITNESS_WALL:-5400}
T=${WITNESS_TIMEOUT:-4800}
OUT=${WITNESS_OUT:-/tmp/witjson}
mkdir -p "$OUT"

run() { # tag sfdir dumpdir gates memlimit threads
  timeout -k 60 "$WALL" \
    python3 scripts/oracle_check.py "$2" "$3" --subset --progress \
    --timeout "$T" --threads "$6" --memlimit "$5" --noorder \
    --tmpdir "/tmp/duck_wit_$1" --only "$4" --witness "$4" \
    --json "$OUT/$1.json" > "$OUT/$1.log" 2>&1
  rc=$?
  if [ "$rc" -ge 124 ]; then
    echo "[scale_witness] worker $1 KILLED by outer wall-clock (${WALL}s, rc=$rc)" \
      | tee -a "$OUT/$1.log"
  fi
}

SF1=target/scaledata/sf1
SF10=target/scaledata/sf10

# sf1 stragglers: 11 gates, three moderate workers in parallel
run s1a "$SF1" /tmp/v1 "d_minhash_cc,hb_cluster_minhash,hb_fim_ids,hb_leakage_safe_split" 30GB 10 &
run s1b "$SF1" /tmp/v1 "hb_sft_chat,s_ann_ivf,s_ann_ivfpq,t_cluster_cap" 30GB 10 &
run s1c "$SF1" /tmp/v1 "t_dpo_artifact,t_sft_artifact,t_sft_template" 30GB 10 &
wait
# sf10 stragglers: 4 gates, sequential with most of the box
run s10 "$SF10" /tmp/v10 "d_embed_cosine_dup,hb_diverse,s_kcenter,st_hb_fertility" 80GB 24
echo "[scale_witness] all workers done"
