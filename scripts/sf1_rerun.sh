#!/bin/bash
# Re-run the sf1 oracle gates that fail on DuckDB resource limits.
# Learned recipe (r15):
#  - --noorder (preserve_insertion_order=false) is the big lever: deep
#    CTE-chain oracles stream instead of buffering for order —
#    st_hb_sft went OOM-at-12GB -> green, the d_minhash_* family went
#    interrupt-at-4000s -> ~25 min each. oracle_check downgrades an
#    order-only break to a sorted-compare pass under the flag (DuckDB
#    may deliver even a top-level ORDER BY out of client order).
#  - gate-level process parallelism beats DuckDB threads for the
#    recursive-CTE oracles; 7 threads/22GB x 4 workers fits a 125GB box.
#  - a residual OOM set (connected components, the deepest BPE chains:
#    d_minhash_cc, hb_fim_ids, t_dpo_artifact, t_sft_template) needs a
#    sequential big-memory pass — run it LAST, alone on the box.
set -u
SF=target/scaledata/sf1
V=/tmp/v1
T=${SF1_TIMEOUT:-4000}
# OUTER wall-clock bound per worker (seconds). The per-query --timeout
# interrupts a running DuckDB query, but a worker stuck elsewhere (huge
# fetchall, allocator thrash after an OOM) ignores it — r15 left a 75 GB
# / 980-CPU-minute worker squatting the box into the NEXT session.
# `timeout` hard-bounds the whole process: TERM at $WALL, KILL 60 s later.
WALL=${SF1_WALL:-7200}
mkdir -p /tmp/sf1json

run() { # name gates memlimit threads
  timeout -k 60 "$WALL" \
    python3 scripts/oracle_check.py "$SF" "$V" --subset --progress \
    --timeout "$T" --threads "$4" --memlimit "$3" --noorder \
    --tmpdir "/tmp/duck_$1" --only "$2" \
    --json "/tmp/sf1json/$1.json" > "/tmp/sf1json/$1.log" 2>&1
  rc=$?
  if [ "$rc" -ge 124 ]; then
    echo "[sf1_rerun] worker $1 KILLED by outer wall-clock (${WALL}s, rc=$rc)" \
      | tee -a "/tmp/sf1json/$1.log"
  fi
}

# four gate-parallel workers over the expensive (non-OOM) set
run w1 "d_minhash_decon,d_minhash_lsh,hb_bpe_ids,hb_cluster_minhash" 22GB 7 &
run w2 "d_minhash_pairs,hb_dedup_minhash,hb_neardup_cfg,hb_sft_chat" 22GB 7 &
run w3 "hb_leakage_safe_split,st_hb_bpe_bytes,st_hb_sft,t_bpe_ids" 22GB 7 &
run w4 "t_cluster_cap,t_sft_artifact,hb_neighbors_ivf,s_ann_ivf,s_ann_ivfpq" 22GB 7 &
wait
# the OOM set: sequential, alone, most of the box
run oom "d_minhash_cc,hb_fim_ids,t_dpo_artifact,t_sft_template,st_hb_bpe_ids,t_bpe_bytes,t_bpe_export_rt,t_bpe_specials,t_bpe_specials_export_rt" 90GB 16
echo "all workers done"
