#!/bin/bash
# Re-run the 26 sf1 oracle gates that failed on DuckDB resource limits
# (OOM at 16GB memlimit / 900s interrupt) with a per-worker budget sized
# to the box: one big-memory worker for the OOM set, four gate-parallel
# workers for the interrupt set (recursive CTEs are mostly
# single-threaded in DuckDB, so gate-level process parallelism is the
# real speedup). Each worker gets its own spill dir.
set -u
SF=target/scaledata/sf1
V=/tmp/v1
T=${SF1_TIMEOUT:-4000}
mkdir -p /tmp/sf1json

run() { # name gates memlimit threads
  python3 scripts/oracle_check.py "$SF" "$V" --subset --progress \
    --timeout "$T" --threads "$4" --memlimit "$3" \
    --tmpdir "/tmp/duck_$1" --only "$2" \
    --json "/tmp/sf1json/$1.json" > "/tmp/sf1json/$1.log" 2>&1
}

# OOM set: needs the big memlimit, sequential
run oom "hb_neighbors_ivf,s_ann_ivf,s_ann_ivfpq,st_hb_bpe_ids,t_bpe_bytes,t_bpe_export_rt,t_bpe_specials,t_bpe_specials_export_rt,t_dpo_artifact,t_sft_template" 70GB 16 &
# interrupt set: 4 workers x 4 gates
run w1 "d_minhash_cc,d_minhash_decon,d_minhash_lsh,d_minhash_pairs" 12GB 3 &
run w2 "hb_bpe_ids,hb_cluster_minhash,hb_dedup_minhash,hb_fim_ids" 12GB 3 &
run w3 "hb_leakage_safe_split,hb_neardup_cfg,hb_sft_chat,st_hb_bpe_bytes" 12GB 3 &
run w4 "st_hb_sft,t_bpe_ids,t_cluster_cap,t_sft_artifact" 12GB 3 &
wait
echo "all workers done"
