#!/bin/sh
# Round-5 serialized measurement queue (ONE process at a time — the box has
# one CPU core; see CLAUDE.md). Each stage tolerates failure and moves on.
# Appends progress markers to docs/r5_queue.log; structured outputs land in
# their usual artifacts (docs/chain_trio_r5.jsonl, BENCH_TRAIN_FLAGSHIP.json,
# BENCH_EXPLAIN.json).
cd "$(dirname "$0")/.." || exit 1
LOG=docs/r5_queue.log
mark() { echo "[$(date -u +%H:%M:%S)] $1" >> "$LOG"; }

mark "queue start"

# --- 1. roll-chain trio (VERDICT r4 #3): Swin-B encoder, B=64, static-int8,
#        back-to-back in one session, one process per arm.
OUT=docs/chain_trio_r5.jsonl
: > "$OUT"
for arm in pair_off pair256 pair256_chain; do
  mark "trio arm $arm start"
  echo "arm=$arm" >> "$OUT"
  case "$arm" in
    pair_off)      env MMRP_SWIN_PAIR=0 AB_SWIN=base timeout 1800 \
                     python tools/ab_bench.py swin_int8s 64 >> "$OUT" 2>> "$LOG" ;;
    pair256)       env AB_SWIN=base timeout 1800 \
                     python tools/ab_bench.py swin_int8s 64 >> "$OUT" 2>> "$LOG" ;;
    pair256_chain) env MMRP_SWIN_CHAIN=1 AB_SWIN=base timeout 1800 \
                     python tools/ab_bench.py swin_int8s 64 >> "$OUT" 2>> "$LOG" ;;
  esac || echo "{\"arm\": \"$arm\", \"error\": \"nonzero exit (timeout or crash)\"}" >> "$OUT"
  mark "trio arm $arm done"
done

# --- 2. flagship (Swin-B) train A/B (VERDICT r4 #5 / ROUND5 6b):
#        b128 core-vs-XLA clean back-to-back + the never-legitimately-benched
#        b192 (bisect proved the compile works: BISECT_COMPILE.json 303 s).
mark "flagship train sweep start"
env BENCH_SWIN=base BENCH_TRAIN_OUT=BENCH_TRAIN_FLAGSHIP.json \
  BENCH_VARIANTS=b128_mu_xla,b128_mu_xla_core,b192_mu_xla_core \
  timeout 5400 python tools/bench_train.py >> "$LOG" 2>&1
mark "flagship train sweep done rc=$?"

# --- 3. explain A/B (VERDICT r4 #7 / ROOFLINE §9): XLA attention in the IG
#        fusion-head backward vs the Pallas default, back-to-back.
mark "explain pallas arm start"
env BENCH_SWIN=base BENCH_PALLAS=1 timeout 1800 \
  python tools/bench_explain.py >> "$LOG" 2>&1
mark "explain pallas arm done rc=$?"
mark "explain xla arm start"
env BENCH_SWIN=base BENCH_PALLAS=0 timeout 1800 \
  python tools/bench_explain.py >> "$LOG" 2>&1
mark "explain xla arm done rc=$?"

mark "queue done"
