#!/bin/sh
# VERDICT r4 #3: the promised clean roll-chain trio, back-to-back in one
# session (one process per arm — CLAUDE.md), Swin-B encoder, B=64,
# static-int8 serving quant (the headline mix):
#   A  pair OFF                 (MMRP_SWIN_PAIR=0)
#   B  pair @ C<=256 (default)
#   C  pair @ C<=256 + roll-chain for C=512/1024 (MMRP_SWIN_CHAIN=1)
# Appends one JSON line per arm to docs/chain_trio_r5.jsonl.
set -e
cd "$(dirname "$0")/.."
OUT=docs/chain_trio_r5.jsonl
: > "$OUT"
B=${1:-64}
echo "arm=pair_off" >> "$OUT"
MMRP_SWIN_PAIR=0 AB_SWIN=base timeout 1800 python tools/ab_bench.py swin_int8s "$B" >> "$OUT"
echo "arm=pair256" >> "$OUT"
AB_SWIN=base timeout 1800 python tools/ab_bench.py swin_int8s "$B" >> "$OUT"
echo "arm=pair256_chain" >> "$OUT"
MMRP_SWIN_CHAIN=1 AB_SWIN=base timeout 1800 python tools/ab_bench.py swin_int8s "$B" >> "$OUT"
cat "$OUT"
