#!/bin/bash
# Round-4 opportunistic TPU evidence grinder: waits for good relay
# windows and captures, in priority order, everything VERDICT r3 asked
# for: prewarmed caches, a full-breadth bench artifact, the TPU BER
# waterfall, and the committed stage profile.  Each stage is
# weather-gated and individually time-boxed; partial progress is
# preserved (bench tees to BENCH_PARTIAL.log, this script tees
# everything to $LOG).
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
LOG="${GRIND_LOG:-/tmp/grind_r4.log}"
cd "$REPO"
exec >> "$LOG" 2>&1

stamp() { date "+%Y-%m-%dT%H:%M:%S"; }

echo "$(stamp) === grind start ==="

echo "$(stamp) --- stage 1: prewarm (lottery + section sweep) ---"
timeout 7200 python tools/weatherwait.py --max-wait 5400 -- \
    python tools/prewarm.py --rounds 3 --target 380
echo "$(stamp) prewarm rc=$?"

echo "$(stamp) --- stage 2: full bench (all sections) ---"
DABTOOLS_HEADLINE_BUDGET=5400 DABTOOLS_BENCH_BUDGET=3600 \
    timeout 12000 python bench.py
echo "$(stamp) bench rc=$?"

echo "$(stamp) --- stage 3: BER sweep on TPU ---"
timeout 5400 python tools/weatherwait.py --max-wait 3600 -- \
    python tools/ber_sweep.py --tpu --snrs 4 5 6 7 8 10 12 \
    --frames 12 --seeds 2 -o /tmp/ber_tpu_r4.jsonl
echo "$(stamp) ber_sweep rc=$?"

echo "$(stamp) --- stage 4: stage profile ---"
timeout 3600 python tools/weatherwait.py --max-wait 2400 -- \
    python tools/stage_profile.py 16
echo "$(stamp) stage_profile rc=$?"

echo "$(stamp) === grind done ==="
