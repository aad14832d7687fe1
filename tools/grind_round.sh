#!/bin/bash
# Round-5 opportunistic TPU evidence grinder: loops until every stage
# has succeeded once or the deadline passes, sleeping through dead
# tunnels (no listener on 8082-8117 — restarting is infra's job, ours is
# to be ready when it returns) and bad windows.  Stages, in priority
# order: prewarm caches (its section sweep now ledgers every capture),
# full-breadth bench artifact, viterbi-select A/B (re-probe with the
# r5 scalar-fetch verdict — the r4 matmul arm read INCONCLUSIVE off the
# enqueue-ack lie), TPU BER waterfall, stage profile.  Everything tees
# to $LOG; bench additionally persists to BENCH_PARTIAL.log and every
# graded result line lands in BENCH_LEDGER.jsonl.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
LOG="${GRIND_LOG:-/tmp/grind_r5.log}"
DEADLINE_S="${GRIND_DEADLINE_S:-32400}"   # 9 h
cd "$REPO"
exec >> "$LOG" 2>&1

stamp() { date "+%Y-%m-%dT%H:%M:%S"; }

tunnel_alive() {
    python3 - << 'EOF'
import socket, sys
for port in (8082, 8083, 8087):
    try:
        s = socket.socket(); s.settimeout(2)
        s.connect(("127.0.0.1", port)); s.close()
        sys.exit(0)
    except OSError:
        pass
sys.exit(1)
EOF
}

run_stage() {  # $1 = name, rest = command
    local name="$1"; shift
    echo "$(stamp) --- stage $name: start ---"
    "$@"
    local rc=$?
    echo "$(stamp) stage $name rc=$rc"
    return $rc
}

START=$(date +%s)
declare -A done=( [prewarm]=0 [bench]=0 [vselect]=0 [batchprobe]=0 [packprobe]=0 [bmprobe]=0 [batchedprofile]=0 [windowgather]=0 [ber]=0 [profile]=0 )
echo "$(stamp) === grind loop start (deadline ${DEADLINE_S}s) ==="

while (( $(date +%s) - START < DEADLINE_S )); do
    if (( done[prewarm] & done[bench] & done[vselect] & done[batchprobe] & done[packprobe] & done[bmprobe] & done[batchedprofile] & done[windowgather] & done[ber] & done[profile] )); then
        break
    fi
    if ! tunnel_alive; then
        echo "$(stamp) tunnel dead; sleeping 300s"
        sleep 300
        continue
    fi
    if (( ! done[prewarm] )); then
        run_stage prewarm timeout 7200 python tools/weatherwait.py \
            --max-wait 3600 -- python tools/prewarm.py --rounds 2 \
            --target 500 && done[prewarm]=1 || true
        continue
    fi
    # r5 session-b ordering: decision data FIRST (batchedprofile gates
    # the config-3 fix this session; probes + stage profile are quick),
    # the long BER sweep next, the full bench artifact LAST — the driver
    # runs bench.py itself at round end and the ledger replay already
    # carries every section a sweep/probe lands in the meantime.
    if (( ! done[batchedprofile] )); then
        run_stage batchedprofile timeout 3600 python tools/weatherwait.py \
            --max-wait 1800 -- python tools/batched_profile.py \
            && done[batchedprofile]=1 || true
        continue
    fi
    if (( ! done[windowgather] )); then
        run_stage windowgather timeout 2700 python tools/weatherwait.py \
            --max-wait 1800 -- python tools/window_gather_probe.py \
            && done[windowgather]=1 || true
        continue
    fi
    if (( ! done[batchprobe] )); then
        run_stage batchprobe timeout 2700 python tools/weatherwait.py \
            --max-wait 1800 -- python tools/viterbi_batch_probe.py \
            && done[batchprobe]=1 || true
        continue
    fi
    if (( ! done[packprobe] )); then
        run_stage packprobe timeout 2700 python tools/weatherwait.py \
            --max-wait 1800 -- python tools/viterbi_pack_probe.py \
            && done[packprobe]=1 || true
        continue
    fi
    if (( ! done[bmprobe] )); then
        run_stage bmprobe timeout 2700 python tools/weatherwait.py \
            --max-wait 1800 -- python tools/viterbi_bm_probe.py \
            && done[bmprobe]=1 || true
        continue
    fi
    if (( ! done[profile] )); then
        run_stage profile timeout 3600 python tools/weatherwait.py \
            --max-wait 1800 -- python tools/stage_profile.py 16 \
            && done[profile]=1 || true
        continue
    fi
    if (( ! done[vselect] )); then
        run_stage vselect timeout 2700 python tools/weatherwait.py \
            --max-wait 1800 -- python tools/viterbi_select_probe.py \
            && done[vselect]=1 || true
        continue
    fi
    if (( ! done[ber] )); then
        run_stage ber timeout 5400 python tools/weatherwait.py \
            --max-wait 2400 -- python tools/ber_sweep.py --tpu \
            --snrs 4 5 6 7 8 10 12 --frames 12 --seeds 2 \
            -o logs/ber_tpu_r5.jsonl && done[ber]=1 || true
        continue
    fi
    if (( ! done[bench] )); then
        # worst case ~= 600 preflight + 3600 headline budget (+420 last
        # child) + 7200 wall (+600 last section) ~= 12.4k s; the wrapper
        # must clear that or a mid-queue SIGTERM re-runs the WHOLE stage.
        DABTOOLS_HEADLINE_BUDGET=3600 DABTOOLS_BENCH_BUDGET=3600 \
            DABTOOLS_BENCH_WALL=7200 \
            run_stage bench timeout 14400 python bench.py \
            && done[bench]=1 || true
        continue
    fi
done
echo "$(stamp) === grind loop done: $(for k in "${!done[@]}"; do printf "%s=%s " "$k" "${done[$k]}"; done)==="
