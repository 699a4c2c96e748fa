#!/bin/bash
# On-chip measurement battery — run when the axon tunnel answers.
# Each stage is independently time-boxed; results land in /tmp/chip_*.json.
# Usage: bash tools/chip_battery.sh [outdir]
set -u
OUT=${1:-/tmp}
cd "$(dirname "$0")/.."

echo "== probe =="
timeout 300 python -c "
import jax
print('probe ok', float(jax.numpy.zeros((8,8)).sum()), jax.devices())
" || { echo "tunnel not answering; abort"; exit 1; }

echo "== bench.py (headline) =="
timeout 3600 python bench.py | tee "$OUT/chip_bench.json"

echo "== decode_bench dense (levers: dtype/fused/topk) =="
timeout 2400 python -m findtextcenternet_tpu.tools.decode_bench \
    --batch 16 --rounds 8 | tee "$OUT/chip_decode_bench.json"

echo "== decode_bench profile trace =="
timeout 1800 python -m findtextcenternet_tpu.tools.decode_bench \
    --batch 16 --rounds 8 --iters 2 --trace /tmp/decode_trace \
    | tee "$OUT/chip_decode_trace.json"

echo "== transformer train step xla vs fused =="
timeout 2400 python -m findtextcenternet_tpu.tools.train_bench \
    --transformer --batch 32 --iters 5 --attn-impl xla \
    | tee "$OUT/chip_train3_xla.json"
timeout 2400 python -m findtextcenternet_tpu.tools.train_bench \
    --transformer --batch 32 --iters 5 --attn-impl fused \
    | tee "$OUT/chip_train3_fused.json"

echo "== detector train step (tracking) =="
timeout 3600 python -m findtextcenternet_tpu.tools.train_bench \
    --model-size xl --batch 32 --accum 4 --iters 5 \
    | tee "$OUT/chip_train1.json"

echo "== battery done =="
