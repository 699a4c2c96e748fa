"""Benchmark: detector tiles/sec/chip on the flagship (xl) model.

Measures the dominant cost of the OCR pipeline — the EfficientNetV2-XL
CenterNet detector forward over 768x768 tiles with fused on-device peak
extraction — in bf16 on the real chip. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the driver-set north star of >= 25 tiles/sec/chip end-to-end
(`BASELINE.json`); vs_baseline = value / 25.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


BATCH = 8
WARMUP = 3
ITERS = 10
BASELINE_TILES_PER_SEC = 25.0


def main():
    from findtextcenternet_tpu.models import CenterNetDetection
    from findtextcenternet_tpu.ops.peaks import extract_peaks

    model = CenterNetDetection(model_size="xl", dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, 768, 768, 3), dtype=jnp.float32)
    variables = model.init(rng, x0)

    @jax.jit
    def fn(variables, images):
        heatmap, features = model.apply(variables, images)
        return extract_peaks(heatmap, features, max_peaks=1024)

    images = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (BATCH, 768, 768, 3)),
        dtype=jnp.float32)

    # warmup / compile
    for _ in range(WARMUP):
        out = fn(variables, images)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(variables, images)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    tiles_per_sec = BATCH * ITERS / dt
    print(json.dumps({
        "metric": "detector_768px_tiles_per_sec_per_chip",
        "value": round(tiles_per_sec, 3),
        "unit": "tiles/s",
        "vs_baseline": round(tiles_per_sec / BASELINE_TILES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
