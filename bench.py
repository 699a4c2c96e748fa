"""Benchmark: detector tiles/sec/chip on the flagship (xl) model.

Measures the dominant cost of the OCR pipeline — the EfficientNetV2-XL
CenterNet detector forward over 768x768 tiles with fused on-device peak
extraction — in bf16 on the real chip. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the driver-set north star of >= 25 tiles/sec/chip end-to-end
(`BASELINE.json`); vs_baseline = value / 25.

Measurement notes: on the 'axon' remote-TPU platform dispatch is fully
async and ``block_until_ready`` does not wait for remote completion, so
timing brackets a host readback of a scalar derived from the last call
(the device stream is in-order, so this syncs the whole loop). Parameter
init is jitted (eager init would pay tunnel latency per op).
"""
from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__) or ".",
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

BATCH = 16
ITERS = 10
BASELINE_TILES_PER_SEC = 25.0


def main():
    from findtextcenternet_tpu.models import CenterNetDetection
    from findtextcenternet_tpu.ops.peaks import extract_peaks

    model = CenterNetDetection(model_size="xl", dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, 768, 768, 3), dtype=jnp.float32)
    variables = jax.jit(model.init)(rng, x0)

    @jax.jit
    def fn(variables, images):
        heatmap, features = model.apply(variables, images)
        return extract_peaks(heatmap, features, max_peaks=1024)

    images = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (BATCH, 768, 768, 3)),
        dtype=jnp.float32)

    def sync(out):
        return float(np.asarray(out["score"][0, 0]))

    # warmup / compile (sync via readback)
    sync(fn(variables, images))
    sync(fn(variables, images))

    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(variables, images)
    sync(out)
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
