"""Decompose the per-page detector wall time on the real chip.

Times each component of OCRPipeline.run_detector separately on a
synthetic 2048x1448 page (the bench.py page shape): link RTT, upload
bandwidth (serial and pipelined-slab), readback bandwidth of a computed
array, transfer/compute overlap, pure detector compute at the
configured batch, and the full run_detector wall — so a degraded tunnel
can never masquerade as a code regression (VERDICT r3 weak #6).

Usage: python tools/tunnel_microbench.py [--iters 5] [--skip-model]
Prints one JSON line.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..",
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def best_of(fn, n=5):
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--skip-model", action="store_true")
    args = ap.parse_args()

    out = {}

    # --- link RTT: submit + read back a scalar ------------------------
    one = jnp.zeros(())
    float(one)  # connect
    add = jax.jit(lambda x: x + 1)
    add(one)
    out["rtt_ms"] = round(best_of(lambda: float(add(one)), 10) * 1e3, 1)

    # --- upload bandwidth: 8.9MB uint8 page ---------------------------
    page = np.random.default_rng(0).integers(
        0, 255, (1448, 2048, 3), np.uint8)
    nbytes = page.nbytes
    touch = jax.jit(lambda a: a[::97, ::97, 0].astype(jnp.int32).sum())
    touch(jax.device_put(page))

    def up():
        a = jax.device_put(page)
        int(touch(a))  # dependent readback forces remote completion
    dt = best_of(up, args.iters)
    out["upload_ms_8p9MB"] = round(dt * 1e3, 1)
    out["upload_MBps"] = round(nbytes / dt / 1e6, 1)

    # --- pipelined slab upload: 8 slabs in flight at once -------------
    slabs = [np.ascontiguousarray(page[i::8]) for i in range(8)]

    def up_slabs():
        devs = [jax.device_put(s) for s in slabs]
        for d in devs:
            int(touch3(d))
    touch3 = jax.jit(lambda a: a[::97, ::97, 0].astype(jnp.int32).sum())
    up_slabs()
    dt = best_of(up_slabs, args.iters)
    out["upload_slabbed_ms"] = round(dt * 1e3, 1)
    out["upload_slabbed_MBps"] = round(nbytes / dt / 1e6, 1)

    # --- readback bandwidth of a COMPUTED array (device_put results
    # keep a host-side copy, so reading those back measures nothing) ---
    mk = jax.jit(lambda: jnp.ones((8, 192, 192, 6), jnp.uint8))
    big = mk()
    np.asarray(big)

    def rb_once():
        b = mk()
        # ensure compute done so timing is transfer-only: scalar probe
        int(jnp.sum(b[0, 0, 0, 0]))
        t0 = time.perf_counter()
        np.asarray(b)
        return time.perf_counter() - t0
    rb_once()
    dts = [rb_once() for _ in range(args.iters)]
    dt = min(dts)
    out["readback_ms_1p77MB"] = round(dt * 1e3, 1)
    out["readback_MBps"] = round(big.nbytes / dt / 1e6, 1)

    # --- upload/compute overlap: dispatch a long matmul chain, then
    # immediately upload the page; if transfers ride a separate lane the
    # total is ~max of the two, else the sum --------------------------
    w = jax.device_put(np.random.default_rng(1).standard_normal(
        (4096, 4096)).astype(np.float32))

    @jax.jit
    def burn(w):
        x = w
        for _ in range(30):
            x = jnp.tanh(x @ w * 1e-4)
        return x[0, 0]

    float(burn(w))
    t_burn = best_of(lambda: float(burn(w)), 3)
    out["burn_ms"] = round(t_burn * 1e3, 1)

    def overlapped():
        r = burn(w)
        a = jax.device_put(page)
        float(r)
        int(touch(a))
    overlapped()
    t_ov = best_of(overlapped, args.iters)
    out["burn_plus_upload_ms"] = round(t_ov * 1e3, 1)
    out["overlap_efficiency"] = round(
        (t_burn + dtup(out) - t_ov) / min(t_burn, dtup(out)), 2) \
        if min(t_burn, dtup(out)) > 0 else None

    if args.skip_model:
        print(json.dumps(out))
        return

    # --- detector page path decomposition ------------------------------
    from findtextcenternet_tpu.config import Config
    from findtextcenternet_tpu.infer.pipeline import OCRPipeline

    pipe = OCRPipeline(Config(), model_size="xl", seed=0)
    B = pipe.cfg.inference.detector_batch
    out["detector_batch"] = B

    img = np.asarray(page)

    # full run_detector wall (end-to-end page)
    pipe.run_detector(img)
    out["run_detector_ms"] = round(
        best_of(lambda: pipe.run_detector(img), args.iters) * 1e3, 1)

    # pure compute: dispatch the page graph, sync one scalar
    ms = pipe.cfg.inference.tile_size // 4
    page_dev = jax.device_put(img)
    int(touch(page_dev))
    offs = jnp.zeros((B, 2), jnp.int32)
    bnds = jnp.tile(jnp.asarray([[0, ms, 0, ms]], jnp.int32), (B, 1))

    def compute_only():
        packed, _, _ = pipe._detect_page(pipe.det_vars, page_dev, offs,
                                         bnds)
        float(np.asarray(packed[0, 0, 0]))
    compute_only()
    out["detect_page_compute_ms"] = round(
        best_of(compute_only, args.iters) * 1e3, 1)

    # dispatch + full readback of everything (one chunk)
    def with_readback():
        packed, feat, maps = pipe._detect_page(pipe.det_vars, page_dev,
                                               offs, bnds)
        pipe._fetch_peaks(packed, feat)
        np.asarray(maps)
    with_readback()
    out["detect_page_plus_readback_ms"] = round(
        best_of(with_readback, args.iters) * 1e3, 1)

    print(json.dumps(out))


def dtup(out):
    return out["upload_ms_8p9MB"] / 1e3


if __name__ == "__main__":
    main()
