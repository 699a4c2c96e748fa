"""Mask-predict decode throughput breakdown on the local device.

Splits the decode-bound dense-page regime (`bench.py`'s ``dense_*``
stage) into its levers: window-batch size, refinement round count,
matmul compute dtype (f32 exact-parity vs bf16, the analog of the
reference's fp16 ONNX/CoreML deployments,
`/root/reference/convert_fp16_onnx.py`), and the hoisted cross-K/V
path vs a per-round full decode (``Transformer.decode`` each round,
what a naive port of `/root/reference/models/transformer.py:274-360`
dispatches).

Reports per-configuration wall-clock plus scheduled FLOPs from XLA's
compiled cost analysis, so per-round MFU is visible directly.

Measurement notes (axon remote-TPU): dispatch is fully async and
``block_until_ready`` does not wait for remote completion, so timings
bracket a host readback of a scalar from the result (the device stream
is in-order, syncing the whole loop).

Usage::

    python -m findtextcenternet_tpu.tools.decode_bench \
        --batch 16 --rounds 8 [--tiny]
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np

DEFAULT_PEAK_TFLOPS = 197.0     # v5e bf16


def build(dims, dtype, attn_impl="xla"):
    import jax

    from ..models.transformer import Transformer
    model = Transformer(dims, dtype=dtype, attn_impl=attn_impl)
    enc_in = np.zeros((1, dims.max_enc_seq_len, dims.enc_input_dim),
                      np.float32)
    tok = np.zeros((1, dims.max_dec_seq_len), np.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jax.numpy.asarray(enc_in),
                                 jax.numpy.asarray(tok))
    return model, params


def timed(fn, *args, iters: int = 5):
    """min-of-N wall-clock; syncs by reading back a scalar."""
    import jax.numpy as jnp

    out = fn(*args)
    float(jnp.sum(out[0]))          # warm + sync
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(out[0]))      # readback syncs the in-order stream
        best = min(best, time.perf_counter() - t0)
    return best


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--tiny", action="store_true",
                    help="smoke config (CI / CPU)")
    ap.add_argument("--peak-tflops", type=float,
                    default=DEFAULT_PEAK_TFLOPS)
    ap.add_argument("--trace", metavar="DIR", default=None,
                    help="wrap the f32 hoisted run in a jax.profiler "
                         "trace (op-level HBM/FLOP attribution for the "
                         "dense-decode gap)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..models.transformer import (
        Transformer, TransformerDims, mask_predict, mask_predict_fns)

    dims = (TransformerDims(embed_dim=32, head_num=4, enc_block_num=1,
                            dec_block_num=1, max_enc_seq_len=16,
                            max_dec_seq_len=16)
            if args.tiny else TransformerDims())

    rng = np.random.default_rng(0)
    enc_in = rng.standard_normal(
        (args.batch, dims.max_enc_seq_len, dims.enc_input_dim)
    ).astype(np.float32)

    results = {}
    for name, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        model, params = build(dims, dtype)

        # hoisted cross-K/V path (the shipped mask_predict)
        hoisted = jax.jit(lambda p, e, m=model: mask_predict(
            m, p, e, max_rounds=args.rounds))
        dt = timed(hoisted, params, jnp.asarray(enc_in),
                   iters=args.iters)
        if args.trace and name == "f32":
            with jax.profiler.trace(args.trace):
                out = hoisted(params, jnp.asarray(enc_in))
                float(jnp.sum(out[0]))
            results["trace_dir"] = args.trace
        comp = hoisted.lower(params, jnp.asarray(enc_in)).compile()
        flops = comp.cost_analysis().get("flops", 0.0)
        results[f"{name}_hoisted_ms"] = round(dt * 1e3, 1)
        results[f"{name}_scheduled_tflop"] = round(flops / 1e12, 3)
        results[f"{name}_mfu_pct_at_max_rounds"] = round(
            100.0 * flops / dt / (args.peak_tflops * 1e12), 1)

        # per-round full decode (naive-port shape: cross K/V recomputed
        # every round)
        naive = jax.jit(lambda p, e, m=model: mask_predict_fns(
            lambda x: m.apply(p, x, method=Transformer.encode),
            lambda d, ctx, km: [
                jax.nn.softmax(x.astype(jnp.float32), -1)
                for x in m.apply(p, d, ctx, km,
                                 method=Transformer.decode)],
            e, m.dims.max_dec_seq_len, max_rounds=args.rounds))
        dt_n = timed(naive, params, jnp.asarray(enc_in),
                     iters=args.iters)
        results[f"{name}_per_round_full_ms"] = round(dt_n * 1e3, 1)

        # parity: same codes out of both paths
        a = np.asarray(hoisted(params, jnp.asarray(enc_in))[0])
        b = np.asarray(naive(params, jnp.asarray(enc_in))[0])
        results[f"{name}_paths_agree"] = bool((a == b).all())

        # fused-attention lever: the Pallas single-tile kernel replaces
        # the einsum score composition (same params, same math — scores
        # never round-trip HBM; see ops/attention.py)
        fused_model = Transformer(dims, dtype=dtype, attn_impl="fused")
        fused = jax.jit(lambda p, e, m=fused_model: mask_predict(
            m, p, e, max_rounds=args.rounds))
        dt_f = timed(fused, params, jnp.asarray(enc_in), iters=args.iters)
        results[f"{name}_fused_attn_ms"] = round(dt_f * 1e3, 1)
        c = np.asarray(fused(params, jnp.asarray(enc_in))[0])
        results[f"{name}_fused_attn_codes_agree"] = bool((a == c).all())

    # top-k lever, isolated at the production per-round shape: XLA's
    # sort-based TopK vs k masked argmax passes (bit-identical; see
    # topk_descending) — 3 moduli per refinement round
    from ..const import MODULO_LIST
    from ..models.transformer import topk_descending
    probs = [jnp.asarray(rng.random((args.batch, dims.max_dec_seq_len, m),
                                    np.float32))
             for m in (MODULO_LIST if not args.tiny else [7, 11, 13])]
    for impl in ("sort", "argmax"):
        f = jax.jit(lambda ps, impl=impl: [
            topk_descending(p, 3, impl=impl) for p in ps])
        dt_k = timed(lambda ps: f(ps)[0], probs, iters=args.iters)
        results[f"topk3_{impl}_ms"] = round(dt_k * 1e3, 2)
    s = f(probs)
    g = jax.jit(lambda ps: [topk_descending(p, 3, "sort") for p in ps])(probs)
    results["topk3_impls_agree"] = bool(all(
        (np.asarray(a) == np.asarray(b)).all()
        for (av, ai), (bv, bi) in zip(s, g) for a, b in ((av, bv), (ai, bi))))

    print(json.dumps({"batch": args.batch, "rounds": args.rounds,
                      **results}))


if __name__ == "__main__":
    main()
