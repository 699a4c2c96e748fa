"""On-device fused-vs-XLA attention agreement check (VERDICT r3 item 3).

BENCH_r03 recorded ``dense_fused_texts_agree: false`` on the real chip
while the CPU e2e test passes. This tool isolates where the divergence
enters, on whatever backend it runs on:

1. **kernel**: ``ops.attention.fused_attention`` vs the exact einsum
   composition from ``MultiheadAttn.attend`` on identical random
   q/k/v/mask at production decode shape — bitwise-equal fraction, max
   abs/rel diff. Two different lowerings of an f32 matmul (Mosaic dot
   vs XLA einsum, with ``--xla_allow_excess_precision`` active on the
   terminal) are NOT guaranteed bit-identical on TPU; this quantifies
   the gap.
2. **module**: ``MultiheadAttn.attend`` with ``attn_impl`` xla/fused on
   shared params — includes the projection/transpose layout changes the
   lever introduces around the kernel.
3. **decode**: full mask-predict over random-weight windows both ways —
   texts agree?, and the confidence-margin histogram (distance of
   per-token confidence to the 0.9 remask / 0.99 early-stop
   thresholds), which says whether any text flip is a knife-edge
   artifact of random weights or a real numeric break.

Prints one JSON line.
"""
from __future__ import annotations

import json

import numpy as np


def kernel_check(b=16, t=400, h=12, hd=64, seed=0):
    import jax
    import jax.numpy as jnp

    from ..ops import attention

    rng = jax.random.PRNGKey(seed)
    kq, kk, kv = jax.random.split(rng, 3)
    q = jax.random.normal(kq, (b, t, h, hd), jnp.float32)
    k = jax.random.normal(kk, (b, t, h, hd), jnp.float32)
    v = jax.random.normal(kv, (b, t, h, hd), jnp.float32)
    # key mask shaped like make_key_mask's output: (B, 1, 1, Tk)
    valid = jnp.arange(t)[None, :] < (t - 7)
    mask = jnp.where(valid, 0.0, -jnp.inf)[:, None, None, :]
    mask = jnp.broadcast_to(mask, (b, 1, 1, t))

    def xla_attend(q, k, v, mask):
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits / jnp.sqrt(jnp.asarray(hd, dtype=logits.dtype))
        logits = logits + mask.astype(logits.dtype)
        attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", attn, v,
                          preferred_element_type=jnp.float32).astype(v.dtype)

    ox = np.asarray(jax.jit(xla_attend)(q, k, v, mask))
    of = np.asarray(jax.jit(attention.fused_attention)(q, k, v, mask))
    # compare only rows attending to >=1 valid key (masked-out rows are
    # NaN by design in both paths)
    finite = np.isfinite(ox) & np.isfinite(of)
    ax, af = ox[finite], of[finite]
    denom = np.maximum(np.abs(ax), 1e-6)
    return {
        "bitwise_equal_frac": round(float(np.mean(ax == af)), 6),
        "max_abs_diff": float(np.max(np.abs(ax - af))),
        "max_rel_diff": float(np.max(np.abs(ax - af) / denom)),
        "nan_pattern_match": bool(
            (np.isnan(ox) == np.isnan(of)).all()),
    }


def decode_check(batch=8, seed=0):
    import dataclasses

    import jax

    from ..config import Config
    from ..infer.pipeline import OCRPipeline

    cfg = Config()
    pipe = OCRPipeline(cfg, model_size="s", seed=seed)
    dims = pipe.transformer.dims
    enc_len = dims.max_enc_seq_len
    rng = np.random.default_rng(seed)
    feats = rng.standard_normal(
        (batch * (enc_len - 2), dims.enc_input_dim)).astype(np.float32)
    step = enc_len - 2
    windows = [(0, i * step, (i + 1) * step, 0) for i in range(batch)]
    texts_x = pipe.decode_windows(feats, windows)

    cfgf = dataclasses.replace(cfg, inference=dataclasses.replace(
        cfg.inference, decode_attention="fused"))
    pipef = OCRPipeline(cfgf, detector_variables=pipe.det_vars,
                        transformer_variables=pipe.tf_vars,
                        model_size="s")
    texts_f = pipef.decode_windows(feats, windows)

    n_char = sum(len(t) for t in texts_x)
    n_diff = sum(1 for a, b in zip(texts_x, texts_f) if a != b)

    # confidence margins to the mask-predict thresholds on the xla path:
    # final-round token confidences within ~1e-4 of 0.9/0.99 are
    # knife-edge — any accumulation-order difference can flip them.
    # pipeline._decode returns (codes, probs).
    import jax.numpy as jnp
    enc_dim = dims.enc_input_dim
    sp = np.zeros(enc_dim, np.float32)
    sp[0:enc_dim - 6:2] = 5
    sp[1:enc_dim - 6:2] = -5
    batch_arr = np.zeros((batch, enc_len, enc_dim), np.float32)
    for wi, (_, ci, cj, _) in enumerate(windows):
        batch_arr[wi, 0] = sp
        batch_arr[wi, 1:1 + cj - ci] = feats[ci:cj]
        batch_arr[wi, 1 + cj - ci] = -sp
    _, probs = pipe._decode(pipe.tf_vars, jnp.asarray(batch_arr))
    p = np.asarray(probs, np.float32)
    return {
        "texts_agree": bool(texts_x == texts_f),
        "windows_differing": n_diff,
        "total_chars": n_char,
        "min_margin_remask": float(np.min(np.abs(p - 0.9))),
        "min_margin_early_stop": float(np.min(np.abs(p - 0.99))),
        "frac_within_1e3_of_threshold": round(float(np.mean(
            (np.abs(p - 0.9) < 1e-3) | (np.abs(p - 0.99) < 1e-3))), 6),
    }


def main():
    import argparse

    import jax

    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-decode", action="store_true")
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    out = {"backend": jax.default_backend()}
    out["kernel"] = kernel_check()
    # module + decode level on the small production-family model
    if not args.skip_decode:
        out["decode"] = decode_check(batch=args.batch)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
