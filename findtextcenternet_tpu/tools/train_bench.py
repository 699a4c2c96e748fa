"""Detector train-step throughput + MFU on the local device.

The reference trains the xl detector at batch 32 on one GPU
(`/root/reference/train1.py:18-25,176-180`); this tool measures the
TPU-native equivalent — `detector_train_step` (bf16, CoV weighting,
schedule-free AdamW, on-device gradient accumulation via `lax.scan`) —
and reports images/sec, step latency, and model FLOP utilization from
XLA's compiled cost analysis.

MFU here counts every FLOP XLA schedules (including the ~30% recompute
that `--remat` adds), i.e. hardware utilization of the compiled program;
`mfu_algorithmic` discounts to the no-remat FLOP count when both numbers
are measured.

Measurement notes (axon remote-TPU): dispatch is fully async and
`block_until_ready` does not wait for remote completion, so every timing
brackets a host readback of a scalar from the step's metrics (the device
stream is in-order, so this syncs the whole loop).

Usage::

    python -m findtextcenternet_tpu.tools.train_bench \
        --model-size xl --batch 32 --accum 4 --remat
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

# v5e: 197 bf16 TFLOP/s per chip; override with --peak-tflops for other
# generations (v4: 275, v5p: 459, v6e: 918)
DEFAULT_PEAK_TFLOPS = 197.0


def fake_batch(rng, batch: int, h: int, w: int, scale: int = 4):
    mh, mw = h // scale, w // scale
    labelmap = np.zeros((batch, mh, mw, 5), np.float32)
    idmap = np.zeros((batch, mh, mw, 2), np.int32)
    # sprinkle plausible GT peaks so topk_fmask/losses see real structure
    n = 600
    ys = rng.integers(2, mh - 2, (batch, n))
    xs = rng.integers(2, mw - 2, (batch, n))
    for b in range(batch):
        labelmap[b, ys[b], xs[b], 0] = 1.0
        labelmap[b, ys[b], xs[b], 1] = rng.uniform(1.0, 3.0, n)
        labelmap[b, ys[b], xs[b], 2] = rng.uniform(1.0, 3.0, n)
        idmap[b, ys[b], xs[b], 0] = rng.integers(1, 0x3000, n)
    return {
        "image": rng.uniform(0, 1, (batch, h, w, 3)).astype(np.float32),
        "labelmap": labelmap,
        "idmap": idmap,
    }


def _total_flops(compiled) -> float:
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    return float(ca.get("flops", 0.0))


def _v5e_sharding():
    """A replicated sharding on a locally-compiled v5e topology (libtpu
    compiles with no device attached — see tests/test_tpu_aot_compile.py)."""
    import numpy as _np

    os.environ.setdefault("ALLOW_MULTIPLE_LIBTPU_LOAD", "true")
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    topo = topologies.get_topology_desc("v5e:2x2", "tpu")
    mesh = Mesh(_np.array(topo.devices[:1]), ("x",))
    return NamedSharding(mesh, P())


def _v5e_mesh(spec: str):
    """A ('data','model') mesh over a v5e topology for AOT GSPMD
    compiles at flagship scale (VERDICT r4 item: prove the
    sharded-memory fit and collective layout of the xl/production train
    steps without multi-chip hardware). ``spec`` is "DATAxMODEL", e.g.
    "8x1" (pure DP) or "4x2" (DP+TP); the smallest v5e slice that holds
    DATA*MODEL chips is compiled for (2x2=4, 2x4=8, 4x4=16)."""
    import numpy as _np

    os.environ.setdefault("ALLOW_MULTIPLE_LIBTPU_LOAD", "true")
    from jax.experimental import topologies
    from jax.sharding import Mesh
    d, m = (int(v) for v in spec.lower().split("x"))
    topo = None
    for tspec, n in (("v5e:2x2", 4), ("v5e:2x4", 8), ("v5e:4x4", 16)):
        if d * m <= n:
            topo = topologies.get_topology_desc(tspec, "tpu")
            break
    assert topo is not None and d * m <= len(topo.devices), \
        (spec, topo and len(topo.devices))
    arr = _np.array(topo.devices[: d * m]).reshape(d, m)
    return Mesh(arr, ("data", "model"))


def _aot_state_and_batch(state_shapes, batch_shapes, mesh, zero1=False):
    """Abstract (ShapeDtypeStruct) train state + batch with flagship
    shardings: params/opt-state by the TP path rules (replicated where
    they don't match / don't divide), batch split over 'data'.
    ``zero1`` shards otherwise-replicated optimizer-state leaves over
    'data' (see :func:`..parallel.state_shardings`)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel import state_shardings

    shardings = state_shardings(state_shapes, mesh, zero1=zero1)
    state = jax.tree_util.tree_map(
        lambda x, sh: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sh),
        state_shapes, shardings)
    dsh = NamedSharding(mesh, P("data"))
    batch = {
        k: jax.ShapeDtypeStruct(v.shape, v.dtype, sharding=dsh)
        for k, v in batch_shapes.items()}
    return state, batch


def _bench_transformer(args):
    """train3's `transformer_train_step` at the production 400/400
    shapes; the --attn-impl lever isolates the fused-attention win
    (reference anchor: `/root/reference/train3.py:129-151`)."""
    import dataclasses as dc
    import time

    import jax

    from ..config import Config
    from ..const import ENCODER_DIM, MAX_CODEPOINT
    from ..train.steps import transformer_train_step
    from ..train.train3 import build_transformer_state

    cfg = Config()
    tcfg = dc.replace(cfg.transformer, attn_impl=args.attn_impl)
    if getattr(args, "tiny", False):
        tcfg = dc.replace(tcfg, embed_dim=32, head_num=4,
                          enc_block_num=1, dec_block_num=1,
                          max_enc_seq_len=16, max_dec_seq_len=16)
    cfg = dc.replace(cfg, transformer=tcfg)

    t = cfg.transformer
    rng = np.random.default_rng(0)
    true = rng.integers(1, MAX_CODEPOINT,
                        (args.batch, t.max_dec_seq_len)).astype(np.int64)
    dec_in = np.where(rng.random(true.shape) < 0.5, 3, true)  # MSK=3
    batch_np = {
        "encoder_input": rng.standard_normal(
            (args.batch, t.max_enc_seq_len, ENCODER_DIM)
        ).astype(np.float32),
        "decoder_input": dec_in.astype(np.int32),
        "decoder_true": true.astype(np.int32),
    }

    if args.aot:
        state = jax.eval_shape(
            lambda _: build_transformer_state(cfg, mesh=None, seed=0)[1],
            0)
        if args.aot_mesh:
            mesh = _v5e_mesh(args.aot_mesh)
            state, batch = _aot_state_and_batch(state, batch_np, mesh)
        else:
            sh = _v5e_sharding()
            state = jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                               sharding=sh), state)
            batch = {k: jax.ShapeDtypeStruct(v.shape, v.dtype, sharding=sh)
                     for k, v in batch_np.items()}
    else:
        model, state = build_transformer_state(cfg, mesh=None, seed=0)
        batch = {k: jax.device_put(v) for k, v in batch_np.items()}

    # --accum's default (4) is the detector bench's; the transformer
    # step historically ran accum-less here, so only honor --accum when
    # it evenly divides the batch AND was explicitly requested
    accum = max(1, int(getattr(args, "accum_explicit", 0) or 1))
    if args.batch % accum != 0:
        accum = 1
    step = jax.jit(lambda s, b: transformer_train_step(
        s, b, accum_steps=accum))
    t0 = time.perf_counter()
    compiled = step.lower(state, batch).compile()
    compile_s = time.perf_counter() - t0
    flops = _total_flops(compiled)
    # cost analysis counts the accumulation scan body once
    if accum > 1 and flops:
        flops *= accum

    if args.dry:
        mem = {}
        try:
            ma = compiled.memory_analysis()
            if ma is not None:
                for k in ("temp_size_in_bytes", "argument_size_in_bytes",
                          "output_size_in_bytes"):
                    v = getattr(ma, k, None)
                    if v is not None:
                        mem[k.replace("_size_in_bytes", "_gb")] = round(
                            v / 2**30, 3)
        except Exception as e:
            mem["memory_analysis_error"] = str(e)[:80]
        print(json.dumps({
            "metric": "transformer_train_dry_compile",
            "batch": args.batch, "attn_impl": args.attn_impl,
            "accum": accum,
            "aot": args.aot,
            **({"aot_mesh": args.aot_mesh} if args.aot_mesh else {}),
            "compile_s": round(compile_s, 1),
            "scheduled_tflops_per_step": round(flops / 1e12, 2)
            if flops else None, **mem,
        }))
        return

    def sync(metrics):
        return float(np.asarray(metrics["loss"], np.float32))

    state, metrics = compiled(state, batch)
    sync(metrics)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, metrics = compiled(state, batch)
    sync(metrics)
    dt = (time.perf_counter() - t0) / args.iters

    print(json.dumps({
        "metric": "transformer_train_windows_per_sec",
        "value": round(args.batch / dt, 2),
        "unit": "windows/s",
        "batch": args.batch,
        "attn_impl": args.attn_impl,
        "accum": accum,
        "step_ms": round(dt * 1e3, 1),
        "compile_s": round(compile_s, 1),
        "scheduled_tflops_per_step": round(flops / 1e12, 2)
        if flops else None,
        "mfu_pct": round(100.0 * flops / dt
                         / (args.peak_tflops * 1e12), 1) if flops else None,
        "loss": sync(metrics),
    }))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-size", default="xl")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--accum", type=int, default=4,
                    help="on-device micro-batch count (lax.scan)")
    ap.add_argument("--image", type=int, default=768)
    ap.add_argument("--head-conv-dim", type=int, default=192,
                    help="Leafmap internal width (256 = the MXU "
                         "tile-padding MFU probe; PERFORMANCE.md)")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--peak-tflops", type=float,
                    default=DEFAULT_PEAK_TFLOPS)
    ap.add_argument("--no-remat-flops", type=float, default=0.0,
                    help="scheduled FLOPs of the no-remat compile (for "
                         "mfu_algorithmic); measure once with --remat off")
    ap.add_argument("--dry", action="store_true",
                    help="compile only: report FLOPs + compiled memory "
                         "footprint without executing (safe probe for "
                         "configs that might OOM the chip)")
    ap.add_argument("--transformer", action="store_true",
                    help="bench transformer_train_step (train3's step) "
                         "instead of the detector step")
    ap.add_argument("--attn-impl", default="xla",
                    choices=["xla", "fused"],
                    help="transformer attention implementation "
                         "(fused = Pallas single-tile, custom VJP)")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny transformer dims (CI / CPU smoke)")
    ap.add_argument("--aot", action="store_true",
                    help="compile for a v5e topology locally (no device "
                         "needed, implies --dry): real Mosaic/XLA:TPU "
                         "pipeline + memory analysis even while the "
                         "tunnel is down")
    ap.add_argument("--donate", action="store_true",
                    help="with --aot: donate the train-state buffers "
                         "(the axon tunnel rejects donation at runtime; "
                         "AOT shows the aliasing the chip would get on a "
                         "standard runtime)")
    ap.add_argument("--aot-mesh", default=None, metavar="DxM",
                    help="with --aot: compile over a multi-chip "
                         "('data','model') mesh on the v5e:2x2 topology "
                         "(e.g. 4x1 = pure DP, 2x2 = DP+TP) — flagship "
                         "GSPMD sharding evidence without hardware; "
                         "memory figures are per device")
    args = ap.parse_args(argv)
    argv_list = list(argv) if argv is not None else list(sys.argv[1:])
    args.accum_explicit = (args.accum if any(
        a == "--accum" or a.startswith("--accum=") for a in argv_list)
        else 0)

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    if args.aot:
        args.dry = True
        jax.config.update("jax_platforms", "cpu")   # keep axon out

    if args.transformer:
        return _bench_transformer(args)

    from ..config import Config, DetectorConfig
    from ..train.steps import detector_train_step
    from ..train.train1 import build_detector_state

    cfg = Config(detector=DetectorConfig(
        model_size=args.model_size, remat=args.remat,
        image_size=(args.image, args.image),
        head_conv_dim=args.head_conv_dim))

    step = jax.jit(lambda s, b: detector_train_step(
        s, b, fmask_k=cfg.detector.fmask_topk_per_sample,
        accum_steps=args.accum),
        donate_argnums=(0,) if args.donate else ())

    if args.aot:
        state = jax.eval_shape(
            lambda _: build_detector_state(cfg, mesh=None, seed=0)[1],
            0)
        batch_np = fake_batch(np.random.default_rng(0), args.batch,
                              args.image, args.image)
        if args.aot_mesh:
            mesh = _v5e_mesh(args.aot_mesh)
            state, batch = _aot_state_and_batch(state, batch_np, mesh)
        else:
            sharding = _v5e_sharding()
            state = jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                               sharding=sharding), state)
            batch = {
                k: jax.ShapeDtypeStruct(v.shape, v.dtype,
                                        sharding=sharding)
                for k, v in batch_np.items()}
    else:
        model, state = build_detector_state(cfg, mesh=None, seed=0)
        rng = np.random.default_rng(0)
        batch = {k: jax.device_put(v) for k, v in
                 fake_batch(rng, args.batch, args.image,
                            args.image).items()}

    t0 = time.perf_counter()
    lowered = step.lower(state, batch)
    compiled = lowered.compile()
    compile_s = time.perf_counter() - t0
    flops = _total_flops(compiled)
    # XLA cost analysis counts a while/scan body ONCE; the accumulation
    # scan runs it accum times, so scale to the true per-step FLOPs.
    # (The non-loop part — optimizer update, CoV — is >100x smaller than
    # one micro-batch fwd+bwd, so the overcount is negligible.)
    if args.accum > 1 and flops:
        flops *= args.accum

    mem = {}
    try:
        ma = compiled.memory_analysis()
        if ma is not None:
            for k in ("temp_size_in_bytes", "argument_size_in_bytes",
                      "output_size_in_bytes", "alias_size_in_bytes",
                      "generated_code_size_in_bytes"):
                v = getattr(ma, k, None)
                if v is not None:
                    mem[k.replace("_size_in_bytes", "_gb")] = round(
                        v / 2**30, 3)
    except Exception as e:             # axon may not expose it
        mem["memory_analysis_error"] = str(e)[:80]

    if args.dry:
        print(json.dumps({
            "metric": "detector_train_dry_compile",
            "model_size": args.model_size, "batch": args.batch,
            "accum_steps": args.accum, "image": args.image,
            "remat": args.remat, "aot": args.aot, "donate": args.donate,
            **({"aot_mesh": args.aot_mesh} if args.aot_mesh else {}),
            "compile_s": round(compile_s, 1),
            "scheduled_tflops_per_step": round(flops / 1e12, 2)
            if flops else None, **mem,
        }))
        return

    def sync(metrics):
        return float(np.asarray(metrics["keymap_loss"], np.float32))

    # rebind `state` each call so the previous iterate is freed before
    # the next dispatch — without donation a dead 3 GB state copy pushes
    # the xl step over the chip's HBM
    state, metrics = compiled(state, batch)
    sync(metrics)
    state, metrics = compiled(state, batch)
    sync(metrics)

    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, metrics = compiled(state, batch)
    sync(metrics)
    dt = (time.perf_counter() - t0) / args.iters

    mfu = flops / dt / (args.peak_tflops * 1e12) if flops else None
    out = {
        "metric": "detector_train_imgs_per_sec",
        "value": round(args.batch / dt, 2),
        "unit": "img/s",
        "model_size": args.model_size,
        "batch": args.batch,
        "accum_steps": args.accum,
        "image": args.image,
        "remat": args.remat,
        "step_ms": round(dt * 1e3, 1),
        "compile_s": round(compile_s, 1),
        "scheduled_tflops_per_step": round(flops / 1e12, 2) if flops
        else None,
        "mfu_hardware": round(mfu, 4) if mfu else None,
        **mem,
    }
    if args.no_remat_flops and flops:
        out["mfu_algorithmic"] = round(
            args.no_remat_flops / dt / (args.peak_tflops * 1e12), 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
