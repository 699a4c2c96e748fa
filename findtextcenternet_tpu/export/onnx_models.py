"""Self-contained ONNX emitters for the four deployment artifacts.

The reference ships `TextDetector.onnx` / `CodeDecoder.onnx`
(`/root/reference/convert1_onnx.py:29-56`) and `TransformerEncoder.onnx` /
`TransformerDecoder.onnx` (`/root/reference/convert3_onnx.py:39-56`) via
torch.onnx.export. This module builds the same four graphs directly from
the flax variable trees with the wire-format writer in
:mod:`onnx_writer` — no torch / onnx / onnxruntime needed at export time.

Layout follows the reference artifacts: NCHW activations, OIHW conv
weights, identical input/output names, and the same output contracts
(detector emits the 10-channel peak-suppressed map, `CodeDecoder` and
`TransformerDecoder` emit softmaxed per-modulus probabilities,
`TransformerEncoder` emits raw encoder states).
"""
from __future__ import annotations

from typing import Dict, Sequence

import numpy as np

from ..const import FEATURE_DIM, MODULO_LIST
from ..models.detector import HEAD_DIMS, HEAD_NAMES
from ..models.efficientnet import EFFNET_V2_CONFIGS, LAST_CHANNEL
from .onnx_writer import DT_INT64, OnnxGraph


def _np(tree, *keys):
    v = tree
    for k in keys:
        v = v[k]
    return np.asarray(v, np.float32)


def _oihw(kernel_hwio: np.ndarray) -> np.ndarray:
    """flax HWIO conv kernel -> ONNX OIHW."""
    return np.ascontiguousarray(np.transpose(kernel_hwio, (3, 2, 0, 1)))


class QdqContext:
    """Static-int8 QDQ insertion for :func:`emit_detector_qdq`.

    Mirrors the reference's ONNX quantization contract
    (`/root/reference/quantize1_onnx.py:96-117`): QInt8 per-output-channel
    weights, QUInt8 activations from calibrated ranges, with the feature
    head and key-heatmap head excluded. ``act_ranges`` comes from
    :func:`..export.quantize.calibrate_detector_edges`, keyed by flax
    module path — emission threads the same paths.
    """

    def __init__(self, act_ranges, exclude=None):
        import re

        from .quantize import DEFAULT_EXCLUDE

        self.ranges = act_ranges or {}
        self.rx = [re.compile(p) for p in (exclude or DEFAULT_EXCLUDE)]

    def excluded(self, path: str) -> bool:
        return any(r.match(path) for r in self.rx)

    def weight(self, g: "OnnxGraph", w_oihw: np.ndarray, path: str) -> str:
        """Per-output-channel symmetric int8 weight + DequantizeLinear;
        excluded paths return a plain float initializer."""
        if self.excluded(path):
            return g.init(w_oihw, "w")
        amax = np.max(np.abs(w_oihw), axis=(1, 2, 3))
        scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
        q = np.clip(np.round(w_oihw / scale[:, None, None, None]),
                    -127, 127).astype(np.int8)
        return g.node("DequantizeLinear",
                      [g.init(q, "wq"), g.init(scale, "ws")], axis=0)

    def act(self, g: "OnnxGraph", x: str, path: str) -> str:
        """QUInt8 quantize->dequantize pair at a calibrated edge; edges
        without a range (or excluded) pass through in float."""
        if path not in self.ranges or self.excluded(path):
            return x
        lo, hi = self.ranges[path]
        lo, hi = min(lo, 0.0), max(hi, 0.0)   # uint8 range must span 0
        scale = max((hi - lo) / 255.0, 1e-12)
        zp = int(np.clip(round(-lo / scale), 0, 255))
        sc = g.init(np.float32(scale).reshape(()), "as")
        zc = g.init(np.uint8(zp).reshape(()), "az")
        q = g.node("QuantizeLinear", [x, sc, zc])
        return g.node("DequantizeLinear", [q, sc, zc])


class _Emit:
    """Shared node-building helpers over an :class:`OnnxGraph`."""

    def __init__(self, g: OnnxGraph):
        self.g = g

    def conv(self, x: str, params, *, stride=1, groups=1, bias=False,
             pad=None, qdq=None, path="") -> str:
        w = _np(params, "kernel")
        kh = w.shape[0]
        p = (kh - 1) // 2 if pad is None else pad
        wname = (qdq.weight(self.g, _oihw(w), path) if qdq is not None
                 else self.g.init(_oihw(w), "w"))
        inputs = [x, wname]
        if bias:
            inputs.append(self.g.init(_np(params, "bias"), "b"))
        return self.g.node(
            "Conv", inputs, strides=[stride, stride],
            pads=[p, p, p, p], group=groups,
            kernel_shape=[kh, w.shape[1]])

    def bn(self, x: str, params, stats, eps: float) -> str:
        return self.g.node("BatchNormalization", [
            x,
            self.g.init(_np(params, "scale"), "bn_s"),
            self.g.init(_np(params, "bias"), "bn_b"),
            self.g.init(_np(stats, "mean"), "bn_m"),
            self.g.init(_np(stats, "var"), "bn_v"),
        ], epsilon=float(eps))

    def silu(self, x: str) -> str:
        return self.g.node("Mul", [x, self.g.node("Sigmoid", [x])])

    def gelu(self, x: str) -> str:
        return self.g.node("Gelu", [x], approximate="none")

    def matmul(self, x: str, kernel: np.ndarray, bias=None) -> str:
        y = self.g.node("MatMul",
                        [x, self.g.init(np.asarray(kernel, np.float32),
                                        "w")])
        if bias is not None:
            y = self.g.node("Add", [y, self.g.init(
                np.asarray(bias, np.float32), "b")])
        return y

    def dense(self, x: str, params, bias=True) -> str:
        return self.matmul(x, _np(params, "kernel"),
                           _np(params, "bias") if bias else None)

    def add(self, a: str, b: str) -> str:
        return self.g.node("Add", [a, b])

    def layernorm(self, x: str, params, eps: float = 1e-6) -> str:
        return self.g.node("LayerNormalization", [
            x,
            self.g.init(_np(params, "scale"), "ln_s"),
            self.g.init(_np(params, "bias"), "ln_b"),
        ], axis=-1, epsilon=float(eps))


# ---------------------------------------------------------------------------
# detector (TextDetector.onnx)
# ---------------------------------------------------------------------------


def _emit_backbone(e: _Emit, x: str, params, stats, model_size: str,
                   bn_eps: float = 1e-3, qdq=None) -> Sequence[str]:
    """EfficientNetV2 trunk -> the 4 multi-scale taps (NCHW names).

    With ``qdq`` set, weights go int8 per-channel and activations get
    uint8 QDQ pairs at every ConvBNAct output and residual block output
    (keys match :func:`..export.quantize.calibrate_detector_edges`)."""
    cfgs = EFFNET_V2_CONFIGS[model_size]
    tap_stages = {1, 2, 4}

    def cba(x, p, s, mpath, *, stride=1, groups=1, act=True):
        y = e.conv(x, p["conv"], stride=stride, groups=groups, qdq=qdq,
                   path=mpath)
        y = e.bn(y, p["bn"], s["bn"], bn_eps)
        y = e.silu(y) if act else y
        return qdq.act(e.g, y, mpath) if qdq is not None else y

    x = cba(x, params["stem"], stats["stem"], "backbone/stem", stride=2)
    taps = []
    for si, cfg in enumerate(cfgs):
        for li in range(cfg.num_layers):
            stride = cfg.stride if li == 0 else 1
            in_ch = cfg.in_ch if li == 0 else cfg.out_ch
            name = f"stage{si}_block{li}"
            bpath = f"backbone/{name}"
            p, s = params[name], stats[name]
            use_res = stride == 1 and in_ch == cfg.out_ch
            inp = x
            if cfg.fused:
                x = cba(x, p["expand"], s["expand"], f"{bpath}/expand",
                        stride=stride)
                if cfg.expand_ratio != 1:
                    x = cba(x, p["project"], s["project"],
                            f"{bpath}/project", act=False)
            else:
                expanded = in_ch * cfg.expand_ratio
                x = cba(x, p["expand"], s["expand"], f"{bpath}/expand")
                x = cba(x, p["depthwise"], s["depthwise"],
                        f"{bpath}/depthwise", stride=stride,
                        groups=expanded)
                # squeeze-excite
                sq = e.g.node("ReduceMean",
                              [x, e.g.init(np.asarray([2, 3], np.int64),
                                           "ax")], keepdims=1)
                sq = e.conv(sq, p["se"]["fc1"], bias=True, pad=0)
                sq = e.silu(sq)
                sq = e.conv(sq, p["se"]["fc2"], bias=True, pad=0)
                x = e.g.node("Mul", [x, e.g.node("Sigmoid", [sq])])
                x = cba(x, p["project"], s["project"], f"{bpath}/project",
                        act=False)
            if use_res:
                x = e.add(x, inp)
                if qdq is not None:
                    x = qdq.act(e.g, x, bpath)
        if si in tap_stages:
            taps.append(x)
    x = cba(x, params["head"], stats["head"], "backbone/head")
    taps.append(x)
    return taps


def _emit_leafmap(e: _Emit, taps: Sequence[str], params, stats,
                  bn_eps: float = 1e-5, qdq=None, head: str = "") -> str:
    """Per-head upsampling cascade (models/detector.py Leafmap).

    Under ``qdq`` the cascade convs carry per-channel int8 weights
    (weight-only in the heads; excluded heads stay float entirely)."""
    y = None
    n = len(taps)
    for i, x in enumerate(reversed(taps)):
        level = n - 1 - i
        x = e.bn(x, params[f"in_bn{level}"], stats[f"in_bn{level}"], bn_eps)
        if y is not None:
            x = e.g.node("Concat", [y, x], axis=1)
        x = e.conv(x, params[f"up{i}_conv"], qdq=qdq,
                   path=f"{head}/up{i}_conv")
        x = e.bn(x, params[f"up{i}_bn"], stats[f"up{i}_bn"], bn_eps)
        x = e.gelu(x)
        if i < n - 1:
            # scales instead of sizes keeps the graph batch-symbolic;
            # tap grids halve exactly (H,W divisible by 32), so the
            # align-corners output dims are identical either way
            scales = e.g.init(np.asarray([1.0, 1.0, 2.0, 2.0],
                                         np.float32), "sc")
            x = e.g.node("Resize", [x, "", scales], mode="linear",
                         coordinate_transformation_mode="align_corners")
        y = x
    return e.conv(y, params["top_conv"], bias=True, qdq=qdq,
                  path=f"{head}/top_conv")


def emit_detector(variables: Dict, model_size: str = "xl",
                  height: int = 768, width: int = 768,
                  feature_dim: int = FEATURE_DIM, qdq=None,
                  half: bool = False) -> bytes:
    """`TextDetector.onnx`: image [B,3,H,W] in [0,1] ->
    (heatmap [B,10,H/4,W/4], feature [B,F,H/4,W/4]); the batch dim is
    symbolic (one artifact serves every tile-chunk size).

    Includes the 3x3 peak suppression of the reference's export wrapper
    (`/root/reference/models/detector.py:283-296`). ``qdq`` (a
    :class:`QdqContext`) switches to the static-int8 QDQ form — use
    :func:`emit_detector_qdq`.
    """
    if qdq is not None and half:
        raise ValueError("half (fp16 weights) and qdq (int8) are "
                         "mutually exclusive")
    if height % 32 or width % 32:
        raise ValueError("height/width must be divisible by 32")
    params, stats = variables["params"], variables["batch_stats"]
    g = OnnxGraph("TextDetector", half_weights=half)
    e = _Emit(g)
    # symbolic batch: the graph itself is batch-agnostic (Resize uses
    # scales), so one artifact serves every tile-chunk size — matching
    # the StableHLO export's symbolic batch dim
    img = g.add_input("image", ["b", 3, height, width])

    x = g.node("Mul", [img, g.init(np.float32(2.0).reshape(()), "two")])
    x = g.node("Sub", [x, g.init(np.float32(1.0).reshape(()), "one")])
    taps = _emit_backbone(e, x, params["backbone"], stats["backbone"],
                          model_size, qdq=qdq)
    maps = [
        _emit_leafmap(e, taps, params[h], stats[h], qdq=qdq, head=h)
        for h in HEAD_NAMES
    ]
    heat = g.node("Concat", maps, axis=1)
    feature = _emit_leafmap(e, taps, params["feature"],
                            stats["feature"], qdq=qdq, head="feature")

    keymap = g.node("Gather",
                    [heat, g.init(np.asarray([0], np.int64), "i0")], axis=1)
    rest = g.node("Gather",
                  [heat, g.init(np.arange(1, sum(HEAD_DIMS),
                                          dtype=np.int64), "i1")], axis=1)
    local = g.node("MaxPool", [keymap], kernel_shape=[3, 3],
                   strides=[1, 1], pads=[1, 1, 1, 1])
    is_less = g.node("Less", [keymap, local])
    peak = g.node("Where", [
        is_less, g.init(np.float32(-np.inf).reshape(()), "ninf"), keymap])
    g.node("Concat", [keymap, peak, rest], axis=1, out="heatmap")
    g.add_output("heatmap", ["b", sum(HEAD_DIMS) + 1, height // 4,
                             width // 4])
    g.node("Identity", [feature], out="feature")
    g.add_output("feature", ["b", feature_dim, height // 4, width // 4])
    return g.serialize()


def emit_detector_qdq(variables: Dict, act_ranges: Dict,
                      model_size: str = "xl", height: int = 768,
                      width: int = 768,
                      feature_dim: int = FEATURE_DIM) -> bytes:
    """Static-int8 `TextDetector.onnx` (the reference's
    `quantize1_onnx.py` artifact): per-output-channel QInt8 weights,
    calibrated QUInt8 activation QDQ pairs across the backbone, with
    the feature head and key-heatmap head excluded
    (`/root/reference/quantize1_onnx.py:96-117`). ``act_ranges`` from
    :func:`..export.quantize.calibrate_detector_edges`.
    """
    return emit_detector(variables, model_size, height, width,
                         feature_dim, qdq=QdqContext(act_ranges))


# ---------------------------------------------------------------------------
# code decoder (CodeDecoder.onnx)
# ---------------------------------------------------------------------------


def emit_code_decoder(variables: Dict, batch: int = 1,
                      half: bool = False) -> bytes:
    """`CodeDecoder.onnx`: feature [B,F] -> softmaxed modulo_{m} triples
    (reference `CodeDecoder`, `/root/reference/models/detector.py:298-305`).
    """
    params, stats = variables["params"], variables["batch_stats"]
    g = OnnxGraph("CodeDecoder", half_weights=half)
    e = _Emit(g)
    x = g.add_input("feature_input", [batch, FEATURE_DIM])
    for bi, m in enumerate(MODULO_LIST):
        h = x
        for li in range(2):
            h = e.dense(h, params[f"block{bi}_fc{li}"], bias=False)
            h = e.bn(h, params[f"block{bi}_bn{li}"],
                     stats[f"block{bi}_bn{li}"], 1e-5)
            h = e.gelu(h)
        h = e.dense(h, params[f"block{bi}_out"])
        g.node("Softmax", [h], axis=-1, out=f"modulo_{m}")
        g.add_output(f"modulo_{m}", [batch, m])
    return g.serialize()


# ---------------------------------------------------------------------------
# transformer (TransformerEncoder.onnx / TransformerDecoder.onnx)
# ---------------------------------------------------------------------------


def _pos_add(e: _Emit, x: str, table: np.ndarray, seq: int) -> str:
    return e.add(x, e.g.init(table[None, :seq, :].astype(np.float32),
                             "pos"))


def _emit_mha(e: _Emit, q_in: str, params, seq_q: int, embed_dim: int,
              num_heads: int, kv_in: str = None, seq_k: int = None,
              key_mask: str = None) -> str:
    """MultiheadAttn with per-layer positional tables
    (models/transformer.py:89-143)."""
    g = e.g
    hd = embed_dim // num_heads
    pos_q = _np(params, "pos_emb_q", "table")
    if kv_in is None:
        kv_in, seq_k = q_in, seq_q
        pos_k = pos_q
    else:
        pos_k = _np(params, "pos_emb_k", "table")
    qp = _pos_add(e, q_in, pos_q, seq_q)
    kp = _pos_add(e, kv_in, pos_k, seq_k)

    q = e.matmul(qp, _np(params, "q_proj", "kernel"))
    k = e.matmul(kp, _np(params, "k_proj", "kernel"))
    v = e.matmul(kv_in, _np(params, "v_proj", "kernel"))

    def heads(t, seq, perm):
        # leading 0 copies the (symbolic) batch dim through Reshape
        t = g.node("Reshape", [t, g.init(np.asarray(
            [0, seq, num_heads, hd], np.int64), "sh")])
        return g.node("Transpose", [t], perm=list(perm))

    qh = heads(q, seq_q, (0, 2, 1, 3))      # (1,H,Lq,hd)
    kh = heads(k, seq_k, (0, 2, 3, 1))      # (1,H,hd,Lk)
    vh = heads(v, seq_k, (0, 2, 1, 3))      # (1,H,Lk,hd)
    logits = g.node("MatMul", [qh, kh])
    logits = g.node("Mul", [logits, g.init(
        np.float32(1.0 / np.sqrt(hd)).reshape(()), "isq")])
    if key_mask is not None:
        logits = e.add(logits, key_mask)
    attn = g.node("Softmax", [logits], axis=-1)
    out = g.node("MatMul", [attn, vh])      # (1,H,Lq,hd)
    out = g.node("Transpose", [out], perm=[0, 2, 1, 3])
    out = g.node("Reshape", [out, g.init(np.asarray(
        [0, seq_q, embed_dim], np.int64), "sh")])
    return e.matmul(out, _np(params, "out_proj", "kernel"))


def _emit_swiglu(e: _Emit, x: str, params) -> str:
    x1 = e.dense(x, params["w1"])
    xg = e.silu(e.dense(x, params["wg"]))
    return e.dense(e.g.node("Mul", [x1, xg]), params["w2"])


def emit_transformer_encoder(variables: Dict, dims,
                             half: bool = False) -> bytes:
    """`TransformerEncoder.onnx`: (encoder_input [B,L,F+6],
    key_mask [B,1,1,L]) -> encoder_output [B,L,D], symbolic batch
    (reference `TransformerEncoderPredictor`,
    `models/transformer.py:362-370`)."""
    params = variables["params"]["encoder"]
    g = OnnxGraph("TransformerEncoder", half_weights=half)
    e = _Emit(g)
    L, D = dims.max_enc_seq_len, dims.embed_dim
    x = g.add_input("encoder_input", ["b", L, dims.enc_input_dim])
    km = g.add_input("key_mask", ["b", 1, 1, L])

    x = e.matmul(x, _np(params, "embed", "kernel"))
    x = _pos_add(e, x, _np(params, "pos_emb", "table"), L)
    x = e.layernorm(x, params["norm"])
    for i in range(dims.enc_block_num):
        bp = params[f"block{i}"]
        skip = x
        x = _emit_mha(e, x, bp["mha"], L, D, dims.head_num, key_mask=km)
        x = e.layernorm(e.add(x, skip), bp["norm1"])
        ffn_in = x
        x = _emit_swiglu(e, x, bp["ff"])
        # B2T residual: + ffn input + block input
        x = e.layernorm(e.add(e.add(x, ffn_in), skip), bp["norm2"])
    g.node("Identity", [x], out="encoder_output")
    g.add_output("encoder_output", ["b", L, D])
    return g.serialize()


def emit_transformer_decoder(variables: Dict, dims,
                             half: bool = False) -> bytes:
    """`TransformerDecoder.onnx`: (encoder_output [B,Le,D],
    decoder_input [B,Ld] int64, key_mask [B,1,1,Le]) -> softmaxed
    modulo_{m} logits, symbolic batch (reference
    `TransformerDecoderPredictor`, `models/transformer.py:387-395`)."""
    params = variables["params"]["decoder"]
    g = OnnxGraph("TransformerDecoder", half_weights=half)
    e = _Emit(g)
    Le, Ld, D = dims.max_enc_seq_len, dims.max_dec_seq_len, dims.embed_dim
    enc = g.add_input("encoder_output", ["b", Le, D])
    tok = g.add_input("decoder_input", ["b", Ld], dtype=DT_INT64)
    km = g.add_input("key_mask", ["b", 1, 1, Le])

    # modulo-sum embedding
    x = None
    for i, m in enumerate(MODULO_LIST):
        res = g.node("Mod", [tok, g.init(np.asarray(m, np.int64), "m")])
        emb = g.node("Gather", [
            g.init(_np(params, f"embed{i}", "embedding"), "emb"), res],
            axis=0)
        x = emb if x is None else e.add(x, emb)
    x = _pos_add(e, x, _np(params, "pos_emb", "table"), Ld)
    x = e.layernorm(x, params["norm"])
    for i in range(dims.dec_block_num):
        bp = params[f"block{i}"]
        skip = x
        x = _emit_mha(e, x, bp["self_attn"], Ld, D, dims.head_num)
        x = e.layernorm(e.add(x, skip), bp["norm1"])
        cross_in = x
        x = _emit_mha(e, x, bp["cross_attn"], Ld, D, dims.head_num,
                      kv_in=enc, seq_k=Le, key_mask=km)
        x = e.layernorm(e.add(x, cross_in), bp["norm2"])
        ffn_in = x
        x = _emit_swiglu(e, x, bp["ff"])
        x = e.layernorm(e.add(e.add(x, ffn_in), skip), bp["norm3"])
    for i, m in enumerate(MODULO_LIST):
        h = e.dense(x, params[f"out{i}"])
        g.node("Softmax", [h], axis=-1, out=f"modulo_{m}")
        g.add_output(f"modulo_{m}", ["b", Ld, m])
    return g.serialize()


# ---------------------------------------------------------------------------
# CLI: write all four artifacts from checkpoints
# ---------------------------------------------------------------------------


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(
        description="Write the 4 reference-format ONNX artifacts from "
                    "torch checkpoints (self-contained, no onnx package).")
    ap.add_argument("--detector-ckpt", help="reference-format model.pt")
    ap.add_argument("--transformer-ckpt", help="reference-format model3.pt")
    ap.add_argument("--model-size", default="xl")
    ap.add_argument("--height", type=int, default=768)
    ap.add_argument("--width", type=int, default=768)
    ap.add_argument("--outdir", default=".")
    ap.add_argument("--int8", action="store_true",
                    help="also write TextDetector.quant.onnx (static QDQ; "
                         "reference quantize1_onnx.py equivalent)")
    ap.add_argument("--fp16", action="store_true",
                    help="write the artifacts with float16 weight storage "
                         "(+Cast to f32 at use; half-size files — the "
                         "reference convert_fp16_onnx.py equivalent) "
                         "instead of f32")
    ap.add_argument("--calib-npy", default=None,
                    help="calibration images (N,H,W,3) float [0,1]; "
                         "factory pages are generated when omitted")
    args = ap.parse_args(argv)

    import os

    from ..io.torch_import import load_torch_state_dict

    if args.detector_ckpt:
        from ..io.torch_import import import_detector
        full = import_detector(load_torch_state_dict(args.detector_ckpt),
                               args.model_size)
        det_vars = {"params": full["params"]["detector"],
                    "batch_stats": full["batch_stats"]["detector"]}
        p = os.path.join(args.outdir, "TextDetector.onnx")
        with open(p, "wb") as f:
            f.write(emit_detector(det_vars, args.model_size,
                                  args.height, args.width,
                                  half=args.fp16))
        print(p)
        if args.int8:
            from ..models.detector import CenterNetDetection
            from .quantize import calibrate_detector_edges
            model = CenterNetDetection(model_size=args.model_size)
            if args.calib_npy:
                imgs = np.load(args.calib_npy)
                batches = [imgs[i:i + 1] for i in range(len(imgs))]
            else:
                from ..factory import PageGenerator
                from ..factory.rasterizer import find_fonts
                gen = PageGenerator(find_fonts(), width=args.width,
                                    height=args.height, seed=0)
                batches = [np.stack([gen.generate()["image"]] * 3,
                                    -1)[None].astype(np.float32) / 255.0
                           for _ in range(8)]
            ranges = calibrate_detector_edges(model, det_vars, batches)
            p = os.path.join(args.outdir, "TextDetector.quant.onnx")
            with open(p, "wb") as f:
                f.write(emit_detector_qdq(det_vars, ranges,
                                          args.model_size, args.height,
                                          args.width))
            print(p)
        if "decoder" in full["params"]:
            dec_vars = {"params": full["params"]["decoder"],
                        "batch_stats": full["batch_stats"]["decoder"]}
            p = os.path.join(args.outdir, "CodeDecoder.onnx")
            with open(p, "wb") as f:
                f.write(emit_code_decoder(dec_vars, half=args.fp16))
            print(p)
    if args.transformer_ckpt:
        from ..config import Config
        from ..io.torch_import import import_transformer
        from ..models.transformer import TransformerDims
        t = Config().transformer
        dims = TransformerDims(
            enc_input_dim=t.enc_input_dim, embed_dim=t.embed_dim,
            head_num=t.head_num, enc_block_num=t.enc_block_num,
            dec_block_num=t.dec_block_num,
            max_enc_seq_len=t.max_enc_seq_len,
            max_dec_seq_len=t.max_dec_seq_len)
        tr_vars = import_transformer(
            load_torch_state_dict(args.transformer_ckpt), dims)
        p = os.path.join(args.outdir, "TransformerEncoder.onnx")
        with open(p, "wb") as f:
            f.write(emit_transformer_encoder(tr_vars, dims,
                                             half=args.fp16))
        print(p)
        p = os.path.join(args.outdir, "TransformerDecoder.onnx")
        with open(p, "wb") as f:
            f.write(emit_transformer_decoder(tr_vars, dims,
                                             half=args.fp16))
        print(p)


if __name__ == "__main__":
    main()
