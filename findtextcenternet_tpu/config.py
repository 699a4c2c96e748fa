"""Typed configuration for the whole framework.

The reference scatters knobs across hand-parsed ``--key=value`` argv, module
globals and C++ flag defaults (`/root/reference/train1.py:246-266`,
`/root/reference/textline_detect/src/main.cpp:17-30`). Here everything lives
in frozen dataclasses that serialize to/from plain dicts (JSON) so configs
can be checkpointed alongside weights.
"""
from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Tuple

from . import const


@dataclass(frozen=True)
class DetectorConfig:
    """CenterNet-style text detector."""
    model_size: str = "xl"               # s / m / l / xl
    # rematerialize backbone blocks in training (activation memory for
    # ~30% extra FLOPs; lets xl train at batch 32 on one chip)
    remat: bool = False
    feature_dim: int = const.FEATURE_DIM
    head_conv_dim: int = 192             # Leafmap internal width
    bn_eps_backbone: float = 1e-3
    bn_eps_head: float = 1e-5
    bn_momentum: float = 0.9             # running-stat decay (1 - torch 0.1)
    image_size: Tuple[int, int] = (const.IMAGE_HEIGHT, const.IMAGE_WIDTH)
    scale: int = const.SCALE
    # SimpleDecoder (CRT auxiliary classifier)
    decoder_mid_dim: int = 2048
    # training-time top-k feature pixels per sample fed to the aux decoder
    fmask_topk_per_sample: int = 1024

    @property
    def map_size(self) -> Tuple[int, int]:
        return (self.image_size[0] // self.scale, self.image_size[1] // self.scale)


@dataclass(frozen=True)
class TransformerConfig:
    """Encoder-decoder text transformer (mask-predict NAR decoding)."""
    enc_input_dim: int = const.ENCODER_DIM
    embed_dim: int = 768
    head_num: int = 12
    enc_block_num: int = 10
    dec_block_num: int = 10
    max_enc_seq_len: int = const.MAX_ENCODER_LEN
    max_dec_seq_len: int = const.MAX_DECODER_LEN
    dropout: float = 0.0
    # attention implementation for train3/eval model builds: "xla"
    # einsum, "fused" (Pallas single-tile, custom VJP — serves training
    # only while dropout == 0.0, the reference's actual config), or
    # "auto" (default): fused on TPU, einsum elsewhere (off-TPU Pallas
    # runs in interpret mode, far slower than the einsum). Measured on
    # the v5e at the production train3 step (batch 32, 400/400):
    # 229.6 ms/step fused vs 322.1 ms xla — 1.40x (docs/PERFORMANCE.md).
    # Inference decode parity is governed separately by
    # InferenceConfig.decode_attention (default "xla").
    attn_impl: str = "auto"


@dataclass(frozen=True)
class MaskPredictConfig:
    """Iterative mask-predict inference loop."""
    max_rounds: int = 8
    topk: int = 3                 # per-modulus candidates in CRT combine
    remask_threshold: float = 0.9
    early_stop_threshold: float = 0.99


@dataclass(frozen=True)
class LineEngineConfig:
    """Text-line ordering engine thresholds (native engine flags)."""
    ruby_cutoff: float = 0.25
    rubybase_cutoff: float = 0.75
    space_cutoff: float = 0.5
    emphasis_cutoff: float = 0.5
    line_valueth: float = 0.4
    sep_valueth: float = 0.1
    sep_valueth2: float = 0.15
    sep_clusterth: float = 10.0
    allowwidth_next_block: float = 1.5
    allow_sizediff: float = 0.5
    page_divide: float = 0.0
    scale: int = const.SCALE


@dataclass(frozen=True)
class InferenceConfig:
    """Sliding-window page OCR."""
    tile_size: int = const.IMAGE_WIDTH
    stride_ratio: float = 0.6
    peak_cutoff: float = 0.4
    max_peaks_per_tile: int = 1024
    detector_batch: int = 8       # tiles per detector call (reference: 1)
    iou_threshold: float = 0.5
    overlap_threshold: float = 0.75
    fill_ratio_threshold: float = 0.5
    resize: float = 1.0
    # transformer matmul compute dtype at inference. "float32" matches
    # the reference torch backend's numerics exactly; "bfloat16" mirrors
    # its fp16 CoreML/ONNX deployments. Measured on the v5e: decode at
    # production size is kernel-launch-bound, not matmul-bound (78 ms
    # for 4x400-token windows either way), so f32 default costs nothing
    decode_dtype: str = "float32"
    # attention implementation for inference decode: "xla" is the
    # einsum composition (scores round-trip HBM; exact-match anchor for
    # the artifact drivers), "fused" the single-tile Pallas kernel
    # (same math, scores stay in VMEM — see ops/attention.py).
    # "fused" is a supported serving flag: at TRAINED weights the two
    # lowerings decode identically (64/64 windows over two independent
    # v5e captures, 0.994 mean confidence, char accuracy 1.0 —
    # tools/trained_margin_check, docs/margin_gate_r5.json); "xla"
    # stays default as the exact-parity anchor for artifact diffing
    decode_attention: str = "xla"
    # hard cap on decode windows per device call. Mask-predict at
    # production dims holds a (B, heads, 400, 400) f32 score tensor per
    # self-attention (7.7 MB/window/head-group); an uncapped batch on a
    # box-dense page (or a random-weight smoke run) can demand tens of
    # GB and OOM the chip. 64 windows ~= 0.5 GB of scores — far more
    # windows than any real page in one call, small enough to never
    # threaten HBM. Chunks dispatch back-to-back (async), so the device
    # pipeline stays full across chunks.
    decode_max_batch: int = 64
    # opt-in decode sequence-length buckets (sorted ascending, e.g.
    # (64, 128, 256, 400)). Each window decodes in the smallest bucket
    # that fits its content + estimated ruby expansion; attention cost
    # is quadratic in the bucket, so short windows stop paying the full
    # 400-token graph (a box-dense page under degenerate detections can
    # emit hundreds of <10-token windows). Empty = always decode at the
    # full production length — the exact-parity default: the reference
    # decodes 400 positions with UNMASKED decoder self-attention
    # (/root/reference/models/transformer.py:281-359), so its padded
    # tail genuinely participates in every softmax and a shorter graph
    # is not bit-identical (near-tie argmax flips are possible; same
    # failure class as the demoted fused-attention decode lever).
    decode_len_buckets: Tuple[int, ...] = ()
    # opt-in (0 = off, the exact-parity default) bound on decode windows
    # per page. The reference's window splitter cuts at every direction
    # change / paragraph break / ruby boundary with NO count bound
    # (/root/reference/process_ocr_base.py:186-283), so a garbage or
    # adversarial page — or an untrained detector — can shred a page
    # into hundreds of near-empty windows, each paying a full decode
    # graph: unbounded tail latency in production serving. With
    # max_windows_per_page = N, a page whose normal split exceeds N is
    # re-split on the length budget alone (direction/ruby cut rules
    # dropped — the page is degenerate by construction, so the windows'
    # semantic hygiene no longer matters), bounding windows at
    # ceil(stream/budget); anything still beyond N is truncated. Real
    # pages at trained statistics split into ~4 windows and never hit
    # the guard.
    max_windows_per_page: int = 0
    # page maps (line/seps/codes) ship device->host as uint8 (4x less
    # transfer; 1/255 resolution sits far below every downstream
    # threshold on real detector output). False ships f32 — used by the
    # differential parity gate's bulk stress, where synthetic pages can
    # land exactly on engine thresholds and the quantization delta
    # (not a logic difference) would flip knife-edge comparisons
    quantize_maps: bool = True
    # single-chip fast path: glyph features never leave the device. The
    # per-chunk (B, K, feature_dim) f16 feature buffers stay resident,
    # the host tracks only int indices through filter/line-engine/
    # windowing, and the decode graph gathers the rows on device —
    # eliminating the dominant per-page readback (~2.5 MB f16 per 12-tile
    # page on a ~22 MB/s tunnel link) AND its re-upload at decode time.
    # Bit-exact with the readback path: the f16 buffer is the same
    # detector output, and f16->f32 casting commutes with the gather
    # (tests/test_device_features.py). Host code that genuinely needs
    # the values (harvest, annotate) materializes via np.asarray, which
    # reads back only the KEPT rows (~8x less than the full buffers).
    # Applies to the live single-chip fused path only (exported/ONNX/
    # CoreML backends decode through fixed-signature artifacts; the
    # mesh path shards the tile batch, keeping the host merge).
    device_features: bool = True
    # single-chip fast path: merge the per-tile line/sep/code maps into
    # one page mosaic ON DEVICE and sample the 3x3 code max-pool there,
    # so only the 2-channel line/sep mosaic ships to the host instead of
    # 6 channels per overlapping tile (~5x less map readback on the
    # tunnel), and the host per-tile merge loop disappears. Bit-exact
    # with the host merge (max-merges and the uint8 dequantization are
    # monotone and commute; tests/test_pipeline.py fused-vs-host gate).
    # Ignored under a mesh (the mosaic is page-global; the multi-chip
    # serving path keeps the host merge).
    fused_page_merge: bool = True


@dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 32
    learning_rate: float = 2.5e-3
    weight_decay: float = 0.0
    epochs: int = 40
    accum_steps: int = 1
    warmup_steps: int = 1000
    bn_recalib_batches: int = 50
    # preemption safety: also checkpoint mid-epoch every N steps (0: off)
    checkpoint_every_steps: int = 0
    checkpoint_dir: str = "result1"
    log_every: int = 100
    seed: int = 0
    # mesh
    data_axis: int = -1          # -1: all devices on data axis
    model_axis: int = 1
    # ZeRO-1: shard otherwise-replicated optimizer-state leaves over the
    # data axis (parallel.state_shardings). Required to fit the xl
    # detector flagship step at 8 devices (AOT: 16.28 -> under-HBM).
    zero1: bool = False


@dataclass(frozen=True)
class Config:
    detector: DetectorConfig = field(default_factory=DetectorConfig)
    transformer: TransformerConfig = field(default_factory=TransformerConfig)
    mask_predict: MaskPredictConfig = field(default_factory=MaskPredictConfig)
    line_engine: LineEngineConfig = field(default_factory=LineEngineConfig)
    inference: InferenceConfig = field(default_factory=InferenceConfig)
    train: TrainConfig = field(default_factory=TrainConfig)


def to_dict(cfg: Any) -> dict:
    return dataclasses.asdict(cfg)


def to_json(cfg: Any) -> str:
    return json.dumps(to_dict(cfg), indent=2)


def _from_dict(cls, d: dict):
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in d:
            continue
        v = d[f.name]
        if isinstance(v, list):
            v = tuple(v)
        kwargs[f.name] = v
    return cls(**kwargs)


def config_from_dict(d: dict) -> Config:
    sub = {
        "detector": DetectorConfig,
        "transformer": TransformerConfig,
        "mask_predict": MaskPredictConfig,
        "line_engine": LineEngineConfig,
        "inference": InferenceConfig,
        "train": TrainConfig,
    }
    kwargs = {}
    for name, cls in sub.items():
        if name in d:
            kwargs[name] = _from_dict(cls, d[name])
    return Config(**kwargs)


def config_from_json(s: str) -> Config:
    return config_from_dict(json.loads(s))
