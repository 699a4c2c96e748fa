"""End-to-end page OCR pipeline.

Behavioral equivalent of the reference pipeline
(`/root/reference/process_ocr_base.py`), redesigned for TPU throughput:

* sliding 768x768 window, stride 0.6, white padding — but detector tiles
  run **batched** through one jitted call (the reference runs them one at
  a time), with peak extraction fused on device (`ops/peaks.py`);
* histogram-contrast filter, greedy IoU dedup, separator rejection and
  3x3 code max-pool on the host (tiny arrays);
* reading order via the native line engine (in-process ctypes);
* transformer windows are decoded in **one batched mask-predict call**
  (the reference loops windows one by one);
* JSON output: per-box / per-line / per-block entries + text with ruby
  markup, aozora and noruby variants.
"""
from __future__ import annotations

import dataclasses
import json
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..config import Config
from ..const import (
    DECODER_EOT,
    DECODER_PAD,
    DECODER_SOT,
    ENCODER_DIM,
    FEATURE_DIM,
    MAX_CODEPOINT,
    MAX_ENCODER_LEN,
    SCALE,
)
from ..models.detector import CenterNetDetection
from ..models.transformer import Transformer, TransformerDims, mask_predict
from ..ops.peaks import extract_peaks
from ..utils.text import decode_ruby
from . import hostops, lineengine

UNICODE_WHITESPACE = set(
    "\t\n\x0b\x0c\r\x1c\x1d\x1e\x1f \x85\xa0     "
    "           "
    "　")


def image_hist_contrast(im: np.ndarray) -> float:
    """2-means cluster distance of the pixel histogram (max over RGB).

    Same contrast statistic as the reference's ``imageHist``
    (`/root/reference/process_ocr_base.py:652-693`).
    """
    def cluster_dist(hist):
        s = hist.sum()
        if s == 0:
            return 0.0
        i = np.arange(hist.shape[0])
        v = hist * i
        mean = v.sum() / s
        lo, hi = hist[: int(mean + 0.5)], hist[int(mean + 0.5):]
        if lo.sum() == 0 or hi.sum() == 0:
            return 0.0
        k1 = (v[: int(mean + 0.5)]).sum() / lo.sum()
        k2 = (v[int(mean + 0.5):]).sum() / hi.sum()
        d_prev, d = 256.0, abs(k1 - k2)
        while d_prev != d:
            d_prev = d
            m1 = np.abs(i - k1) < np.abs(i - k2)
            s1, s2 = hist[m1].sum(), hist[~m1].sum()
            if s1 == 0 or s2 == 0:
                return 0.0
            k1 = v[m1].sum() / s1
            k2 = v[~m1].sum() / s2
            d = abs(k1 - k2)
        return d

    best = -1.0
    flat = im.reshape(-1, im.shape[-1])
    for c in range(im.shape[-1]):
        # bincount beats np.histogram ~10x for uint8 crops (host hot path)
        hist = np.bincount(flat[:, c].astype(np.uint8, copy=False),
                           minlength=256)
        best = max(best, cluster_dist(hist))
    return best


def batch_hist_contrast(img: np.ndarray, rects: np.ndarray) -> np.ndarray:
    """Vectorized :func:`image_hist_contrast` over N crop rectangles.

    rects: (N, 4) int [x0, y0, x1, y1], already clamped. One bincount per
    crop builds all three channel histograms at once; the 2-means runs
    over all N*3 histograms simultaneously (identical fixed point to the
    scalar loop). ~30x faster than per-box calls on a 1.5k-box page.
    """
    n = len(rects)
    if n == 0:
        return np.zeros((0,), np.float32)
    C = img.shape[-1]
    hists = np.zeros((n, C, 256), np.float64)
    off = (np.arange(C) * 256)[None, :]
    for k, (x0, y0, x1, y1) in enumerate(rects):
        crop = img[y0:y1, x0:x1].reshape(-1, C).astype(np.uint8,
                                                       copy=False)
        h = np.bincount((crop.astype(np.int64) + off).ravel(),
                        minlength=C * 256)
        hists[k] = h.reshape(C, 256)

    h = hists.reshape(n * C, 256)
    i = np.arange(256, dtype=np.float64)
    v = h * i
    s = h.sum(-1)
    valid = s > 0
    dist = np.zeros(n * C)
    mean = np.where(valid, v.sum(-1) / np.maximum(s, 1), 0.0)
    split = (mean + 0.5).astype(np.int64)
    cs_h = np.cumsum(h, -1)
    cs_v = np.cumsum(v, -1)
    lo_s = np.where(split > 0, np.take_along_axis(
        cs_h, np.maximum(split - 1, 0)[:, None], 1)[:, 0], 0.0)
    lo_v = np.where(split > 0, np.take_along_axis(
        cs_v, np.maximum(split - 1, 0)[:, None], 1)[:, 0], 0.0)
    hi_s = s - lo_s
    hi_v = v.sum(-1) - lo_v
    live = valid & (lo_s > 0) & (hi_s > 0)
    k1 = np.where(live, lo_v / np.maximum(lo_s, 1), 0.0)
    k2 = np.where(live, hi_v / np.maximum(hi_s, 1), 0.0)
    d = np.abs(k1 - k2)
    d_prev = np.full_like(d, 256.0)
    # Iterate to fixpoint like the native hostops path and the reference
    # imageHist (process_ocr_base.py:652-693).  Lloyd's on a 256-bin 1-D
    # histogram converges in far fewer steps; the cap is a safety net
    # against a (theoretical) tie-cycle and is logged if ever hit.
    for it in range(2048):
        upd = live & (d_prev != d)
        if not upd.any():
            break
        d_prev = d.copy()
        m1 = np.abs(i[None, :] - k1[:, None]) < \
            np.abs(i[None, :] - k2[:, None])
        s1 = (h * m1).sum(-1)
        s2 = s - s1
        dead = upd & ((s1 == 0) | (s2 == 0))
        live &= ~dead
        d[dead] = 0.0
        ok = upd & ~dead
        k1 = np.where(ok, (v * m1).sum(-1) / np.maximum(s1, 1), k1)
        k2 = np.where(ok, (v * ~m1).sum(-1) / np.maximum(s2, 1), k2)
        d = np.where(ok, np.abs(k1 - k2), d)
    else:
        import logging
        logging.getLogger(__name__).warning(
            "batch_hist_contrast hit the %d-iteration cap before "
            "convergence", it + 1)
    dist = np.where(live, d, dist)
    dist[~valid] = 0.0
    return dist.reshape(n, C).max(-1).astype(np.float32)


@dataclasses.dataclass
class DetectedPage:
    locations: np.ndarray      # (N, 9): score, cx, cy, w, h, code1..4
    features: np.ndarray      # (N, FEATURE_DIM) — or LazyFeatures view
    lines: np.ndarray          # page textline prob map (H/4, W/4)
    seps: np.ndarray           # page separator prob map


# flat f16 row gather + f32 cast, on device. jit caches per (buffer,
# index-bucket) shape; LazyFeatures pads indices to a power-of-two
# bucket so page-to-page variation in kept-box count reuses graphs.
_GATHER_F32 = jax.jit(lambda F, i: F[i].astype(jnp.float32))
# flatten + concatenate the per-chunk (B, K, fdim) buffers into the
# page feature matrix, once per page (one async dispatch)
_CONCAT_FEATS = jax.jit(
    lambda *bufs: jnp.concatenate(
        [b.reshape(-1, b.shape[-1]) for b in bufs], 0))


class LazyFeatures:
    """Device-resident glyph features addressed by host-side indices.

    ``dev`` is the page's flat (N, feature_dim) f16 buffer on device;
    ``idx`` the int64 row indices of this view. Filtering/reordering
    stages only ever index rows (``feats[keep]``), which here costs a
    numpy index-array slice; the values cross the link only if a
    consumer materializes (``np.asarray``) — and then only the kept
    rows. The decode path never materializes: it ships the indices and
    gathers inside the decode graph (InferenceConfig.device_features).
    """

    ndim = 2

    def __init__(self, dev, idx):
        self.dev = dev
        self.idx = np.asarray(idx, np.int64).reshape(-1)

    @property
    def shape(self):
        return (len(self.idx), int(self.dev.shape[-1]))

    def __len__(self):
        return len(self.idx)

    def __getitem__(self, k):
        return LazyFeatures(self.dev, self.idx[k])

    def __array__(self, dtype=None, copy=None):
        n = len(self.idx)
        fdim = int(self.dev.shape[-1])
        if n == 0:
            out = np.zeros((0, fdim), np.float32)
        else:
            b = 1
            while b < n:
                b *= 2
            pad = np.zeros(b, np.int64)
            pad[:n] = self.idx
            out = np.asarray(_GATHER_F32(self.dev, jnp.asarray(pad)))[:n]
        return out.astype(dtype) if dtype is not None else out

    def astype(self, dtype):
        return np.asarray(self).astype(dtype)


class FeatureStream(np.ndarray):
    """Encoder stream whose glyph-feature columns live on device.

    A plain (total, enc_dim) f32 array view — the host-computed flag /
    separator columns are real; the [:feature_dim] block of glyph rows
    is zero, with ``glyph_idx`` (total,) int64 mapping each row to its
    row in ``glyph_dev`` (-1 for separator rows). ``decode_windows``
    ships the indices and gathers on device.
    """

    glyph_idx: Optional[np.ndarray] = None
    glyph_dev = None

    def __array_finalize__(self, obj):
        # Derived arrays (slices, copies, astype, concatenate results)
        # deliberately do NOT inherit glyph_idx/glyph_dev: a transformed
        # view's rows no longer line up with the device buffer, so
        # propagating the attributes would gather the wrong glyph rows.
        # They stay at the class defaults (None); decode_windows raises
        # on a FeatureStream whose indices were lost rather than
        # silently decoding the zero glyph columns.
        self.glyph_idx = None
        self.glyph_dev = None


class OCRPipeline:
    def __init__(self, config: Config = Config(),
                 detector_variables=None, transformer_variables=None,
                 model_size: Optional[str] = None, seed: int = 0,
                 detector_apply=None, decode_fn=None, mesh=None):
        """``detector_apply``/``decode_fn`` override the model calls while
        keeping every pipeline stage intact — the hook the differential
        parity test uses to run identical nets through this pipeline and
        the reference's ``process_ocr_base`` oracle.

        detector_apply(variables, images) -> (heatmap (B,H/4,W/4,9),
        features (B,H/4,W/4,F)); decode_fn(variables, enc_input) ->
        (codes (B,400), probs).

        ``mesh``: a ``('data','model')`` :func:`..parallel.make_mesh`
        mesh shards inference across chips — tile batches and decode
        window buckets split over the ``data`` axis with replicated
        weights (GSPMD inserts no collectives in the forward pass, so
        detector throughput scales linearly over ICI). Requires
        ``inference.detector_batch`` divisible by the data-axis size;
        window buckets are padded up to it. The reference has no
        multi-device serving path (SURVEY.md §2.8) — this is new design.
        """
        self.cfg = config
        size = model_size or config.detector.model_size
        self.detector = CenterNetDetection(
            model_size=size, feature_dim=config.detector.feature_dim,
            dtype=jnp.bfloat16)
        dims = TransformerDims(
            enc_input_dim=config.transformer.enc_input_dim,
            embed_dim=config.transformer.embed_dim,
            head_num=config.transformer.head_num,
            enc_block_num=config.transformer.enc_block_num,
            dec_block_num=config.transformer.dec_block_num,
            max_enc_seq_len=config.transformer.max_enc_seq_len,
            max_dec_seq_len=config.transformer.max_dec_seq_len)
        # decode matmul dtype is a config knob (params stay f32 either
        # way; norms + residue logits always f32) — see
        # InferenceConfig.decode_dtype
        self.transformer = Transformer(
            dims, dtype=jnp.dtype(config.inference.decode_dtype),
            attn_impl=config.inference.decode_attention)

        key = jax.random.PRNGKey(seed)
        tile = config.inference.tile_size
        if detector_variables is None and detector_apply is None:
            detector_variables = self.detector.init(
                key, jnp.zeros((1, tile, tile, 3)))
        if transformer_variables is None and decode_fn is None:
            transformer_variables = self.transformer.init(
                key, jnp.zeros((1, dims.max_enc_seq_len, dims.enc_input_dim)),
                jnp.zeros((1, dims.max_dec_seq_len), jnp.int32))
        self.det_vars = detector_variables
        self.tf_vars = transformer_variables
        # optional CRT auxiliary classifier (per-box decode in tools)
        self.simple_decoder_vars = None

        mp = config.mask_predict
        ic = config.inference

        # device-resident glyph features: live single-chip fused path
        # only (exported/ONNX/CoreML decode_fns are fixed-signature
        # artifacts; the mesh path keeps the host merge) — see
        # InferenceConfig.device_features
        self._lazy_features = bool(
            ic.device_features and ic.fused_page_merge
            and mesh is None and decode_fn is None)

        self.mesh = mesh
        self._min_bucket = 1
        repl = data = None
        if mesh is not None:
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P
            n_data = mesh.shape["data"]
            if ic.detector_batch % n_data:
                raise ValueError(
                    f"inference.detector_batch={ic.detector_batch} must be "
                    f"divisible by the mesh data axis ({n_data})")
            self._min_bucket = n_data
            repl = NamedSharding(mesh, P())
            data = NamedSharding(mesh, P("data"))
            if self.det_vars is not None:
                self.det_vars = jax.device_put(self.det_vars, repl)
            if self.tf_vars is not None:
                self.tf_vars = jax.device_put(self.tf_vars, repl)

        apply_fn = detector_apply or self.detector.apply
        self._apply_fn = apply_fn   # tools (annotate) reuse the same net

        def _detect(variables, images, bounds):
            # tiles ship to the device as uint8 (4x less transfer over
            # the device link than f32); the [0,1] scaling happens here,
            # bitwise identical to a host-side /255
            if images.dtype == jnp.uint8:
                images = images.astype(jnp.float32) / 255.0
            heatmap, features = apply_fn(variables, images)
            # tile-ownership region built on device from (B,4) int32
            # [x_min, x_max, y_min, y_max) map-scale bounds — a 16-byte
            # upload per tile instead of the (B, ms, ms) bool masks the
            # host used to build and ship (~0.3 MB/chunk on the tunnel)
            mh, mw = heatmap.shape[1:3]
            yy = jax.lax.broadcasted_iota(jnp.int32, (mh, mw), 0)[None]
            xx = jax.lax.broadcasted_iota(jnp.int32, (mh, mw), 1)[None]
            region = ((xx >= bounds[:, 0, None, None]) &
                      (xx < bounds[:, 1, None, None]) &
                      (yy >= bounds[:, 2, None, None]) &
                      (yy < bounds[:, 3, None, None]))
            peaks = extract_peaks(heatmap, features,
                                  max_peaks=ic.max_peaks_per_tile,
                                  threshold=ic.peak_cutoff,
                                  region_mask=region)
            # every per-peak scalar packs into ONE (B, K, 10) f32 buffer
            # [score, x, y, w, h, code1..4, valid] so the host pays a
            # single readback round trip instead of seven (the axon
            # tunnel charges ~29 ms RTT per dependent readback). x/y are
            # < 2^24 so the f32 round trip is exact; everything else was
            # already f32.
            packed = jnp.concatenate([
                peaks["score"][..., None],
                peaks["x"].astype(jnp.float32)[..., None],
                peaks["y"].astype(jnp.float32)[..., None],
                peaks["w"][..., None],
                peaks["h"][..., None],
                peaks["codes"],
                peaks["valid"].astype(jnp.float32)[..., None],
            ], axis=-1)
            # glyph features ship to the host as f16 — the dominant
            # readback (batch x 1024 peaks x 100 dims); the reference's
            # own transformer data path stores features as float16
            # (/root/reference/dataset/data_transformer.py:398-414), so
            # the precision is parity-safe by construction
            feature = peaks["feature"].astype(jnp.float16)

            # page maps ship to the host as uint8 (4x less transfer over
            # the device link; 1/255 resolution is far below every
            # downstream threshold)
            def q8(x):
                p = jax.nn.sigmoid(x.astype(jnp.float32))
                if not ic.quantize_maps:
                    return p
                return jnp.round(p * 255).astype(jnp.uint8)

            # only the maps the host consumes ship back: line/seps feed
            # the line engine, codes feed the 3x3 code max-pool filter —
            # stacked into ONE (B, ms, ms, 6) buffer (one readback) and
            # pre-masked by the ownership region on device (the host
            # used to multiply by the same mask after dequantization;
            # masking 0/1 commutes with the uint8 quantization exactly)
            maps = jnp.concatenate([
                q8(heatmap[..., 3])[..., None],
                q8(heatmap[..., 4])[..., None],
                q8(heatmap[..., 5:9]),
            ], axis=-1)
            maps = maps * region[..., None].astype(maps.dtype)
            return packed, feature, maps

        def _page_tiles(page, offs):
            # the page ships to the device ONCE as uint8 and tiles are
            # cut on-device with dynamic_slice — the 0.6-stride grid
            # overlaps tiles ~2.4x, so host-side tiling re-uploads every
            # overlap; bit-identical to host slicing. Cost: one compile
            # per padded page shape (the persistent cache makes repeats
            # free; book runs share one shape). A 2-D page is the
            # grayscale upload fast path (run_detector ships one channel
            # when all three are equal — every book scan — and the
            # broadcast back to 3 channels happens here, for free inside
            # the conv fusion).
            ts = ic.tile_size
            if page.ndim == 2:
                def cut2(off):
                    return jax.lax.dynamic_slice(
                        page, (off[1], off[0]), (ts, ts))
                tiles = jax.vmap(cut2)(offs)
                return jnp.broadcast_to(tiles[..., None],
                                        tiles.shape + (3,))

            def cut(off):
                return jax.lax.dynamic_slice(
                    page, (off[1], off[0], jnp.zeros((), off.dtype)),
                    (ts, ts, 3))

            return jax.vmap(cut)(offs)

        def _detect_page(variables, page, offs, bounds):
            return _detect(variables, _page_tiles(page, offs), bounds)

        def _merge_maps(mosaic, maps, offs):
            # max-merge the chunk's pre-masked (B, ms, ms, C) tile maps
            # into the page mosaic at their offsets. Padded tile slots
            # carry all-zero ownership masks, so their maps are zero and
            # the max is a no-op. Sequential over B (the slices overlap
            # at tile seams, so a scatter would race); each step is one
            # VPU-sized dynamic_update_slice.
            ms_ = ic.tile_size // SCALE

            def body(i, mo):
                oy = offs[i, 1] // SCALE
                ox = offs[i, 0] // SCALE
                cur = jax.lax.dynamic_slice(
                    mo, (oy, ox, 0), (ms_, ms_, mo.shape[-1]))
                return jax.lax.dynamic_update_slice(
                    mo, jnp.maximum(cur, maps[i]), (oy, ox, 0))

            return jax.lax.fori_loop(0, maps.shape[0], body, mosaic)

        def _detect_page_merge(variables, page, offs, bounds, mosaic):
            # fused single-chip page path (InferenceConfig.
            # fused_page_merge): detect a chunk AND fold its maps into
            # the device-resident page mosaic, so per-tile maps never
            # ship to the host. mosaic=None creates the zeroed page
            # mosaic (first chunk).
            packed, feat, maps = _detect(
                variables, _page_tiles(page, offs), bounds)
            if mosaic is None:
                mosaic = jnp.zeros(
                    (page.shape[0] // SCALE, page.shape[1] // SCALE,
                     maps.shape[-1]), maps.dtype)
            return packed, feat, _merge_maps(mosaic, maps, offs)

        def _finish_page(mosaic, chunks):
            # after every chunk merged: sample the 3x3 code max-pool at
            # each peak from the MERGED mosaic (the host used to read
            # all 4 code channels back per tile just to do this) and
            # hand back the line/sep mosaic planes. ``chunks`` is a
            # tuple of (packed, offs) per dispatched chunk. The clipped
            # 3x3 neighbor gather equals a SAME-padded max reduce_window
            # (max-identity padding; coordinate clipping only duplicates
            # in-window values). Final per-peak codes are
            # max(raw peak codes, pooled map) — exactly
            # _filter_boxes's host composition (reference semantics:
            # /root/reference/process_ocr_base.py code3x3 max-pool).
            codes = mosaic[..., 2:6]
            if codes.dtype == jnp.uint8:
                pooled = jax.lax.reduce_window(
                    codes, jnp.zeros((), jnp.uint8), jax.lax.max,
                    (3, 3, 1), (1, 1, 1), "SAME")
            else:
                pooled = jax.lax.reduce_window(
                    codes, -jnp.inf, jax.lax.max,
                    (3, 3, 1), (1, 1, 1), "SAME")
            # the sampled pool ships RAW (uint8 when quantized): the
            # dequantize + max-with-raw-codes runs on the HOST with the
            # same numpy ops as the host-merge path — XLA rewrites /255
            # into a reciprocal multiply (one-ulp off the host's
            # correctly-rounded divide), which would break the bit-exact
            # fused-vs-host gate
            outs = []
            for packed, offs in chunks:
                xs = (packed[..., 1].astype(jnp.int32)
                      + offs[:, 0:1] // SCALE)
                ys = (packed[..., 2].astype(jnp.int32)
                      + offs[:, 1:2] // SCALE)
                outs.append(pooled[ys, xs])
            return tuple(outs), mosaic[..., 0], mosaic[..., 1], codes

        self._detect_page_merge0 = None
        self._detect_page_merge = None
        self._finish_page = None
        if mesh is None:
            self._detect = jax.jit(_detect)
            self._detect_page = jax.jit(_detect_page)
            if ic.fused_page_merge:
                self._detect_page_merge0 = jax.jit(
                    lambda v, p, o, b: _detect_page_merge(v, p, o, b,
                                                          None))
                self._detect_page_merge = jax.jit(_detect_page_merge)
                self._finish_page = jax.jit(_finish_page)
        else:
            # weights replicated, tile batch split over the data axis
            self._detect = jax.jit(_detect,
                                   in_shardings=(repl, data, data),
                                   out_shardings=data)
            self._detect_page = jax.jit(
                _detect_page, in_shardings=(repl, repl, data, data),
                out_shardings=data)

        self._make_decode_fn = None
        if decode_fn is None:
            def make_decode_fn(dec_len):
                def decode_fn(variables, enc_input):
                    return mask_predict(
                        self.transformer, variables, enc_input,
                        max_rounds=mp.max_rounds, topk=mp.topk,
                        remask_threshold=mp.remask_threshold,
                        early_stop_threshold=mp.early_stop_threshold,
                        dec_len=dec_len)
                return decode_fn

            # only the live model decodes at bucketed lengths; exported
            # / ONNX / CoreML decode_fns are fixed-shape artifacts
            self._make_decode_fn = make_decode_fn
            decode_fn = make_decode_fn(None)

        self._decode_shardings = (None if mesh is None
                                  else (repl, data))
        if mesh is None:
            self._decode = jax.jit(decode_fn)
        else:
            self._decode = jax.jit(decode_fn,
                                   in_shardings=(repl, data),
                                   out_shardings=data)
        self._decode_cache: Dict[int, object] = {}
        self._decode_lazy_cache: Dict[Optional[int], object] = {}

    def _decode_for(self, seq_len: int):
        """Jitted decode graph at a bucketed sequence length (cached
        per length; the persistent compilation cache makes the compiles
        one-time). Falls back to the full-length graph for exported
        backends (fixed-shape artifacts) and for ``seq_len`` at or
        above the production length."""
        if (self._make_decode_fn is None
                or seq_len >= self.transformer.dims.max_dec_seq_len):
            return self._decode
        if seq_len not in self._decode_cache:
            fn = self._make_decode_fn(seq_len)
            if self._decode_shardings is None:
                self._decode_cache[seq_len] = jax.jit(fn)
            else:
                repl, data = self._decode_shardings
                self._decode_cache[seq_len] = jax.jit(
                    fn, in_shardings=(repl, data), out_shardings=data)
        return self._decode_cache[seq_len]

    def _decode_lazy_for(self, seq_len: int):
        """Decode graph that gathers device-resident glyph features:
        ``fn(vars, enc_extras, F, idx)`` where ``enc_extras`` is the
        host-built (b, s, enc_dim) batch with zeros in the glyph rows'
        feature columns, ``F`` the page's (N, fdim) f16 buffer, and
        ``idx`` (b, s) int32 rows (-1 = keep the host columns: start /
        end / separator markers). Cached per bucketed length like
        :meth:`_decode_for`; live-model path only."""
        full = seq_len >= self.transformer.dims.max_dec_seq_len
        key = None if full else seq_len
        if key not in self._decode_lazy_cache:
            base = self._make_decode_fn(key)

            def fn(variables, enc, F, idx):
                fd = F.shape[-1]
                g = F[jnp.clip(idx, 0)].astype(enc.dtype)
                feat = jnp.where(idx[..., None] >= 0, g, enc[..., :fd])
                return base(variables,
                            jnp.concatenate([feat, enc[..., fd:]], -1))

            self._decode_lazy_cache[key] = jax.jit(fn)
        return self._decode_lazy_cache[key]

    # ------------------------------------------------------------------
    @classmethod
    def from_torch_checkpoints(cls, model_pt: str, model3_pt: str,
                               config: Config = Config(),
                               model_size: str = "xl") -> "OCRPipeline":
        from ..io.torch_import import (
            import_detection_only, import_detector, import_transformer,
            load_torch_state_dict)
        det_sd = load_torch_state_dict(model_pt)
        det_vars = import_detection_only(det_sd, model_size)
        tf_sd = load_torch_state_dict(model3_pt)
        t = config.transformer
        dims = TransformerDims(
            enc_input_dim=t.enc_input_dim, embed_dim=t.embed_dim,
            head_num=t.head_num, enc_block_num=t.enc_block_num,
            dec_block_num=t.dec_block_num,
            max_enc_seq_len=t.max_enc_seq_len,
            max_dec_seq_len=t.max_dec_seq_len)
        tf_vars = import_transformer(tf_sd, dims)
        self = cls(config, det_vars, tf_vars, model_size=model_size)
        # wire the CRT auxiliary decoder when present in the checkpoint
        if any(k.startswith("decoder.") for k in det_sd):
            from ..models.detector import SimpleDecoder
            full = import_detector(det_sd, model_size)
            sd_model = SimpleDecoder(config.detector.decoder_mid_dim)
            self.simple_decoder_vars = (sd_model, {
                "params": full["params"]["decoder"],
                "batch_stats": full["batch_stats"]["decoder"]})
        return self

    # ------------------------------------------------------------------
    @classmethod
    def from_exported(cls, detector_dir: str, encoder_dir: str,
                      decoder_dir: str, config: Config = Config(),
                      model_size: str = "xl") -> "OCRPipeline":
        """Pipeline driven by *exported* StableHLO artifacts.

        The TPU-native analog of the reference's alternate inference
        backends, which run the deployed ONNX/CoreML graphs instead of
        the live model (`/root/reference/process_ocr_onnx.py:27-72`,
        `run_ocr.py:5-21`): detection and mask-predict decode call the
        serialized graphs from :mod:`..export.export`; every host stage
        is shared. Artifacts exported with a symbolic batch dim serve
        any tile-chunk / window-bucket size.
        """
        from ..export.export import load_exported
        from ..models.transformer import mask_predict_fns

        det_call, det_params, det_meta = load_exported(detector_dir)
        enc_call, enc_params, _ = load_exported(encoder_dir)
        dec_call, dec_params, _ = load_exported(decoder_dir)
        if det_meta["kind"] != "detector":
            raise ValueError(f"{detector_dir}: kind {det_meta['kind']}")

        def detector_apply(variables, images):
            # exported graph returns the 10-channel peak-suppressed map
            # (keymap, peakmap, rest); the pipeline's fused peak
            # extraction recomputes NMS from the keymap, so drop the
            # redundant peak channel to recover the 9-channel layout
            out10, features = det_call(variables, images)
            heat9 = jnp.concatenate([out10[..., 0:1], out10[..., 2:]],
                                    axis=-1)
            return heat9, features

        mp = config.mask_predict

        def decode_fn(variables, enc_input):
            return mask_predict_fns(
                lambda e: enc_call(variables["enc"], e),
                lambda d, e, km: dec_call(variables["dec"], d, e, km),
                enc_input, config.transformer.max_dec_seq_len,
                max_rounds=mp.max_rounds, topk=mp.topk,
                remask_threshold=mp.remask_threshold,
                early_stop_threshold=mp.early_stop_threshold)

        self = cls(config, detector_variables=det_params,
                   transformer_variables={"enc": enc_params,
                                          "dec": dec_params},
                   model_size=model_size, detector_apply=detector_apply,
                   decode_fn=decode_fn)
        return self

    # ------------------------------------------------------------------
    @classmethod
    def from_onnx(cls, detector_onnx, encoder_onnx, decoder_onnx,
                  config: Config = Config(),
                  model_size: str = "xl") -> "OCRPipeline":
        """Pipeline driven by the exported ONNX artifacts — the
        equivalent of the reference's ``process_ocr_onnx.py`` backend
        (`/root/reference/process_ocr_onnx.py:27-104`).

        The graphs (written by :mod:`..export.onnx_models`) run through
        onnxruntime when available, else the in-tree numpy evaluator;
        their batch dim is symbolic, so tile chunks and window buckets
        evaluate in one call. Every host stage (filters, line engine,
        stream, assembly) is the shared pipeline code; the jitted
        stages call the sessions via ``jax.pure_callback``.
        """
        from .onnx_backend import OnnxSession

        return cls._from_sessions(
            OnnxSession(detector_onnx), OnnxSession(encoder_onnx),
            OnnxSession(decoder_onnx), config, model_size)

    # ------------------------------------------------------------------
    @classmethod
    def from_coreml(cls, detector_onnx, encoder_onnx, decoder_onnx,
                    config: Config = Config(),
                    model_size: str = "xl") -> "OCRPipeline":
        """Pipeline driven through the CoreML (MIL) op mapping — the
        equivalent of the reference's ``process_ocr_coreml.py`` backend
        (`/root/reference/process_ocr_coreml.py:7-74`).

        Each artifact executes under the deployed-mlpackage contract
        (:class:`..export.coreml_models.MilSession`): per-sample batch-1
        evaluation of the exact MIL op/argument stream
        ``convert_to_mlpackage`` emits, int64 cast to int32. On a box
        with ``coremltools`` the same graphs convert to real
        .mlpackages; this driver is their in-tree twin.
        """
        from ..export.coreml_models import MilSession

        return cls._from_sessions(
            MilSession(detector_onnx), MilSession(encoder_onnx),
            MilSession(decoder_onnx), config, model_size)

    # ------------------------------------------------------------------
    @classmethod
    def _from_sessions(cls, det, enc, dec, config: Config,
                       model_size: str) -> "OCRPipeline":
        """Shared driver body for the artifact-session backends
        (`from_onnx`, `from_coreml`): wraps three callable sessions as
        ``detector_apply`` / ``decode_fn`` via ``jax.pure_callback``."""
        from ..const import MODULO_LIST
        from ..models.transformer import make_key_mask, mask_predict_fns

        fdim = config.detector.feature_dim
        t = config.transformer
        mp = config.mask_predict

        def det_host(imgs):
            imgs = np.asarray(imgs, np.float32)
            out = det(image=imgs.transpose(0, 3, 1, 2))
            # artifact heatmap is 10-channel (keymap, peak-suppressed
            # keymap, rest); the pipeline's fused peak extraction
            # recomputes NMS from the raw keymap, so drop the redundant
            # peak channel (same contract as from_exported)
            h10 = out["heatmap"].transpose(0, 2, 3, 1)
            heat9 = np.concatenate([h10[..., :1], h10[..., 2:]], axis=-1)
            feat = out["feature"].transpose(0, 2, 3, 1)
            return (heat9.astype(np.float32), feat.astype(np.float32))

        def detector_apply(variables, images):
            del variables
            b, h, w, _ = images.shape
            sds = (jax.ShapeDtypeStruct((b, h // 4, w // 4, 9),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((b, h // 4, w // 4, fdim),
                                        jnp.float32))
            return jax.pure_callback(det_host, sds, images)

        le, ld, ed = t.max_enc_seq_len, t.max_dec_seq_len, t.embed_dim

        def enc_host(e_in, km):
            out = enc(encoder_input=np.asarray(e_in, np.float32),
                      key_mask=np.asarray(km, np.float32))
            return out["encoder_output"].astype(np.float32)

        def dec_host(d_in, e_out, km):
            out = dec(encoder_output=np.asarray(e_out, np.float32),
                      decoder_input=np.asarray(d_in).astype(np.int64),
                      key_mask=np.asarray(km, np.float32))
            return tuple(out[f"modulo_{m}"].astype(np.float32)
                         for m in MODULO_LIST)

        def decode_fn(variables, enc_input):
            del variables
            b = enc_input.shape[0]
            km = make_key_mask(enc_input)

            def encode_cb(e_in):
                return jax.pure_callback(
                    enc_host,
                    jax.ShapeDtypeStruct((b, le, ed), jnp.float32),
                    e_in, km)

            def decode_cb(d_in, e_out, km_):
                sds = tuple(
                    jax.ShapeDtypeStruct((b, ld, m), jnp.float32)
                    for m in MODULO_LIST)
                return jax.pure_callback(dec_host, sds, d_in, e_out, km_)

            return mask_predict_fns(
                encode_cb, decode_cb, enc_input, ld,
                max_rounds=mp.max_rounds, topk=mp.topk,
                remask_threshold=mp.remask_threshold,
                early_stop_threshold=mp.early_stop_threshold)

        return cls(config, detector_variables={}, transformer_variables={},
                   model_size=model_size, detector_apply=detector_apply,
                   decode_fn=decode_fn)

    # ------------------------------------------------------------------
    # stage 1: tiled detection
    # ------------------------------------------------------------------

    @staticmethod
    def _fetch_peaks(packed, feat_dev=None) -> Dict[str, np.ndarray]:
        """Unpack the single (B, K, 10) peak readback plus the f16
        feature buffer. The features read back whole: an earlier design
        sliced ``feat_dev[:, :kmax]`` on device to ship only the valid
        prefix, but that slice is a fresh dispatch (a full tunnel RTT)
        producing a buffer that was never host-mirrored — measured ~200
        ms per page on the axon link, versus ~0 for ``np.asarray`` of a
        result whose ``copy_to_host_async`` started at dispatch time
        (run_detector kicks those off for every chunk output).
        ``feat_dev=None`` (the device_features path) skips the feature
        readback entirely — the buffer stays device-resident."""
        packed = np.asarray(packed)
        out = {
            "score": packed[..., 0],
            "x": packed[..., 1].astype(np.int32),
            "y": packed[..., 2].astype(np.int32),
            "w": packed[..., 3],
            "h": packed[..., 4],
            "codes": packed[..., 5:9],
            "valid": packed[..., 9] > 0.5,
        }
        if feat_dev is not None:
            out["feature"] = np.asarray(feat_dev)
        return out

    def _chunk_sizes(self, n: int) -> List[int]:
        """Split ``n`` tiles into compiled-batch chunks: full
        ``detector_batch`` chunks, remainder rounded up to the smallest
        power-of-two bucket (times the mesh data-axis size) — a 6-tile
        page runs 6-8 tiles of XL compute instead of padding to 16
        (VERDICT r3 weak #1). Each bucket shape compiles once and is
        cached persistently."""
        B = self.cfg.inference.detector_batch
        sizes = []
        left = n
        while left >= B:
            sizes.append(B)
            left -= B
        if left:
            b = self._min_bucket
            while b < left:
                b *= 2
            sizes.append(min(b, B))
        return sizes

    def tile_grid(self, height: int, width: int):
        """Tile offsets + map-scale ownership bounds for a page.

        The page pads (bottom/right, blank 255) until the 0.6-stride
        grid divides it exactly — the same rule as the reference's
        dataset construction (`/root/reference/process_ocr_base.py:63-71`),
        so both frameworks run the identical tile count per page (a
        2048x1448 book scan is 12 tiles, not the 6 an unpadded
        ``(W - tile) // step + 1`` would suggest — that grid leaves the
        bottom 220 rows uncovered). Returns ``(padx, pady, offs,
        bounds)`` with offsets in padded-page pixels.
        """
        ic = self.cfg.inference
        tile = ic.tile_size
        step = int(tile * ic.stride_ratio)
        padx = max(0, (tile - width) % step, tile - width)
        pady = max(0, (tile - height) % step, tile - height)
        H, W = height + pady, width + padx
        ms = tile // SCALE
        offs, bounds = [], []
        for y in range(0, H - tile + 1, step):
            for x in range(0, W - tile + 1, step):
                offs.append((x, y))
                x_min = int(ms * (1 - ic.stride_ratio) / 2) if x > 0 else 0
                x_max = (int(ms * (1 - (1 - ic.stride_ratio) / 2)) + 1
                         if x + tile < W else ms)
                y_min = int(ms * (1 - ic.stride_ratio) / 2) if y > 0 else 0
                y_max = (int(ms * (1 - (1 - ic.stride_ratio) / 2)) + 1
                         if y + tile < H else ms)
                bounds.append((x_min, x_max, y_min, y_max))
        return padx, pady, offs, bounds

    def run_detector(self, img: np.ndarray,
                     twopass: bool = False) -> DetectedPage:
        ic = self.cfg.inference
        tile = ic.tile_size
        step = int(tile * ic.stride_ratio)

        if img.dtype != np.uint8:
            # tiles ship to the device as uint8 (the [0,1] scaling
            # happens on-device, keyed on the uint8 dtype) — coerce
            # float pages here instead of silently feeding the detector
            # unscaled values. Accept both float conventions: [0,1]
            # (max <= 1) and 0..255. NaNs map to 0 (astype(uint8) of
            # NaN is undefined behavior).
            img = np.nan_to_num(np.asarray(img, np.float32))
            scale = 255.0 if img.max(initial=0.0) <= 1.0 else 1.0
            img = np.clip(np.round(img * scale), 0, 255).astype(np.uint8)

        padx, pady, offs, bounds = self.tile_grid(img.shape[0],
                                                  img.shape[1])
        img = np.pad(img, [[0, pady], [0, padx], [0, 0]],
                     constant_values=255)
        H, W = img.shape[:2]

        # device-resident glyph features: collect the per-chunk f16
        # buffers + integer row indices instead of reading values back
        # (InferenceConfig.device_features)
        lazy = self._lazy_features
        featbufs: List = []
        feat_base = 0

        # two-pass: a whole-page low-resolution pre-pass catches characters
        # larger than one tile; its detections (scaled back) are merged
        # before dedup (`/root/reference/test_image1_torch.py:313-333`)
        pre_locs, pre_feats = [], []
        if twopass and (W / step > 2 or H / step > 2):
            s = max(W, H) / tile
            from PIL import Image as PILImage
            im1 = np.asarray(PILImage.fromarray(img).resize(
                (int(W / s), int(H / s)), PILImage.Resampling.BILINEAR))
            p1x = max(0, tile - im1.shape[1])
            p1y = max(0, tile - im1.shape[0])
            im1 = np.pad(im1, [[0, p1y], [0, p1x], [0, 0]],
                         constant_values=255)
            B1 = self._chunk_sizes(1)[0]
            ms1 = tile // SCALE
            # reuse _detect_page with all offsets at 0 on the tile-sized
            # pre-pass image in the smallest bucket: one tile of compute
            # instead of a full B-tile chunk of which B-1 were padding
            bounds1 = np.zeros((B1, 4), np.int32)
            bounds1[0] = (0, ms1, 0, ms1)
            packed1, feat1, _ = self._detect_page(
                self.det_vars, jnp.asarray(im1),
                jnp.zeros((B1, 2), jnp.int32), jnp.asarray(bounds1))
            peaks = self._fetch_peaks(packed1, None if lazy else feat1)
            if lazy:
                featbufs.append(feat1)
                feat_base = int(feat1.shape[0]) * int(feat1.shape[1])
            for pi in np.where(peaks["valid"][0])[0]:
                w0 = float(peaks["w"][0, pi]) * s
                h0 = float(peaks["h"][0, pi]) * s
                if w0 <= 0 or h0 <= 0 or w0 > W or h0 > H:
                    continue
                ix = int(peaks["x"][0, pi]) * SCALE * s
                iy = int(peaks["y"][0, pi]) * SCALE * s
                if ix >= W or iy >= H:   # padded blank region of im1
                    continue
                pre_locs.append(np.array(
                    [peaks["score"][0, pi], ix, iy, w0, h0,
                     *peaks["codes"][0, pi]], np.float32))
                # lazy: record the flat device-buffer row (tile 0 of
                # the pre-pass chunk, base 0) instead of the value
                pre_feats.append(int(pi) if lazy
                                 else peaks["feature"][0, pi])
        mh, mw = H // SCALE, W // SCALE
        ms = tile // SCALE

        locations: List[np.ndarray] = [np.stack(pre_locs)] if pre_locs \
            else []
        glyphfeats: List[np.ndarray] = []
        if pre_feats:
            glyphfeats.append(np.asarray(pre_feats, np.int64) if lazy
                              else np.stack(pre_feats))

        # dispatch every chunk up front: jax dispatch is async, so the
        # device works through the queue while the host merges earlier
        # chunks (the in-order stream keeps results sequential). The
        # page uploads once — as a SINGLE channel when the page is
        # grayscale-in-RGB (every book scan; 3x less upload), broadcast
        # back on-device — and tiles are cut on-device (_detect_page);
        # the trailing chunk runs in a small power-of-two bucket instead
        # of padding to the full compiled batch (_chunk_sizes).
        gray = bool((img[..., 0] == img[..., 1]).all()
                    and (img[..., 0] == img[..., 2]).all())
        page_dev = jnp.asarray(img[..., 0] if gray else img)
        fused = self._detect_page_merge is not None
        pending = []
        mosaic = None
        i0 = 0
        for size in self._chunk_sizes(len(offs)):
            n = min(size, len(offs) - i0)
            coffs = jnp.asarray(np.asarray(
                offs[i0:i0 + n] + [(0, 0)] * (size - n), np.int32))
            cbounds = jnp.asarray(np.asarray(
                bounds[i0:i0 + n] + [(0, 0, 0, 0)] * (size - n),
                np.int32))
            if not fused:
                packed, feat, cmaps = self._detect_page(
                    self.det_vars, page_dev, coffs, cbounds)
            elif mosaic is None:
                packed, feat, mosaic = self._detect_page_merge0(
                    self.det_vars, page_dev, coffs, cbounds)
                cmaps = None
            else:
                packed, feat, mosaic = self._detect_page_merge(
                    self.det_vars, page_dev, coffs, cbounds, mosaic)
                cmaps = None
            # start the bulk readbacks streaming immediately; the merge
            # loop below consumes them in dispatch order. The feature
            # buffer is the dominant readback (B x K x fdim f16) — in
            # lazy mode it never crosses the link at all
            if lazy:
                featbufs.append(feat)
            for a in ((packed, cmaps) if lazy else (packed, feat, cmaps)):
                if hasattr(a, "copy_to_host_async"):
                    a.copy_to_host_async()
            pending.append((i0, n, packed, feat, cmaps, coffs))
            i0 += n

        codes_all = codes_mosaic = None
        chunk_codes = [None] * len(pending)
        if fused:
            # one more dispatch closes the page: device-side 3x3 code
            # max-pool sampling at every peak + the 2-channel line/sep
            # mosaic readback. The 4-channel code mosaic stays on device
            # unless the (rare) two-pass pre-detections need host
            # sampling below.
            chunk_codes, lines_dev, seps_dev, codes_mosaic = \
                self._finish_page(
                    mosaic,
                    tuple((p, o) for _, _, p, _, _, o in pending))
            for a in (*chunk_codes, lines_dev, seps_dev):
                if hasattr(a, "copy_to_host_async"):
                    a.copy_to_host_async()

            def dq(a):
                a = np.asarray(a)
                return (a.astype(np.float32) / 255.0
                        if a.dtype == np.uint8 else a)

            lines_all, seps_all = dq(lines_dev), dq(seps_dev)
        else:
            lines_all = np.zeros((mh, mw), np.float32)
            seps_all = np.zeros((mh, mw), np.float32)
            codes_all = np.zeros((mh, mw, 4), np.float32)

        for (i0, n, packed, feat, cmaps, _), cds in zip(pending,
                                                        chunk_codes):
            peaks = self._fetch_peaks(packed, None if lazy else feat)
            if cds is not None:
                cds = np.asarray(cds)
                if cds.dtype == np.uint8:
                    cds = cds.astype(np.float32) / 255.0
                peaks["codes"] = np.maximum(peaks["codes"], cds)
            else:
                maps = np.asarray(cmaps)
                if maps.dtype == np.uint8:
                    maps = maps.astype(np.float32) / 255.0
                for bi in range(n):
                    x, y = offs[i0 + bi]
                    xs, ys = x // SCALE, y // SCALE
                    sl = np.s_[ys:ys + ms, xs:xs + ms]
                    # maps arrive pre-masked by the ownership region
                    np.maximum(lines_all[sl], maps[bi, ..., 0],
                               out=lines_all[sl])
                    np.maximum(seps_all[sl], maps[bi, ..., 1],
                               out=seps_all[sl])
                    np.maximum(codes_all[sl], maps[bi, ..., 2:6],
                               out=codes_all[sl])

            # vectorized peak extraction (row-major over (tile, peak)
            # preserves the per-tile, per-peak emit order of the old
            # python loop bit-for-bit)
            offc = np.asarray(offs[i0:i0 + n], np.int64)
            w = peaks["w"][:n]
            h = peaks["h"][:n]
            ok = (peaks["valid"][:n] & (w > 0) & (h > 0)
                  & (w <= W) & (h <= H))
            if ok.any():
                ix = (peaks["x"][:n].astype(np.int64) * SCALE
                      + offc[:, 0:1])
                iy = (peaks["y"][:n].astype(np.int64) * SCALE
                      + offc[:, 1:2])
                rows = np.concatenate([
                    peaks["score"][:n][..., None],
                    ix[..., None].astype(np.float32),
                    iy[..., None].astype(np.float32),
                    w[..., None], h[..., None],
                    peaks["codes"][:n],
                ], axis=-1).astype(np.float32)
                locations.append(rows[ok])
                if lazy:
                    # np.nonzero is row-major over (tile, peak) — the
                    # same order rows[ok] flattens in
                    ti, pk = np.nonzero(ok)
                    K = int(feat.shape[1])
                    glyphfeats.append(feat_base + ti * K + pk)
                else:
                    glyphfeats.append(peaks["feature"][:n][ok])
            if lazy:
                feat_base += int(feat.shape[0]) * int(feat.shape[1])

        if not locations or not sum(len(a) for a in locations):
            return DetectedPage(np.zeros((0, 9), np.float32),
                                np.zeros((0, FEATURE_DIM), np.float32),
                                lines_all, seps_all)
        loc = np.concatenate(locations).astype(np.float32)
        if lazy:
            # one async dispatch flattens the chunk buffers into the
            # page feature matrix; values stay on device from here on
            feats = LazyFeatures(_CONCAT_FEATS(*featbufs),
                                 np.concatenate(glyphfeats))
        else:
            feats = np.concatenate(glyphfeats).astype(np.float32)
        if fused and pre_locs:
            # two-pass pre-detections were never device-sampled: fetch
            # the code mosaic (kept on device otherwise) and apply the
            # same host 3x3 max-pool to those rows only
            cm = np.asarray(codes_mosaic)
            if cm.dtype == np.uint8:
                cm = cm.astype(np.float32) / 255.0
            loc[:len(pre_locs)] = self._sample_codes_host(
                cm, loc[:len(pre_locs)])
        loc, feats = self._filter_boxes(loc, feats, img, lines_all, seps_all,
                                        codes_all)
        return DetectedPage(loc, feats, lines_all, seps_all)

    def _greedy_dedup_numpy(self, loc, cand):
        """numpy fallback for the native greedy dedup (same semantics)."""
        ic = self.cfg.inference
        done = np.zeros((0, 4))
        keep = []
        for i in cand:
            _, cx, cy, w, h = loc[i, :5]
            if len(done):
                a0 = w * h
                a1 = done[:, 2] * done[:, 3]
                ix0 = np.maximum(cx - w / 2, done[:, 0] - done[:, 2] / 2)
                iy0 = np.maximum(cy - h / 2, done[:, 1] - done[:, 3] / 2)
                ix1 = np.minimum(cx + w / 2, done[:, 0] + done[:, 2] / 2)
                iy1 = np.minimum(cy + h / 2, done[:, 1] + done[:, 3] / 2)
                iw = np.maximum(ix1 - ix0, 0)
                ih = np.maximum(iy1 - iy0, 0)
                inter = iw * ih
                union = a0 + a1 - inter
                iou = np.where(union > 0, inter / union, 0)
                if iou.max() > ic.iou_threshold:
                    continue
                if inter.max() > a0 * ic.overlap_threshold:
                    continue
                # fill-ratio: union of overlaps covering this box
                fill = np.zeros((max(1, int(w)), max(1, int(h))), bool)
                for j in np.where(iou > 0)[0]:
                    ox0 = int(max(done[j, 0] - done[j, 2] / 2, cx - w / 2)
                              - (cx - w / 2))
                    ox1 = int(min(done[j, 0] + done[j, 2] / 2, cx + w / 2)
                              - (cx - w / 2)) + 1
                    oy0 = int(max(done[j, 1] - done[j, 3] / 2, cy - h / 2)
                              - (cy - h / 2))
                    oy1 = int(min(done[j, 1] + done[j, 3] / 2, cy + h / 2)
                              - (cy - h / 2)) + 1
                    fill[ox0:ox1, oy0:oy1] = True
                if fill.mean() > ic.fill_ratio_threshold:
                    continue
            done = np.vstack([done, [cx, cy, w, h]])
            keep.append(i)
        return keep

    def _filter_boxes(self, loc, feats, img, lines_all, seps_all, codes_all):
        ic = self.cfg.inference
        H, W = img.shape[:2]

        # histogram-contrast threshold from the median box; both crop
        # sets batch through one vectorized 2-means pass
        above = loc[:, 0] >= ic.peak_cutoff
        idxs = np.where(above)[0]
        cx_, cy_ = loc[idxs, 1], loc[idxs, 2]
        w_, h_ = loc[idxs, 3], loc[idxs, 4]
        rect1 = np.stack([
            np.maximum(0, (cx_ - w_ / 2).astype(int) - 1),
            np.maximum(0, (cy_ - h_ / 2).astype(int) - 1),
            np.maximum(0, (cx_ + w_ / 2).astype(int) + 2),
            np.maximum(0, (cy_ + h_ / 2).astype(int) + 2),
        ], 1)
        if hostops.available():
            th_src = hostops.hist_contrast(img, rect1)
        else:
            th_src = batch_hist_contrast(img, rect1)
        th_hist = (np.median(th_src) / 5) if len(th_src) else 0.0
        rect2 = np.stack([
            np.maximum(0, (cx_ - w_ / 2).astype(int)),
            np.maximum(0, (cy_ - h_ / 2).astype(int)),
            np.minimum(W - 1, (cx_ + w_ / 2).astype(int) + 1),
            np.minimum(H - 1, (cy_ + h_ / 2).astype(int) + 1),
        ], 1)
        contrast = np.zeros(len(loc), np.float32)
        if hostops.available():
            contrast[idxs] = hostops.hist_contrast(img, rect2)
        else:
            contrast[idxs] = batch_hist_contrast(img, rect2)

        order = np.argsort(-loc[:, 0])
        # candidates: score-descending, above cutoff, contrast-passing
        ok = (loc[:, 0] >= ic.peak_cutoff) & (contrast >= th_hist)
        cand = order[ok[order]]
        if hostops.available():
            mask = hostops.greedy_dedup(
                np.ascontiguousarray(loc[cand, 1:5], np.float32),
                ic.iou_threshold, ic.overlap_threshold,
                ic.fill_ratio_threshold)
            keep = cand[np.asarray(mask, bool)]
        else:
            keep = np.asarray(self._greedy_dedup_numpy(loc, cand),
                              np.int64).reshape(-1)

        # separator rejection (int() and astype both truncate toward 0)
        xs = (loc[keep, 1] / SCALE).astype(int)
        ys = (loc[keep, 2] / SCALE).astype(int)
        inb = ((xs >= 0) & (xs < seps_all.shape[1]) &
               (ys >= 0) & (ys < seps_all.shape[0]))
        hit = np.zeros(len(keep), bool)
        hit[inb] = seps_all[ys[inb], xs[inb]] > 0.5
        keep2 = keep[~hit]
        if not len(keep2):
            return (np.zeros((0, 9), np.float32),
                    np.zeros((0, FEATURE_DIM), np.float32))
        keep2 = np.asarray(keep2)
        loc, feats = loc[keep2], feats[keep2]

        # code probability 3x3 max-pool at each box center (skipped when
        # the fused page path already sampled codes on device —
        # codes_all is None then)
        if codes_all is not None:
            loc = self._sample_codes_host(codes_all, loc)
        return loc, feats

    @staticmethod
    def _sample_codes_host(codes_all, loc):
        """max(raw codes, clipped 3x3 neighborhood of the merged code
        map) at each box center — the host twin of the device-side
        sampling in ``_finish_page`` (clipped neighbor gather ==
        edge-clipped window max)."""
        mh, mw = codes_all.shape[:2]
        xs = (loc[:, 1] / SCALE).astype(int)
        ys = (loc[:, 2] / SCALE).astype(int)
        inb = (xs >= 0) & (xs < mw) & (ys >= 0) & (ys < mh)
        if inb.any():
            yc, xc = ys[inb], xs[inb]
            m = loc[inb, 5:9]
            for dy in (-1, 0, 1):
                yy = np.clip(yc + dy, 0, mh - 1)
                for dx in (-1, 0, 1):
                    m = np.maximum(
                        m, codes_all[yy, np.clip(xc + dx, 0, mw - 1)])
            loc[inb, 5:9] = m
        return loc

    # ------------------------------------------------------------------
    # stage 2: reading order
    # ------------------------------------------------------------------

    def run_line_engine(self, page: DetectedPage) -> np.ndarray:
        le = self.cfg.line_engine
        params = {
            "ruby_cutoff": le.ruby_cutoff,
            "rubybase_cutoff": le.rubybase_cutoff,
            "space_cutoff": le.space_cutoff,
            "emphasis_cutoff": le.emphasis_cutoff,
            "line_valueth": le.line_valueth,
            "sep_valueth": le.sep_valueth,
            "allowwidth_next_block": le.allowwidth_next_block,
            "allow_sizediff": le.allow_sizediff,
            "page_divide": le.page_divide,
        }
        boxes = page.locations[:, 1:]     # cx, cy, w, h, code1..4
        return lineengine.detect_lines(page.lines, page.seps, boxes, params)

    # ------------------------------------------------------------------
    # stage 3: feature stream + windowed decode
    # ------------------------------------------------------------------

    @staticmethod
    def build_feature_stream(detected_boxes: np.ndarray,
                             glyphfeatures: np.ndarray
                             ) -> Tuple[np.ndarray, List[Tuple]]:
        """(feature_dim + 6)-d encoder stream with block/line separator
        rows (106-d at the reference's feature_dim = 100).

        Mirrors `/root/reference/process_ocr_base.py:114-174`. Dimensions
        derive from the features so reduced smoke configs work.
        """
        fdim = glyphfeatures.shape[-1] if glyphfeatures.ndim == 2 \
            else FEATURE_DIM
        enc_dim = fdim + 6
        rows = np.asarray(detected_boxes)
        rows = rows[rows[:, 0] >= 0].astype(np.int64) if len(rows) else rows
        if not len(rows):
            return np.zeros((0, enc_dim), np.float32), []
        bid, block, idx, subtype = (rows[:, 0], rows[:, 1], rows[:, 2],
                                    rows[:, 4])
        n = len(rows)

        vert = (subtype & 1).astype(np.float32)
        rubybase = ((subtype & 6) == 2).astype(np.float32)
        ruby = ((subtype & 6) == 6).astype(np.float32)
        space = ((subtype & 8) != 0).astype(np.float32)
        emphasis = ((subtype & 16) != 0).astype(np.float32)

        # separator-row bookkeeping, vectorized: a block separator fires
        # on every block transition (initial state block=0), and an idx
        # separator on every idx transition OR after any block separator
        # (the block row resets the running idx to -1, never a real idx)
        blk_sep = np.empty(n, bool)
        blk_sep[0] = block[0] != 0
        blk_sep[1:] = block[1:] != block[:-1]
        idx_sep = np.empty(n, bool)
        idx_sep[0] = idx[0] != 0
        idx_sep[1:] = idx[1:] != idx[:-1]
        idx_sep |= blk_sep
        nsep = blk_sep.astype(np.int64) + idx_sep
        pos = np.cumsum(nsep) + np.arange(n)   # glyph row positions
        total = int(pos[-1]) + 1

        out = np.zeros((total, enc_dim), np.float32)
        lazy = isinstance(glyphfeatures, LazyFeatures)
        if not lazy:
            out[pos, :fdim] = glyphfeatures[bid]
        out[pos, fdim:] = 5 * np.stack(
            [vert, rubybase, ruby, space, emphasis,
             np.zeros_like(vert)], 1)
        # separator rows carry the *previous* glyph's vertical flag (the
        # running state updates after the separators are emitted)
        vert_prev = np.concatenate([[0.0], vert[:-1]]).astype(np.float32)
        isp = pos[idx_sep] - 1
        out[isp, fdim] = 5 * vert_prev[idx_sep]
        out[isp, -1] = 5
        bsp = pos[blk_sep] - 2          # block sep always precedes an idx sep
        out[bsp, fdim] = 5 * vert_prev[blk_sep]
        out[bsp, -1] = 5

        fi = np.full((total, 5), -1, np.int64)
        fi[pos] = rows[:, :5]
        feature_idx = list(map(tuple, fi.tolist()))
        if lazy:
            # glyph-feature columns stay zero on the host; the stream
            # carries device-buffer row indices instead, and
            # decode_windows gathers them inside the decode graph
            out = out.view(FeatureStream)
            gidx = np.full(total, -1, np.int64)
            gidx[pos] = glyphfeatures.idx[bid]
            out.glyph_idx = gidx
            out.glyph_dev = glyphfeatures.dev
        return out, feature_idx

    @staticmethod
    def _ruby_expansion(features: np.ndarray, i0: int, i1: int) -> int:
        """Estimated extra decode tokens from ruby markup in rows [i0,i1).

        One shared copy of the reference's budget state machine
        (`/root/reference/process_ocr_base.py:186-203`): each ruby glyph
        (col -3) adds one output char, and each rubybase group opening
        (col -5 rising while outside a group, closed when col -4 returns
        to 0) adds the 3 bracket markers. Used by both ``split_windows``
        (window sizing) and ``decode_windows`` (bucket sizing) so the
        two can never drift apart.
        """
        r, s = 0, 0
        for k in range(i0, i1):
            if features[k, -3] > 0:
                r += 1
            if s == 0 and features[k, -5] > 0:
                r += 3
                s = 1
            elif s == 1 and features[k, -4] > 0:
                s = 2
            elif s == 2 and features[k, -4] == 0:
                s = 0
        return r

    @staticmethod
    def split_windows(features: np.ndarray,
                      max_enc_len: int = MAX_ENCODER_LEN,
                      max_windows: int = 0
                      ) -> List[Tuple[int, int, int, int]]:
        """Window boundaries (prev_j, cur_i, cur_j, keep_back).

        Same cut rules as the reference's chunked decode loop
        (`/root/reference/process_ocr_base.py:186-283`): estimated decode
        length budget, direction change, double newline, ruby-group
        boundary; overlap re-feed with keep_back dedup.

        ``max_windows`` (0 = unbounded, exact reference behavior) bounds
        worst-case decode load: if the normal split exceeds it, the
        stream is re-split on the length budget alone — see
        ``InferenceConfig.max_windows_per_page``.
        """
        out = []
        n = features.shape[0]
        cur_i, prev_j, keep_back = 0, 0, 0
        while cur_i < n:
            r = OCRPipeline._ruby_expansion(
                features, cur_i, min(cur_i + max_enc_len - 3, n))
            cur_j = min(n, cur_i + (max_enc_len - 3 - r))
            for j in range(cur_i + 1, cur_j):
                if features[j, -6] != features[cur_i, -6]:
                    cur_j = j
                    break
            if cur_j < n - 1 and cur_i + 1 < cur_j - 1:
                for j in range(cur_i + 1, cur_j - 1):
                    if features[j, -1] > 0 and features[j + 1, -1] > 0:
                        cur_j = j + 2
                        break
            if cur_j < n:
                if cur_j > 1 and features[cur_j - 1, -1] == 0:
                    for j in reversed(range(cur_i + 1, cur_j)):
                        if features[j, -4] == 0 and features[j, -5] == 0:
                            cur_j = j + 1
                            break
            if prev_j == cur_j:
                keep_back = 0
                cur_i = cur_j
                continue
            out.append((prev_j, cur_i, cur_j, keep_back))

            if cur_j >= n:
                break
            k = cur_j - 1
            prev_j = cur_j
            keep_back = 0
            while cur_i < k:
                if features[k, -6] != features[cur_j, -6]:
                    k += 1
                    break
                if features[k, -5] > 0 or features[k, -4] > 0:
                    k += 1
                    break
                if k < cur_j - 1 and features[k, -1] > 0:
                    k += 1
                    break
                if features[k, -3] > 0:
                    keep_back += 1
                if k > cur_j - 3:
                    k -= 1
                else:
                    break
            if cur_i < k:
                cur_i = k
                keep_back += cur_j - k
            else:
                keep_back = 0
                cur_i = cur_j
        if max_windows > 0 and len(out) > max_windows:
            # degenerate stream (garbage page / untrained detector):
            # re-split on the length budget only — contiguous coverage,
            # no overlap — so window count is ~stream/budget instead of
            # one per spurious direction flip; hard-truncate beyond the
            # cap so device time per page is strictly bounded
            out = []
            i = 0
            while i < n and len(out) < max_windows:
                r = OCRPipeline._ruby_expansion(
                    features, i, min(i + max_enc_len - 3, n))
                j = min(n, max(i + 1, i + (max_enc_len - 3 - r)))
                out.append((i, i, j, 0))
                i = j
        return out

    def decode_windows(self, features: np.ndarray,
                       windows: List[Tuple[int, int, int, int]]
                       ) -> List[str]:
        """Batched mask-predict over all windows at once."""
        if not windows:
            return []
        enc_dim = self.transformer.dims.enc_input_dim
        fdim = enc_dim - 6
        sp = np.zeros(enc_dim, np.float32)
        sp[0:fdim:2] = 5
        sp[1:fdim:2] = -5

        enc_len = self.transformer.dims.max_enc_seq_len

        # group windows by decode sequence length. Default (no
        # decode_len_buckets) every window decodes at the production
        # length — exact reference numerics. With buckets configured,
        # each window runs in the smallest bucket that fits its content
        # plus the estimated ruby expansion (the same budget
        # split_windows uses, process_ocr_base.py:186-203): attention
        # is quadratic in the length, so short windows stop paying the
        # 400-token graph.
        buckets_cfg = tuple(sorted(self.cfg.inference.decode_len_buckets))

        def seq_need(ci: int, cj: int) -> int:
            r = self._ruby_expansion(features, ci, cj)
            return max(cj - ci + 2, min(enc_len, cj - ci + r + 3))

        groups: Dict[int, List[int]] = {}
        for wi, (_, ci, cj, _) in enumerate(windows):
            s_len = enc_len
            if buckets_cfg:
                need = seq_need(ci, cj)
                for b in buckets_cfg:
                    if b >= need:
                        s_len = min(b, enc_len)
                        break
            groups.setdefault(s_len, []).append(wi)

        # pad each chunk's window count to a power-of-two bucket so
        # page-to-page variation reuses compiled decode graphs (all-zero
        # rows make an empty key mask and decode to PAD). The chunk size
        # is capped (cfg.inference.decode_max_batch): the self-attention
        # score tensor scales linearly in the window batch and an
        # uncapped box-dense page can demand tens of GB of HBM. All
        # chunks dispatch before the first readback — dispatch is async,
        # so the device works through the queue back-to-back.
        cap = max(self._min_bucket,
                  int(self.cfg.inference.decode_max_batch))
        # device-resident features: ship (bucket, s_len) int32 indices
        # into the page's device feature matrix instead of the gathered
        # values; the decode graph does the gather (bit-exact: the f16
        # buffer is the same detector output the host path reads back,
        # and f16->f32 casting commutes with the gather)
        gidx = getattr(features, "glyph_idx", None)
        if isinstance(features, FeatureStream) and (
                gidx is None or features.glyph_dev is None):
            # A FeatureStream that lost its device indices (e.g. through
            # a numpy transform — __array_finalize__ drops them) has
            # all-zero glyph columns: the non-lazy fallback would decode
            # garbage silently. Fail loudly instead.
            raise ValueError(
                "FeatureStream lost its glyph_idx/glyph_dev (was it "
                "copied/sliced/transformed?); its glyph-feature columns "
                "are zeros, so decoding it would produce garbage. Pass "
                "the original stream from build_feature_stream, or "
                "materialize features on the host first.")
        lazy = gidx is not None and self._make_decode_fn is not None
        pending = []
        for s_len, idxs in sorted(groups.items()):
            decode = (self._decode_lazy_for(s_len) if lazy
                      else self._decode_for(s_len))
            for c0 in range(0, len(idxs), cap):
                chunk = idxs[c0:c0 + cap]
                cn = len(chunk)
                bucket = self._min_bucket  # mesh data-axis size, else 1
                while bucket < cn:
                    bucket *= 2
                batch = np.zeros((bucket, s_len, enc_dim), np.float32)
                idxb = np.full((bucket, s_len), -1, np.int32)
                for bi, wi in enumerate(chunk):
                    _, ci, cj, _ = windows[wi]
                    batch[bi, 0] = sp
                    batch[bi, 1:1 + cj - ci] = features[ci:cj]
                    batch[bi, 1 + cj - ci] = -sp
                    if lazy:
                        idxb[bi, 1:1 + cj - ci] = gidx[ci:cj]
                # padding rows copy the first window: a fully-masked
                # encoder row would NaN its attention and defeat the
                # early-exit test
                batch[cn:] = batch[0]
                if lazy:
                    idxb[cn:] = idxb[0]
                    chunk_codes, _ = decode(
                        self.tf_vars, jnp.asarray(batch),
                        features.glyph_dev, jnp.asarray(idxb))
                else:
                    chunk_codes, _ = decode(self.tf_vars,
                                            jnp.asarray(batch))
                pending.append((chunk, chunk_codes))

        texts: List[str] = [""] * len(windows)
        for chunk, chunk_codes in pending:
            codes = np.asarray(chunk_codes)
            for bi, wi in enumerate(chunk):
                out = []
                for p in codes[bi]:
                    p = int(p)
                    if p == DECODER_SOT:
                        continue
                    if p in (DECODER_PAD, DECODER_EOT):
                        break
                    if 0xD800 <= p <= 0xDFFF or p > MAX_CODEPOINT:
                        out.append("�")
                    else:
                        out.append(chr(p))
                texts[wi] = "".join(out)
        return texts

    # ------------------------------------------------------------------
    # stage 4: assembly
    # ------------------------------------------------------------------

    def assemble(self, locations, feature_idx, windows, texts,
                 resize: float = 1.0) -> Dict:
        outdict = {"box": [], "line": [], "block": [], "text": ""}
        result_txt = ""
        linebuf = []
        for (prev_j, ci, cj, keep_back), txt in zip(windows, texts):
            kept = txt[keep_back:]
            result_txt += kept
            linebuf.append((prev_j, cj, kept))

        lx1 = ly1 = lx2 = ly2 = -2000.0
        line_text = ""
        blockidx = lineidx = 0

        def flush_line():
            nonlocal lx1, ly1, lx2, ly2, line_text
            if line_text:
                outdict["line"].append({
                    "x1": float(lx1 / resize), "y1": float(ly1 / resize),
                    "x2": float(lx2 / resize), "y2": float(ly2 / resize),
                    "blockidx": blockidx, "lineidx": lineidx,
                    "text": line_text,
                    "aozora": decode_ruby(line_text, "aozora"),
                    "noruby": decode_ruby(line_text, "noruby"),
                })
            lx1 = ly1 = lx2 = ly2 = -2000.0
            line_text = ""

        for prev_j, cur_j, predstr in linebuf:
            k_iter = iter(range(prev_j, cur_j))
            try:
                k = next(k_iter)
                for c in predstr:
                    if c in ("￹", "￺", "￻"):
                        line_text += c
                        continue
                    if feature_idx[k][0] < 0 or c == "\n":
                        flush_line()
                        while feature_idx[k][0] < 0:
                            k = next(k_iter)
                        if c == "\n":
                            continue
                    if c in UNICODE_WHITESPACE:
                        line_text += c
                        continue
                    bid, blockidx, lineidx, subidx, subtype = feature_idx[k]
                    loc = locations[bid]
                    cx, cy, w, h = loc[1:5]
                    ruby = 1 if (subtype & 6) == 6 else 0
                    rubybase = 1 if (subtype & 6) == 2 else 0
                    emphasis = 1 if subtype & 16 else 0
                    vertical = 1 if subtype & 1 else 0
                    if ruby == 0:
                        lx1 = cx - w / 2 if lx1 < -1000 else min(lx1, cx - w / 2)
                        lx2 = cx + w / 2 if lx2 < -1000 else max(lx2, cx + w / 2)
                        ly1 = cy - h / 2 if ly1 < -1000 else min(ly1, cy - h / 2)
                        ly2 = cy + h / 2 if ly2 < -1000 else max(ly2, cy + h / 2)
                    line_text += c
                    outdict["box"].append({
                        "cx": float(cx / resize), "cy": float(cy / resize),
                        "w": float(w / resize), "h": float(h / resize),
                        "text": c, "blockidx": blockidx, "lineidx": lineidx,
                        "subidx": subidx, "ruby": ruby,
                        "rubybase": rubybase, "emphasis": emphasis,
                        "vertical": vertical,
                    })
                    k = next(k_iter)
            except StopIteration:
                pass
        flush_line()

        # blocks: aggregate line entries
        by_block: Dict[int, List[dict]] = {}
        for li in outdict["line"]:
            by_block.setdefault(li["blockidx"], []).append(li)
        for b, lis in sorted(by_block.items()):
            block_text = "\n".join(li["text"] for li in lis)
            outdict["block"].append({
                "blockidx": b,
                "x1": min(li["x1"] for li in lis),
                "y1": min(li["y1"] for li in lis),
                "x2": max(li["x2"] for li in lis),
                "y2": max(li["y2"] for li in lis),
                "text": block_text,
                "aozora": decode_ruby(block_text, "aozora"),
                "noruby": decode_ruby(block_text, "noruby"),
            })
        outdict["text"] = result_txt
        # top-level markup variants (process_ocr_base.py:463-465)
        outdict["aozora"] = decode_ruby(result_txt, "aozora")
        outdict["noruby"] = decode_ruby(result_txt, "noruby")
        return outdict

    # ------------------------------------------------------------------

    # measurement/debug hook: when set to a callable
    # ``hook(page: DetectedPage, image) -> DetectedPage``, it runs right
    # after run_detector in __call__ and may replace the detections the
    # downstream stages consume. bench.py uses it to measure the full
    # ocr_pages wall-clock with the REAL device detector cost but
    # trained-weight detection statistics (published weights are not
    # reachable from this box; an untrained detector shreds pages into
    # hundreds of degenerate decode windows, which measures a
    # pathological load, not the production one). Not a serving feature;
    # None (default) is a no-op.
    detections_hook = None

    def __call__(self, image: np.ndarray, resize: float = 1.0,
                 twopass: bool = False) -> Dict:
        """Full OCR of an RGB uint8 page image."""
        if resize != 1.0:
            from PIL import Image as PILImage
            pim = PILImage.fromarray(image)
            pim = pim.resize((int(pim.width * resize),
                              int(pim.height * resize)),
                             PILImage.Resampling.BILINEAR)
            image = np.asarray(pim)
        page = self.run_detector(image, twopass=twopass)
        if self.detections_hook is not None:
            page = self.detections_hook(page, image)
        if len(page.locations) == 0:
            return {"box": [], "line": [], "block": [], "text": "",
                    "aozora": "", "noruby": ""}
        detected = self.run_line_engine(page)
        features, feature_idx = self.build_feature_stream(
            detected, page.features)
        windows = self.split_windows(
            features, self.transformer.dims.max_enc_seq_len,
            self.cfg.inference.max_windows_per_page)
        texts = self.decode_windows(features, windows)
        return self.assemble(page.locations, feature_idx, windows, texts,
                             resize)


def ocr_pages(pipeline: OCRPipeline, images, workers: int = 2,
              resize: float = 1.0, twopass: bool = False) -> List[Dict]:
    """OCR several pages with host/device overlap.

    JAX device dispatch is asynchronous and readbacks release the GIL, so
    two worker threads keep the TPU busy with page N+1's detector/decoder
    while page N runs its host stages (filter, line engine, assembly) —
    a software pipeline over the in-order device stream. Results keep the
    input order.
    """
    from concurrent.futures import ThreadPoolExecutor

    if workers <= 1 or len(images) <= 1:
        return [pipeline(im, resize, twopass=twopass) for im in images]
    with ThreadPoolExecutor(max_workers=workers) as ex:
        futs = [ex.submit(pipeline, im, resize, twopass=twopass)
                for im in images]
        return [f.result() for f in futs]


def ocr_file(path: str, pipeline: OCRPipeline, resize: float = 1.0,
             save_json: bool = True, twopass: bool = False) -> Dict:
    from PIL import Image as PILImage
    img = np.asarray(PILImage.open(path).convert("RGB"))
    out = pipeline(img, resize, twopass=twopass)
    if save_json:
        with open(path + ".json", "w", encoding="utf-8") as f:
            json.dump(out, f, ensure_ascii=False, indent=1)
    return out
