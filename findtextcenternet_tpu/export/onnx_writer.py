"""Self-contained ONNX serialization: protobuf wire-format writer, graph
builder, and a numpy reference evaluator.

The image ships no ``onnx``/``onnxruntime`` packages and torch's
exporters require them, so this module encodes the ONNX ``ModelProto``
wire format directly (field numbers follow the public onnx.proto
schema). The reference ships ONNX deployment artifacts
(`/root/reference/convert1_onnx.py`, `convert3_onnx.py`); the emitters
in :mod:`onnx_models` build the same four graphs from flax variables,
and :class:`OnnxEvaluator` executes the emitted op subset in numpy so
the artifacts are validated against the flax models in-tree.
"""
from __future__ import annotations

import struct
from typing import Dict, List, Optional, Sequence

import numpy as np

# ---------------------------------------------------------------------------
# protobuf wire format
# ---------------------------------------------------------------------------


def _varint(n: int) -> bytes:
    out = bytearray()
    n &= (1 << 64) - 1
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _key(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _f_int(field: int, v: int) -> bytes:
    return _key(field, 0) + _varint(int(v))


def _f_bytes(field: int, v: bytes) -> bytes:
    return _key(field, 2) + _varint(len(v)) + v


def _f_str(field: int, v: str) -> bytes:
    return _f_bytes(field, v.encode("utf-8"))


def _f_float(field: int, v: float) -> bytes:
    return _key(field, 5) + struct.pack("<f", v)


# ONNX TensorProto.DataType
DT_FLOAT, DT_UINT8, DT_INT8, DT_INT32, DT_INT64, DT_BOOL = 1, 2, 3, 6, 7, 9
DT_FLOAT16, DT_DOUBLE = 10, 11
_NP2DT = {
    np.dtype(np.float32): DT_FLOAT, np.dtype(np.uint8): DT_UINT8,
    np.dtype(np.int8): DT_INT8, np.dtype(np.int32): DT_INT32,
    np.dtype(np.int64): DT_INT64, np.dtype(np.bool_): DT_BOOL,
    np.dtype(np.float16): DT_FLOAT16, np.dtype(np.float64): DT_DOUBLE,
}
_DT2NP = {v: k for k, v in _NP2DT.items()}

# AttributeProto.AttributeType
AT_FLOAT, AT_INT, AT_STRING, AT_TENSOR = 1, 2, 3, 4
AT_FLOATS, AT_INTS, AT_STRINGS = 6, 7, 8


def tensor_proto(name: str, arr: np.ndarray) -> bytes:
    arr = np.asarray(arr)
    out = b""
    for d in arr.shape:
        out += _f_int(1, d)                       # dims
    out += _f_int(2, _NP2DT[arr.dtype])           # data_type
    out += _f_str(8, name)                        # name
    out += _f_bytes(9, np.ascontiguousarray(arr).tobytes())  # raw_data
    return out


def _attr(name: str, value) -> bytes:
    out = _f_str(1, name)
    if isinstance(value, float):
        out += _f_float(2, value) + _f_int(20, AT_FLOAT)
    elif isinstance(value, bool) or isinstance(value, (int, np.integer)):
        out += _f_int(3, int(value)) + _f_int(20, AT_INT)
    elif isinstance(value, str):
        out += _f_bytes(4, value.encode()) + _f_int(20, AT_STRING)
    elif isinstance(value, np.ndarray):
        out += _f_bytes(5, tensor_proto("", value)) + _f_int(20, AT_TENSOR)
    elif isinstance(value, (list, tuple)):
        if value and isinstance(value[0], float):
            for v in value:
                out += _f_float(7, v)
            out += _f_int(20, AT_FLOATS)
        elif value and isinstance(value[0], str):
            for v in value:
                out += _f_bytes(9, v.encode())
            out += _f_int(20, AT_STRINGS)
        else:
            for v in value:
                out += _f_int(8, int(v))
            out += _f_int(20, AT_INTS)
    else:
        raise TypeError(f"attr {name}: {type(value)}")
    return out


def _value_info(name: str, dtype: int, shape: Sequence) -> bytes:
    dims = b""
    for d in shape:
        if isinstance(d, str):
            dims += _f_bytes(1, _f_str(2, d))     # dim_param
        else:
            dims += _f_bytes(1, _f_int(1, int(d)))  # dim_value
    tensor_type = _f_int(1, dtype) + _f_bytes(2, dims)
    type_proto = _f_bytes(1, tensor_type)
    return _f_str(1, name) + _f_bytes(2, type_proto)


class OnnxGraph:
    """Accumulates nodes/initializers and serializes a ModelProto.

    ``half_weights`` stores every f32 initializer with >= 16 elements as
    float16 plus a Cast back to f32 at its use site — the deployment
    payload of the reference's ``convert_fp16_onnx.py`` (half-size
    artifacts; runtimes fold or fuse the casts) while compute stays f32.
    """

    def __init__(self, name: str = "graph", opset: int = 20,
                 half_weights: bool = False):
        self.name = name
        self.opset = opset
        self.half_weights = half_weights
        self.nodes: List[bytes] = []
        self.inits: Dict[str, np.ndarray] = {}
        self.inputs: List[bytes] = []
        self.outputs: List[bytes] = []
        self._n = 0

    # -- construction ---------------------------------------------------
    def uniq(self, base: str) -> str:
        self._n += 1
        return f"{base}_{self._n}"

    def add_input(self, name: str, shape, dtype=DT_FLOAT):
        self.inputs.append(_value_info(name, dtype, shape))
        return name

    def add_output(self, name: str, shape, dtype=DT_FLOAT):
        self.outputs.append(_value_info(name, dtype, shape))
        return name

    def init(self, arr: np.ndarray, base: str = "w") -> str:
        arr = np.asarray(arr)
        if self.half_weights and arr.dtype == np.float32 and arr.size >= 16:
            name = self.uniq(base + "_h")
            self.inits[name] = arr.astype(np.float16)
            return self.node("Cast", [name], to=DT_FLOAT)
        name = self.uniq(base)
        self.inits[name] = arr
        return name

    def node(self, op: str, inputs: Sequence[str],
             n_out: int = 1, out: Optional[str] = None,
             **attrs) -> str:
        outs = ([out] if out else
                [self.uniq(op.lower()) for _ in range(n_out)])
        if out and n_out > 1:
            outs = [out] + [self.uniq(op.lower())
                            for _ in range(n_out - 1)]
        body = b""
        for i in inputs:
            body += _f_str(1, i)
        for o in outs:
            body += _f_str(2, o)
        body += _f_str(4, op)
        for k, v in attrs.items():
            body += _f_bytes(5, _attr(k, v))
        self.nodes.append(body)
        return outs[0] if n_out == 1 else outs

    def const(self, arr, base: str = "c") -> str:
        return self.init(np.asarray(arr), base)

    # -- serialization --------------------------------------------------
    def serialize(self, producer: str = "findtextcenternet_tpu") -> bytes:
        g = b""
        for n in self.nodes:
            g += _f_bytes(1, n)
        g += _f_str(2, self.name)
        for name, arr in self.inits.items():
            g += _f_bytes(5, tensor_proto(name, arr))
        for i in self.inputs:
            g += _f_bytes(11, i)
        for o in self.outputs:
            g += _f_bytes(12, o)
        opset = _f_str(1, "") + _f_int(2, self.opset)
        model = (_f_int(1, 10)                  # ir_version 10
                 + _f_str(2, producer)
                 + _f_bytes(7, g)
                 + _f_bytes(8, opset))
        return model

    def save(self, path: str) -> str:
        with open(path, "wb") as f:
            f.write(self.serialize())
        return path


# ---------------------------------------------------------------------------
# minimal protobuf reader (round-trip checks + evaluator input)
# ---------------------------------------------------------------------------


def _read_fields(buf: bytes):
    i, n = 0, len(buf)
    while i < n:
        key, shift = 0, 0
        while True:
            b = buf[i]
            i += 1
            key |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                break
        field, wire = key >> 3, key & 7
        if wire == 0:
            v, shift = 0, 0
            while True:
                b = buf[i]
                i += 1
                v |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            yield field, v
        elif wire == 2:
            ln, shift = 0, 0
            while True:
                b = buf[i]
                i += 1
                ln |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            yield field, buf[i:i + ln]
            i += ln
        elif wire == 5:
            yield field, struct.unpack("<f", buf[i:i + 4])[0]
            i += 4
        else:
            raise ValueError(f"wire type {wire}")


def parse_model(buf: bytes) -> dict:
    """Parse a serialized ModelProto into a dict of nodes/inits/io."""
    model = {"nodes": [], "inits": {}, "inputs": [], "outputs": [],
             "opset": None}
    graph = None
    for f, v in _read_fields(buf):
        if f == 7:
            graph = v
        elif f == 8:
            for f2, v2 in _read_fields(v):
                if f2 == 2:
                    model["opset"] = v2
    if graph is None:
        raise ValueError("no graph")
    for f, v in _read_fields(graph):
        if f == 1:      # node
            node = {"inputs": [], "outputs": [], "op": "", "attrs": {}}
            for f2, v2 in _read_fields(v):
                if f2 == 1:
                    node["inputs"].append(v2.decode())
                elif f2 == 2:
                    node["outputs"].append(v2.decode())
                elif f2 == 4:
                    node["op"] = v2.decode()
                elif f2 == 5:
                    node["attrs"].update(_parse_attr(v2))
            model["nodes"].append(node)
        elif f == 5:    # initializer
            name, arr = _parse_tensor(v)
            model["inits"][name] = arr
        elif f == 11:
            model["inputs"].append(_parse_vi(v))
        elif f == 12:
            model["outputs"].append(_parse_vi(v))
    return model


def _parse_tensor(buf: bytes):
    dims, dt, name, raw = [], DT_FLOAT, "", b""
    for f, v in _read_fields(buf):
        if f == 1:
            dims.append(v)
        elif f == 2:
            dt = v
        elif f == 8:
            name = v.decode()
        elif f == 9:
            raw = v
    arr = np.frombuffer(raw, _DT2NP[dt]).reshape(dims)
    return name, arr


def _parse_attr(buf: bytes) -> dict:
    name, val, ints, floats = "", None, [], []
    for f, v in _read_fields(buf):
        if f == 1:
            name = v.decode()
        elif f == 2:
            val = v
        elif f == 3:
            val = v if v < (1 << 63) else v - (1 << 64)
        elif f == 4:
            val = v.decode()
        elif f == 5:
            val = _parse_tensor(v)[1]
        elif f == 7:
            floats.append(v)
        elif f == 8:
            ints.append(v if v < (1 << 63) else v - (1 << 64))
    if ints:
        val = ints
    if floats:
        val = floats
    return {name: val}


def _parse_vi(buf: bytes):
    """ValueInfoProto -> {name, dtype, shape} (shape dims are int or
    str for symbolic dim_params)."""
    name, dtype, shape = "", None, []
    for f, v in _read_fields(buf):
        if f == 1:
            name = v.decode()
        elif f == 2:                       # TypeProto
            for f2, v2 in _read_fields(v):
                if f2 != 1:                # tensor_type
                    continue
                for f3, v3 in _read_fields(v2):
                    if f3 == 1:
                        dtype = v3
                    elif f3 == 2:          # TensorShapeProto
                        for f4, v4 in _read_fields(v3):
                            if f4 != 1:    # dim
                                continue
                            for f5, v5 in _read_fields(v4):
                                if f5 == 1:
                                    shape.append(v5)
                                elif f5 == 2:
                                    shape.append(v5.decode())
    return {"name": name, "dtype": dtype, "shape": shape}


# ---------------------------------------------------------------------------
# numpy evaluator (the emitted op subset)
# ---------------------------------------------------------------------------


class OnnxEvaluator:
    """Execute an emitted graph in numpy — in-tree validation of the
    artifacts against the flax models (no onnxruntime in this image)."""

    def __init__(self, model_bytes: bytes):
        self.m = parse_model(model_bytes)

    def __call__(self, **feeds) -> Dict[str, np.ndarray]:
        env: Dict[str, np.ndarray] = dict(self.m["inits"])
        env.update({k: np.asarray(v) for k, v in feeds.items()})
        for node in self.m["nodes"]:
            fn = getattr(self, "op_" + node["op"].lower(), None)
            if fn is None:
                raise NotImplementedError(node["op"])
            args = [env[i] if i else None for i in node["inputs"]]
            res = fn(*args, **node["attrs"])
            if not isinstance(res, tuple):
                res = (res,)
            for o, r in zip(node["outputs"], res):
                env[o] = r
        return {o["name"]: env[o["name"]] for o in self.m["outputs"]}

    # --- ops -----------------------------------------------------------
    # im2col working-set cap for batched conv; module-level so tests can
    # exercise the chunked path with small tensors
    CONV_BUFFER_BYTES = 512 * 1024 * 1024

    @staticmethod
    def op_conv(x, w, b=None, *, strides=(1, 1), pads=(0, 0, 0, 0),
                group=1, kernel_shape=None, dilations=None):
        del kernel_shape, dilations
        n, ci, h, wd = x.shape
        co, cig, kh, kw = w.shape
        sh, sw = strides
        pt, pl, pb, pr = pads
        # the im2col buffer scales with batch; slice large batches so a
        # symbolic-batch artifact never materializes multi-GB buffers
        oh_est = (h + pt + pb - kh) // sh + 1
        ow_est = (wd + pl + pr - kw) // sw + 1
        per_sample = 4 * (ci // group) * kh * kw * oh_est * ow_est
        budget = OnnxEvaluator.CONV_BUFFER_BYTES
        if n > 1 and n * per_sample > budget:
            step = max(1, budget // max(1, per_sample))
            return np.concatenate(
                [OnnxEvaluator.op_conv(
                    x[i:i + step], w, b, strides=strides, pads=pads,
                    group=group)
                 for i in range(0, n, step)], axis=0)
        xp = np.pad(x, ((0, 0), (0, 0), (pt, pb), (pl, pr)))
        oh = (xp.shape[2] - kh) // sh + 1
        ow = (xp.shape[3] - kw) // sw + 1
        # im2col per group
        out = np.zeros((n, co, oh, ow), np.float32)
        cpg_i, cpg_o = ci // group, co // group
        for g in range(group):
            xg = xp[:, g * cpg_i:(g + 1) * cpg_i]
            wg = w[g * cpg_o:(g + 1) * cpg_o]
            cols = np.empty((n, cpg_i * kh * kw, oh * ow), np.float32)
            idx = 0
            for dy in range(kh):
                for dx in range(kw):
                    patch = xg[:, :, dy:dy + oh * sh:sh,
                               dx:dx + ow * sw:sw]
                    cols[:, idx * cpg_i:(idx + 1) * cpg_i] = \
                        patch.reshape(n, cpg_i, -1)
                    idx += 1
            wm = wg.transpose(0, 2, 3, 1).reshape(cpg_o, -1)
            # reorder cols to (kh*kw, ci) like wm
            cols = cols.reshape(n, kh * kw, cpg_i, -1).transpose(
                0, 1, 2, 3).reshape(n, kh * kw * cpg_i, -1)
            out[:, g * cpg_o:(g + 1) * cpg_o] = (
                wm @ cols).reshape(n, cpg_o, oh, ow)
        if b is not None:
            out += b.reshape(1, -1, 1, 1)
        return out

    @staticmethod
    def op_batchnormalization(x, scale, bias, mean, var, *,
                              epsilon=1e-5, momentum=0.9):
        del momentum
        shape = [1, -1] + [1] * (x.ndim - 2)
        return ((x - mean.reshape(shape))
                / np.sqrt(var.reshape(shape) + epsilon)
                * scale.reshape(shape) + bias.reshape(shape))

    @staticmethod
    def op_sigmoid(x):
        return 1.0 / (1.0 + np.exp(-x))

    @staticmethod
    def op_gelu(x, *, approximate="none"):
        del approximate   # emitters use exact gelu only
        try:
            from scipy.special import erf
        except ImportError:                       # pragma: no cover
            import math
            erf = np.vectorize(math.erf, otypes=[np.float32])
        return (0.5 * x * (1.0 + erf(
            (x / np.sqrt(2.0)).astype(np.float32)))).astype(np.float32)

    @staticmethod
    def op_mul(a, b):
        return a * b

    @staticmethod
    def op_add(a, b):
        return a + b

    @staticmethod
    def op_sub(a, b):
        return a - b

    @staticmethod
    def op_div(a, b):
        return a / b

    @staticmethod
    def op_erf(x):
        # Abramowitz-Stegun 7.1.26 is not exact enough; use the exact
        # relation via the complementary error function series — numpy
        # lacks erf, math.erf is scalar; vectorize it.
        import math
        return np.vectorize(math.erf, otypes=[np.float32])(
            x.astype(np.float32))

    @staticmethod
    def op_reducemean(x, axes=None, *, keepdims=1, **kw):
        ax = tuple(kw.get("axes", axes if axes is not None else []))
        if not isinstance(ax, tuple):
            ax = tuple(ax)
        if ax and not isinstance(ax[0], (int, np.integer)):
            ax = tuple(int(a) for a in np.asarray(ax[0]).ravel())
        return np.mean(x, axis=ax or None, keepdims=bool(keepdims))

    @staticmethod
    def op_concat(*xs, axis):
        return np.concatenate(xs, axis=axis)

    @staticmethod
    def op_maxpool(x, *, kernel_shape, strides=(1, 1),
                   pads=(0, 0, 0, 0)):
        kh, kw = kernel_shape
        sh, sw = strides
        pt, pl, pb, pr = pads
        xp = np.pad(x, ((0, 0), (0, 0), (pt, pb), (pl, pr)),
                    constant_values=-np.inf)
        oh = (xp.shape[2] - kh) // sh + 1
        ow = (xp.shape[3] - kw) // sw + 1
        out = np.full(x.shape[:2] + (oh, ow), -np.inf, x.dtype)
        for dy in range(kh):
            for dx in range(kw):
                np.maximum(out, xp[:, :, dy:dy + oh * sh:sh,
                                   dx:dx + ow * sw:sw], out=out)
        return out

    @staticmethod
    def op_where(c, a, b):
        return np.where(c, a, b)

    @staticmethod
    def op_less(a, b):
        return a < b

    @staticmethod
    def op_resize(x, roi=None, scales=None, sizes=None, *, mode="linear",
                  coordinate_transformation_mode="align_corners", **kw):
        assert mode in (b"linear", "linear")
        n, c, h, w = x.shape
        if sizes is not None:
            oh, ow = int(sizes[2]), int(sizes[3])
        else:
            oh, ow = int(h * scales[2]), int(w * scales[3])

        def interp_mat(inn, out):
            a = np.zeros((out, inn), np.float32)
            if inn == 1 or out == 1:
                a[:, 0] = 1
                return a
            src = np.arange(out) * (inn - 1) / (out - 1)
            lo = np.floor(src).astype(int)
            hi = np.minimum(lo + 1, inn - 1)
            t = (src - lo).astype(np.float32)
            a[np.arange(out), lo] += 1 - t
            a[np.arange(out), hi] += t
            return a

        ah, aw = interp_mat(h, oh), interp_mat(w, ow)
        y = np.einsum("oh,nchw->ncow", ah, x)
        return np.einsum("ow,nchw->ncho", aw, y).astype(np.float32)

    @staticmethod
    def op_gemm(a, b, c=None, *, alpha=1.0, beta=1.0, transA=0,
                transB=0):
        if transA:
            a = a.T
        if transB:
            b = b.T
        out = alpha * (a @ b)
        if c is not None:
            out = out + beta * c
        return out

    @staticmethod
    def op_matmul(a, b):
        return a @ b

    @staticmethod
    def op_transpose(x, *, perm):
        return np.transpose(x, perm)

    @staticmethod
    def op_reshape(x, shape, **kw):
        # ONNX semantics (allowzero=0): a 0 entry copies the input dim —
        # the emitters use it for the symbolic batch dimension
        dims = [x.shape[i] if int(s) == 0 else int(s)
                for i, s in enumerate([int(v) for v in shape])]
        return x.reshape(dims)

    @staticmethod
    def op_softmax(x, *, axis=-1):
        m = x - x.max(axis=axis, keepdims=True)
        e = np.exp(m)
        return e / e.sum(axis=axis, keepdims=True)

    @staticmethod
    def op_layernormalization(x, scale, bias=None, *, axis=-1,
                              epsilon=1e-5):
        m = x.mean(axis=axis, keepdims=True)
        v = x.var(axis=axis, keepdims=True)
        out = (x - m) / np.sqrt(v + epsilon) * scale
        if bias is not None:
            out = out + bias
        return out

    @staticmethod
    def op_gather(x, idx, *, axis=0):
        return np.take(x, idx.astype(np.int64), axis=axis)

    @staticmethod
    def op_reducesum(x, axes=None, *, keepdims=1, **kw):
        ax = axes
        if ax is not None:
            ax = tuple(int(a) for a in np.asarray(ax).ravel())
        return np.sum(x, axis=ax, keepdims=bool(keepdims))

    @staticmethod
    def op_abs(x):
        return np.abs(x)

    @staticmethod
    def op_identity(x):
        return x

    @staticmethod
    def op_cast(x, *, to):
        return np.asarray(x).astype(_DT2NP[to])

    @staticmethod
    def op_mod(a, b, *, fmod=0):
        return np.fmod(a, b) if fmod else np.mod(a, b)

    @staticmethod
    def op_equal(a, b):
        return a == b

    @staticmethod
    def op_exp(x):
        return np.exp(x)

    @staticmethod
    def op_unsqueeze(x, axes=None, **kw):
        for a in sorted(int(a) for a in np.asarray(axes).ravel()):
            x = np.expand_dims(x, a)
        return x

    @staticmethod
    def _qdq_shape(x, scale, axis):
        if np.ndim(scale) == 0 or np.size(scale) == 1:
            return np.reshape(scale, ())
        shape = [1] * x.ndim
        shape[axis] = -1
        return np.reshape(scale, shape)

    @classmethod
    def op_quantizelinear(cls, x, scale, zp=None, *, axis=1, **kw):
        s = cls._qdq_shape(x, scale, axis)
        z = 0 if zp is None else cls._qdq_shape(x, zp, axis).astype(
            np.int32)
        dt = np.uint8 if zp is None or np.asarray(zp).dtype == np.uint8 \
            else np.int8
        lo, hi = (0, 255) if dt == np.uint8 else (-128, 127)
        return np.clip(np.round(x / s) + z, lo, hi).astype(dt)

    @classmethod
    def op_dequantizelinear(cls, x, scale, zp=None, *, axis=1, **kw):
        s = cls._qdq_shape(x, scale, axis)
        z = 0 if zp is None else cls._qdq_shape(x, zp, axis).astype(
            np.int32)
        return ((x.astype(np.int32) - z) * s).astype(np.float32)
