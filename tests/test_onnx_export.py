"""Self-contained ONNX export: emitted graphs reproduce the flax models.

The emitted artifacts mirror the reference's four deployment graphs
(`/root/reference/convert1_onnx.py:29-56`, `convert3_onnx.py:39-56`).
With no onnxruntime in the image, validation runs the serialized graphs
through the in-tree numpy evaluator (`export/onnx_writer.OnnxEvaluator`)
and compares against the live flax forward passes.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from findtextcenternet_tpu.export.onnx_models import (
    emit_code_decoder, emit_detector, emit_transformer_decoder,
    emit_transformer_encoder,
)
from findtextcenternet_tpu.export.onnx_writer import (
    OnnxEvaluator, OnnxGraph, parse_model,
)
from findtextcenternet_tpu.models import Transformer, TransformerDims
from findtextcenternet_tpu.models.detector import (
    CenterNetDetection, SimpleDecoder, detect_peaks,
)
from findtextcenternet_tpu.models.transformer import make_key_mask

TINY = TransformerDims(enc_input_dim=12, embed_dim=16, head_num=2,
                       enc_block_num=2, dec_block_num=2,
                       max_enc_seq_len=8, max_dec_seq_len=8)


def test_wire_roundtrip():
    g = OnnxGraph("t")
    x = g.add_input("x", [1, 4])
    w = g.init(np.arange(8, dtype=np.float32).reshape(4, 2), "w")
    g.node("MatMul", [x, w], out="y")
    g.add_output("y", [1, 2])
    m = parse_model(g.serialize())
    assert m["opset"] == 20
    assert [n["op"] for n in m["nodes"]] == ["MatMul"]
    assert [o["name"] for o in m["outputs"]] == ["y"]
    assert m["inputs"][0]["shape"] == [1, 4]
    np.testing.assert_array_equal(
        m["inits"]["w_1"], np.arange(8, dtype=np.float32).reshape(4, 2))


def test_detector_onnx_matches_flax(rng):
    model = CenterNetDetection(model_size="tiny", feature_dim=8)
    img = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img)
    # random-walk the batch stats so BN isn't the identity
    variables = jax.tree.map(
        lambda a: a + 0.05 * rng.standard_normal(a.shape).astype(a.dtype)
        if a.dtype == jnp.float32 else a, variables)

    heat, feat = model.apply(variables, img)
    live = detect_peaks(heat)

    blob = emit_detector(jax.tree.map(np.asarray, variables), "tiny",
                         height=64, width=64, feature_dim=8)
    out = OnnxEvaluator(blob)(
        image=np.transpose(np.asarray(img), (0, 3, 1, 2)))
    got_heat = np.transpose(out["heatmap"], (0, 2, 3, 1))
    got_feat = np.transpose(out["feature"], (0, 2, 3, 1))
    np.testing.assert_allclose(got_heat, np.asarray(live),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got_feat, np.asarray(feat),
                               rtol=1e-4, atol=1e-4)


def test_code_decoder_onnx_matches_flax(rng):
    model = SimpleDecoder(mid_dim=32)
    x = jnp.asarray(rng.standard_normal((4, 100)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(1), x)
    variables = jax.tree.map(
        lambda a: a + 0.05 * rng.standard_normal(a.shape).astype(a.dtype)
        if a.dtype == jnp.float32 else a, variables)
    live = model.apply(variables, x)

    blob = emit_code_decoder(jax.tree.map(np.asarray, variables), batch=4)
    out = OnnxEvaluator(blob)(feature_input=np.asarray(x))
    from findtextcenternet_tpu.const import MODULO_LIST
    for m, lv in zip(MODULO_LIST, live):
        np.testing.assert_allclose(
            out[f"modulo_{m}"], np.asarray(jax.nn.softmax(lv, axis=-1)),
            rtol=1e-4, atol=1e-5)


def test_detector_qdq_onnx(rng):
    """Static-int8 QDQ artifact: calibrated edges quantize, excluded
    heads stay float, outputs stay close to the float graph."""
    from findtextcenternet_tpu.export.onnx_models import (
        QdqContext, emit_detector_qdq,
    )
    from findtextcenternet_tpu.export.quantize import (
        calibrate_detector_edges,
    )

    model = CenterNetDetection(model_size="tiny", feature_dim=8)
    img = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img)

    batches = [np.asarray(rng.random((1, 64, 64, 3)), np.float32)
               for _ in range(2)]
    ranges = calibrate_detector_edges(model, variables, batches)
    assert "backbone/stem" in ranges
    assert "backbone/stage0_block0/expand" in ranges

    np_vars = jax.tree.map(np.asarray, variables)
    qblob = emit_detector_qdq(np_vars, ranges, "tiny",
                              height=64, width=64, feature_dim=8)
    m = parse_model(qblob)
    ops = [n["op"] for n in m["nodes"]]
    assert ops.count("QuantizeLinear") >= 8          # backbone edges
    wdq = [n for n in m["nodes"]
           if n["op"] == "DequantizeLinear" and n["attrs"].get("axis") == 0]
    assert len(wdq) >= 8                             # per-channel weights
    # int8 weight initializers exist and shrink the payload
    assert any(m["inits"][n["inputs"][0]].dtype == np.int8 for n in wdq)

    fblob = emit_detector(np_vars, "tiny", height=64, width=64,
                          feature_dim=8)
    feeds = {"image": np.transpose(np.asarray(img), (0, 3, 1, 2))}
    ref = OnnxEvaluator(fblob)(**feeds)
    got = OnnxEvaluator(qblob)(**feeds)
    for k in ("heatmap", "feature"):
        a, b = got[k], ref[k]
        a, b = np.nan_to_num(a, neginf=0), np.nan_to_num(b, neginf=0)
        rms = float(np.sqrt(np.mean(b ** 2))) or 1.0
        assert float(np.sqrt(np.mean((a - b) ** 2))) / rms < 0.25

    # excluding everything degenerates to the float graph, bit-identical
    allx = emit_detector(np_vars, "tiny", height=64, width=64,
                         feature_dim=8,
                         qdq=QdqContext(ranges, exclude=[r".*"]))
    out2 = OnnxEvaluator(allx)(**feeds)
    for k in ("heatmap", "feature"):
        np.testing.assert_array_equal(
            np.nan_to_num(out2[k], neginf=0),
            np.nan_to_num(ref[k], neginf=0))


@pytest.fixture(scope="module")
def tf_model_and_vars():
    model = Transformer(TINY)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 8, 12)),
                           jnp.zeros((1, 8), jnp.int32))
    return model, variables


def test_transformer_encoder_onnx_matches_flax(rng, tf_model_and_vars):
    model, variables = tf_model_and_vars
    enc_in = np.asarray(rng.standard_normal((1, 8, 12)), np.float32)
    enc_in[0, 6:] = 0.0          # padding tail exercises the key mask
    live = model.apply(variables, jnp.asarray(enc_in),
                       method=Transformer.encode)

    blob = emit_transformer_encoder(jax.tree.map(np.asarray, variables),
                                    TINY)
    km = np.where(np.all(enc_in == 0, -1), -np.inf, 0.0)[:, None, None, :]
    out = OnnxEvaluator(blob)(encoder_input=enc_in,
                              key_mask=km.astype(np.float32))
    np.testing.assert_allclose(out["encoder_output"], np.asarray(live),
                               rtol=1e-4, atol=1e-5)


def test_coreml_mapping_detector_matches_onnx(rng):
    """The ONNX->MIL mapping (numpy backend) reproduces the detector
    graph — the in-tree validation of the CoreML conversion path."""
    from findtextcenternet_tpu.export.coreml_models import run_mapped_numpy

    model = CenterNetDetection(model_size="tiny", feature_dim=8)
    img = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img)
    blob = emit_detector(jax.tree.map(np.asarray, variables), "tiny",
                         height=64, width=64, feature_dim=8)
    feeds = {"image": np.transpose(np.asarray(img), (0, 3, 1, 2))}
    ref = OnnxEvaluator(blob)(**feeds)
    got = run_mapped_numpy(blob, feeds)
    assert set(got) == set(ref)
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], rtol=1e-5, atol=1e-5)


def test_coreml_mapping_transformer_matches_onnx(rng, tf_model_and_vars):
    from findtextcenternet_tpu.export.coreml_models import run_mapped_numpy

    model, variables = tf_model_and_vars
    enc_in = np.asarray(rng.standard_normal((1, 8, 12)), np.float32)
    km = np.zeros((1, 1, 1, 8), np.float32)
    blob = emit_transformer_encoder(jax.tree.map(np.asarray, variables),
                                    TINY)
    feeds = {"encoder_input": enc_in, "key_mask": km}
    ref = OnnxEvaluator(blob)(**feeds)
    got = run_mapped_numpy(blob, feeds)
    np.testing.assert_allclose(got["encoder_output"],
                               ref["encoder_output"], rtol=1e-5, atol=1e-5)

    enc_out = ref["encoder_output"]
    dec_blob = emit_transformer_decoder(
        jax.tree.map(np.asarray, variables), TINY)
    dfeeds = {"encoder_output": enc_out,
              "decoder_input": rng.integers(0, 5000, (1, 8)).astype(
                  np.int64),
              "key_mask": km}
    dref = OnnxEvaluator(dec_blob)(**dfeeds)
    dgot = run_mapped_numpy(dec_blob, dfeeds)
    for k in dref:
        np.testing.assert_allclose(dgot[k], dref[k], rtol=1e-5, atol=1e-6)


def test_transformer_decoder_onnx_matches_flax(rng, tf_model_and_vars):
    model, variables = tf_model_and_vars
    enc_in = jnp.asarray(rng.standard_normal((1, 8, 12)), jnp.float32)
    km = make_key_mask(enc_in)
    enc_out = model.apply(variables, enc_in, method=Transformer.encode)
    dec_in = rng.integers(0, 5000, (1, 8))
    live = model.apply(variables, jnp.asarray(dec_in, jnp.int32), enc_out,
                       km, method=Transformer.decode)

    blob = emit_transformer_decoder(jax.tree.map(np.asarray, variables),
                                    TINY)
    out = OnnxEvaluator(blob)(
        encoder_output=np.asarray(enc_out),
        decoder_input=dec_in.astype(np.int64),
        key_mask=np.asarray(km, np.float32))
    from findtextcenternet_tpu.const import MODULO_LIST
    for m, lv in zip(MODULO_LIST, live):
        np.testing.assert_allclose(
            out[f"modulo_{m}"], np.asarray(jax.nn.softmax(lv, axis=-1)),
            rtol=1e-4, atol=1e-5)


def test_fp16_weight_storage(rng):
    """half=True stores f32 initializers as fp16 + Cast (the reference's
    convert_fp16_onnx.py payload): ~half the bytes, close outputs."""
    model = CenterNetDetection(model_size="tiny", feature_dim=8)
    img = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img)
    np_vars = jax.tree.map(np.asarray, variables)

    f32 = emit_detector(np_vars, "tiny", height=64, width=64,
                        feature_dim=8)
    f16 = emit_detector(np_vars, "tiny", height=64, width=64,
                        feature_dim=8, half=True)
    assert len(f16) < 0.62 * len(f32)
    m = parse_model(f16)
    assert any(n["op"] == "Cast" for n in m["nodes"])
    assert any(v.dtype == np.float16 for v in m["inits"].values())

    feeds = {"image": np.transpose(np.asarray(img), (0, 3, 1, 2))}
    ref = OnnxEvaluator(f32)(**feeds)
    got = OnnxEvaluator(f16)(**feeds)
    for k in ("heatmap", "feature"):
        a = np.nan_to_num(got[k], neginf=0)
        b = np.nan_to_num(ref[k], neginf=0)
        rms = float(np.sqrt(np.mean(b ** 2))) or 1.0
        assert float(np.sqrt(np.mean((a - b) ** 2))) / rms < 0.05

    with pytest.raises(ValueError, match="mutually exclusive"):
        from findtextcenternet_tpu.export.onnx_models import QdqContext
        emit_detector(np_vars, "tiny", height=64, width=64, feature_dim=8,
                      half=True, qdq=QdqContext({}))


def test_fp16_transformer_roundtrip(rng, tf_model_and_vars):
    model, variables = tf_model_and_vars
    np_vars = jax.tree.map(np.asarray, variables)
    enc_in = np.asarray(rng.standard_normal((1, 8, 12)), np.float32)
    km = np.zeros((1, 1, 1, 8), np.float32)
    f32 = emit_transformer_encoder(np_vars, TINY)
    f16 = emit_transformer_encoder(np_vars, TINY, half=True)
    assert len(f16) < 0.75 * len(f32)
    a = OnnxEvaluator(f32)(encoder_input=enc_in, key_mask=km)
    b = OnnxEvaluator(f16)(encoder_input=enc_in, key_mask=km)
    np.testing.assert_allclose(a["encoder_output"], b["encoder_output"],
                               rtol=0.15, atol=0.05)


def test_symbolic_batch_evaluates_batched(rng, tf_model_and_vars):
    """Artifacts carry a symbolic batch dim: a batch-2 evaluation equals
    two stacked batch-1 evaluations (the from_onnx driver relies on it
    to run tile chunks / window buckets in one call)."""
    model, variables = tf_model_and_vars
    np_vars = jax.tree.map(np.asarray, variables)
    blob = emit_transformer_encoder(np_vars, TINY)
    ev = OnnxEvaluator(blob)
    enc_in = np.asarray(rng.standard_normal((2, 8, 12)), np.float32)
    km = np.zeros((2, 1, 1, 8), np.float32)
    both = ev(encoder_input=enc_in, key_mask=km)["encoder_output"]
    for i in range(2):
        one = ev(encoder_input=enc_in[i:i + 1],
                 key_mask=km[i:i + 1])["encoder_output"]
        np.testing.assert_allclose(both[i:i + 1], one, rtol=1e-5,
                                   atol=1e-6)

    dec_blob = emit_transformer_decoder(np_vars, TINY)
    dv = OnnxEvaluator(dec_blob)
    d_in = rng.integers(0, 5000, (2, 8)).astype(np.int64)
    dboth = dv(encoder_output=both, decoder_input=d_in, key_mask=km)
    done = dv(encoder_output=both[:1], decoder_input=d_in[:1],
              key_mask=km[:1])
    from findtextcenternet_tpu.const import MODULO_LIST
    for m in MODULO_LIST:
        np.testing.assert_allclose(dboth[f"modulo_{m}"][:1],
                                   done[f"modulo_{m}"], rtol=1e-5,
                                   atol=1e-6)

    det_model = CenterNetDetection(model_size="tiny", feature_dim=8)
    img = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
    dvars = det_model.init(jax.random.PRNGKey(0), img)
    dblob = emit_detector(jax.tree.map(np.asarray, dvars), "tiny",
                          height=64, width=64, feature_dim=8)
    de = OnnxEvaluator(dblob)
    feeds = np.transpose(np.asarray(img), (0, 3, 1, 2))
    b2 = de(image=feeds)
    b1 = de(image=feeds[:1])
    np.testing.assert_allclose(
        np.nan_to_num(b2["heatmap"][:1], neginf=0),
        np.nan_to_num(b1["heatmap"], neginf=0), rtol=1e-5, atol=1e-6)


def test_conv_batch_chunking_matches_unchunked(rng, monkeypatch):
    """The evaluator slices very large conv batches to bound the im2col
    buffer; the chunked path must be numerically identical."""
    x = np.asarray(rng.standard_normal((6, 3, 16, 16)), np.float32)
    w = np.asarray(rng.standard_normal((4, 3, 3, 3)), np.float32)
    b = np.asarray(rng.standard_normal(4), np.float32)
    full = OnnxEvaluator.op_conv(x, w, b, strides=(1, 1),
                                 pads=(1, 1, 1, 1))
    monkeypatch.setattr(OnnxEvaluator, "CONV_BUFFER_BYTES",
                        x[0:2].size * 9 * 4)   # forces ~2-sample chunks
    chunked = OnnxEvaluator.op_conv(x, w, b, strides=(1, 1),
                                    pads=(1, 1, 1, 1))
    np.testing.assert_array_equal(full, chunked)
