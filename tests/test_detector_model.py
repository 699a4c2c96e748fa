"""Detector model: shapes, peak NMS, fmask top-k."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from findtextcenternet_tpu.models import (
    CenterNetDetection,
    SimpleDecoder,
    TextDetectorModel,
    detect_peaks,
    topk_fmask,
)
from findtextcenternet_tpu.const import MODULO_LIST, NUM_HEATMAP_CH


@pytest.fixture(scope="module")
def small_det():
    model = CenterNetDetection(model_size="s", feature_dim=16)
    x = jnp.zeros((1, 128, 128, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    return model, variables


def test_detector_shapes(small_det):
    model, variables = small_det
    x = jnp.zeros((2, 128, 128, 3))
    heatmap, features = model.apply(variables, x)
    assert heatmap.shape == (2, 32, 32, NUM_HEATMAP_CH)
    assert features.shape == (2, 32, 32, 16)


def test_detector_train_mode_updates_bn(small_det):
    model, variables = small_det
    x = jnp.ones((1, 128, 128, 3)) * 0.3
    _, new_state = model.apply(
        variables, x, True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)})
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(new_state["batch_stats"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(old, new)
    )


def test_simple_decoder_shapes():
    model = SimpleDecoder(mid_dim=64)
    x = jnp.zeros((5, 100))
    variables = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(variables, x)
    assert len(outs) == 3
    for o, m in zip(outs, MODULO_LIST):
        assert o.shape == (5, m)


def test_detect_peaks_matches_naive(rng):
    hm = rng.standard_normal((1, 16, 16, NUM_HEATMAP_CH)).astype(np.float32)
    out = np.asarray(detect_peaks(jnp.asarray(hm)))
    assert out.shape == (1, 16, 16, NUM_HEATMAP_CH + 1)
    key = hm[0, :, :, 0]
    padded = np.pad(key, 1, constant_values=-np.inf)
    for i in range(16):
        for j in range(16):
            local_max = padded[i:i + 3, j:j + 3].max()
            expect = key[i, j] if key[i, j] >= local_max else -np.inf
            assert out[0, i, j, 1] == pytest.approx(expect) or (
                np.isneginf(out[0, i, j, 1]) and np.isneginf(expect))
    # channel 0 is the raw keymap, channels 2.. are passthrough
    np.testing.assert_array_equal(out[..., 0], hm[..., 0])
    np.testing.assert_array_equal(out[..., 2:], hm[..., 1:])


def test_topk_fmask_selects_highest():
    key = np.zeros((2, 8, 8), dtype=np.float32)
    key[0, 1, 2] = 5.0
    key[1, 3, 4] = 7.0
    key[0, 0, 0] = 3.0
    idx = np.asarray(topk_fmask(jnp.asarray(key), k_per_sample=2))
    assert idx.shape == (4,)
    flat = key.reshape(-1)
    top_vals = sorted(flat[idx], reverse=True)
    assert top_vals[0] == 7.0 and top_vals[1] == 5.0 and top_vals[2] == 3.0


def test_text_detector_model_end_to_end():
    model = TextDetectorModel(model_size="s", feature_dim=8,
                              decoder_mid_dim=32)
    x = jnp.zeros((1, 128, 128, 3))
    fmask_idx = jnp.arange(16, dtype=jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), x, fmask_idx)
    heatmap, outs = model.apply(variables, x, fmask_idx)
    assert heatmap.shape == (1, 32, 32, NUM_HEATMAP_CH)
    assert [o.shape for o in outs] == [(16, m) for m in MODULO_LIST]


def test_remat_matches_plain_forward():
    """remat is numerically transparent (same params, same outputs)."""
    import jax
    import numpy as np
    from findtextcenternet_tpu.models import TextDetectorModel

    x = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (1, 64, 64, 3)), jnp.float32)
    fidx = jnp.zeros((8,), jnp.int32)
    plain = TextDetectorModel(model_size="tiny", feature_dim=8,
                              decoder_mid_dim=32)
    rem = TextDetectorModel(model_size="tiny", feature_dim=8,
                            decoder_mid_dim=32, remat=True)
    v = jax.jit(plain.init)(jax.random.PRNGKey(0), x, fidx)
    h1, d1 = plain.apply(v, x, fidx)
    h2, d2 = rem.apply(v, x, fidx)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
    for a, b in zip(d1, d2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # gradients flow through the remat path too
    def loss(params, model):
        h, _ = model.apply({"params": params,
                            "batch_stats": v["batch_stats"]}, x, fidx)
        return jnp.sum(h ** 2)

    g1 = jax.grad(loss)(v["params"], plain)
    g2 = jax.grad(loss)(v["params"], rem)
    a = jax.tree_util.tree_leaves(g1)[0]
    b = jax.tree_util.tree_leaves(g2)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-6)
