"""Loss functions vs independent numpy oracles (and torch focal semantics)."""
import jax.numpy as jnp
import numpy as np
import pytest

from findtextcenternet_tpu import losses
from findtextcenternet_tpu.const import MODULO_LIST


def _sigmoid(x):
    return 1 / (1 + np.exp(-x))


def test_heatmap_loss_focal_oracle(rng):
    true = rng.uniform(0, 1, (2, 8, 8)).astype(np.float32)
    true[0, 1, 1] = 1.0
    logits = rng.standard_normal((2, 8, 8)).astype(np.float32)

    p = _sigmoid(logits)
    pos = (true >= 1.0).astype(np.float32)
    neg = 1 - pos
    expect = (
        -np.log(p) * (1 - p) ** 2 * pos
        + -np.log(1 - p) * p ** 2 * (1 - true) ** 4 * neg
    ).mean()
    got = float(losses.heatmap_loss(jnp.asarray(true), jnp.asarray(logits)))
    assert got == pytest.approx(expect, rel=1e-4)


def test_bce_weighted_matches_numpy(rng):
    logits = rng.standard_normal((4, 4)).astype(np.float32)
    labels = (rng.uniform(size=(4, 4)) > 0.5).astype(np.float32)
    w = rng.uniform(0.5, 2.0, (4, 4)).astype(np.float32)
    p = _sigmoid(logits)
    expect = (-(labels * np.log(p) + (1 - labels) * np.log(1 - p)) * w).mean()
    got = float(losses._bce_logits(jnp.asarray(logits), jnp.asarray(labels),
                                   jnp.asarray(w)))
    assert got == pytest.approx(expect, rel=1e-4)


def _fake_detector_batch(rng, b=2, h=16, w=16, k=8):
    labelmap = rng.uniform(0, 1, (b, h, w, 5)).astype(np.float32)
    # a few exact-1 peaks
    labelmap[0, 2, 3, 0] = 1.0
    labelmap[1, 5, 6, 0] = 1.0
    idmap = np.zeros((b, h, w, 2), dtype=np.int32)
    idmap[..., 0] = rng.integers(0, 3000, (b, h, w))
    idmap[..., 1] = rng.integers(0, 16, (b, h, w))
    heatmap = rng.standard_normal((b, h, w, 9)).astype(np.float32)
    fmask_idx = rng.choice(b * h * w, size=b * k, replace=False).astype(np.int32)
    outs = [rng.standard_normal((b * k, m)).astype(np.float32)
            for m in MODULO_LIST]
    return labelmap, idmap, heatmap, fmask_idx, outs


def test_detector_loss_finite_and_structured(rng):
    labelmap, idmap, heatmap, fmask_idx, outs = _fake_detector_batch(rng)
    d = losses.detector_loss(
        jnp.asarray(fmask_idx), jnp.asarray(labelmap), jnp.asarray(idmap),
        jnp.asarray(heatmap), [jnp.asarray(o) for o in outs])
    for name in losses.DETECTOR_LOSS_NAMES:
        assert np.isfinite(float(d[name])), name
    # total is the sum of the components
    comp = sum(float(d[n]) for n in losses.DETECTOR_LOSS_NAMES)
    assert float(d["loss"]) == pytest.approx(comp, rel=1e-5)
    assert int(d["total"]) >= 0


def test_detector_size_loss_weighted_oracle(rng):
    """size_loss: huber on mask(key>0.85) weighted by (key-0.85)/0.15."""
    labelmap, idmap, heatmap, fmask_idx, outs = _fake_detector_batch(rng)
    d = losses.detector_loss(
        jnp.asarray(fmask_idx), jnp.asarray(labelmap), jnp.asarray(idmap),
        jnp.asarray(heatmap), [jnp.asarray(o) for o in outs])
    key = labelmap[..., 0]
    w1 = np.maximum(key - 0.85, 0) / 0.15

    def huber(a, b):
        e = np.abs(a - b)
        return np.where(e < 1, 0.5 * e * e, e - 0.5)

    hx = huber(heatmap[..., 1], labelmap[..., 1])
    hy = huber(heatmap[..., 2], labelmap[..., 2])
    expect = ((hx + hy) * w1).sum() / max(1.0, w1.sum())
    assert float(d["size_loss"]) == pytest.approx(expect, rel=1e-4)


def test_transformer_loss_oracle(rng):
    b, l = 2, 6
    labels = rng.integers(0, 0x3000, (b, l)).astype(np.int32)
    mask = rng.uniform(size=(b, l)) > 0.5
    outs = [rng.standard_normal((b, l, m)).astype(np.float32)
            for m in MODULO_LIST]
    d = losses.transformer_loss([jnp.asarray(o) for o in outs],
                                jnp.asarray(labels), jnp.asarray(mask))

    expect = 0.0
    for m, o in zip(MODULO_LIST, outs):
        tgt = labels % m
        logz = np.log(np.exp(o - o.max(-1, keepdims=True)).sum(-1)) + \
            o.max(-1)
        ce = logz - np.take_along_axis(o, tgt[..., None], axis=-1)[..., 0]
        expect += ce[mask].mean()
    assert float(d["loss"]) == pytest.approx(expect, rel=1e-4)


def test_cov_weighting_schedule():
    state = losses.cov_init(3)
    # iteration 0 and 1: uniform weights
    l0 = [jnp.asarray(1.0), jnp.asarray(2.0), jnp.asarray(4.0)]
    total, state, alphas = losses.cov_apply(state, l0)
    np.testing.assert_allclose(np.asarray(alphas), [1 / 3] * 3, atol=1e-6)
    assert float(total) == pytest.approx((1 + 2 + 4) / 3, rel=1e-5)

    total, state, alphas = losses.cov_apply(state, l0)
    np.testing.assert_allclose(np.asarray(alphas), [1 / 3] * 3, atol=1e-6)

    # vary one loss; its ratio variance grows so its weight should dominate
    for i in range(20):
        lv = [jnp.asarray(1.0), jnp.asarray(2.0),
              jnp.asarray(4.0 * (1.0 + 0.5 * (-1) ** i))]
        total, state, alphas = losses.cov_apply(state, lv)
    a = np.asarray(alphas)
    assert a[2] > a[0] and a[2] > a[1]
    np.testing.assert_allclose(a.sum(), 1.0, atol=1e-5)


def test_cov_eval_is_sum():
    l0 = [jnp.asarray(1.0), jnp.asarray(2.5)]
    assert float(losses.cov_eval(l0)) == pytest.approx(3.5)
