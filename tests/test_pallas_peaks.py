"""Pallas NMS kernel vs XLA reference (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from findtextcenternet_tpu.ops.pallas_kernels import nms_sigmoid_masked
from findtextcenternet_tpu.ops.peaks import extract_peaks, nms_peakmap


def test_pallas_kernel_matches_xla(rng):
    x = jnp.asarray(rng.standard_normal((3, 32, 32)).astype(np.float32))
    m = jnp.asarray(rng.uniform(size=(3, 32, 32)) > 0.4)
    out = np.asarray(nms_sigmoid_masked(x, m, interpret=True))
    logits = np.asarray(nms_peakmap(x))
    ref = np.where(np.isneginf(logits), 0.0,
                   np.asarray(jax.nn.sigmoid(jnp.asarray(logits))))
    ref = ref * np.asarray(m)
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_extract_peaks_backends_agree(rng):
    heat = jnp.asarray(rng.standard_normal((2, 16, 16, 9)).astype(np.float32))
    feats = jnp.asarray(rng.standard_normal((2, 16, 16, 4)).astype(np.float32))
    a = extract_peaks(heat, feats, max_peaks=8, use_pallas=False)
    # interpret-mode pallas path via explicit kernel call comparison is
    # covered above; here verify the XLA fallback output contract
    assert a["score"].shape == (2, 8)
    assert a["feature"].shape == (2, 8, 4)
    # scores sorted descending
    s = np.asarray(a["score"])
    assert (np.diff(s, axis=1) <= 1e-6).all()


def test_valid_peaks_are_a_sorted_prefix(rng):
    """OCRPipeline._fetch_peaks slices the feature readback to the valid
    rows, which is only safe because ownership masking happens BEFORE
    top_k: scores sort descending, so `valid = score >= threshold` must
    be a prefix of every row. Pin the invariant."""
    heat = jnp.asarray(
        rng.standard_normal((3, 24, 24, 9)).astype(np.float32))
    feats = jnp.asarray(
        rng.standard_normal((3, 24, 24, 4)).astype(np.float32))
    mask = jnp.asarray(rng.uniform(size=(3, 24, 24)) > 0.5)
    p = extract_peaks(heat, feats, max_peaks=32, threshold=0.4,
                      region_mask=mask, use_pallas=False)
    valid = np.asarray(p["valid"])
    assert valid.any() and not valid.all()
    counts = valid.sum(axis=1)
    for b in range(valid.shape[0]):
        assert valid[b, :counts[b]].all() and not valid[b, counts[b]:].any()
