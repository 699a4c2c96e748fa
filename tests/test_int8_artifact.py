"""Static int8 detector artifact: per-channel int8 weights with the
reference's head exclusions + calibrated activation QDQ at the artifact
boundary, exported through StableHLO and accuracy-checked against the
float model (`/root/reference/quantize1_onnx.py` counterpart)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from findtextcenternet_tpu.export.quantize import (  # noqa: E402
    build_int8_detector, calibrate_detector,
)
from findtextcenternet_tpu.models.detector import (  # noqa: E402
    CenterNetDetection,
)


@pytest.fixture(scope="module")
def rig():
    det = CenterNetDetection(model_size="tiny", feature_dim=16)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    variables = det.init(jax.random.PRNGKey(1), x)
    imgs = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(2), (2, 1, 64, 64, 3)))
    return det, variables, imgs


def test_int8_detector_accuracy(rig):
    det, variables, imgs = rig
    cal = calibrate_detector(det, variables, list(imgs))
    fn, qvars = build_int8_detector(det, variables, cal)

    # int8 weight tensors actually present (outside the exclusions)
    kinds = set()

    def walk(t):
        if isinstance(t, dict):
            for v in t.values():
                walk(v)
        else:
            kinds.add(np.asarray(t).dtype)

    walk(qvars["params"])
    assert np.dtype(np.int8) in kinds

    heat_f, feat_f = det.apply(variables, jnp.asarray(imgs[0]))
    heat_q, feat_q = jax.jit(fn)(qvars, jnp.asarray(imgs[0]))
    # accuracy delta: int8 per-channel weights + boundary QDQ stay close
    # to the float model (reported, and bounded)
    d_heat = float(jnp.max(jnp.abs(heat_q - heat_f)))
    d_feat = float(jnp.max(jnp.abs(feat_q - feat_f)))
    rms = float(jnp.sqrt(jnp.mean(heat_f ** 2)))
    print(f"int8 delta: heat max {d_heat:.4f} (rms {rms:.4f}), "
          f"feat max {d_feat:.4f}")
    assert d_heat < max(0.25, rms)
    assert np.corrcoef(np.asarray(heat_q).ravel(),
                       np.asarray(heat_f).ravel())[0, 1] > 0.99


def test_int8_feature_head_excluded(rig):
    det, variables, imgs = rig
    cal = calibrate_detector(det, variables, list(imgs))
    _, qvars = build_int8_detector(det, variables, cal)
    # feature + keyheatmap head weights stay float (reference exclusions,
    # quantize1_onnx.py:96-117)
    for head in ("feature", "keyheatmap"):
        sub = qvars["params"][head]

        def all_float(t):
            if isinstance(t, dict):
                return all(all_float(v) for v in t.values())
            return np.asarray(t).dtype != np.int8

        assert all_float(sub), head


def test_int8_artifact_roundtrip(rig, tmp_path):
    from findtextcenternet_tpu.export.export import (
        load_exported, save_exported)

    det, variables, imgs = rig
    cal = calibrate_detector(det, variables, list(imgs))
    fn, qvars = build_int8_detector(det, variables, cal)
    out = str(tmp_path / "det_int8")
    save_exported(out, fn, qvars, (jnp.asarray(imgs[0]),),
                  kind="detector_int8")
    call, loaded_vars, meta = load_exported(out)
    assert meta["kind"] == "detector_int8"
    h1, f1 = jax.jit(fn)(qvars, jnp.asarray(imgs[0]))
    h2, f2 = call(loaded_vars, jnp.asarray(imgs[0]))
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2),
                               atol=2e-2, rtol=1e-2)
