"""FusedLeafmaps must be math-identical to the 10 per-head Leafmap
cascades (the reference head layout, `models/detector.py:148-230`) under
the fuse/unfuse parameter mapping — in eval (per-head running-stat BN
folds) and train (shared batch moments) modes, including the updated
batch statistics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from findtextcenternet_tpu.models.detector import (
    HEAD_DIMS, HEAD_NAMES, CenterNetDetection, FusedLeafmaps, Leafmap,
    fuse_head_variables, unfuse_head_variables,
)

D = 16          # conv_dim for test speed
FDIM = 10


@pytest.fixture(scope="module")
def rig():
    key = jax.random.PRNGKey(0)
    taps = [jax.random.normal(jax.random.PRNGKey(10 + i),
                              (2, 16 // (2 ** i), 16 // (2 ** i), c))
            for i, c in enumerate((6, 8, 10, 12))]

    names = list(HEAD_NAMES) + ["feature"]
    dims = list(HEAD_DIMS) + [FDIM]
    heads = {n: Leafmap(d, conv_dim=D) for n, d in zip(names, dims)}
    hp, hs = {}, {}
    for i, n in enumerate(names):
        v = heads[n].init(jax.random.PRNGKey(100 + i), taps)
        # randomize params AND running stats so the eval-mode BN folds
        # are exercised with per-head differing statistics
        kk = jax.random.PRNGKey(200 + i)
        p = jax.tree.map(
            lambda a: a + 0.3 * jax.random.normal(
                jax.random.fold_in(kk, a.size), a.shape), v["params"])
        s = jax.tree.map(
            lambda a: jnp.abs(a + 0.2 * jax.random.normal(
                jax.random.fold_in(kk, a.size + 1), a.shape)) + 0.05,
            v["batch_stats"])
        hp[n], hs[n] = p, s
    fp, fs = fuse_head_variables(hp, hs, feature_dim=FDIM, conv_dim=D)
    fused = FusedLeafmaps(tuple(HEAD_DIMS), FDIM, conv_dim=D)
    return taps, names, dims, heads, hp, hs, fused, fp, fs


def _per_head_outputs(heads, hp, hs, names, taps, train=False):
    outs, new_stats = {}, {}
    for n in names:
        if train:
            o, mut = heads[n].apply(
                {"params": hp[n], "batch_stats": hs[n]}, taps, True,
                mutable=["batch_stats"])
            new_stats[n] = mut["batch_stats"]
        else:
            o = heads[n].apply({"params": hp[n], "batch_stats": hs[n]},
                               taps, False)
        outs[n] = o
    return outs, new_stats


def test_eval_equivalence(rig):
    taps, names, dims, heads, hp, hs, fused, fp, fs = rig
    outs, _ = _per_head_outputs(heads, hp, hs, names, taps)
    want_heat = jnp.concatenate([outs[n] for n in HEAD_NAMES], -1)
    heat, feat = fused.apply({"params": fp, "batch_stats": fs}, taps,
                             False)
    np.testing.assert_allclose(heat, want_heat, rtol=2e-4, atol=5e-4)
    np.testing.assert_allclose(feat, outs["feature"], rtol=2e-4, atol=5e-4)


def test_train_equivalence_and_stats(rig):
    taps, names, dims, heads, hp, hs, fused, fp, fs = rig
    outs, new_stats = _per_head_outputs(heads, hp, hs, names, taps,
                                        train=True)
    want_heat = jnp.concatenate([outs[n] for n in HEAD_NAMES], -1)
    (heat, feat), mut = fused.apply(
        {"params": fp, "batch_stats": fs}, taps, True,
        mutable=["batch_stats"])
    np.testing.assert_allclose(heat, want_heat, rtol=2e-4, atol=5e-4)
    np.testing.assert_allclose(feat, outs["feature"], rtol=2e-4, atol=5e-4)
    # updated running stats must match per-head updates row for row
    for level in range(4):
        for g, n in enumerate(names):
            np.testing.assert_allclose(
                mut["batch_stats"][f"in_bn{level}_mean"][g],
                new_stats[n][f"in_bn{level}"]["mean"], atol=1e-5)
            np.testing.assert_allclose(
                mut["batch_stats"][f"in_bn{level}_var"][g],
                new_stats[n][f"in_bn{level}"]["var"], atol=1e-5)
    for i in range(4):
        merged_mean = jnp.concatenate(
            [new_stats[n][f"up{i}_bn"]["mean"] for n in names])
        np.testing.assert_allclose(
            mut["batch_stats"][f"up{i}_bn"]["mean"], merged_mean,
            atol=1e-5)


def test_unfuse_roundtrip(rig):
    taps, names, dims, heads, hp, hs, fused, fp, fs = rig
    hp2, hs2 = unfuse_head_variables(fp, fs, conv_dim=D)
    for n in names:
        jax.tree.map(np.testing.assert_allclose, hp[n], hp2[n])
        jax.tree.map(np.testing.assert_allclose, hs[n], hs2[n])


def test_centernet_fused_matches_unfused():
    """Whole detector: fused=True vs fused=False with mapped params."""
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    det_u = CenterNetDetection(model_size="tiny", feature_dim=FDIM,
                               fused=False)
    v = det_u.init(jax.random.PRNGKey(1), x)
    names = list(HEAD_NAMES) + ["feature"]
    hp = {n: v["params"][n] for n in names}
    hs = {n: v["batch_stats"][n] for n in names}
    fp, fs = fuse_head_variables(hp, hs, feature_dim=FDIM)
    vf = {
        "params": {"backbone": v["params"]["backbone"], "heads": fp},
        "batch_stats": {"backbone": v["batch_stats"]["backbone"],
                        "heads": fs},
    }
    det_f = CenterNetDetection(model_size="tiny", feature_dim=FDIM,
                               fused=True)
    hu, fu = det_u.apply(v, x)
    hf, ff = det_f.apply(vf, x)
    np.testing.assert_allclose(hf, hu, rtol=2e-4, atol=5e-4)
    np.testing.assert_allclose(ff, fu, rtol=2e-4, atol=5e-4)
