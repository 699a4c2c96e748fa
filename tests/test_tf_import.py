"""TF npz backbone importer: key schedule, layout transposes, round trip.

Reference key mapping: /root/reference/models/detector.py:30-121
(`load_weight` for efficientnetv2-xl-21k.npz).
"""
import jax
import numpy as np
import pytest

from findtextcenternet_tpu.io.tf_import import (
    export_backbone_npz, load_backbone_npz, _entries)
from findtextcenternet_tpu.models.efficientnet import (
    EFFNET_V2_CONFIGS, EfficientNetV2)


@pytest.fixture(scope="module")
def s_variables():
    model = EfficientNetV2(model_size="s")
    x = np.zeros((1, 64, 64, 3), np.float32)
    return jax.jit(model.init)(jax.random.PRNGKey(0), x)


def test_key_schedule_matches_reference_counts():
    # xl: stem + head + per-block keys, blocks numbered globally
    entries = _entries("xl", "efficientnetv2-xl")
    keys = [e[0] for e in entries]
    n_blocks = sum(c.num_layers for c in EFFNET_V2_CONFIGS["xl"])
    assert n_blocks == 100
    assert "efficientnetv2-xl/stem/conv2d/kernel" in keys
    assert "efficientnetv2-xl/head/tpu_batch_normalization/moving_mean" \
        in keys
    assert "efficientnetv2-xl/blocks_0/conv2d/kernel" in keys
    assert f"efficientnetv2-xl/blocks_{n_blocks - 1}/" \
           "tpu_batch_normalization_2/gamma" in keys
    # fused expand==1 blocks expose no conv2d_1
    assert "efficientnetv2-xl/blocks_0/conv2d_1/kernel" not in keys
    assert "efficientnetv2-xl/blocks_4/conv2d_1/kernel" in keys
    # MBConv blocks (>= stage 4 in xl => global block >= 20) carry SE +
    # depthwise keys
    assert "efficientnetv2-xl/blocks_20/depthwise_conv2d/" \
           "depthwise_kernel" in keys
    assert "efficientnetv2-xl/blocks_20/se/conv2d/bias" in keys


def test_round_trip_s(s_variables):
    # synthesize a TF-keyed npz from the flax shapes, randomize, load
    tf_dict = export_backbone_npz(s_variables, "s", backbone_path=())
    rng = np.random.default_rng(0)
    tf_rand = {k: rng.normal(size=v.shape).astype(np.float32)
               for k, v in tf_dict.items()}
    loaded = load_backbone_npz(s_variables, tf_rand, "s",
                               backbone_path=())
    # kernels land where they should, with the depthwise transpose
    p = loaded["params"]
    np.testing.assert_array_equal(
        np.asarray(p["stem"]["conv"]["kernel"]),
        tf_rand["efficientnetv2-s/stem/conv2d/kernel"])
    dw = np.asarray(
        p["stage3_block0"]["depthwise"]["conv"]["kernel"])
    idx = sum(c.num_layers for c in EFFNET_V2_CONFIGS["s"][:3])
    np.testing.assert_array_equal(
        dw, np.transpose(
            tf_rand[f"efficientnetv2-s/blocks_{idx}/depthwise_conv2d/"
                    "depthwise_kernel"], (0, 1, 3, 2)))
    assert dw.shape[2] == 1   # flax depthwise layout (H, W, 1, C)
    bs = loaded["batch_stats"]
    np.testing.assert_array_equal(
        np.asarray(bs["head"]["bn"]["var"]),
        tf_rand["efficientnetv2-s/head/tpu_batch_normalization/"
                "moving_variance"])


def test_missing_key_raises(s_variables):
    tf_dict = export_backbone_npz(s_variables, "s", backbone_path=())
    del tf_dict["efficientnetv2-s/stem/conv2d/kernel"]
    with pytest.raises(KeyError):
        load_backbone_npz(s_variables, tf_dict, "s", backbone_path=())


def test_shape_mismatch_raises(s_variables):
    tf_dict = export_backbone_npz(s_variables, "s", backbone_path=())
    k = "efficientnetv2-s/stem/conv2d/kernel"
    tf_dict[k] = np.zeros((3, 3, 3, 99), np.float32)
    with pytest.raises(ValueError):
        load_backbone_npz(s_variables, tf_dict, "s", backbone_path=())
