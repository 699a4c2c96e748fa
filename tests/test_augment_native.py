"""Native C++ augmentation kernels vs the numpy reference implementation."""
import numpy as np
import pytest

from findtextcenternet_tpu.data.augment import (
    AffineParams, apply_transform_numpy, sample_params,
)
from findtextcenternet_tpu.data import augment_native


@pytest.fixture(scope="module", autouse=True)
def built():
    if not augment_native.build_native():
        pytest.skip("native augment library not buildable")


def _sample():
    rng = np.random.default_rng(0)
    img = np.zeros((600, 500), np.uint8)
    img[100:140, 50:90] = 255
    img[300:340, 200:240] = 200
    line = np.zeros((300, 250), np.uint8)
    line[55:70, 20:120] = 255
    seps = np.zeros((300, 250), np.uint8)
    seps[10:150, 125:128] = 255
    pos = np.array([[70, 120, 40, 40], [220, 320, 40, 40]], np.float32)
    codes = np.array([[0x3042, 1], [65, 2]], np.int32)
    return img, line, seps, pos, codes, rng


@pytest.mark.parametrize("nearest", [False, True])
def test_native_matches_numpy(nearest):
    img, line, seps, pos, codes, rng = _sample()
    p = AffineParams(angle=0.05, size_x=1.1, size_y=0.95, sh_x=0.004,
                     sh_y=-0.006, startx=-30.0, starty=20.0,
                     nearest=nearest, inv_rect=(50, 200, 30, 100))
    a = apply_transform_numpy(img, line, seps, pos, codes, p,
                              out_hw=(256, 256))
    b = augment_native.apply_transform_native(img, line, seps, pos, codes,
                                              p, out_hw=(256, 256))
    # image warp parity: cv2 vs native bilinear differ at interpolation
    # edges; compare loosely overall and exactly on interior mass
    np.testing.assert_allclose(b[0].mean(), a[0].mean(), atol=2e-3)
    assert np.abs(a[0] - b[0]).mean() < 0.01
    # target maps must be near-identical (same math, float order aside)
    np.testing.assert_allclose(b[1][..., 0], a[1][..., 0], atol=1e-5)
    np.testing.assert_allclose(b[1][..., 1:3], a[1][..., 1:3], atol=1e-5)
    np.testing.assert_array_equal(b[2], a[2])
    # transformed positions identical
    np.testing.assert_allclose(b[4], a[4], rtol=1e-5, atol=1e-3)


def test_identity_params_roundtrip():
    img, line, seps, pos, codes, rng = _sample()
    p = AffineParams(0.0, 1.0, 1.0, 0.0, 0.0, 0.0, 0.0, False,
                     (-1, -1, -1, -1))
    out_img, label, idmap, minsize, out_pos = \
        augment_native.apply_transform_native(img, line, seps, pos, codes, p,
                                              out_hw=(600, 500))
    # identity: positions unchanged, image reproduced
    np.testing.assert_allclose(out_pos, pos, atol=1e-3)
    np.testing.assert_allclose(out_img, img.astype(np.float32) / 255,
                               atol=1e-3)
    # heatmap peaks at box centers (map scale 4, rounded)
    assert label[30, 18, 0] == pytest.approx(1.0)  # (round(70/4), 120/4)
    assert idmap[30, 18, 0] == 0x3042


def test_transform_crop_auto_backend(rng):
    img, line, seps, pos, codes, _ = _sample()
    from findtextcenternet_tpu.data.augment import transform_crop
    out = transform_crop(img, line, seps, pos, codes, rng,
                         out_hw=(256, 256), backend="native")
    assert out[0].shape == (256, 256)
    assert out[1].shape == (64, 64, 5)
