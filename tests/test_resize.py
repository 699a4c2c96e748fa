"""align_corners bilinear resize vs torch's UpsamplingBilinear2d semantics."""
import numpy as np
import pytest

from findtextcenternet_tpu.ops.resize import resize_bilinear_align_corners

torch = pytest.importorskip("torch")


@pytest.mark.parametrize("h,w,oh,ow", [
    (6, 6, 12, 12), (24, 24, 48, 48), (5, 7, 10, 14), (8, 8, 3, 3),
])
def test_matches_torch_align_corners(rng, h, w, oh, ow):
    x = rng.standard_normal((2, h, w, 5)).astype(np.float32)
    ours = np.asarray(resize_bilinear_align_corners(x, oh, ow))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    ref = torch.nn.functional.interpolate(
        xt, size=(oh, ow), mode="bilinear", align_corners=True)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_identity():
    x = np.random.default_rng(1).standard_normal((1, 4, 4, 3)).astype(np.float32)
    out = np.asarray(resize_bilinear_align_corners(x, 4, 4))
    np.testing.assert_allclose(out, x, atol=1e-6)
