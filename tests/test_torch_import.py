"""Weight importer: layer-level numerics vs torch, structural round trips,
and full transformer parity against the reference model as a torch oracle."""
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from flax import linen as nn  # noqa: E402

from findtextcenternet_tpu.io.torch_import import (  # noqa: E402
    import_detector,
    import_transformer,
    assert_tree_matches,
)
from findtextcenternet_tpu.models import (  # noqa: E402
    TextDetectorModel,
    Transformer,
    TransformerDims,
)

REF = "/root/reference"


# --------------------------------------------------------------------------
# layer-level layout conversions vs torch
# --------------------------------------------------------------------------

def test_conv_layout_conversion(rng):
    tconv = torch.nn.Conv2d(5, 7, 3, stride=2, padding=1, bias=False)
    x = rng.standard_normal((1, 5, 8, 8)).astype(np.float32)
    with torch.no_grad():
        ref = tconv(torch.from_numpy(x)).permute(0, 2, 3, 1).numpy()

    w = tconv.weight.detach().numpy().transpose(2, 3, 1, 0)
    conv = nn.Conv(7, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                   use_bias=False)
    out = conv.apply({"params": {"kernel": jnp.asarray(w)}},
                     jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_depthwise_conv_layout(rng):
    tconv = torch.nn.Conv2d(6, 6, 3, padding=1, groups=6, bias=False)
    x = rng.standard_normal((1, 6, 8, 8)).astype(np.float32)
    with torch.no_grad():
        ref = tconv(torch.from_numpy(x)).permute(0, 2, 3, 1).numpy()
    w = tconv.weight.detach().numpy().transpose(2, 3, 1, 0)
    conv = nn.Conv(6, (3, 3), padding=((1, 1), (1, 1)),
                   feature_group_count=6, use_bias=False)
    out = conv.apply({"params": {"kernel": jnp.asarray(w)}},
                     jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_batchnorm_eval_semantics(rng):
    tbn = torch.nn.BatchNorm2d(4, eps=1e-3)
    with torch.no_grad():
        tbn.weight.copy_(torch.from_numpy(
            rng.uniform(0.5, 2, 4).astype(np.float32)))
        tbn.bias.copy_(torch.from_numpy(
            rng.standard_normal(4).astype(np.float32)))
        tbn.running_mean.copy_(torch.from_numpy(
            rng.standard_normal(4).astype(np.float32)))
        tbn.running_var.copy_(torch.from_numpy(
            rng.uniform(0.5, 2, 4).astype(np.float32)))
    tbn.eval()
    x = rng.standard_normal((2, 4, 5, 5)).astype(np.float32)
    with torch.no_grad():
        ref = tbn(torch.from_numpy(x)).permute(0, 2, 3, 1).numpy()

    bn = nn.BatchNorm(use_running_average=True, epsilon=1e-3)
    variables = {
        "params": {"scale": jnp.asarray(tbn.weight.detach().numpy()),
                   "bias": jnp.asarray(tbn.bias.detach().numpy())},
        "batch_stats": {"mean": jnp.asarray(tbn.running_mean.numpy()),
                        "var": jnp.asarray(tbn.running_var.numpy())},
    }
    out = bn.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_gelu_exact_matches_torch(rng):
    x = rng.standard_normal(64).astype(np.float32)
    ref = torch.nn.functional.gelu(torch.from_numpy(x)).numpy()
    out = np.asarray(nn.gelu(jnp.asarray(x), approximate=False))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


# --------------------------------------------------------------------------
# structural: synthetic torch state dict -> flax tree == model.init tree
# --------------------------------------------------------------------------

def _synth_detector_sd(model_size="s", feature_dim=100):
    """Generate a torch-layout state dict with torchvision-style names.

    Written independently of the importer (generator enumerates the
    architecture in torch layout) so key naming and shapes cross-check.
    """
    from findtextcenternet_tpu.models.efficientnet import (
        EFFNET_V2_CONFIGS, LAST_CHANNEL)

    sd = {}

    def conv(name, cin, cout, k, groups=1, bias=False):
        sd[name + ".weight"] = np.zeros(
            (cout, cin // groups, k, k), np.float32)
        if bias:
            sd[name + ".bias"] = np.zeros((cout,), np.float32)

    def bnorm(name, c):
        sd[name + ".weight"] = np.ones((c,), np.float32)
        sd[name + ".bias"] = np.zeros((c,), np.float32)
        sd[name + ".running_mean"] = np.zeros((c,), np.float32)
        sd[name + ".running_var"] = np.ones((c,), np.float32)
        sd[name + ".num_batches_tracked"] = np.zeros((), np.int64)

    def linear(name, cin, cout, bias=True):
        sd[name + ".weight"] = np.zeros((cout, cin), np.float32)
        if bias:
            sd[name + ".bias"] = np.zeros((cout,), np.float32)

    cfgs = EFFNET_V2_CONFIGS[model_size]
    b = "detector.backbone"
    conv(f"{b}.features.0.0", 3, cfgs[0].in_ch, 3)
    bnorm(f"{b}.features.0.1", cfgs[0].in_ch)
    for si, c in enumerate(cfgs):
        fi = si + 1
        for li in range(c.num_layers):
            cin = c.in_ch if li == 0 else c.out_ch
            exp = cin * c.expand_ratio
            t = f"{b}.features.{fi}.{li}.block"
            if c.fused:
                if c.expand_ratio == 1:
                    conv(f"{t}.0.0", cin, c.out_ch, c.kernel)
                    bnorm(f"{t}.0.1", c.out_ch)
                else:
                    conv(f"{t}.0.0", cin, exp, c.kernel)
                    bnorm(f"{t}.0.1", exp)
                    conv(f"{t}.1.0", exp, c.out_ch, 1)
                    bnorm(f"{t}.1.1", c.out_ch)
            else:
                conv(f"{t}.0.0", cin, exp, 1)
                bnorm(f"{t}.0.1", exp)
                conv(f"{t}.1.0", exp, exp, c.kernel, groups=exp)
                bnorm(f"{t}.1.1", exp)
                sq = max(1, cin // 4)
                conv(f"{t}.2.fc1", exp, sq, 1, bias=True)
                conv(f"{t}.2.fc2", sq, exp, 1, bias=True)
                conv(f"{t}.3.0", exp, c.out_ch, 1)
                bnorm(f"{t}.3.1", c.out_ch)
    hi = len(cfgs) + 1
    conv(f"{b}.features.{hi}.0", cfgs[-1].out_ch, LAST_CHANNEL, 1)
    bnorm(f"{b}.features.{hi}.1", LAST_CHANNEL)

    from findtextcenternet_tpu.models.efficientnet import TAP_CHANNELS
    taps = TAP_CHANNELS[model_size]
    conv_dim = 192
    heads = {"keyheatmap": 1, "sizes": 2, "textline": 1, "sepatator": 1,
             "code1": 1, "code2": 1, "code4": 1, "code8": 1,
             "feature": feature_dim}
    for hname, out_dim in heads.items():
        p = f"detector.{hname}"
        for k, c in enumerate(taps):
            bnorm(f"{p}.in_bn.{k}", c)
        rev = list(reversed(taps))
        for i, cin in enumerate(rev):
            real_cin = cin if i == 0 else cin + conv_dim
            conv(f"{p}.upsamplers.{i}.0", real_cin, conv_dim, 3)
            bnorm(f"{p}.upsamplers.{i}.1", conv_dim)
        conv(f"{p}.top_conv.0", conv_dim, out_dim, 3, bias=True)

    mid = 2048
    from findtextcenternet_tpu.const import MODULO_LIST
    for bi, m in enumerate(MODULO_LIST):
        t = f"decoder.blocks.{bi}"
        linear(f"{t}.0", feature_dim, mid, bias=False)
        bnorm(f"{t}.1", mid)
        linear(f"{t}.3", mid, mid, bias=False)
        bnorm(f"{t}.4", mid)
        linear(f"{t}.6", mid, m)
    return sd


def test_detector_import_structure_matches_init():
    sd = _synth_detector_sd("s")
    variables = import_detector(sd, model_size="s")

    model = TextDetectorModel(model_size="s")
    x = jnp.zeros((1, 64, 64, 3))
    init = model.init(jax.random.PRNGKey(0), x,
                      jnp.zeros((4,), dtype=jnp.int32))
    assert_tree_matches(variables["params"], init["params"])
    assert_tree_matches(variables["batch_stats"], init["batch_stats"])


# --------------------------------------------------------------------------
# full transformer parity against the reference (torch oracle, tiny dims)
# --------------------------------------------------------------------------

@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_transformer_parity_with_reference_oracle(rng):
    if REF not in sys.path:
        sys.path.insert(0, REF)
    ref_tf = pytest.importorskip("models.transformer")

    # equal enc/dec lengths: the reference shares its cross-attn key pos
    # table sizing with the decoder length and breaks otherwise
    tiny = dict(enc_input_dim=106, embed_dim=32, head_num=4,
                enc_block_num=2, dec_block_num=2,
                max_enc_seq_len=12, max_dec_seq_len=12, dropout=0.0)
    tmodel = ref_tf.Transformer(**tiny)
    tmodel.eval()
    # randomize parameters so the comparison is non-trivial
    with torch.no_grad():
        for p in tmodel.parameters():
            p.copy_(torch.from_numpy(
                rng.standard_normal(tuple(p.shape)).astype(np.float32) * 0.1))

    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    dims = TransformerDims(**tiny)
    variables = import_transformer(sd, dims)
    jmodel = Transformer(dims)

    enc_in = rng.standard_normal((2, 12, 106)).astype(np.float32)
    enc_in[:, 9:] = 0.0  # padded tail
    dec_in = rng.integers(0, 0x3000, (2, 12)).astype(np.int64)

    with torch.no_grad():
        ref_out = tmodel(torch.from_numpy(enc_in), torch.from_numpy(dec_in))
    ref_out = [o.numpy() for o in ref_out]

    out = jmodel.apply(variables, jnp.asarray(enc_in),
                       jnp.asarray(dec_in.astype(np.int32)))
    for a, b in zip(out, ref_out):
        np.testing.assert_allclose(np.asarray(a), b, rtol=2e-3, atol=2e-4)
