"""Backbone building blocks vs freshly-written torch oracles.

These verify the block wiring semantics (SE gating, residuals, eval-mode
BN) against independent torch implementations written here — not imported
from torchvision — using weights imported through the same converter the
model.pt path uses.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from findtextcenternet_tpu.models.efficientnet import (  # noqa: E402
    BlockCfg, FusedMBConv, MBConv,
)


class TorchSE(torch.nn.Module):
    def __init__(self, ch, squeeze):
        super().__init__()
        self.fc1 = torch.nn.Conv2d(ch, squeeze, 1)
        self.fc2 = torch.nn.Conv2d(squeeze, ch, 1)

    def forward(self, x):
        s = x.mean(dim=(2, 3), keepdim=True)
        s = torch.nn.functional.silu(self.fc1(s))
        s = torch.sigmoid(self.fc2(s))
        return x * s


class TorchMBConv(torch.nn.Module):
    """Independent MBConv oracle: expand 1x1 -> depthwise -> SE -> project,
    residual when stride 1 and channels match."""

    def __init__(self, cin, cout, expand, k, stride):
        super().__init__()
        ce = cin * expand
        bn = lambda c: torch.nn.BatchNorm2d(c, eps=1e-3)  # noqa: E731
        self.expand = torch.nn.Conv2d(cin, ce, 1, bias=False)
        self.bn0 = bn(ce)
        self.dw = torch.nn.Conv2d(ce, ce, k, stride, (k - 1) // 2,
                                  groups=ce, bias=False)
        self.bn1 = bn(ce)
        self.se = TorchSE(ce, max(1, cin // 4))
        self.proj = torch.nn.Conv2d(ce, cout, 1, bias=False)
        self.bn2 = bn(cout)
        self.use_res = stride == 1 and cin == cout

    def forward(self, x):
        inp = x
        x = torch.nn.functional.silu(self.bn0(self.expand(x)))
        x = torch.nn.functional.silu(self.bn1(self.dw(x)))
        x = self.se(x)
        x = self.bn2(self.proj(x))
        return x + inp if self.use_res else x


def _randomize(m, rng):
    with torch.no_grad():
        for p in m.parameters():
            p.copy_(torch.from_numpy(
                rng.standard_normal(tuple(p.shape)).astype(np.float32) * 0.2))
        for b in m.buffers():
            if b.dtype.is_floating_point:
                b.copy_(torch.from_numpy(
                    np.abs(rng.standard_normal(tuple(b.shape))
                           ).astype(np.float32) + 0.5))


def _import_mbconv_weights(tm: TorchMBConv):
    """Map the torch oracle's weights into the flax MBConv tree."""
    def conv(m):
        return {"kernel": jnp.asarray(
            m.weight.detach().numpy().transpose(2, 3, 1, 0))}

    def bn_p(m):
        return {"scale": jnp.asarray(m.weight.detach().numpy()),
                "bias": jnp.asarray(m.bias.detach().numpy())}

    def bn_s(m):
        return {"mean": jnp.asarray(m.running_mean.numpy()),
                "var": jnp.asarray(m.running_var.numpy())}

    def conv_b(m):
        return {"kernel": jnp.asarray(
            m.weight.detach().numpy().transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(m.bias.detach().numpy())}

    params = {
        "expand": {"conv": conv(tm.expand), "bn": bn_p(tm.bn0)},
        "depthwise": {"conv": conv(tm.dw), "bn": bn_p(tm.bn1)},
        "se": {"fc1": conv_b(tm.se.fc1), "fc2": conv_b(tm.se.fc2)},
        "project": {"conv": conv(tm.proj), "bn": bn_p(tm.bn2)},
    }
    stats = {
        "expand": {"bn": bn_s(tm.bn0)},
        "depthwise": {"bn": bn_s(tm.bn1)},
        "project": {"bn": bn_s(tm.bn2)},
    }
    return {"params": params, "batch_stats": stats}


@pytest.mark.parametrize("stride,cin,cout", [(1, 8, 8), (2, 8, 12)])
def test_mbconv_matches_torch_oracle(rng, stride, cin, cout):
    tm = TorchMBConv(cin, cout, expand=4, k=3, stride=stride)
    tm.eval()
    _randomize(tm, rng)

    cfg = BlockCfg(False, 4, 3, stride, cin, cout, 1)
    jm = MBConv(cfg, stride, cin, sd_rate=0.0)
    variables = _import_mbconv_weights(tm)

    x = rng.standard_normal((2, cin, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).permute(0, 2, 3, 1).numpy()
    out = jm.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-4)
