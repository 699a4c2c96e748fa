"""Leafmap head parity vs an independently-written torch oracle.

The riskiest wiring for model.pt import parity is the cascade structure:
BN each tap, deepest-first 3x3 conv -> BN -> exact GELU -> align-corners
2x upsample, channel-concat [carry, tap], final 3x3 output conv. This
oracle reimplements it in torch from the spec and cross-checks with
imported weights.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from findtextcenternet_tpu.models.detector import Leafmap  # noqa: E402


class TorchLeafmap(torch.nn.Module):
    def __init__(self, in_dims, conv_dim=16, out_dim=3):
        super().__init__()
        self.in_bn = torch.nn.ModuleList(
            [torch.nn.BatchNorm2d(d) for d in in_dims])
        ups = []
        for i, d in enumerate(reversed(in_dims)):
            cin = d if i == 0 else d + conv_dim
            block = torch.nn.ModuleDict({
                "conv": torch.nn.Conv2d(cin, conv_dim, 3, padding=1,
                                        bias=False),
                "bn": torch.nn.BatchNorm2d(conv_dim),
            })
            ups.append(block)
        self.ups = torch.nn.ModuleList(ups)
        self.top = torch.nn.Conv2d(conv_dim, out_dim, 3, padding=1)

    def forward(self, taps):
        y = None
        n = len(taps)
        for i, (x, up) in enumerate(zip(reversed(taps), self.ups)):
            bn = self.in_bn[n - 1 - i]
            x = bn(x)
            if y is not None:
                x = torch.cat([y, x], dim=1)
            x = up["conv"](x)
            x = up["bn"](x)
            x = torch.nn.functional.gelu(x)
            if i < n - 1:
                x = torch.nn.functional.interpolate(
                    x, scale_factor=2, mode="bilinear", align_corners=True)
            y = x
        return self.top(y)


def test_leafmap_matches_torch_oracle(rng):
    in_dims = [4, 6, 8, 10]
    tm = TorchLeafmap(in_dims, conv_dim=16, out_dim=3)
    tm.eval()
    with torch.no_grad():
        for p in tm.parameters():
            p.copy_(torch.from_numpy(
                rng.standard_normal(tuple(p.shape)).astype(np.float32) * 0.2))
        for b in tm.buffers():
            if b.dtype.is_floating_point:
                b.copy_(torch.from_numpy(
                    np.abs(rng.standard_normal(tuple(b.shape))
                           ).astype(np.float32) + 0.5))

    # import the oracle's weights into the flax Leafmap tree
    def conv(m, bias=False):
        d = {"kernel": jnp.asarray(
            m.weight.detach().numpy().transpose(2, 3, 1, 0))}
        if bias:
            d["bias"] = jnp.asarray(m.bias.detach().numpy())
        return d

    def bn_p(m):
        return {"scale": jnp.asarray(m.weight.detach().numpy()),
                "bias": jnp.asarray(m.bias.detach().numpy())}

    def bn_s(m):
        return {"mean": jnp.asarray(m.running_mean.numpy()),
                "var": jnp.asarray(m.running_var.numpy())}

    params, stats = {}, {}
    for k in range(4):
        params[f"in_bn{k}"] = bn_p(tm.in_bn[k])
        stats[f"in_bn{k}"] = bn_s(tm.in_bn[k])
    for i in range(4):
        params[f"up{i}_conv"] = conv(tm.ups[i]["conv"])
        params[f"up{i}_bn"] = bn_p(tm.ups[i]["bn"])
        stats[f"up{i}_bn"] = bn_s(tm.ups[i]["bn"])
    params["top_conv"] = conv(tm.top, bias=True)
    variables = {"params": params, "batch_stats": stats}

    jm = Leafmap(out_dim=3, conv_dim=16)
    # taps at 1/4 .. 1/32 of a 64-px input
    taps_t = [torch.from_numpy(
        rng.standard_normal((1, d, 16 // (2 ** i), 16 // (2 ** i))
                            ).astype(np.float32))
        for i, d in enumerate(in_dims)]
    with torch.no_grad():
        ref = tm(taps_t).permute(0, 2, 3, 1).numpy()
    taps_j = [jnp.asarray(t.numpy().transpose(0, 2, 3, 1)) for t in taps_t]
    out = jm.apply(variables, taps_j)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-4)
