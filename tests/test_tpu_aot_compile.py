"""AOT Mosaic-lowering gate for the Pallas kernels (no TPU needed).

``libtpu`` is installed locally, so ``jax.experimental.topologies`` can
compile for a real v5e **without any device** — this catches Mosaic
lowering constraints that ``interpret=True`` hides (e.g. the block-shape
sublane/lane divisibility rules), exactly the class of failure that
would otherwise only surface on the chip.

Each compile is seconds warm (.jax_cache), ~a minute cold.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402


@pytest.fixture(scope="module")
def v5e_sharding():
    import os
    # libtpu takes a single-process lockfile by default; compile-only
    # use is safe to share (no device state)
    os.environ.setdefault("ALLOW_MULTIPLE_LIBTPU_LOAD", "true")
    try:
        from jax.experimental import topologies
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        topo = topologies.get_topology_desc("v5e:2x2", "tpu")
    except Exception as e:           # no local libtpu / unsupported
        pytest.skip(f"no AOT TPU topology support: {e}")
    mesh = Mesh(np.array(topo.devices[:1]), ("x",))
    return NamedSharding(mesh, P())


def test_fused_attention_fwd_bwd_mosaic_lowering(v5e_sharding):
    from findtextcenternet_tpu.ops.attention import fused_attention
    s = v5e_sharding
    B, T, H, hd = 16, 400, 12, 64    # production decode shapes
    q = jax.ShapeDtypeStruct((B, T, H, hd), jnp.float32, sharding=s)
    m = jax.ShapeDtypeStruct((B, 1, 1, T), jnp.float32, sharding=s)

    def fwd(q_, k_, v_, m_):
        return fused_attention(q_, k_, v_, key_mask=m_, interpret=False)

    jax.jit(fwd, out_shardings=s).lower(q, q, q, m).compile()

    def grads(q_, k_, v_, m_):
        return jax.grad(
            lambda *a: jnp.sum(fwd(*a)), argnums=(0, 1, 2))(q_, k_, v_, m_)

    jax.jit(grads, out_shardings=(s, s, s)).lower(q, q, q, m).compile()


def test_fused_train_step_mosaic_lowering(v5e_sharding):
    """train3's step with attn_impl='fused' (custom-VJP Pallas kernels
    inside jax.grad) lowers through Mosaic for v5e — tiny dims keep the
    compile to seconds; the kernel shapes are exercised at production
    size by test_fused_attention_fwd_bwd_mosaic_lowering."""
    import dataclasses as dc

    from findtextcenternet_tpu.config import Config
    from findtextcenternet_tpu.const import ENCODER_DIM
    from findtextcenternet_tpu.train.steps import transformer_train_step
    from findtextcenternet_tpu.train.train3 import build_transformer_state

    s = v5e_sharding
    cfg = Config()
    cfg = dc.replace(cfg, transformer=dc.replace(
        cfg.transformer, embed_dim=32, head_num=4, enc_block_num=1,
        dec_block_num=1, max_enc_seq_len=16, max_dec_seq_len=16,
        attn_impl="fused"))
    state = jax.eval_shape(
        lambda _: build_transformer_state(cfg, mesh=None, seed=0)[1], 0)
    state = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=s),
        state)
    t = cfg.transformer
    batch = {
        "encoder_input": jax.ShapeDtypeStruct(
            (8, t.max_enc_seq_len, ENCODER_DIM), jnp.float32, sharding=s),
        "decoder_input": jax.ShapeDtypeStruct(
            (8, t.max_dec_seq_len), jnp.int32, sharding=s),
        "decoder_true": jax.ShapeDtypeStruct(
            (8, t.max_dec_seq_len), jnp.int32, sharding=s),
    }
    jax.jit(lambda st, b: transformer_train_step(st, b)).lower(
        state, batch).compile()


def test_peaks_kernel_mosaic_lowering(v5e_sharding):
    from findtextcenternet_tpu.ops.pallas_kernels import nms_sigmoid_masked
    s = v5e_sharding
    x = jax.ShapeDtypeStruct((8, 192, 192), jnp.float32, sharding=s)
    m = jax.ShapeDtypeStruct((8, 192, 192), jnp.float32, sharding=s)
    jax.jit(lambda a, b: nms_sigmoid_masked(a, b, interpret=False),
            out_shardings=s).lower(x, m).compile()
