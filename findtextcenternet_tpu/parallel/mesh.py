"""Device mesh and sharding layer.

The reference has no multi-device support at all (SURVEY.md §2.8); this is
new TPU-first design: a (data, model) mesh, NamedSharding rules applied by
parameter-path regex, and pjit-compatible helpers. Collectives are inserted
by XLA/GSPMD from the shardings — there is no hand-written communication.

Model sizes here (detector ≤ ~210M params, transformer ~150M) mean data
parallelism is the primary axis; tensor parallelism over the transformer's
feed-forward/attention projections is supported for the 'model' axis so the
same code scales to larger meshes and serves as the multi-chip validation
path (``__graft_entry__.dryrun_multichip``).
"""
from __future__ import annotations

import re
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Create a ('data', 'model') mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_data is None:
        n_data = n // n_model
    assert n_data * n_model <= n, (n_data, n_model, n)
    arr = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


# parameter-path regex -> PartitionSpec. First match wins; default replicated.
# Paths are '/'-joined flax param tree keys.
_TP_RULES = [
    # transformer SwiGLU: w1/wg split on the expanded (output) dim,
    # w2 on the contracted (input) dim
    (re.compile(r".*/ff/w1/kernel$"), P(None, "model")),
    (re.compile(r".*/ff/wg/kernel$"), P(None, "model")),
    (re.compile(r".*/ff/w2/kernel$"), P("model", None)),
    (re.compile(r".*/ff/w[1g]/bias$"), P("model")),
    # attention projections: q/k/v split on heads (output dim), out on input
    (re.compile(r".*/(q|k|v)_proj/kernel$"), P(None, "model")),
    (re.compile(r".*/out_proj/kernel$"), P("model", None)),
    # SimpleDecoder MLPs: alternate split
    (re.compile(r".*/block\d+_fc0/kernel$"), P(None, "model")),
    (re.compile(r".*/block\d+_fc1/kernel$"), P("model", None)),
]


def param_pspec(path: str) -> P:
    for rx, spec in _TP_RULES:
        if rx.match(path):
            return spec
    return P()


def _tree_paths(tree, prefix=""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _tree_paths(v, f"{prefix}/{k}" if prefix else k)
    else:
        yield prefix, tree


def shard_params(params, mesh: Mesh):
    """Apply the TP rules to a param pytree, return sharded copies."""
    def place(path, leaf):
        spec = param_pspec(path)
        # dims must divide; fall back to replication when they don't
        try:
            sh = NamedSharding(mesh, spec)
            for dim, axis in enumerate(spec):
                if axis is None:
                    continue
                size = mesh.shape[axis]
                if leaf.ndim <= dim or leaf.shape[dim] % size != 0:
                    sh = NamedSharding(mesh, P())
                    break
        except Exception:
            sh = NamedSharding(mesh, P())
        return jax.device_put(leaf, sh)

    flat = dict(_tree_paths(params))
    placed = {p: place(p, l) for p, l in flat.items()}

    def rebuild(tree, prefix=""):
        if isinstance(tree, dict):
            return {k: rebuild(v, f"{prefix}/{k}" if prefix else k)
                    for k, v in tree.items()}
        return placed[prefix]

    return rebuild(params)


def tree_pspecs(tree):
    """PartitionSpec pytree for ``tree`` by matching each leaf's path
    against the TP rules (default replicated).

    Works on any pytree — param dicts AND full train states: optimizer
    state mirrors the param tree (schedule-free keeps a z copy), so the
    suffix regexes in ``_TP_RULES`` match its leaves too, giving the
    optimizer moments the same layout as their parameters. Used for AOT
    multi-device compiles where leaves are abstract (ShapeDtypeStruct)
    and :func:`shard_params`'s device_put is unavailable.
    """
    from jax.tree_util import (DictKey, FlattenedIndexKey, GetAttrKey,
                               SequenceKey)

    def key_str(k):
        if isinstance(k, DictKey):
            return str(k.key)
        if isinstance(k, GetAttrKey):
            return k.name
        if isinstance(k, (SequenceKey, FlattenedIndexKey)):
            return str(getattr(k, "idx", getattr(k, "key", "")))
        return str(k)

    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    specs = []
    for path, leaf in flat:
        p = "/".join(key_str(k) for k in path)
        spec = param_pspec(p)
        # dims must exist and divide the mesh axis at placement time;
        # the caller checks that (shapes are known there, mesh too)
        specs.append((spec, getattr(leaf, "ndim", 0)))
    return jax.tree_util.tree_unflatten(
        treedef, [s for s, _ in specs])


def state_shardings(state, mesh: Mesh, zero1: bool = False,
                    data_axis: str = "data"):
    """NamedSharding pytree for a full train state under ``mesh``.

    Default layout: the TP rules (:func:`tree_pspecs`) with replication
    fallback — params and optimizer moments share their parameter's
    layout.

    ``zero1=True`` additionally shards **optimizer-state** leaves that
    would otherwise be replicated over the ``data`` axis, on their
    largest evenly-divisible dim (ZeRO-1 / optimizer-state sharding).
    Model params stay replicated — the forward pass reads them every
    layer and sharding them would be ZeRO-3 with per-layer all-gathers —
    but the schedule-free z copy and the Adam second moment are touched
    only once per step, so GSPMD turns the update into
    reduce-scatter(grads) → sharded update → all-gather(params), cutting
    the two extra param-tree copies to 1/N per device. Found necessary
    by AOT cost analysis: the replicated xl detector state at 8 devices
    reads 16.28 GB/device (> v5e HBM); ZeRO-1 brings the same step under
    budget (`tests/test_tpu_aot_compile.py`).

    Works on abstract (ShapeDtypeStruct) and concrete leaves alike.
    """
    from jax.tree_util import (DictKey, FlattenedIndexKey, GetAttrKey,
                               SequenceKey)

    def key_str(k):
        if isinstance(k, DictKey):
            return str(k.key)
        if isinstance(k, GetAttrKey):
            return k.name
        if isinstance(k, (SequenceKey, FlattenedIndexKey)):
            return str(getattr(k, "idx", getattr(k, "key", "")))
        return str(k)

    n_data = mesh.shape[data_axis]
    flat, treedef = jax.tree_util.tree_flatten_with_path(state)
    out = []
    for path, leaf in flat:
        p = "/".join(key_str(k) for k in path)
        sh = leaf_sharding(mesh, param_pspec(p), leaf)
        if (zero1 and n_data > 1 and p.startswith("opt_state")
                and not any(sh.spec)):
            shape = getattr(leaf, "shape", ())
            # largest dim that divides the data axis (scalars and odd
            # shapes stay replicated — they are bytes, not gigabytes)
            cands = [(d, s) for d, s in enumerate(shape)
                     if s % n_data == 0 and s >= n_data]
            if cands:
                dim = max(cands, key=lambda t: t[1])[0]
                spec = [None] * len(shape)
                spec[dim] = data_axis
                sh = NamedSharding(mesh, P(*spec))
        out.append(sh)
    return jax.tree_util.tree_unflatten(treedef, out)


def leaf_sharding(mesh: Mesh, spec: P, leaf) -> NamedSharding:
    """NamedSharding for ``leaf`` under ``spec``, falling back to
    replication when a sharded dim doesn't exist or doesn't divide."""
    for dim, axis in enumerate(spec):
        if axis is None:
            continue
        size = mesh.shape[axis]
        if getattr(leaf, "ndim", 0) <= dim or leaf.shape[dim] % size != 0:
            return NamedSharding(mesh, P())
    return NamedSharding(mesh, spec)


def shard_batch(batch, mesh: Mesh):
    """Shard leading batch axis over the 'data' mesh axis."""
    sh = NamedSharding(mesh, P("data"))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
