"""Model summaries: parameter counts per module (torchinfo-style).

The reference smoke-checks shapes with ``torchinfo.summary``
(`/root/reference/models/detector.py:307-331`); this is the flax analog.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _count(tree) -> int:
    if isinstance(tree, dict):
        return sum(_count(v) for v in tree.values())
    return int(np.prod(np.shape(tree)))


def param_summary(params: Dict[str, Any], depth: int = 1) -> str:
    """Human-readable per-module parameter counts."""
    lines = []

    def walk(tree, prefix="", level=0):
        if not isinstance(tree, dict) or level >= depth:
            n = _count(tree)
            lines.append(f"{prefix:<48s} {n:>14,d}")
            return
        for k in sorted(tree):
            walk(tree[k], f"{prefix}/{k}" if prefix else k, level + 1)

    walk(params)
    total = _count(params)
    lines.append("-" * 63)
    lines.append(f"{'total':<48s} {total:>14,d}")
    return "\n".join(lines)


def param_count(params) -> int:
    return _count(params)
