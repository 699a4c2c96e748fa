"""Protocol-level differential fuzz: our line engine vs the reference
binary on IDENTICAL random protocol bytes.

The parity corpora (450 hard pages + detector-derived pages) are built
from a page model; this fuzz removes the model entirely and feeds raw
randomized protocol inputs — degenerate boxes (zero/negative size,
out-of-bounds centers, overlapping stacks), noise maps, empty pages —
to both engines. On identical input bytes the engines must emit
identical rows (modulo arbitrary block labels): any divergence here is
uninitialized memory / UB, not a modeling knife-edge.

Slow lane: builds the reference binary out-of-tree
(`/root/reference/textline_detect` -> /tmp/ref, CLAUDE.md workflow).
"""
import os
import shutil
import struct
import subprocess

import numpy as np
import pytest

from findtextcenternet_tpu.infer import lineengine
from findtextcenternet_tpu.tools.lineengine_parity import (
    canonicalize, run_engine,
)

REF = "/root/reference"
REF_BIN_DIR = "/tmp/ref"
REF_BIN = os.path.join(REF_BIN_DIR, "linedetect")
OUR_BIN = os.path.join(os.path.dirname(__file__), "..", "native",
                       "lineengine", "linedetect")


def _reference_ready():
    if os.path.exists(REF_BIN):
        return True
    try:
        if not os.path.exists(REF_BIN_DIR):
            shutil.copytree(os.path.join(REF, "textline_detect"),
                            REF_BIN_DIR)
        subprocess.run(["make", "-C", REF_BIN_DIR, "-j4"], check=True,
                       capture_output=True, timeout=600)
    except Exception:
        return False
    return os.path.exists(REF_BIN)


def _blob(rng) -> bytes:
    mw = int(rng.integers(24, 200))
    mh = int(rng.integers(24, 200))
    kind = rng.integers(0, 4)
    if kind == 0:          # empty maps
        line = np.zeros((mh, mw), np.float32)
        sep = np.zeros((mh, mw), np.float32)
    elif kind == 1:        # pure noise maps
        line = (rng.random((mh, mw)) ** 3).astype(np.float32)
        sep = (rng.random((mh, mw)) ** 5).astype(np.float32)
    else:                  # sparse random bands + noise floor
        line = (rng.random((mh, mw)) * 0.2).astype(np.float32)
        sep = (rng.random((mh, mw)) * 0.1).astype(np.float32)
        for _ in range(int(rng.integers(0, 8))):
            x0, y0 = rng.integers(0, mw), rng.integers(0, mh)
            w, h = rng.integers(1, mw), rng.integers(1, 4)
            if rng.random() < 0.5:
                w, h = h, w
            line[y0:y0 + h, x0:x0 + w] = rng.uniform(0.5, 1.0)
        for _ in range(int(rng.integers(0, 4))):
            x0, y0 = rng.integers(0, mw), rng.integers(0, mh)
            sep[y0:y0 + int(rng.integers(1, mh)), x0:x0 + 2] = 1.0

    n = int(rng.integers(0, 300))
    boxes = np.zeros((n, 8), np.float32)
    if n:
        # image coordinates are map*4; include off-page and degenerate
        boxes[:, 0] = rng.uniform(-40, mw * 4 + 40, n)        # cx
        boxes[:, 1] = rng.uniform(-40, mh * 4 + 40, n)        # cy
        boxes[:, 2] = rng.uniform(0.0, 90.0, n)               # w
        boxes[:, 3] = rng.uniform(0.0, 90.0, n)               # h
        boxes[:, 4] = (rng.random(n) < 0.1).astype(np.float32)  # ruby
        boxes[:, 5] = (rng.random(n) < 0.1).astype(np.float32)  # rubybase
        boxes[:, 6] = (rng.random(n) < 0.05).astype(np.float32)  # emphasis
        boxes[:, 7] = (rng.random(n) < 0.1).astype(np.float32)  # space
        # a few exactly-stacked duplicates (dedup/orphan paths)
        if n > 10:
            dup = rng.integers(0, n, n // 10)
            boxes[dup] = boxes[dup[::-1]]
    out = struct.pack("<III", 0, mw, mh)
    out += line.tobytes() + sep.tobytes()
    out += struct.pack("<I", n) + boxes.tobytes()
    return out


# understood, pinned divergences on this seed (see docstring + the
# std::reduce quirk note in native/lineengine/src/doubleline.cpp):
#  - space-only: 1-4 rows' space bit (subtype&8) flips — the LM space
#    fit converges to a marginally different optimum than the
#    reference's MINPACK lmdif1 on degenerate random clouds
#  - ub: the reference's split_doubleline3 std::reduce uses truncated
#    *heights* as box indices; on these pages they exceed the box
#    count, so the reference reads out of bounds (undefined,
#    memory-layout-dependent) — irreproducible in principle
KNOWN_SPACE_ONLY = {12, 20, 34}
KNOWN_REF_UB = {25}


@pytest.mark.slow
def test_capi_matches_own_binary_on_fuzz_corpus():
    """The in-process C API (what OCRPipeline calls) must be
    bit-identical to our own subprocess binary on the same fuzz corpus —
    they share the engine source but differ in entry path and process
    state (no exec, repeated calls in one process)."""
    import struct as st
    if not lineengine.build_native():
        pytest.skip("native line engine not buildable")
    rng = np.random.default_rng(20260818)
    for case in range(40):
        blob = _blob(rng)
        mw, mh = st.unpack_from("<II", blob, 4)
        off = 12
        line = np.frombuffer(blob, np.float32, mw * mh, off).reshape(mh, mw)
        off += mw * mh * 4
        sep = np.frombuffer(blob, np.float32, mw * mh, off).reshape(mh, mw)
        off += mw * mh * 4
        (n,) = st.unpack_from("<I", blob, off)
        boxes = np.frombuffer(blob, np.float32, n * 8, off + 4).reshape(n, 8)
        capi = lineengine.detect_lines(line, sep, boxes)
        sub = run_engine(OUR_BIN, blob)
        np.testing.assert_array_equal(
            capi, sub, err_msg=f"case {case}: capi != binary")


@pytest.mark.slow
def test_protocol_fuzz_vs_reference_binary():
    if not os.path.isdir(REF):
        pytest.skip("reference checkout not available")
    if not _reference_ready():
        pytest.skip("reference binary not buildable")
    if not lineengine.build_native():
        pytest.skip("native line engine not buildable")

    rng = np.random.default_rng(20260818)
    sort = lambda a: a[np.lexsort(a.T[::-1])]       # noqa: E731
    for case in range(40):
        blob = _blob(rng)
        ours = run_engine(OUR_BIN, blob)
        ref = run_engine(REF_BIN, blob)
        assert ours.shape == ref.shape, f"case {case}: row count differs"
        if not len(ref) or case in KNOWN_REF_UB:
            continue
        co, cr = sort(canonicalize(ours)), sort(canonicalize(ref))
        if case in KNOWN_SPACE_ONLY:
            co, cr = co.copy(), cr.copy()
            co[:, 4] &= ~8
            cr[:, 4] &= ~8
            np.testing.assert_array_equal(
                sort(co), sort(cr),
                err_msg=f"case {case}: non-space divergence appeared")
        else:
            np.testing.assert_array_equal(
                co, cr,
                err_msg=f"case {case}: rows diverge on identical input")
