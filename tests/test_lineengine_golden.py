"""Line engine golden-file regression tests over the binary protocol.

Fixtures in ``tests/data/lineengine_*.{in,out}.bin`` are recorded protocol
transcripts; any behavioral change to the engine shows up as a diff here
(re-record consciously when the change is intended).
"""
import glob
import os
import subprocess

import pytest

from findtextcenternet_tpu.infer import lineengine

DATA = os.path.join(os.path.dirname(__file__), "data")
CASES = sorted(glob.glob(os.path.join(DATA, "lineengine_*.in.bin")))


@pytest.fixture(scope="module", autouse=True)
def built():
    if not lineengine.build_native():
        pytest.skip("native line engine not buildable")


@pytest.mark.parametrize("in_path", CASES,
                         ids=[os.path.basename(p)[11:-7] for p in CASES])
def test_golden(in_path):
    with open(in_path, "rb") as f:
        blob = f.read()
    expect_path = in_path.replace(".in.bin", ".out.bin")
    with open(expect_path, "rb") as f:
        expect = f.read()
    out = subprocess.run([lineengine.BIN_PATH], input=blob,
                         stdout=subprocess.PIPE,
                         stderr=subprocess.DEVNULL, check=True).stdout
    assert out == expect, (
        f"line engine output changed for {os.path.basename(in_path)}; "
        "re-record tests/data fixtures if intended")


def test_cases_exist():
    assert len(CASES) >= 3
