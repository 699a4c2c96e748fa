"""CRT codec: exhaustive-ish roundtrip + parity with a slow pure-python CRT."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from findtextcenternet_tpu import const
from findtextcenternet_tpu import crt


def slow_crt(b0, b1, b2):
    """Brute CRT by search over k (independent oracle)."""
    m0, m1, m2 = const.MODULO_LIST
    # x = b0 + m0 * k ; solve for residues
    x = b0 % m0
    while x % m1 != b1 % m1:
        x += m0
    step = m0 * m1
    while x % m2 != b2 % m2:
        x += step
    return x % (m0 * m1 * m2)


def test_roundtrip_dense():
    xs = np.arange(0, const.MAX_CODEPOINT + 1, 97, dtype=np.int64)
    b0, b1, b2 = crt.encode(xs)
    out = crt.decode(b0, b1, b2)
    np.testing.assert_array_equal(out, xs)


def test_roundtrip_edge_values():
    xs = np.array([0, 1, 2, 3, 0xFFF9, 0xFFFA, 0xFFFB, const.MAX_CODEPOINT])
    out = crt.decode(*crt.encode(xs))
    np.testing.assert_array_equal(out, xs)


def test_matches_slow_oracle(rng):
    b = rng.integers(0, np.array(const.MODULO_LIST), size=(64, 3))
    fast = crt.decode(b[:, 0], b[:, 1], b[:, 2])
    slow = np.array([slow_crt(*row) for row in b])
    np.testing.assert_array_equal(fast, slow)


def test_jit_and_int32_safety():
    xs = jnp.array([0, 40, const.MAX_CODEPOINT, 0x3FFFE], dtype=jnp.int32)
    f = jax.jit(lambda a, b, c: crt.decode(a, b, c))
    out = f(*crt.encode(xs))
    assert out.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(out), np.asarray(xs))


def test_invalid_detection():
    # values above MAX_CODEPOINT reconstruct but are flagged invalid
    x = const.MAX_CODEPOINT + 12345
    out = crt.decode(*crt.encode(np.array([x])))
    assert out[0] == x
    assert not crt.is_valid(out)[0]
    checked = crt.decode_checked(*crt.encode(np.array([x])), fill=0)
    assert checked[0] == 0


def test_decode_checked_valid_passthrough():
    xs = np.array([65, 0x3042])  # 'A', 'あ'
    out = crt.decode_checked(*crt.encode(xs))
    np.testing.assert_array_equal(out, xs)


@pytest.mark.parametrize("outtype,expected", [
    ("aozora", "｜漢字《かんじ》"),
    ("noruby", "漢字"),
    ("html", "<ruby><rb>漢字</rb><rp>(</rp><rt>かんじ</rt><rp>)</rp></ruby>"),
])
def test_decode_ruby(outtype, expected):
    from findtextcenternet_tpu.utils import decode_ruby
    marked = "￹漢字￺かんじ￻"
    assert decode_ruby(marked, outtype) == expected


def test_codes_to_text():
    from findtextcenternet_tpu.utils import codes_to_text
    codes = [const.DECODER_SOT, ord("あ"), ord("A"), const.DECODER_EOT, ord("x")]
    assert codes_to_text(codes) == "あA"
    assert codes_to_text([0xD800]) == "�"
