"""Stage-3 data generation: feature banks, text rendering, MSK masking."""
import numpy as np
import pytest

from findtextcenternet_tpu.const import (
    DECODER_EOT, DECODER_MSK, DECODER_SOT, ENCODER_DIM, FEATURE_DIM,
    MAX_DECODER_LEN, MAX_ENCODER_LEN,
)
from findtextcenternet_tpu.data.transformer_data import (
    FeatureBank, TransformerDataset, encode_target, gen_feature,
    mask_input, random_furigana, random_text, save_feature_bank,
)


@pytest.fixture(scope="module")
def bank():
    codes = [ord(c) for c in "あいうえお漢字猫犬AB"]
    return FeatureBank.synthetic(codes, samples=3, seed=0)


def test_bank_sampling(bank, rng):
    f = bank.sample(ord("あ"), True, rng)
    assert f.shape == (FEATURE_DIM,)
    # unknown code falls back to random vector
    f2 = bank.sample(0x1F600, True, rng)
    assert f2.shape == (FEATURE_DIM,)


def test_gen_feature_flags(bank, rng):
    text = "あ い\n￹漢￺かん￻A"
    enc = gen_feature(text, bank, rng, orientation="horizontal")
    assert enc.shape == (MAX_ENCODER_LEN, ENCODER_DIM)
    # row 0: SOT pattern
    assert enc[0, 0] == 5 and enc[0, 1] == -5
    # row 1: 'あ'; row 2: 'い' with space flag (space consumed)
    assert enc[2, FEATURE_DIM + 3] == 5
    # row 3: newline flag only
    assert enc[3, FEATURE_DIM + 5] == 5
    assert np.all(enc[3, :FEATURE_DIM] == 0)
    # row 4: '漢' rubybase, rows 5-6 ruby text
    assert enc[4, FEATURE_DIM + 1] == 5
    assert enc[5, FEATURE_DIM + 2] == 5
    assert enc[6, FEATURE_DIM + 2] == 5
    # row 7: 'A' no flags, then EOT
    assert np.all(enc[7, FEATURE_DIM:] == 0)
    assert enc[8, 0] == -5 and enc[8, 1] == 5


def test_gen_feature_vertical_flag(bank, rng):
    enc = gen_feature("あい", bank, rng, orientation="vertical")
    assert enc[1, FEATURE_DIM + 0] == 5
    assert enc[2, FEATURE_DIM + 0] == 5


def test_encode_target_and_mask(rng):
    text = "あい"
    t = encode_target(text)
    assert t.shape == (MAX_DECODER_LEN,)
    assert t[0] == DECODER_SOT
    assert t[1] == ord("あ") and t[2] == ord("い")
    assert t[3] == DECODER_EOT
    assert (t[4:] == 0).all()
    masked = mask_input(t, rng)
    assert masked.shape == t.shape
    assert ((masked == t) | (masked == DECODER_MSK)).all()


def test_random_generators(bank, rng):
    t1 = random_text(bank, rng, max_len=50)
    assert 0 < len(t1)
    t2 = random_furigana(bank, rng)
    # well-formed ruby markers
    assert t2.count("￹") == t2.count("￺") == t2.count("￻")


def test_dataset_batches(bank):
    ds = TransformerDataset(bank, noise_ratio=0.5, seed=1)
    b = next(ds.batches(4))
    assert b["encoder_input"].shape == (4, MAX_ENCODER_LEN, ENCODER_DIM)
    assert b["decoder_input"].shape == (4, MAX_DECODER_LEN)
    assert b["decoder_true"].shape == (4, MAX_DECODER_LEN)
    assert b["decoder_true"].dtype == np.int32


def test_save_feature_bank(tmp_path):
    d = tmp_path / "code_features"
    d.mkdir()
    np.save(d / ("h%08x.npy" % 0x3042), np.ones((2, 100), np.float32))
    np.save(d / ("v%08x.npy" % 0x3042), np.zeros((3, 100), np.float32))
    out = tmp_path / "features.npz"
    keys = save_feature_bank(str(d), str(out))
    assert keys == ["hori_12354", "vert_12354"]
    bank = FeatureBank.load(str(out))
    assert bank.hori[0x3042].shape == (2, 100)
    assert bank.vert[0x3042].shape == (3, 100)
