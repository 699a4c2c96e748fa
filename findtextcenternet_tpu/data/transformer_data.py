"""Stage-3 (transformer) training data generation.

Equivalent of the reference's ``TransformerDataDataset``
(`/root/reference/dataset/data_transformer.py:267-687`): per-codepoint
feature banks harvested from a trained detector (``features.npz`` with
``hori_<code>`` / ``vert_<code>`` arrays), synthetic encoder sequences
rendered from corpus text / random strings / furigana patterns with
gaussian feature noise, and MSK-corrupted decoder inputs.

Emits numpy batches ready for `train/steps.transformer_train_step`.
"""
from __future__ import annotations

import glob
import os
import re
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ..const import (
    DECODER_EOT,
    DECODER_MSK,
    DECODER_PAD,
    DECODER_SOT,
    ENCODER_DIM,
    FEATURE_DIM,
    MAX_DECODER_LEN,
    MAX_ENCODER_LEN,
)

UNICODE_WHITESPACE = set(
    "\t\x0b\x0c\r\x1c\x1d\x1e\x1f \x85\xa0　")
EMPHASIS_CHARACTERS = ("・", "﹅", "﹆", "●", "○")

SP_TOKEN = np.zeros(ENCODER_DIM, np.float32)
SP_TOKEN[0:FEATURE_DIM:2] = 5
SP_TOKEN[1:FEATURE_DIM:2] = -5


class FeatureBank:
    """Per-codepoint detector feature banks (hori/vert)."""

    def __init__(self, hori: Dict[int, np.ndarray],
                 vert: Dict[int, np.ndarray]):
        self.hori = hori
        self.vert = vert
        self.codes = sorted(set(hori) | set(vert))
        self.hcodes = sorted(hori)
        self.vcodes = sorted(vert)

    @classmethod
    def load(cls, npz_path: str) -> "FeatureBank":
        hori, vert = {}, {}
        with np.load(npz_path) as data:
            for name in data.files:
                kind, code = name.split("_")
                code = int(code)
                if kind == "hori":
                    hori[code] = np.asarray(data[name], np.float32)
                elif kind == "vert":
                    vert[code] = np.asarray(data[name], np.float32)
        return cls(hori, vert)

    @classmethod
    def synthetic(cls, codes: Sequence[int], samples: int = 4,
                  seed: int = 0) -> "FeatureBank":
        """Random per-code banks (tests / smoke training)."""
        rng = np.random.default_rng(seed)
        hori = {c: rng.normal(0, 5, (samples, FEATURE_DIM)
                              ).astype(np.float32) for c in codes}
        vert = {c: rng.normal(0, 5, (samples, FEATURE_DIM)
                              ).astype(np.float32) for c in codes}
        return cls(hori, vert)

    def sample(self, code: int, horizontal: bool,
               rng: np.random.Generator) -> np.ndarray:
        bank = self.hori if horizontal else self.vert
        arr = bank.get(code)
        if arr is None or len(arr) == 0:
            return rng.normal(0, 5, (FEATURE_DIM,)).astype(np.float32)
        return arr[int(rng.integers(len(arr)))]


def gen_feature(text: str, bank: FeatureBank, rng: np.random.Generator,
                orientation: str = "both", noise_ratio: float = 0.0,
                enc_len: int = MAX_ENCODER_LEN) -> np.ndarray:
    """Render text to a (max_encoderlen, 106) encoder sequence.

    Flags layout and SOT/EOT patterns match
    `/root/reference/dataset/data_transformer.py:527-604`.
    """
    if orientation == "horizontal":
        horizontal = True
    elif orientation == "vertical":
        horizontal = False
    else:
        horizontal = rng.uniform() < 0.5

    # emphasis: ruby groups whose annotation is an emphasis character mark
    # their base characters with the emphasis flag
    emphasis_idx = set()
    ind = text.find("￹")
    while ind >= 0:
        ind2 = text.find("￺", ind)
        ind3 = text.find("￻", ind2) if ind2 >= 0 else -1
        if ind2 >= 0 and ind3 >= 0:
            if ind2 + 1 < len(text) and text[ind2 + 1] in EMPHASIS_CHARACTERS:
                emphasis_idx.update(range(ind + 1, ind3))
            ind = text.find("￹", ind3)
        else:
            break

    ret = np.zeros((enc_len, ENCODER_DIM), np.float32)
    ret[0] = SP_TOKEN
    idx, sp, ruby = 1, False, 0
    for i, c in enumerate(text):
        if idx >= enc_len:
            break
        if not horizontal:
            ret[idx, FEATURE_DIM + 0] = 5
        if c == "\n":
            ret[idx, FEATURE_DIM + 5] = 5
            sp = False
            idx += 1
            continue
        if c in UNICODE_WHITESPACE:
            sp = True
            continue
        if c == "￹":
            ruby = 1
            continue
        if c == "￺":
            ruby = 2
            continue
        if c == "￻":
            ruby = 0
            continue
        feat = bank.sample(ord(c), horizontal, rng)
        if noise_ratio > 0:
            feat = feat + 10.0 * rng.normal(size=feat.shape) * noise_ratio
        ret[idx, :FEATURE_DIM] = feat
        if ruby == 1:
            ret[idx, FEATURE_DIM + 1] = 5
        elif ruby == 2:
            ret[idx, FEATURE_DIM + 2] = 5
        if sp:
            ret[idx, FEATURE_DIM + 3] = 5
            sp = False
        if i in emphasis_idx:
            ret[idx, FEATURE_DIM + 4] = 5
        idx += 1
    if idx < enc_len:
        ret[idx] = -SP_TOKEN
    return ret


def encode_target(text: str, dec_len: int = MAX_DECODER_LEN) -> np.ndarray:
    """text -> [SOT, utf32 codes..., EOT, PAD...] of dec_len."""
    codes = [DECODER_SOT] + [ord(c) for c in text] + [DECODER_EOT]
    codes += [DECODER_PAD] * max(0, dec_len - len(codes))
    return np.asarray(codes[:dec_len], np.int32)


def mask_input(true_codes: np.ndarray, rng: np.random.Generator
               ) -> np.ndarray:
    """Per-sample uniform MSK rate corruption
    (`/root/reference/dataset/data_transformer.py:678-687`)."""
    p = rng.uniform()
    mask = rng.uniform(size=true_codes.shape) < p
    return np.where(mask, DECODER_MSK, true_codes).astype(np.int32)


# ---------------------------------------------------------------------------
# text sources
# ---------------------------------------------------------------------------

_HIRAGANA = [chr(c) for c in range(0x3041, 0x3097)]
_KATAKANA = [chr(c) for c in range(0x30A1, 0x30FB)]


def random_text(bank: FeatureBank, rng: np.random.Generator,
                max_len: Optional[int] = None) -> str:
    """Random codepoint string from the bank's coverage."""
    n = int(rng.integers(1, max_len or (MAX_DECODER_LEN - 2)))
    codes = bank.codes or [0x3042]
    out = []
    for _ in range(n):
        c = codes[int(rng.integers(len(codes)))]
        out.append(chr(c))
        if rng.uniform() < 0.05:
            out.append("\n")
    return "".join(out)


def random_furigana(bank: FeatureBank, rng: np.random.Generator,
                    max_len: Optional[int] = None) -> str:
    """Random text with interlinear ruby groups (simplified generator;
    the reference's is corpus-driven —
    `/root/reference/dataset/data_transformer.py:98-265`)."""
    kanji = [c for c in (bank.codes or []) if 0x4E00 <= c <= 0x9FFF]
    if not kanji:
        kanji = list(range(0x4E00, 0x4E80))
    n = int(rng.integers(1, (max_len or 120) // 6 + 2))
    out = []
    for _ in range(n):
        r = rng.uniform()
        if r < 0.4:
            base = "".join(chr(kanji[int(rng.integers(len(kanji)))])
                           for _ in range(int(rng.integers(1, 4))))
            ruby = "".join(_HIRAGANA[int(rng.integers(len(_HIRAGANA)))]
                           for _ in range(int(rng.integers(1, 6))))
            out.append(f"￹{base}￺{ruby}￻")
        elif r < 0.8:
            out.append("".join(
                _HIRAGANA[int(rng.integers(len(_HIRAGANA)))]
                for _ in range(int(rng.integers(1, 8)))))
        else:
            out.append("\n")
    return "".join(out)


class TransformerDataset:
    """Mixes real-data replay, corpus text, and random strings.

    Source weighting mirrors the reference: corpus text dominates, with
    random furigana / random codepoint strings as augmentation.
    """

    def __init__(self, bank: FeatureBank,
                 text_files: Sequence[str] = (),
                 real_data: Sequence[Tuple[np.ndarray, str]] = (),
                 noise_ratio: float = 1.0, seed: int = 0,
                 enc_len: int = MAX_ENCODER_LEN,
                 dec_len: int = MAX_DECODER_LEN):
        self.bank = bank
        self.noise_ratio = noise_ratio
        self.enc_len = enc_len
        self.dec_len = dec_len
        self.rng = np.random.default_rng(seed)
        self.texts: List[str] = []
        for f in text_files:
            try:
                with open(f, encoding="utf-8") as fh:
                    t = fh.read()
                if t.strip():
                    self.texts.append(t)
            except OSError:
                pass
        self.real_data = list(real_data)

    def _corpus_slice(self) -> str:
        t = self.texts[int(self.rng.integers(len(self.texts)))]
        start = int(self.rng.integers(max(1, len(t) - 1)))
        piece = t[start:start + MAX_DECODER_LEN - 2]
        # don't start inside a ruby group
        for m in ("￺", "￻"):
            i = piece.find(m)
            j = piece.find("￹")
            if i >= 0 and (j < 0 or i < j):
                piece = piece[i + 1:]
        return piece

    def sample(self) -> Dict[str, np.ndarray]:
        rng = self.rng
        r = rng.uniform()
        if self.real_data and r < 0.01 * len(self.real_data):
            feat, text = self.real_data[int(rng.integers(
                len(self.real_data)))]
            enc = feat
        else:
            if self.texts and r < 0.7:
                text = self._corpus_slice()
            elif r < 0.85:
                text = random_furigana(self.bank, rng,
                                       max_len=self.dec_len - 2)
            else:
                text = random_text(self.bank, rng,
                                   max_len=self.dec_len - 2)
            text = text[:self.dec_len - 2]
            enc = gen_feature(text, self.bank, rng,
                              noise_ratio=self.noise_ratio,
                              enc_len=self.enc_len)
        true = encode_target(text, self.dec_len)
        inp = mask_input(true, rng)
        return {"encoder_input": enc, "decoder_input": inp,
                "decoder_true": true, "text": text}

    def batches(self, batch_size: int) -> Iterator[Dict[str, np.ndarray]]:
        while True:
            items = [self.sample() for _ in range(batch_size)]
            yield {
                "encoder_input": np.stack([i["encoder_input"]
                                           for i in items]),
                "decoder_input": np.stack([i["decoder_input"]
                                           for i in items]),
                "decoder_true": np.stack([i["decoder_true"]
                                          for i in items]),
            }


def save_feature_bank(code_features_dir: str, out_npz: str):
    """Pack harvested per-code .npy banks into features.npz
    (`/root/reference/train_data3/save_feature.py` equivalent;
    files named ``h%08x.npy`` / ``v%08x.npy``)."""
    arrays = {}
    for f in glob.glob(os.path.join(code_features_dir, "*.npy")):
        base = os.path.basename(f)[:-4]
        kind, code = base[0], int(base[1:], 16)
        key = ("hori_%d" if kind == "h" else "vert_%d") % code
        arrays[key] = np.load(f)
    np.savez_compressed(out_npz, **arrays)
    return sorted(arrays)
