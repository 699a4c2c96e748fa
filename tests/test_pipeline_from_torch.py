"""OCRPipeline.from_torch_checkpoints end-to-end with synthetic .pt files."""
import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from findtextcenternet_tpu.config import Config  # noqa: E402
from findtextcenternet_tpu.infer import lineengine  # noqa: E402
from findtextcenternet_tpu.infer.pipeline import OCRPipeline  # noqa: E402
from test_torch_import import _synth_detector_sd  # noqa: E402


def _synth_transformer_sd(dims):
    """torch-layout transformer state dict with reference key names."""
    import sys
    if "/root/reference" in sys.path or True:
        sys.path.insert(0, "/root/reference")
    ref_tf = pytest.importorskip("models.transformer")
    m = ref_tf.Transformer(
        enc_input_dim=dims["enc_input_dim"], embed_dim=dims["embed_dim"],
        head_num=dims["head_num"], enc_block_num=dims["enc_block_num"],
        dec_block_num=dims["dec_block_num"],
        max_enc_seq_len=dims["max_enc_seq_len"],
        max_dec_seq_len=dims["max_dec_seq_len"], dropout=0.0)
    return m.state_dict()


def test_from_torch_checkpoints(tmp_path):
    if not lineengine.build_native():
        pytest.skip("native line engine not buildable")

    det_sd = {k: torch.from_numpy(np.asarray(v, np.float32))
              if np.asarray(v).dtype != np.int64 else torch.from_numpy(
                  np.asarray(v))
              for k, v in _synth_detector_sd("s").items()}
    torch.save({"epoch": 1, "model_state_dict": det_sd},
               tmp_path / "model.pt")

    tdims = dict(enc_input_dim=106, embed_dim=32, head_num=4,
                 enc_block_num=1, dec_block_num=1,
                 max_enc_seq_len=20, max_dec_seq_len=20)
    torch.save({"epoch": 1, "config": tdims,
                "model_state_dict": _synth_transformer_sd(tdims)},
               tmp_path / "model3.pt")

    cfg = Config()
    cfg = dataclasses.replace(
        cfg,
        detector=dataclasses.replace(cfg.detector, model_size="s"),
        transformer=dataclasses.replace(
            cfg.transformer, embed_dim=32, head_num=4, enc_block_num=1,
            dec_block_num=1, max_enc_seq_len=20, max_dec_seq_len=20),
        inference=dataclasses.replace(
            cfg.inference, tile_size=256, detector_batch=1,
            max_peaks_per_tile=32),
        mask_predict=dataclasses.replace(cfg.mask_predict, max_rounds=1),
    )
    pipe = OCRPipeline.from_torch_checkpoints(
        str(tmp_path / "model.pt"), str(tmp_path / "model3.pt"),
        cfg, model_size="s")
    # SimpleDecoder got wired from the checkpoint
    assert pipe.simple_decoder_vars is not None

    img = np.full((256, 256, 3), 255, np.uint8)
    img[100:140, 60:200] = 0
    out = pipe(img)
    assert set(out) == {"box", "line", "block", "text",
                    "aozora", "noruby"}
