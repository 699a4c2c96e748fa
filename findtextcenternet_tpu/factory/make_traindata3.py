"""CLI: harvest stage-3 per-codepoint feature banks with a trained detector.

Equivalent of `/root/reference/make_traindata/make_traindata3.py` +
``train_data3/save_feature.py``.

Usage:
    python -m findtextcenternet_tpu.factory.make_traindata3 \
        --checkpoint=result1 --pages=1000 --out=train_data3 \
        [--model-size=xl] [--fonts='fonts/*.ttf'] [--pack]
"""
from __future__ import annotations

import glob
import os
import sys


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    ckpt_dir, pages, out = None, 100, "train_data3"
    model_size = "xl"
    fonts = None
    pack = False
    seed = 0
    for a in argv:
        if a.startswith("--checkpoint="):
            ckpt_dir = a.split("=", 1)[1]
        elif a.startswith("--pages="):
            pages = int(a.split("=", 1)[1])
        elif a.startswith("--out="):
            out = a.split("=", 1)[1]
        elif a.startswith("--model-size="):
            model_size = a.split("=", 1)[1]
        elif a.startswith("--fonts="):
            fonts = sorted(glob.glob(a.split("=", 1)[1]))
        elif a == "--pack":
            pack = True
        elif a.startswith("--seed="):
            seed = int(a.split("=", 1)[1])

    import dataclasses

    from ..config import Config
    from ..infer.pipeline import OCRPipeline
    from .generators import PageGenerator
    from .harvest import FeatureHarvester

    cfg = Config()
    cfg = dataclasses.replace(
        cfg, detector=dataclasses.replace(cfg.detector,
                                          model_size=model_size))
    pipeline = OCRPipeline(cfg, model_size=model_size)
    if ckpt_dir:
        from ..train import checkpoint as ckpt
        latest = ckpt.latest_checkpoint(ckpt_dir)
        if latest:
            eval_params, batch_stats = ckpt.load_eval_params(latest)
            pipeline.det_vars = {
                "params": eval_params["detector"],
                "batch_stats": (batch_stats or {}).get("detector", {}),
            }
            print(f"loaded detector from {latest}")

    gen = PageGenerator(fonts, seed=seed)
    banks_dir = os.path.join(out, "code_features")
    harvester = FeatureHarvester(pipeline, gen, banks_dir, seed=seed)
    total = harvester.run(pages)
    print(f"harvested {total} feature vectors")

    if pack:
        from ..data.transformer_data import save_feature_bank
        keys = save_feature_bank(banks_dir,
                                 os.path.join(out, "features.npz"))
        print(f"packed {len(keys)} banks into features.npz")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
