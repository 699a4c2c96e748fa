from findtextcenternet_tpu.config import Config, config_from_json, to_json


def test_roundtrip_json():
    cfg = Config()
    s = to_json(cfg)
    cfg2 = config_from_json(s)
    assert cfg2 == cfg


def test_override():
    import dataclasses
    cfg = Config()
    cfg2 = dataclasses.replace(
        cfg, detector=dataclasses.replace(cfg.detector, model_size="s")
    )
    assert cfg2.detector.model_size == "s"
    assert cfg2.detector.map_size == (192, 192)
