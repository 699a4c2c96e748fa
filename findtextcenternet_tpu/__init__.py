"""findtextcenternet_tpu — a TPU-native (JAX/XLA/Pallas/pjit) OCR framework.

A ground-up rebuild of the capabilities of ``lithium0003/findtextCenterNet``:
CenterNet-style character detection (EfficientNetV2 backbone, 9 heatmap
heads + 100-d per-character features), CRT-coded codepoint classification,
a native text-line ordering engine, an encoder-decoder transformer with
mask-predict parallel decoding, a synthetic-data factory, and three-stage
training — all designed TPU-first (NHWC layouts, static shapes, sharded
batches over a device mesh, Pallas kernels on the hot paths).
"""

__version__ = "0.1.0"

from . import const  # noqa: F401
from .config import Config  # noqa: F401
