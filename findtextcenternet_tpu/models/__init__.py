from .efficientnet import EfficientNetV2, EFFNET_V2_CONFIGS, TAP_CHANNELS  # noqa: F401
from .detector import (  # noqa: F401
    CenterNetDetection,
    Leafmap,
    SimpleDecoder,
    TextDetectorModel,
    detect_peaks,
    topk_fmask,
)
from .transformer import (  # noqa: F401
    Transformer,
    TransformerDims,
    mask_predict,
    make_key_mask,
    crt_combine_topk,
)
