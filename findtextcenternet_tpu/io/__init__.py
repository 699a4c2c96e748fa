from .torch_import import (  # noqa: F401
    import_detection_only,
    import_detector,
    import_transformer,
    load_torch_state_dict,
)
from .torch_export import (  # noqa: F401
    export_detector_sd,
    export_transformer_sd,
    save_torch_checkpoint,
)
from .tf_import import load_backbone_npz  # noqa: F401
