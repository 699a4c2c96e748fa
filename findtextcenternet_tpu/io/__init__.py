from .torch_import import (  # noqa: F401
    import_detection_only,
    import_detector,
    import_transformer,
    load_torch_state_dict,
)
