from .export import (  # noqa: F401
    export_code_decoder,
    export_detector,
    export_transformer_decoder,
    export_transformer_encoder,
    load_exported,
    save_exported,
)
