from . import lineengine  # noqa: F401
from .onnx_backend import OnnxSession  # noqa: F401
from .pipeline import OCRPipeline, ocr_file, ocr_pages  # noqa: F401
