from . import lineengine  # noqa: F401
from .pipeline import OCRPipeline, ocr_file  # noqa: F401
