from .resize import resize_bilinear_align_corners, upsample2x  # noqa: F401
