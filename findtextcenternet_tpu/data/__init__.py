from .targets import make_target_maps  # noqa: F401
from .augment import process_sample, transform_crop, colorize  # noqa: F401
from .shards import ShardWriter, iter_tar_samples  # noqa: F401
