from . import checkpoint, common, image, profiling, rng, stats
from .common import EasyDict, Logger, construct_class_by_name, format_time, open_url
