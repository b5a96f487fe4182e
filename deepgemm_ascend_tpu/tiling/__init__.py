from . import analytic, cache, platform, selector
from .cache import TilingCache, cache_key, global_cache, reset_global_cache
from .platform import PlatformInfo, detect
from .selector import register_predictor, select_config

__all__ = [
    "analytic", "cache", "platform", "selector",
    "TilingCache", "cache_key", "global_cache", "reset_global_cache",
    "PlatformInfo", "detect", "register_predictor", "select_config",
]
