from . import cache, checkpoint, metrics, profiling  # noqa: F401
from .cache import enable_compile_cache  # noqa: F401
