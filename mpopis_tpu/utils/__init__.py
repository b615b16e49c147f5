from mpopis_tpu.utils.cache import enable_compilation_cache
from mpopis_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from mpopis_tpu.utils.profiling import PhaseTimer, timed, trace

__all__ = [
    "enable_compilation_cache",
    "load_checkpoint",
    "save_checkpoint",
    "PhaseTimer",
    "timed",
    "trace",
]
