from mpopis_tpu.native.build import build

__all__ = ["build"]
