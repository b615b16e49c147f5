"""Fused-kernel compile-failure fallback helpers.

`supports_fused_rollout` equates "platform is TPU" with "the Pallas
kernel compiles" — round 3 shipped a Mosaic regression that turned three
working vmap-capable tasks into hard crashes (VERDICT r3: Pusher/
Humanoid/HumanoidStandup "Invalid relayout" / vmem OOM with no
fallback). The policy builder and the harness now probe the compiled
step once and degrade to the generic vmap rollout when the kernel fails
to compile, instead of crashing the task.
"""

from __future__ import annotations

# Substrings that identify a TPU kernel-compilation failure (as opposed
# to a user error like a bad shape). Matched against the full exception
# chain's text:
# - "Mosaic"             — the Pallas TPU compiler's own errors
# - "tpu_custom_call"    — XLA failing on the kernel custom call
# - "remote_compile" / "tpu_compile_helper" — the relay's compile path
#   (wraps the Mosaic error in an HTTP 500 without the original text)
# - "vmem"               — scoped-VMEM RESOURCE_EXHAUSTED
_KERNEL_ERROR_MARKS = (
    "Mosaic",
    "mosaic",
    "tpu_custom_call",
    "remote_compile",
    "tpu_compile_helper",
    "vmem",
    "Invalid relayout",
)


def is_kernel_compile_error(exc: BaseException) -> bool:
    """True when the exception (or anything in its cause/context chain)
    looks like a TPU kernel compilation failure."""
    seen: set[int] = set()
    e: BaseException | None = exc
    while e is not None and id(e) not in seen:
        seen.add(id(e))
        text = f"{type(e).__name__}: {e}"
        if any(m in text for m in _KERNEL_ERROR_MARKS):
            return True
        e = e.__cause__ or e.__context__
    return False
