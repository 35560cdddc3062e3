"""Small shared utilities (shape math, platform detection, logging).

Counterpart of the reference's `tensorrt_llm/_utils.py` + `cpp/.../common/`
(logger, assert, envUtils) — re-imagined as a thin Python module since the
TPU framework keeps orchestration in Python/JAX.
"""

from __future__ import annotations

import functools
import logging
import os

logger = logging.getLogger("tensorrt_llm_tpu")
if not logger.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(
        logging.Formatter("[TLLM-TPU] %(asctime)s %(levelname)s %(message)s"))
    logger.addHandler(_h)
logger.setLevel(os.environ.get("TLLM_LOG_LEVEL", "WARNING").upper())


def cdiv(a: int, b: int) -> int:
    """Ceiling division."""
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m


def pad_to(x, size: int, axis: int = 0, value=0):
    """Pad jnp array `x` along `axis` up to `size` with `value`."""
    import jax.numpy as jnp

    cur = x.shape[axis]
    if cur == size:
        return x
    assert cur < size, f"cannot pad {cur} down to {size}"
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, size - cur)
    return jnp.pad(x, widths, constant_values=value)


def pad_dim(x, multiple: int, axis: int = 0, value=0):
    """Pad `x` along `axis` to the next multiple of `multiple`."""
    return pad_to(x, round_up(x.shape[axis], multiple), axis=axis, value=value)


def largest_divisor_leq(n: int, cap: int) -> int:
    """Largest divisor of n that is <= cap."""
    for d in range(min(n, cap), 0, -1):
        if n % d == 0:
            return d
    return 1


@functools.cache
def is_tpu_backend() -> bool:
    import jax

    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


@functools.cache
def enable_compilation_cache() -> str:
    """Persist compiled XLA executables across processes/sessions.

    TPU analog of the reference's engine build-cache
    (`tensorrt_llm/builder.py:93`): without it every chip session pays the
    full (remote, ~minutes-per-program) compile again.  Called from LLM
    bring-up and the bench CLIs; idempotent.  Override the location with
    ``TLLM_TPU_JIT_CACHE`` (set to ``"0"``/``"off"`` to disable).
    """
    import jax

    path = os.environ.get("TLLM_TPU_JIT_CACHE", "")
    if path.lower() in ("0", "off", "none"):
        return ""
    if not path:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    logger.info("persistent compilation cache at %s", path)
    return path
