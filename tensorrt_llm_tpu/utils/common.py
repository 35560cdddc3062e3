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
