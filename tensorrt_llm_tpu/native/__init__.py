"""Native (C++) runtime extensions.

The reference keeps CPU-hot serving bookkeeping in native code
(`cpp/tensorrt_llm/batch_manager/`, exposed via nanobind bindings); we do the
same for the paged-KV block index, but with a zero-dependency toolchain: the
shared library is compiled on demand with ``g++`` and loaded through
``ctypes`` (pybind11 is not available in this environment).  Everything
degrades gracefully — if no compiler is present the pure-Python
implementations in ``runtime/`` are used instead.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional

from tensorrt_llm_tpu.utils import logger

_HERE = os.path.dirname(os.path.abspath(__file__))
_SOURCES = ["kv_bookkeeping.cc"]
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _cache_dir() -> str:
    d = os.environ.get("TLLM_TPU_NATIVE_CACHE") or os.path.join(
        os.path.expanduser("~"), ".cache", "tensorrt_llm_tpu")
    os.makedirs(d, exist_ok=True)
    return d


def _source_hash() -> str:
    h = hashlib.sha256()
    for s in _SOURCES:
        with open(os.path.join(_HERE, s), "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:16]


def _build() -> Optional[str]:
    out = os.path.join(_cache_dir(), f"_tllm_native_{_source_hash()}.so")
    if os.path.exists(out):
        return out
    srcs = [os.path.join(_HERE, s) for s in _SOURCES]
    cmd = ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", *srcs, "-o", out]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (OSError, subprocess.SubprocessError) as e:
        stderr = getattr(e, "stderr", b"") or b""
        logger.warning("native extension build failed (%s); falling back to "
                       "pure Python: %s", e, stderr.decode(errors="replace"))
        return None
    return out


def _declare(lib: ctypes.CDLL) -> ctypes.CDLL:
    c = ctypes
    p, i32, i64, u64 = c.c_void_p, c.c_int32, c.c_int64, c.c_uint64
    pi32, pi64 = c.POINTER(i32), c.POINTER(i64)
    lib.tllm_kvbm_create.restype = p
    lib.tllm_kvbm_create.argtypes = [i32, i32, i32]
    lib.tllm_kvbm_destroy.argtypes = [p]
    lib.tllm_kvbm_add_sequence.restype = i64
    lib.tllm_kvbm_add_sequence.argtypes = [p, i64, pi32, i64, u64, i32]
    lib.tllm_kvbm_grow.restype = i32
    lib.tllm_kvbm_grow.argtypes = [p, i64, i64]
    lib.tllm_kvbm_seq_num_blocks.restype = i64
    lib.tllm_kvbm_seq_num_blocks.argtypes = [p, i64]
    lib.tllm_kvbm_seal.argtypes = [p, i64, pi32, i64]
    lib.tllm_kvbm_fork.restype = i64
    lib.tllm_kvbm_fork.argtypes = [p, i64, i64, pi32, pi32, i64]
    lib.tllm_kvbm_free_seq.argtypes = [p, i64]
    lib.tllm_kvbm_block_table.argtypes = [p, i64, pi32, i64]
    lib.tllm_kvbm_slot_mapping.restype = i32
    lib.tllm_kvbm_slot_mapping.argtypes = [p, i64, i64, i64, pi32]
    lib.tllm_kvbm_num_free.restype = i64
    lib.tllm_kvbm_num_free.argtypes = [p]
    lib.tllm_kvbm_match.restype = i64
    lib.tllm_kvbm_match.argtypes = [p, pi32, i64, u64, i32]
    lib.tllm_kvbm_match_partial.restype = i64
    lib.tllm_kvbm_match_partial.argtypes = [p, pi32, i64, u64, i32]
    lib.tllm_kvbm_partial_match.argtypes = [p, i64, pi32, i64, i32, pi64]
    lib.tllm_kvbm_stats.argtypes = [p, pi64]
    lib.tllm_kvbm_set_priority.argtypes = [p, i64, i32]
    lib.tllm_kvbm_drain_evictions.restype = i64
    lib.tllm_kvbm_drain_evictions.argtypes = [p, pi32, i64]
    return lib


def load_native() -> Optional[ctypes.CDLL]:
    """Build (once) and load the native extension; None when unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get("TLLM_NATIVE", "1") == "0":
            return None
        path = _build()
        if path is None:
            return None
        try:
            _LIB = _declare(ctypes.CDLL(path))
        except OSError as e:
            logger.warning("native extension load failed: %s", e)
            _LIB = None
    return _LIB
