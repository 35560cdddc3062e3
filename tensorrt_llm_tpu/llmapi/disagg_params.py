"""Disaggregated serving parameters + KV payload serialization.

Counterpart of the reference's `DisaggregatedParams` (llmapi) and the
CacheTransceiver wire format (`batch_manager/cacheFormatter.cpp`): a
context-only request returns the first generated token plus an opaque KV
payload; a generation-only request carries both to the decode server.  The
transfer plane here is host memory + HTTP/DCN (npz framing) instead of
UCX/NIXL RDMA.
"""

from __future__ import annotations

import io
from dataclasses import dataclass, field
from typing import Any, List, Optional

import numpy as np


@dataclass
class DisaggregatedParams:
    request_type: str = "context_only"   # context_only | generation_only
    first_gen_tokens: List[int] = field(default_factory=list)
    kv_payload: Optional[dict] = None    # {"layers": [...], "num_tokens": N}


def payload_to_bytes(payload: dict) -> bytes:
    """Flatten the per-layer KV pytrees into one framed blob.  Leaves are
    shipped as raw bytes with a JSON spec (numpy's npz cannot represent
    bfloat16/fp8)."""
    import json

    import jax
    spec = {"num_tokens": payload["num_tokens"],
            "block_size": payload["block_size"], "leaves": []}
    chunks = []
    for i, layer in enumerate(payload["layers"]):
        for leaf in jax.tree.leaves(layer):
            a = np.asarray(leaf)
            spec["leaves"].append(
                {"layer": i, "dtype": str(a.dtype), "shape": list(a.shape)})
            chunks.append(a.tobytes())
    head = json.dumps(spec).encode()
    buf = io.BytesIO()
    buf.write(len(head).to_bytes(8, "little"))
    buf.write(head)
    for c in chunks:
        buf.write(c)
    return buf.getvalue()


def payload_from_bytes(data: bytes) -> dict:
    """Rebuild the payload as flat per-layer leaf lists (the engine's
    inject matches leaves by order)."""
    import json

    import ml_dtypes  # noqa: F401 — registers bfloat16/fp8 numpy dtypes

    hlen = int.from_bytes(data[:8], "little")
    spec = json.loads(data[8:8 + hlen].decode())
    off = 8 + hlen
    layers: dict = {}
    for leaf in spec["leaves"]:
        dt = np.dtype(leaf["dtype"])
        n = int(np.prod(leaf["shape"])) * dt.itemsize
        arr = np.frombuffer(data[off:off + n], dtype=dt).reshape(leaf["shape"])
        off += n
        layers.setdefault(leaf["layer"], []).append(arr)
    ordered = [layers[i] for i in sorted(layers)]
    ordered = [ls[0] if len(ls) == 1 else tuple(ls) for ls in ordered]
    return {"layers": ordered, "num_tokens": spec["num_tokens"],
            "block_size": spec["block_size"]}
