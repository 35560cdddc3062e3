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
    # layer-wise/chunk-wise streamed transfer (reference ContextProgress,
    # batch_manager/cacheTransceiver.cpp:203): context_only with
    # stream=True emits KV frames per finished prefill chunk instead of
    # one blocking whole-payload capture; generation_only with kv_frames
    # (a queue.Queue of frames) injects them as they arrive, overlapping
    # transfer with the sender's remaining prefill compute.
    stream: bool = False
    kv_frames: Optional[Any] = None


FRAME_WIRE_VERSION = 1


def frame_to_bytes(frame: dict) -> bytes:
    """Serialize one streamed-KV frame.

    KV frame: ``{"start_block": s, "layers": [...]}`` — per-layer pytrees
    of block pages covering table rows [s, s+n).  End frame:
    ``{"end": True, "first_gen_tokens": [...], "num_tokens": N,
    "block_size": B}``.  Same leaf framing as :func:`payload_to_bytes`
    (raw bytes + JSON spec) with a version tag.
    """
    import json

    import jax
    spec = {"v": FRAME_WIRE_VERSION, "leaves": []}
    for k in ("start_block", "end", "first_gen_tokens", "num_tokens",
              "block_size", "ring", "error"):
        if k in frame:
            spec[k] = frame[k]
    chunks = []
    for i, layer in enumerate(frame.get("layers", [])):
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


def frame_from_bytes(data: bytes) -> dict:
    import json

    import ml_dtypes  # noqa: F401 — registers bfloat16/fp8 numpy dtypes

    hlen = int.from_bytes(data[:8], "little")
    spec = json.loads(data[8:8 + hlen].decode())
    if spec.get("v", 1) > FRAME_WIRE_VERSION:
        raise ValueError(f"unsupported KV frame version {spec['v']}")
    off = 8 + hlen
    layers: dict = {}
    for leaf in spec["leaves"]:
        dt = np.dtype(leaf["dtype"])
        n = int(np.prod(leaf["shape"])) * dt.itemsize
        arr = np.frombuffer(data[off:off + n], dtype=dt).reshape(leaf["shape"])
        off += n
        layers.setdefault(leaf["layer"], []).append(arr)
    out = {k: spec[k] for k in ("start_block", "end", "first_gen_tokens",
                                "num_tokens", "block_size", "ring",
                                "error")
           if k in spec}
    if layers:
        ordered = [layers[i] for i in sorted(layers)]
        out["layers"] = [ls[0] if len(ls) == 1 else tuple(ls)
                         for ls in ordered]
    return out


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
