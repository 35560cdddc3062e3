"""SAVE_HIDDEN_STATES mode: capture target hidden states to disk.

Counterpart of the reference's `SaveHiddenStatesDrafter`
(`_torch/speculative/save_hidden_state.py`, mode at `interface.py:45-56`):
a propose-nothing drafter that rides the executor's hidden-state tap
(the same path one-model EAGLE/MTP drafters use) and writes each finished
request's ``{input_ids, hidden_state}`` to ``.npz`` shards — the training
data for EAGLE-style draft heads.  ``hidden_capture="eagle3"`` records the
3-layer concatenated features instead of the final hidden.
"""

from __future__ import annotations

import os
from typing import List

import numpy as np

from tensorrt_llm_tpu.speculative.interface import Drafter, SpeculativeConfig


class SaveHiddenStatesDrafter(Drafter):
    needs_hidden = True

    def __init__(self, cfg: SpeculativeConfig):
        self.cfg = cfg
        self.hidden_capture = getattr(cfg, "save_capture", "final")
        self.out_dir = getattr(cfg, "save_dir", None) or "hidden_states"
        self.file_prefix = getattr(cfg, "save_file_prefix", "data")
        self.write_interval = int(getattr(cfg, "save_write_interval", 16))
        self._buf = {}            # request_id -> {pos: hidden row np[H]}
        self._records: List[dict] = []
        self._shard = 0
        self._count = 0

    def bind(self, engine, kv):
        os.makedirs(self.out_dir, exist_ok=True)

    # propose nothing: requests run the normal decode path while the
    # hidden tap records every position
    def propose(self, request) -> List[int]:
        return []

    def on_hidden(self, request, start_pos: int, hiddens):
        rows = self._buf.setdefault(request.request_id, {})
        h = np.asarray(hiddens)
        for i in range(h.shape[0]):
            rows[start_pos + i] = h[i]

    def on_request_finished(self, request):
        rows = self._buf.pop(request.request_id, None)
        if not rows:
            return
        n = max(rows) + 1
        width = next(iter(rows.values())).shape[-1]
        hs = np.zeros((n, width), np.float32)
        for p, row in rows.items():
            hs[p] = row
        ids = list(request.prompt_token_ids) + list(request.output_token_ids)
        self._count += 1
        self._records.append({
            "id": self._count,
            "input_ids": np.asarray(ids[:n], np.int64),
            "hidden_state": hs,
        })
        if len(self._records) >= self.write_interval:
            self.flush()

    def flush(self):
        if not self._records:
            return
        self._shard += 1
        path = os.path.join(self.out_dir,
                            f"{self.file_prefix}_{self._shard}.npz")
        arrays = {}
        for rec in self._records:
            arrays[f"input_ids_{rec['id']}"] = rec["input_ids"]
            arrays[f"hidden_state_{rec['id']}"] = rec["hidden_state"]
        np.savez(path, **arrays)
        self._records = []


def load_hidden_state_shards(out_dir: str, prefix: str = "data"):
    """Read back saved shards as a list of {input_ids, hidden_state}."""
    records = []
    for name in sorted(os.listdir(out_dir)):
        if not (name.startswith(prefix) and name.endswith(".npz")):
            continue
        with np.load(os.path.join(out_dir, name)) as z:
            rids = sorted({int(k.rsplit("_", 1)[1]) for k in z.files})
            for rid in rids:
                records.append({
                    "input_ids": z[f"input_ids_{rid}"],
                    "hidden_state": z[f"hidden_state_{rid}"],
                })
    return records
