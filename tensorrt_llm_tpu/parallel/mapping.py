"""Parallel topology math.

TPU-native analog of the reference's `tensorrt_llm/mapping.py:394` (`Mapping`):
TP x PP x DP x EP x CP factorization — but expressed as named axes of a
`jax.sharding.Mesh` instead of rank arithmetic.  Collectives ride ICI; the
device mesh is the single source of truth.

Axis names:
  "dp" — data parallel / attention-DP replicas
  "pp" — pipeline stages
  "ep" — MoE expert parallel (experts sharded over this axis)
  "tp" — MoE per-expert tensor parallel
Dense layers shard over the COMBINED ("ep", "tp") axes — the reference's
MoE TPxEP factorization of the tensor-parallel group (mapping.py:79-122)
expressed as mesh structure.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class Mapping:
    world_size: int = 1
    tp_size: int = 1
    pp_size: int = 1
    dp_size: int = 1
    # MoE: experts are sharded over moe_ep_size ranks of the tp axis, each
    # expert's weights further split moe_tp_size ways (tp = moe_ep * moe_tp).
    moe_ep_size: int = 1
    moe_tp_size: int = 1
    # Context parallel (sequence): "ulysses" (head-scatter/seq-gather
    # all_to_all) or "ring" (blockwise KV rotation over the ICI torus —
    # works for any head count; prefill must be single-chunk)
    cp_size: int = 1
    cp_type: str = "ulysses"
    enable_attention_dp: bool = False

    def __post_init__(self):
        if self.moe_ep_size == 1 and self.moe_tp_size == 1:
            object.__setattr__(self, "moe_tp_size", self.tp_size)
        assert self.moe_ep_size * self.moe_tp_size == self.tp_size, (
            f"moe_ep({self.moe_ep_size}) * moe_tp({self.moe_tp_size}) "
            f"!= tp({self.tp_size})")
        expected = self.tp_size * self.pp_size * self.dp_size * self.cp_size
        if self.world_size == 1 and expected > 1:
            object.__setattr__(self, "world_size", expected)
        assert self.world_size == expected, (
            f"world_size {self.world_size} != tp*pp*dp*cp {expected}")

    @property
    def has_tp(self) -> bool:
        return self.tp_size > 1

    @property
    def has_pp(self) -> bool:
        return self.pp_size > 1

    @property
    def has_cp(self) -> bool:
        return self.cp_size > 1

    @property
    def mesh_shape(self):
        return (self.dp_size, self.pp_size, self.cp_size,
                self.moe_ep_size, self.moe_tp_size)

    @property
    def mesh_axis_names(self):
        return ("dp", "pp", "cp", "ep", "tp")

    @classmethod
    def single(cls) -> "Mapping":
        return cls()
