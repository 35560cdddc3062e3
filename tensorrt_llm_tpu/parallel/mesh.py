"""Device mesh construction over ICI.

Replaces the reference's NCCL communicator bring-up
(`cpp/.../runtime/ncclCommunicator.cpp`, `_torch/distributed/communicator.py`):
on TPU the mesh + XLA collectives are the communicator.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax

from tensorrt_llm_tpu.parallel.mapping import Mapping


def make_mesh(mapping: Mapping, devices: Optional[Sequence] = None) -> jax.sharding.Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    n = mapping.world_size
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    return jax.make_mesh(
        mapping.mesh_shape, mapping.mesh_axis_names, devices=devices[:n])


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None):
    """Multi-host bring-up: one Python controller process per host.

    Replaces the reference's MPI world bootstrap (`llmapi/mpi_session.py`) —
    jax.distributed wires all hosts' chips into one device list; the mesh
    then spans hosts, DCN between slices is handled by XLA.
    """
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)
    return jax.devices()
