"""Device-mesh helpers.

All multi-chip layouts here are 1-D: the corpus axis ("data") is the only
dimension worth sharding for an index-and-query engine (SURVEY.md §5 —
there is no attention/sequence model; scale axes are corpus size N and
descriptor count). Training reuses the same axis for data parallelism.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), axis_names=(axis,))


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Join a multi-host (DCN) job: ``jax.distributed.initialize`` so
    ``jax.devices()`` spans every host's chips and the 1-D mesh (and all
    collectives riding it) extends across the slice boundary.

    Call once per process before any other JAX use. With no arguments, JAX
    auto-detects cluster parameters from the TPU environment; pass them
    explicitly for manual multi-process runs. Returns the global device
    count. (The reference is strictly single-process — SURVEY.md §2.3; this
    is the DCN half of the BASELINE-mandated scale-out, the ICI half being
    the mesh itself.)
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)
    return len(jax.devices())


def mesh_from_config(cfg) -> Optional[Mesh]:
    """Build the serving/indexing mesh a CLI run asked for (or None).

    ``cfg.shard_devices`` (the ``--sharded`` flag): 0 = all local devices,
    N = the first N. The ``cfg.dcn_*`` trio first joins a multi-host job
    via :func:`init_multihost`, then shards over the GLOBAL device set —
    the launch shape for serving one index across a multi-host slice.
    """
    dcn = (cfg.dcn_coordinator, cfg.dcn_num_processes, cfg.dcn_process_id)
    if any(v is not None for v in dcn):
        if cfg.dcn_coordinator == "auto":
            # TPU-pod autodetection: jax.distributed.initialize() reads
            # cluster parameters from the TPU environment
            init_multihost()
        elif None in dcn:
            raise ValueError(
                "multi-host needs all three of --dcn-coordinator, "
                "--dcn-processes and --dcn-process-id (or "
                "--dcn-coordinator auto on a TPU pod)"
            )
        else:
            init_multihost(*dcn)
        if cfg.shard_devices is None:
            return make_mesh(axis=cfg.mesh_axis)  # all global devices
    if cfg.shard_devices is None:
        return None
    return make_mesh(cfg.shard_devices or None, axis=cfg.mesh_axis)


def shard_rows(x, mesh: Mesh, axis: str = "data"):
    """Place (N, ...) array row-sharded over the mesh axis. N must be
    divisible by the mesh size (pad first — see index/store.py)."""
    spec = P(axis, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(x, mesh: Mesh):
    return jax.device_put(x, NamedSharding(mesh, P()))
