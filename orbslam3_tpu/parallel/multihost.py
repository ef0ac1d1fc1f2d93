"""Multi-host (multi-process) distribution for the BA back-end.

Replaces the reference's single-machine assumption (its g2o solver runs
on one CPU thread — /root/reference/src/Optimizer.cc:74-85) with the
standard JAX multi-controller recipe: every process calls
`jax.distributed.initialize`, builds ONE global mesh over all devices,
and runs the same jitted program; XLA places collectives on ICI within
a host and DCN (Gloo on CPU) across hosts.  The engine's sharded BA
(`parallel.dist_ba`, reached through `mapping.run_local_ba(mesh=...)`)
needs no changes — `lax.psum` over the mesh axis IS the multi-host
reduction.

Environment contract (torchrun-style, one process per host):
  SLAM_COORDINATOR   host:port of process 0   (default 127.0.0.1:29500)
  SLAM_NUM_PROCESSES total process count       (default 1)
  SLAM_PROCESS_ID    this process's rank       (default 0)

Weak-scaling driver: tools/bench_multihost.py.
"""

from __future__ import annotations

import os

import numpy as np


def initialize_from_env() -> int:
    """Call jax.distributed.initialize from SLAM_* env vars.

    Must run BEFORE any other jax API touches the backend.  Returns the
    process id (0 when not distributed).
    """
    import jax

    n = int(os.environ.get("SLAM_NUM_PROCESSES", "1"))
    if n <= 1:
        return 0
    pid = int(os.environ.get("SLAM_PROCESS_ID", "0"))
    coord = os.environ.get("SLAM_COORDINATOR", "127.0.0.1:29500")
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=n, process_id=pid)
    return pid


def global_mesh(axis: str = "shard"):
    """One 1-D mesh over every device of every process."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (axis,))


def is_primary() -> bool:
    import jax

    return jax.process_index() == 0
