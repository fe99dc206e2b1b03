"""Multi-host runtime helpers.

The reference has no distributed runtime (SURVEY.md §2.3). On a TPU pod
slice, each host process calls initialize() once before building meshes;
jax.distributed wires the hosts and jax.devices() then spans the slice.
Collectives ride ICI within a slice and DCN across slices — all inserted by
XLA from the sharding annotations, never hand-rolled transport.
"""

from __future__ import annotations

import jax


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Idempotent jax.distributed.initialize wrapper; no-op single-process."""
    if jax.process_count() > 1:
        return  # already initialized
    if coordinator_address is None and num_processes is None:
        # single-process (incl. single-host multi-chip): nothing to do
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def process_info():
    return {"process_index": jax.process_index(), "process_count": jax.process_count(),
            "local_devices": len(jax.local_devices()), "global_devices": len(jax.devices())}
