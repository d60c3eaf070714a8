"""Multi-host scale-out: the same group-axis data parallelism as
`parallel.sharding`, spanning processes.

Design (SURVEY §2.8; reference anchor: the parallel-safe loop markers
enc_frame.cc:714-715,837-838 — the format has no cross-group coupling
except the histogram sum and the final byte concatenation):

- The global mesh spans all processes' devices on one axis ``g``; the
  group axis is sharded over it DC-group-major (a DC group = 8x8 AC
  groups, enc_frame.cc:536-570, so group-major contiguity keeps each DC
  group's all_gather traffic on as few hosts as possible).
- Every process feeds the *same* replicated image (pixels are tiny next
  to compute; for production multi-host ingest each host would read its
  slice and all_gather — see SCALING.md) plus its addressable slice of
  the per-group valid-dims arrays.
- The only cross-host collectives are the integer AC/DC histogram psums
  (order-invariant => bytes identical to single-host) and the per-group
  map all_gather that builds the DC layout — a few MB, once per image.
- Sections come back sharded; host 0 gathers them (process_allgather —
  the DCN hop) and assembles the codestream exactly like single-chip.

Everything here works unchanged on a single process (process_count==1),
so the encode path is testable without the distributed runtime; the
two-process CPU dryrun (tools/multihost_dryrun.py, wired into
__graft_entry__) exercises the real cross-process collectives.
"""
import numpy as np
import jax

from .sharding import make_mesh


def initialize(coordinator: str, num_processes: int, process_id: int,
               local_device_count: int | None = None):
    """jax.distributed bring-up for a CPU/TPU pod slice. On CPU, pin the
    per-process virtual device count *before* backend init."""
    if local_device_count is not None:
        jax.config.update(
            "jax_num_cpu_devices", int(local_device_count)
        )
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh():
    """One-axis global mesh over all processes' devices, process-major —
    jax.devices() orders by process index, so group-major sharding lands
    contiguous group ranges on each host."""
    return make_mesh(jax.devices())


def host0_gather(tree):
    """Gather sharded device outputs to every host (the host-0 DCN hop;
    symmetric because process_allgather is the primitive JAX exposes).
    No-op copies on a single process."""
    if jax.process_count() == 1:
        return jax.tree.map(np.asarray, tree)
    from jax.experimental import multihost_utils

    return jax.tree.map(
        lambda x: np.asarray(
            multihost_utils.process_allgather(x, tiled=True)
        ),
        tree,
    )


def encode_image_multihost(img, distance=1.0, config=None, cap=32768,
                           ow=8192):
    """Full flagship encode over the global (possibly multi-process) mesh;
    every process participates in the device programs, host 0 assembles
    and returns the codestream bytes (others return None).

    The device programs are exactly DeviceEncodeJob's mesh mode; only the
    section fetch differs (process_allgather instead of local np.asarray).
    """
    from ..encoder import DeviceEncodeJob

    mesh = global_mesh()
    job = DeviceEncodeJob(
        img, distance, upload_dtype=None, cap=cap, ow=ow, config=config,
        mesh=mesh, fetch=host0_gather,
    )
    job.pack()
    if jax.process_index() == 0:
        return job.result()
    job.result()  # participate in collective fetches
    return None
