"""Multi-chip scale-out: shard the group axis over a device mesh.

The format is designed for independent-unit parallelism (groups own their TOC
entry and entropy-coded stream), so distribution is pure data parallelism over
the group axis 'g' — the TPU-native replacement for the reference's
ThreadPool (base/data_parallel.h; constructed but unused there). The only
cross-group couplings are the integer histogram psum (order-invariant =>
byte-identical output for any sharding) and the host-side TOC/byte
assembly.
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.pipeline_jax import analyze_groups_jax


def make_mesh(devices=None):
    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), ("g",))


def shard_groups(groups, yb_valid, xb_valid, mesh: Mesh):
    """Pad G to a device multiple and device_put with group-axis sharding."""
    n = mesh.devices.size
    g = groups.shape[0]
    pad = (-g) % n
    if pad:
        groups = np.concatenate([groups, np.zeros((pad,) + groups.shape[1:], groups.dtype)])
        yb_valid = np.concatenate([yb_valid, np.zeros(pad, yb_valid.dtype)])
        xb_valid = np.concatenate([xb_valid, np.zeros(pad, xb_valid.dtype)])
    sh = NamedSharding(mesh, P("g"))
    return (
        jax.device_put(groups, sh),
        jax.device_put(yb_valid, sh),
        jax.device_put(xb_valid, sh),
        g,
    )


def analyze_groups_sharded(
    groups, yb_valid, xb_valid, distp, mesh: Mesh, fast=False, cap=16384
):
    """Run the batched pipeline with the group axis sharded over `mesh`.

    All pipeline ops are per-group, so XLA partitions the whole program
    without inserting collectives (except, in the fast path, the all-reduce
    of the AC histogram — an order-invariant integer sum); outputs come back
    sharded the same way.
    """
    from ..ops.pipeline_jax import analyze_groups_fast

    gshard, ybs, xbs, g = shard_groups(
        np.asarray(groups), np.asarray(yb_valid), np.asarray(xb_valid), mesh
    )
    kwargs = dict(
        distance=float(distp.distance),
        inv_scale=float(distp.inv_scale),
        scale=float(distp.scale),
        scale_dc=float(distp.scale_dc),
        x_qm_mul=float(distp.x_qm_mul),
    )
    if fast:
        out = analyze_groups_fast(gshard, ybs, xbs, cap=cap, **kwargs)
    else:
        out = analyze_groups_jax(gshard, ybs, xbs, **kwargs)
    return {k: np.asarray(v)[:g] for k, v in out.items()}


def analyze_groups_packed_sharded(
    groups, yb_valid, xb_valid, distp, mesh: Mesh, cap=32768,
    cfl=True, blocks=True,
):
    """Flagship program A under shard_map: the group axis is sharded over the
    mesh; each shard runs the full analysis + Pallas compaction locally and
    the base-64 histogram partials are all-reduced (integer psum — order
    invariant, so the resulting entropy code and final bytes are identical
    for any mesh shape; test_sharding asserts this).

    Returns dict(stream [G,cap+128] sharded, totals [G], hist [64,64]
    replicated, meta [G, META_BYTES])."""
    from ..ops.pipeline_jax import analyze_groups_packed

    shard_map = getattr(jax, "shard_map", None)
    if shard_map is None:  # older jax
        from jax.experimental.shard_map import shard_map

    def shard_fn(gr, yb, xb):
        out = analyze_groups_packed(
            gr, yb, xb,
            distance=float(distp.distance),
            inv_scale=float(distp.inv_scale),
            scale=float(distp.scale),
            scale_dc=float(distp.scale_dc),
            x_qm_mul=float(distp.x_qm_mul),
            cap=cap, cfl=cfl, blocks=blocks,
        )
        out["hist"] = jax.lax.psum(out["hist"].astype(jnp.int32), "g").astype(
            jnp.uint32
        )
        return out

    f = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P("g"), P("g"), P("g")),
        out_specs=dict(stream=P("g"), totals=P("g"), hist=P(), meta=P("g")),
        check_vma=False,
    )
    gshard, ybs, xbs, g = shard_groups(
        np.asarray(groups, np.float32), np.asarray(yb_valid), np.asarray(xb_valid),
        mesh,
    )
    return jax.jit(f)(gshard, ybs, xbs), g


def pack_ac_sections_sharded(stream, totals, d_table, mesh: Mesh, ow=8192):
    """Program B under shard_map: per-shard bit-packing + word compaction.

    Returns dict(words [n_dev, wcap] — shard k's compacted buffer in row k,
    bits [G], word_offs [G] — offsets local to each shard's buffer)."""
    from ..ops.pack_kernels import pack_ac_sections

    shard_map = getattr(jax, "shard_map", None)
    if shard_map is None:  # older jax
        from jax.experimental.shard_map import shard_map

    n = mesh.devices.size
    g = stream.shape[0]
    assert g % n == 0
    wcap = min(1 << int((g // n) * ow).bit_length(), 2 * 1024 * 1024)

    def shard_fn(s, t, d):
        out = pack_ac_sections(s, t, d, ow=ow, wcap=wcap)
        return dict(
            words=out["words"][None], bits=out["bits"], word_offs=out["word_offs"]
        )

    f = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P("g"), P("g"), P()),
        out_specs=dict(words=P("g"), bits=P("g"), word_offs=P("g")),
        check_vma=False,
    )
    return jax.jit(f)(stream, totals, jax.device_put(d_table, NamedSharding(mesh, P())))
