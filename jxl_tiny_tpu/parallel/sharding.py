"""Multi-chip scale-out: shard the group axis over a device mesh.

The format is designed for independent-unit parallelism (groups own their TOC
entry and entropy-coded stream), so distribution is pure data parallelism over
the group axis 'g' — the TPU-native replacement for the reference's
ThreadPool (base/data_parallel.h; constructed but unused there). The only
cross-group couplings are the integer histogram psum (order-invariant =>
byte-identical output for any sharding) and the host-side TOC/byte
assembly.
"""
import os

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


def _get_shard_map():
    shard_map = getattr(jax, "shard_map", None)
    if shard_map is None:  # older jax
        from jax.experimental.shard_map import shard_map
    return shard_map


def _pad_to(n, m):
    return -(-n // m) * m


def _mesh_geometry(ysize, xsize, gpad, n):
    """Static group-grid geometry for the image-level mesh programs."""
    from ..common import div_ceil

    g_img = div_ceil(ysize, 256) * div_ceil(xsize, 256)
    assert gpad % n == 0 and gpad >= g_img
    gd_img = div_ceil(ysize, 2048) * div_ceil(xsize, 2048)
    gd_pad = _pad_to(gd_img, n)
    return g_img, gpad // n, gd_img, gd_pad, gd_pad // n


import functools as _functools


@_functools.lru_cache(maxsize=None)
def _dc_owner_tables(ysize, xsize, n_shards, gps, gd_ps):
    """Static routing for the DC-group-owner exchange (SCALING.md's named
    ~64x all_gather reduction; enc_frame.cc:536-570 locality): every AC
    group's maps are needed by exactly ONE shard — the owner of its DC
    group — so a few ppermute ring rounds move each map once instead of
    the all_gather's everything-to-everyone.

    Returns (deltas tuple, sel [n_shards, len(deltas), gd_ps*64] i32):
    sel[s, di, m] = the source-local row of member m's group when its
    source shard is (s - deltas[di]) % n_shards, else -1. Member order:
    m = local_dc * 64 + my * 8 + mx."""
    from ..common import div_ceil

    ygr, xgr = div_ceil(ysize, 256), div_ceil(xsize, 256)
    ydg, xdg = div_ceil(ysize, 2048), div_ceil(xsize, 2048)
    gd_img = ydg * xdg
    m_tot = gd_ps * 64
    need = np.full((n_shards, m_tot), -1, np.int64)
    for s in range(n_shards):
        for dl in range(gd_ps):
            d = s * gd_ps + dl
            if d >= gd_img:
                continue
            dy, dx = d // xdg, d % xdg
            for my in range(8):
                gy = dy * 8 + my
                if gy >= ygr:
                    continue
                for mx in range(8):
                    gx = dx * 8 + mx
                    if gx < xgr:
                        need[s, dl * 64 + my * 8 + mx] = gy * xgr + gx
    src = np.where(need >= 0, need // gps, -1)
    deltas = sorted(
        {
            int((s - src[s, m]) % n_shards)
            for s in range(n_shards)
            for m in range(m_tot)
            if src[s, m] >= 0
        }
    )
    sel = np.full((n_shards, max(len(deltas), 1), m_tot), -1, np.int32)
    for s in range(n_shards):
        for di, dlt in enumerate(deltas):
            match = (src[s] >= 0) & (src[s] == (s - dlt) % n_shards)
            sel[s, di, match] = (need[s, match] % gps).astype(np.int32)
    return tuple(deltas), sel


def _dc_layout_owner_exchange(
    maps, i, ysize, xsize, n, gps, gd_img, gd_ps,
):
    """Owner-routed replacement for the all_gather + full-layout build:
    each shard receives only its DC groups' member maps (one ppermute ring
    round per static source-distance) and builds only its own layout
    slice. Bit-identical to the all_gather path (integer maps, exact
    placement; tested)."""
    from ..common import div_ceil
    from ..ops import dc_kernels as DK

    deltas, sel_np = _dc_owner_tables(ysize, xsize, n, gps, gd_ps)
    sel = jnp.asarray(sel_np)
    m_tot = gd_ps * 64
    maps = [m.astype(jnp.int32) for m in maps]  # uniform exact accumulate
    accs = [
        jnp.zeros((m_tot,) + m.shape[1:], jnp.int32) for m in maps
    ]
    for di, dlt in enumerate(deltas):
        if dlt == 0:
            recv = maps
        else:
            perm = [(j, (j + dlt) % n) for j in range(n)]
            recv = [jax.lax.ppermute(m, "g", perm) for m in maps]
        idx = sel[i, di]  # [m_tot], -1 = not this round
        ok = idx >= 0
        ic = jnp.clip(idx, 0)
        for k, r in enumerate(recv):
            take = jnp.take(r, ic, axis=0)
            okb = ok.reshape((m_tot,) + (1,) * (take.ndim - 1))
            accs[k] = accs[k] + jnp.where(okb, take, 0)

    def mosaic(a, trailing):
        # member-ordered [gd_ps*64, (C,) t, t] -> DC-group planes
        # [gd_ps, (C,) 8t, 8t] (regroup_dc's tile order).
        t = a.shape[-1]
        if trailing:
            c = a.shape[1]
            v = a.reshape(gd_ps, 8, 8, c, t, t).transpose(0, 3, 1, 4, 2, 5)
            return v.reshape(gd_ps, c, 8 * t, 8 * t)
        v = a.reshape(gd_ps, 8, 8, t, t).transpose(0, 1, 3, 2, 4)
        return v.reshape(gd_ps, 8 * t, 8 * t)

    qdc = mosaic(accs[0].astype(jnp.int32), True)
    qf = mosaic(accs[1].astype(jnp.int32), False)
    st = mosaic(accs[2].astype(jnp.int32), False)
    fi = mosaic(accs[3].astype(jnp.int32), False).astype(bool)
    yx = mosaic(accs[4].astype(jnp.int32), False)
    yb_ = mosaic(accs[5].astype(jnp.int32), False)

    # Static per-DC-group dims (same formulas as dc_layout_from_maps),
    # padded with zeros beyond the image's DC groups.
    ydg, xdg = div_ceil(ysize, 2048), div_ceil(xsize, 2048)
    gd_pad_full = max(gd_img, n * gd_ps)
    ydb = np.zeros(gd_pad_full, np.int32)
    xdb = np.zeros(gd_pad_full, np.int32)
    tyv = np.zeros(gd_pad_full, np.int32)
    txv = np.zeros(gd_pad_full, np.int32)
    nbv = np.zeros(gd_pad_full, np.int32)
    for d in range(gd_img):
        dy, dx = d // xdg, d % xdg
        ydb[d] = div_ceil(min(2048, ysize - dy * 2048), 8)
        xdb[d] = div_ceil(min(2048, xsize - dx * 2048), 8)
        tyv[d] = div_ceil(ydb[d] * 8, 64)
        txv[d] = div_ceil(xdb[d] * 8, 64)
        nbv[d] = int(ydb[d] * xdb[d] - 1).bit_length()

    def myslice(a):
        return jax.lax.dynamic_slice_in_dim(jnp.asarray(a), i * gd_ps, gd_ps, 0)

    my_dc = DK.build_dc_layout(
        qdc, qf, st, fi, yx, yb_,
        myslice(ydb), myslice(xdb), myslice(tyv), myslice(txv), myslice(nbv),
    )
    # Padded DC-group rows must equal the all_gather path's PAD fill.
    d_global = i * gd_ps + jnp.arange(gd_ps)
    return jnp.where(
        (d_global >= gd_img)[:, None], jnp.uint32(DK.PAD) << 16, my_dc
    )


def _analysis_shard_body(
    img, yb_l, xb_l, distp, cap, cfl, blocks, ysize, xsize,
    g_img, gpad, gps, gd_img, gd_pad, gd_ps,
):
    """Per-shard body of image-level program A: device tiling of the
    replicated image (u8 / byte-plane f16 / f32 ingest — the same
    extract_groups_device as single-chip), this shard's slice of the group
    axis through the full analysis + fused compaction, and this shard's
    slice of the device DC-section layout. The per-group maps are
    all-gathered (a few MB) so every shard can build the DC-group layout —
    DC groups span 8x8 AC groups (enc_frame.cc:536-570), the one place the
    group-major sharding needs cross-shard data.

    Returns (out dict with stream/totals/hist/meta, my_dc [gd_ps, DC_CAP])."""
    from ..ops.pipeline_jax import analyze_groups_packed, dc_layout_from_maps
    from ..ops import dc_kernels as DK

    groups_all = extract_groups_device(img)
    if gpad > g_img:
        groups_all = jnp.pad(
            groups_all, ((0, gpad - g_img), (0, 0), (0, 0), (0, 0))
        )
    i = jax.lax.axis_index("g")
    my = jax.lax.dynamic_slice_in_dim(groups_all, i * gps, gps, 0)
    out = analyze_groups_packed(
        my, yb_l, xb_l,
        distance=float(distp.distance),
        inv_scale=float(distp.inv_scale),
        scale=float(distp.scale),
        scale_dc=float(distp.scale_dc),
        x_qm_mul=float(distp.x_qm_mul),
        cap=cap, cfl=cfl, blocks=blocks, return_maps=True,
    )
    maps = out.pop("_maps")
    n = gpad // gps  # static shard count
    if os.environ.get("JXL_DC_OWNER_EXCHANGE") == "1":
        # Owner-routed exchange: each map travels once, to its DC-group
        # owner (ppermute ring rounds; see _dc_layout_owner_exchange) —
        # byte-identical to the all_gather path below, at 1/N-ish the
        # fabric volume (SCALING.md model).
        my_dc = _dc_layout_owner_exchange(
            maps, i, ysize, xsize, n, gps, gd_img, gd_ps,
        )
        return out, my_dc
    full = [jax.lax.all_gather(m, "g", axis=0, tiled=True)[:g_img] for m in maps]
    dc_layout, _ = dc_layout_from_maps(
        *full, ysize=ysize, xsize=xsize, with_hist=False
    )
    if gd_pad > gd_img:
        dc_layout = jnp.pad(
            dc_layout, ((0, gd_pad - gd_img), (0, 0)),
            constant_values=np.uint32(DK.PAD) << 16,
        )
    my_dc = jax.lax.dynamic_slice_in_dim(dc_layout, i * gd_ps, gd_ps, 0)
    return out, my_dc


def analyze_image_packed_mesh(
    image, yb_pad, xb_pad, distp, mesh: Mesh, cap, cfl=True, blocks=True,
    ysize=None, xsize=None,
):
    """Flagship program A under shard_map, at full single-chip parity:
    device tiling, per-shard analysis + fused compaction, integer-psum AC
    and DC histograms, and per-shard device DC-section layouts.

    image: [3,H,W] or [2,3,H,W]; yb_pad/xb_pad: [Gpad] valid block dims
    padded to a mesh multiple (zeros => empty groups).
    Returns dict(stream [Gpad,cap+128] P('g'), totals [Gpad] P('g'),
    hists [2,64,64] replicated, dc_layout [Gd_pad, DC_CAP] P('g'),
    meta [Gpad, META] P('g'))."""
    from ..ops import dc_kernels as DK

    shard_map = _get_shard_map()
    n = mesh.devices.size
    gpad = yb_pad.shape[0]
    g_img, gps, gd_img, gd_pad, gd_ps = _mesh_geometry(ysize, xsize, gpad, n)

    def shard_fn(img, yb_l, xb_l):
        out, my_dc = _analysis_shard_body(
            img, yb_l, xb_l, distp, cap, cfl, blocks, ysize, xsize,
            g_img, gpad, gps, gd_img, gd_pad, gd_ps,
        )
        achist = jax.lax.psum(out.pop("hist").astype(jnp.int32), "g")
        dchist = jax.lax.psum(DK.dc_hist(my_dc).astype(jnp.int32), "g")
        out["hists"] = jnp.stack([achist, dchist]).astype(jnp.uint32)
        out["dc_layout"] = my_dc
        return out

    f = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P("g"), P("g")),
        out_specs=dict(
            stream=P("g"), totals=P("g"), hists=P(), dc_layout=P("g"),
            meta=P("g"),
        ),
        check_vma=False,
    )
    rep = NamedSharding(mesh, P())
    shg = NamedSharding(mesh, P("g"))
    return jax.jit(f)(
        jax.device_put(image, rep),
        jax.device_put(yb_pad, shg),
        jax.device_put(xb_pad, shg),
    )


def analyze_pack_static_mesh(
    image, yb_pad, xb_pad, distp, d_ac, d_dc, ac_depths, dc_depths,
    mesh: Mesh, cap, cfl, blocks, ow_ac, wcap_ac, ow_dc, wcap_dc,
    compact_ac=True, compact_dc=True, ysize=None, xsize=None,
):
    """One-pass static tier under shard_map: the whole encode (analysis +
    AC/DC section packing with static code tables) in a single sharded
    device program — no host histogram roundtrip, no second dispatch; the
    mesh twin of dc_kernels.analyze_pack_static (OPTIMIZE_CODE=0,
    static_entropy_codes.h role). The candidate picks (select_code_table)
    run on the *psum'd* histograms — exact integer argmins, so every shard
    selects the same tables and the bytes match single-chip.

    Returns dict(ac_words [n,wcap_ac] / dc_words [n,wcap_dc] (or [Gpad,ow]
    rows when uncompacted), small = [ac_bits, ac_offs(shard-local),
    dc_bits, dc_offs(shard-local), totals, k_ac, k_dc] concatenated)."""
    from ..ops.pack_kernels import _pack_ac_impl
    from ..ops import dc_kernels as DK

    shard_map = _get_shard_map()
    n = mesh.devices.size
    gpad = yb_pad.shape[0]
    g_img, gps, gd_img, gd_pad, gd_ps = _mesh_geometry(ysize, xsize, gpad, n)

    def shard_fn(img, yb_l, xb_l, da, dd, adep, ddep):
        out, my_dc = _analysis_shard_body(
            img, yb_l, xb_l, distp, cap, cfl, blocks, ysize, xsize,
            g_img, gpad, gps, gd_img, gd_pad, gd_ps,
        )
        achist = jax.lax.psum(out.pop("hist").astype(jnp.int32), "g")
        dchist = jax.lax.psum(DK.dc_hist(my_dc).astype(jnp.int32), "g")
        k_ac = DK.select_code_table(achist.astype(jnp.uint32), adep)
        k_dc = DK.select_code_table(dchist.astype(jnp.uint32), ddep)
        ac = _pack_ac_impl(
            out["stream"][:, :cap], out["totals"],
            jnp.take(da, k_ac, axis=0), ow_ac, wcap_ac, compact_ac,
        )
        dc = DK._pack_dc_impl(
            my_dc, jnp.take(dd, k_dc, axis=0), ow_dc, wcap_dc, compact_dc
        )
        return dict(
            ac_words=ac["words"][None] if compact_ac else ac["words"],
            dc_words=dc["words"][None] if compact_dc else dc["words"],
            ac_bits=ac["bits"], ac_offs=ac["word_offs"],
            dc_bits=dc["bits"], dc_offs=dc["word_offs"],
            totals=out["totals"],
            k=jnp.stack([k_ac, k_dc]),
        )

    f = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P("g"), P("g"), P(), P(), P(), P()),
        out_specs=dict(
            ac_words=P("g"), dc_words=P("g"),
            ac_bits=P("g"), ac_offs=P("g"),
            dc_bits=P("g"), dc_offs=P("g"), totals=P("g"), k=P(),
        ),
        check_vma=False,
    )
    rep = NamedSharding(mesh, P())
    shg = NamedSharding(mesh, P("g"))
    out = jax.jit(f)(
        jax.device_put(image, rep),
        jax.device_put(yb_pad, shg),
        jax.device_put(xb_pad, shg),
        jax.device_put(d_ac, rep),
        jax.device_put(d_dc, rep),
        jax.device_put(ac_depths, rep),
        jax.device_put(dc_depths, rep),
    )
    out["small"] = jnp.concatenate(
        [out["ac_bits"], out["ac_offs"], out["dc_bits"], out["dc_offs"],
         out["totals"].astype(jnp.int32), out.pop("k")]
    )
    return out


def pack_all_sections_mesh(
    stream, totals, d_ac, dc_layout, d_dc, mesh: Mesh,
    ow_ac, ow_dc, wcap_ac=None, wcap_dc=None,
    compact_ac=True, compact_dc=True,
):
    """Program B under shard_map at single-chip parity: AC + DC section
    packing per shard in one dispatch.

    Returns dict(ac_words [n_dev, wcap_ac], dc_words [n_dev, wcap_dc],
    small [2*Gpad + 2*Gd_pad] — bits then shard-local word offsets for
    each section kind, concatenated exactly like pack_all_sections)."""
    from ..ops.pack_kernels import _pack_ac_impl
    from ..ops.dc_kernels import _pack_dc_impl

    shard_map = _get_shard_map()
    n = mesh.devices.size
    g = stream.shape[0]
    gd = dc_layout.shape[0]
    assert g % n == 0 and gd % n == 0
    if wcap_ac is None:
        wcap_ac = min(1 << int((g // n) * ow_ac).bit_length(), 2 * 1024 * 1024)
    if wcap_dc is None:
        wcap_dc = min(1 << int((gd // n) * ow_dc).bit_length(), 2 * 1024 * 1024)

    def shard_fn(s, t, da, lay, dd):
        ac = _pack_ac_impl(s, t, da, ow_ac, wcap_ac, compact_ac)
        dc = _pack_dc_impl(lay, dd, ow_dc, wcap_dc, compact_dc)
        return dict(
            ac_words=ac["words"][None] if compact_ac else ac["words"],
            dc_words=dc["words"][None] if compact_dc else dc["words"],
            ac_bits=ac["bits"], ac_offs=ac["word_offs"],
            dc_bits=dc["bits"], dc_offs=dc["word_offs"],
        )

    f = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P("g"), P("g"), P(), P("g"), P()),
        out_specs=dict(
            ac_words=P("g"), dc_words=P("g"),
            ac_bits=P("g"), ac_offs=P("g"),
            dc_bits=P("g"), dc_offs=P("g"),
        ),
        check_vma=False,
    )
    rep = NamedSharding(mesh, P())
    out = jax.jit(f)(
        stream, totals, jax.device_put(d_ac, rep), dc_layout,
        jax.device_put(d_dc, rep),
    )
    out["small"] = jnp.concatenate(
        [out["ac_bits"], out["ac_offs"], out["dc_bits"], out["dc_offs"]]
    )
    out["wcap_ac"], out["wcap_dc"] = wcap_ac, wcap_dc
    return out


def analyze_batch_packed_mesh(
    batch, yb_flat, xb_flat, mesh: Mesh, cap, **kwargs
):
    """Batched program A over the mesh, sharded on the IMAGE axis: each
    device analyzes whole images, so there are no collectives at all — the
    codec's batch throughput scales linearly by construction (each image's
    histograms/codes/sections are self-contained; the reference's analogue
    is the per-image ThreadPool fan-out, base/data_parallel.h).

    batch: [N,3,H,W] with N a device-count multiple; yb/xb: [N*G].
    Returns analyze_batch_packed's dict with every array sharded on its
    leading (image or image*group) axis."""
    from ..ops.pipeline_jax import analyze_batch_packed

    shard_map = _get_shard_map()
    n = mesh.devices.size
    assert batch.shape[0] % n == 0

    def shard_fn(bt, yb, xb):
        return analyze_batch_packed(bt, yb, xb, cap=cap, **kwargs)

    f = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P("g"), P("g"), P("g")),
        out_specs=dict(
            stream=P("g"), totals=P("g"), hists=P("g"), dc_layout=P("g")
        ),
        check_vma=False,
    )
    shg = NamedSharding(mesh, P("g"))
    return jax.jit(f)(
        jax.device_put(batch, shg),
        jax.device_put(yb_flat, shg),
        jax.device_put(xb_flat, shg),
    )


def pack_batch_sections_mesh(
    stream, totals, d_ac, layout, d_dc, mesh: Mesh,
    ow_ac, ow_dc, wcap_ac, wcap_dc, compact_ac=True, compact_dc=True,
):
    """Batched program B sharded on the image axis (d_ac/d_dc are [N,9,64]
    per-image tables, so P('g') on them keys each shard's lookup to its own
    images). Same output contract as pack_all_sections_mesh: per-shard
    compacted word buffers, shard-local offsets."""
    from ..ops.dc_kernels import pack_batch_sections

    shard_map = _get_shard_map()
    n = mesh.devices.size
    assert d_ac.shape[0] % n == 0

    def shard_fn(s, t, da, lay, dd):
        out = pack_batch_sections(
            s, t, da, lay, dd, ow_ac=ow_ac, wcap_ac=wcap_ac,
            ow_dc=ow_dc, wcap_dc=wcap_dc,
            compact_ac=compact_ac, compact_dc=compact_dc,
        )
        out.pop("small")
        if compact_ac:
            out["ac_words"] = out["ac_words"][None]
        if compact_dc:
            out["dc_words"] = out["dc_words"][None]
        return out

    f = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P("g"), P("g"), P("g"), P("g"), P("g")),
        out_specs=dict(
            ac_words=P("g"), dc_words=P("g"),
            ac_bits=P("g"), ac_offs=P("g"),
            dc_bits=P("g"), dc_offs=P("g"),
        ),
        check_vma=False,
    )
    shg = NamedSharding(mesh, P("g"))
    out = jax.jit(f)(
        stream, totals, jax.device_put(jnp.asarray(d_ac), shg), layout,
        jax.device_put(jnp.asarray(d_dc), shg),
    )
    out["small"] = jnp.concatenate(
        [out["ac_bits"], out["ac_offs"], out["dc_bits"], out["dc_offs"]]
    )
    return out


def analyze_pack_batch_static_mesh(
    batch, yb_flat, xb_flat, d_ac, d_dc, ac_depths, dc_depths, mesh: Mesh,
    cap, ow_ac, wcap_ac, ow_dc, wcap_dc,
    compact_ac=True, compact_dc=True, **kwargs,
):
    """One-pass batch tier on the image-sharded mesh: each device runs the
    fused analyze+select+pack program (dc_kernels.analyze_pack_batch_static)
    on its images — no collectives at all (per-image histograms, picks, and
    sections are self-contained), so bytes match single-chip by
    construction. Same output contract as pack_batch_sections_mesh, with
    `small` gaining [totals, k_ac, k_dc] (image-sharded picks)."""
    from ..ops.dc_kernels import analyze_pack_batch_static

    shard_map = _get_shard_map()
    n = mesh.devices.size
    assert batch.shape[0] % n == 0

    def shard_fn(bt, yb, xb, da, dd, adep, ddep):
        out = analyze_pack_batch_static(
            bt, yb, xb, da, dd, adep, ddep, cap=cap,
            ow_ac=ow_ac, wcap_ac=wcap_ac, ow_dc=ow_dc, wcap_dc=wcap_dc,
            compact_ac=compact_ac, compact_dc=compact_dc, **kwargs,
        )
        n_img = bt.shape[0]
        small = out.pop("small")
        out["k_ac"] = small[-2 * n_img : -n_img]
        out["k_dc"] = small[-n_img:]
        if compact_ac:
            out["ac_words"] = out["ac_words"][None]
        if compact_dc:
            out["dc_words"] = out["dc_words"][None]
        return out

    f = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P("g"), P("g"), P("g"), P(), P(), P(), P()),
        out_specs=dict(
            ac_words=P("g"), dc_words=P("g"),
            ac_bits=P("g"), ac_offs=P("g"),
            dc_bits=P("g"), dc_offs=P("g"), totals=P("g"),
            k_ac=P("g"), k_dc=P("g"),
        ),
        check_vma=False,
    )
    rep = NamedSharding(mesh, P())
    shg = NamedSharding(mesh, P("g"))
    out = jax.jit(f)(
        jax.device_put(batch, shg),
        jax.device_put(yb_flat, shg),
        jax.device_put(xb_flat, shg),
        jax.device_put(jnp.asarray(d_ac), rep),
        jax.device_put(jnp.asarray(d_dc), rep),
        jax.device_put(jnp.asarray(ac_depths), rep),
        jax.device_put(jnp.asarray(dc_depths), rep),
    )
    out["small"] = jnp.concatenate(
        [out["ac_bits"], out["ac_offs"], out["dc_bits"], out["dc_offs"],
         out["totals"].astype(jnp.int32), out.pop("k_ac"), out.pop("k_dc")]
    )
    return out


def extract_groups_device(img):
    from ..ops.pipeline_jax import extract_groups_device as _e

    return _e(img)


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
