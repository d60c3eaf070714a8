"""Top-level encoder: image -> spec-conformant .jxl codestream.

Orchestration mirrors EncodeFile/EncodeFrame (enc_file.cc:55-105,
enc_frame.cc:818-860). Group analysis runs through a pluggable pipeline:
the numpy golden model (jxl_tiny_tpu.ref) or the batched TPU pipeline
(jxl_tiny_tpu.ops). Section assembly, entropy-code optimization, and bit
packing are host-side.
"""
import numpy as np

from . import constants as C
from .common import (
    DEFAULT_CONFIG,
    ImageDim,
    clamp_distance,
    compute_distance_params,
    div_ceil,
)
from .bitstream.bit_writer import BitWriter
from .bitstream import sections as S
from .entropy import build_entropy_code
from .ref import pipeline_np as P
from .ref import group_np as G

# Below this pixel count, upload_dtype=float16 silently upgrades to f32:
# the upload saving is negligible and f16 mantissa noise tilts the
# adaptive-quant heuristics on very flat content. Tests pin this to 0 to
# golden-gate the genuine f16 split-plane ingest on small corpus images.
F16_AUTO_F32_PIXELS = 2e6


class GroupResult:
    """Per-group analysis outputs (cropped to valid block dims)."""

    def __init__(self, gt, strategy, is_first, raw_qf, ytox, ytob, yb, xb):
        if gt is not None:
            self.tokens = gt.tokens[:yb, :xb]
            self.counts = gt.counts[:yb, :xb]
            self.quant_dc = gt.quant_dc[:, :yb, :xb]
        self.strategy = strategy[:yb, :xb]
        self.is_first = is_first[:yb, :xb]
        self.raw_qf = raw_qf[:yb, :xb]
        self.ytox = ytox
        self.ytob = ytob
        self.yb = yb
        self.xb = xb


def _extract_group(img, gx, gy):
    """Edge-replicated 256x256 patch (CopyAndPadImage, enc_frame.cc:597-617)."""
    _, h, w = img.shape
    ys = np.clip(gy * 256 + np.arange(256), 0, h - 1)
    xs = np.clip(gx * 256 + np.arange(256), 0, w - 1)
    return img[:, ys[:, None], xs[None, :]]


def analyze_group_numpy(img, gx, gy, distp, aq_fn=None):
    _, h, w = img.shape
    gw = min(256, w - gx * 256)
    gh = min(256, h - gy * 256)
    xb, yb = div_ceil(gw, 8), div_ceil(gh, 8)
    xyb = P.to_xyb(_extract_group(img, gx, gy))
    if aq_fn is None:
        aq_fn = P.compute_adaptive_quant_field
    qf, masking, raw_qf = aq_fn(xyb, distp.distance, distp.inv_scale)
    ytox, ytob = P.compute_cmap(xyb, xb, yb)
    ytox_p = _pad_tile_map(ytox)
    ytob_p = _pad_tile_map(ytob)
    strategy, is_first = P.compute_ac_strategy(
        xyb, qf, masking, ytox_p, ytob_p, distp.distance, xb, yb
    )
    raw_qf = P.adjust_quant_field(strategy, is_first, raw_qf)
    gt = G.encode_group(
        xyb,
        strategy,
        is_first,
        raw_qf,
        ytox_p,
        ytob_p,
        distp.scale,
        distp.scale_dc,
        distp.x_qm_mul,
        xb,
        yb,
    )
    return GroupResult(gt, strategy, is_first, raw_qf, ytox, ytob, yb, xb)


def _pad_tile_map(m):
    ty, tx = m.shape
    return np.pad(m, ((0, 4 - ty), (0, 4 - tx)), mode="edge")


def encode_image(img: np.ndarray, distance: float = 1.0, analyze_fn=None) -> bytes:
    """img: [3, H, W] float32 linear sRGB -> .jxl bytes."""
    assert img.ndim == 3 and img.shape[0] == 3
    distance = clamp_distance(distance)
    distp = compute_distance_params(distance)
    dim = ImageDim(img.shape[2], img.shape[1])
    if analyze_fn is None:
        analyze_fn = analyze_group_numpy

    groups = {}
    for gy in range(dim.ysize_groups):
        for gx in range(dim.xsize_groups):
            groups[(gy, gx)] = analyze_fn(img, gx, gy, distp)

    return assemble_codestream(groups, dim, distp)


def assemble_codestream(
    groups,
    dim: ImageDim,
    distp,
    ac_ops=None,
    ac_histo=None,
    ac_writers=None,
    ac_code=None,
    dc_code=None,
    dc_writers=None,
) -> bytes:
    """Build sections, optimize entropy codes, pack the final codestream.

    ac_writers/ac_code and dc_writers/dc_code: pre-serialized sections + the
    codes they were packed with (the device-packed path) — histogramming and
    token packing are skipped for those. dc_code alone: static code tier."""
    # --- DC group sections ---
    dc_ops = []
    if dc_writers is None:
        for dgy in range(dim.ysize_dc_groups):
            for dgx in range(dim.xsize_dc_groups):
                dc_ops.append(_build_dc_group(groups, dim, dgy, dgx))

    # --- AC group sections ---
    if ac_ops is None and ac_writers is None:
        ac_ops = []
        for gy in range(dim.ysize_groups):
            for gx in range(dim.xsize_groups):
                g = groups[(gy, gx)]
                ac_ops.append(
                    S.build_ac_group_section(
                        g.tokens, g.counts, g.strategy, g.is_first
                    )
                )

    # --- Two-pass entropy optimization (enc_frame.cc:846-850) ---
    if dc_code is None:
        dc_histo = S.histogram_sections(dc_ops, C.NUM_DC_CONTEXTS)
        dc_code = build_entropy_code(dc_histo)
    if ac_code is None:
        if ac_histo is None:
            ac_histo = S.histogram_sections(ac_ops, C.NUM_AC_CONTEXTS)
        ac_code = build_entropy_code(ac_histo)

    # --- Serialize sections in stream order ---
    sections = []
    w = BitWriter()
    S.write_dc_global(w, distp, dim.num_dc_groups, dc_code)
    sections.append(w)
    if dc_writers is not None:
        if callable(dc_writers):
            dc_writers = dc_writers()
        sections.extend(dc_writers)
    else:
        for ops in dc_ops:
            sections.append(S.serialize_section(ops, dc_code))
    w = BitWriter()
    S.write_ac_global(w, dim.num_groups, ac_code)
    sections.append(w)
    if ac_writers is not None:
        # Callable form: the device-packed path defers its download/sync so
        # program B overlaps all the host work above.
        if callable(ac_writers):
            ac_writers = ac_writers()
        sections.extend(ac_writers)
    else:
        for ops in ac_ops:
            sections.append(S.serialize_section(ops, ac_code))

    # --- Final assembly ---
    out = BitWriter()
    S.write_file_header(out, dim.xsize, dim.ysize)
    S.write_frame_header(out, distp.x_qm_scale, distp.epf_iters)
    S.write_toc_and_sections(out, sections)
    return out.to_bytes()


def _ac_histogram_host(ac_ops):
    """AC histograms from compact streams (C++ fast path, numpy fallback)."""
    from .cpp import get_lib

    lib = get_lib()
    if lib is None:
        return S.histogram_sections(ac_ops, C.NUM_AC_CONTEXTS)
    hist = np.zeros((C.NUM_AC_CONTEXTS, C.ALPHABET_SIZE), np.uint32)
    for ops in ac_ops:
        for op in ops:
            s = np.ascontiguousarray(op[1], np.uint32)
            lib.histogram_tokens(s.ctypes.data, len(s), hist.ctypes.data)
    return hist


def _build_dc_group(groups, dim: ImageDim, dgy, dgx):
    """Assemble per-DC-group maps from member groups and build its section ops."""
    ydb = div_ceil(min(2048, dim.ysize - dgy * 2048), 8)
    xdb = div_ceil(min(2048, dim.xsize - dgx * 2048), 8)
    quant_dc = np.zeros((3, ydb, xdb), np.int16)
    raw_qf = np.zeros((ydb, xdb), np.uint8)
    strategy_code = np.zeros((ydb, xdb), np.int64)
    is_first = np.zeros((ydb, xdb), bool)
    ty = div_ceil(ydb * 8, 64)
    tx = div_ceil(xdb * 8, 64)
    ytox = np.zeros((ty, tx), np.int8)
    ytob = np.zeros((ty, tx), np.int8)

    gy0, gx0 = dgy * 8, dgx * 8
    for gy in range(gy0, min(gy0 + 8, dim.ysize_groups)):
        for gx in range(gx0, min(gx0 + 8, dim.xsize_groups)):
            g = groups[(gy, gx)]
            by0 = (gy - gy0) * 32
            bx0 = (gx - gx0) * 32
            quant_dc[:, by0 : by0 + g.yb, bx0 : bx0 + g.xb] = g.quant_dc
            raw_qf[by0 : by0 + g.yb, bx0 : bx0 + g.xb] = g.raw_qf
            strategy_code[by0 : by0 + g.yb, bx0 : bx0 + g.xb] = C.STRATEGY_CODE[
                g.strategy
            ]
            is_first[by0 : by0 + g.yb, bx0 : bx0 + g.xb] = g.is_first
            t_y0 = (gy - gy0) * 4
            t_x0 = (gx - gx0) * 4
            gty, gtx = g.ytox.shape
            ytox[t_y0 : t_y0 + gty, t_x0 : t_x0 + gtx] = g.ytox
            ytob[t_y0 : t_y0 + gty, t_x0 : t_x0 + gtx] = g.ytob

    return S.build_dc_group_section(
        quant_dc, raw_qf, strategy_code, is_first, ytox, ytob
    )


def _extract_all_groups(img, dim: ImageDim):
    """All group patches [G, 3, 256, 256] (edge replicated) + valid dims."""
    _, h, w = img.shape
    g = dim.num_groups
    groups = np.empty((g, 3, 256, 256), np.float32)
    yb = np.empty(g, np.int32)
    xb = np.empty(g, np.int32)
    i = 0
    for gy in range(dim.ysize_groups):
        for gx in range(dim.xsize_groups):
            groups[i] = _extract_group(img, gx, gy)
            yb[i] = div_ceil(min(256, h - gy * 256), 8)
            xb[i] = div_ceil(min(256, w - gx * 256), 8)
            i += 1
    return groups, yb, xb


def encode_image_jax(
    img: np.ndarray,
    distance: float = 1.0,
    mesh=None,
    fast=True,
    cap=16384,
    upload_dtype=None,
) -> bytes:
    """Batched TPU path: all groups analyzed in one jitted (optionally
    mesh-sharded) program, host packs the codestream.

    fast=True keeps token arrays on device: only the compact emission-ordered
    stream, AC histograms, and small per-block maps are transferred (the
    device<->host link is the bottleneck in tunneled TPU setups). `cap` bounds
    tokens per group; on overflow the encode falls back to the full cap.
    """
    from .ref.group_np import GroupTokens
    from .parallel.sharding import analyze_groups_sharded, make_mesh

    assert img.ndim == 3 and img.shape[0] == 3
    distance = clamp_distance(distance)
    distp = compute_distance_params(distance)
    dim = ImageDim(img.shape[2], img.shape[1])
    if mesh is None:
        mesh = make_mesh()

    yb_arr = np.empty(dim.num_groups, np.int32)
    xb_arr = np.empty(dim.num_groups, np.int32)
    i = 0
    for gy in range(dim.ysize_groups):
        for gx in range(dim.xsize_groups):
            yb_arr[i] = div_ceil(min(256, img.shape[1] - gy * 256), 8)
            xb_arr[i] = div_ceil(min(256, img.shape[2] - gx * 256), 8)
            i += 1

    if fast and mesh.devices.size == 1:
        # Whole-image upload; tiling happens on device (halves host work and
        # avoids materializing the padded group batch host-side).
        from .ops.pipeline_jax import analyze_image_fast
        import jax.numpy as jnp

        up = img if upload_dtype is None else img.astype(upload_dtype)

        def run(c):
            out = analyze_image_fast(
                jnp.asarray(up),
                jnp.asarray(yb_arr),
                jnp.asarray(xb_arr),
                distance=float(distp.distance),
                inv_scale=float(distp.inv_scale),
                scale=float(distp.scale),
                scale_dc=float(distp.scale_dc),
                x_qm_mul=float(distp.x_qm_mul),
                cap=c,
            )
            return {k: np.asarray(v) for k, v in out.items()}

        out = run(cap)
        if int(out["totals"].max(initial=0)) > cap:
            out = run(3 * 64 * 1024)
    else:
        groups_px, yb_arr, xb_arr = _extract_all_groups(img, dim)
        out = analyze_groups_sharded(
            groups_px, yb_arr, xb_arr, distp, mesh, fast=fast, cap=cap
        )
        if fast and int(out["totals"].max(initial=0)) > cap:
            out = analyze_groups_sharded(
                groups_px, yb_arr, xb_arr, distp, mesh, fast=True, cap=3 * 64 * 1024
            )

    ac_ops = None
    ac_histo = None
    if fast:
        ac_ops = []
        for i in range(dim.num_groups):
            s = out["stream"][i, : int(out["totals"][i])]
            ac_ops.append([("stream", s)])
        ac_histo = _ac_histogram_host(ac_ops)

    groups = {}
    i = 0
    for gy in range(dim.ysize_groups):
        for gx in range(dim.xsize_groups):
            yb, xb = int(yb_arr[i]), int(xb_arr[i])
            ty, tx = div_ceil(yb, 8), div_ceil(xb, 8)
            if fast:
                gt = None
            else:
                gt = GroupTokens(
                    tokens=out["tokens"][i],
                    counts=out["counts"][i],
                    quant_dc=out["quant_dc"][i].astype(np.int16),
                    nzeros=None,
                )
            gr = GroupResult(
                gt,
                out["strategy"][i].astype(np.uint8),
                out["is_first"][i],
                out["raw_qf"][i].astype(np.uint8),
                out["ytox"][i, :ty, :tx].astype(np.int8),
                out["ytob"][i, :ty, :tx].astype(np.int8),
                yb,
                xb,
            )
            if fast:
                gr.quant_dc = out["quant_dc"][i][:, :yb, :xb]
            groups[(gy, gx)] = gr
            i += 1
    return assemble_codestream(groups, dim, distp, ac_ops=ac_ops, ac_histo=ac_histo)


def _writer_from_bits(raw_bytes: np.ndarray, nbits: int) -> BitWriter:
    """BitWriter holding `nbits` bits whose byte image is raw_bytes (LSB
    first). Trailing bits of the final partial byte are zeroed (JXL section
    padding must be zero; the device packer leaves garbage past `nbits`)."""
    w = BitWriter()
    full = nbits // 8
    if full:
        w.write_arrays(
            np.full(full, 8, np.uint8), raw_bytes[:full].astype(np.uint64)
        )
    rem = nbits & 7
    if rem:
        w.write(rem, int(raw_bytes[full]) & ((1 << rem) - 1))
    return w


_CAP_BUCKETS = (32768, 65536, 131072, 262144)


def _split_f16_planes(img16: np.ndarray) -> np.ndarray:
    """f16 [3,H,W] -> byte planes [2,3,H,W] u8 (hi plane first).

    The hi-byte plane (sign+exponent+top mantissa) is spatially smooth, so
    link-level transport compression recovers ~20% of the upload time vs
    interleaved f16 on compressing links; the device recombines exactly
    (extract_groups_device)."""
    b = img16.view(np.uint8).reshape(img16.shape + (2,))
    # little-endian f16: byte 1 is the high byte
    return np.stack([b[..., 1], b[..., 0]])


def _next_bucket(buckets, value):
    for b in buckets:
        if value <= b:
            return b
    raise ValueError(f"value {value} exceeds largest bucket {buckets[-1]}")


class DeviceEncodeJob:
    """One image through the device-packed path, staged so that several
    images can be pipelined over the host<->device link
    (encode_images_device). Stages:

      __init__  enqueues the pixel upload + device program A (async)
      pack()    syncs A's small outputs, builds the entropy code, enqueues
                program B (async)
      result()  host assembly (DC sections, headers, TOC); B's outputs are
                synced at the last moment so its device time overlaps the
                host work
    """

    def __init__(self, img, distance=1.0, upload_dtype=np.float16,
                 cap=32768, ow=8192, config=None, mesh=None, fetch=None):
        import jax.numpy as jnp
        from .ops.pipeline_jax import analyze_image_packed
        from .common import DEFAULT_CONFIG

        assert img.ndim == 3 and img.shape[0] == 3
        self.config = DEFAULT_CONFIG if config is None else config
        distance = clamp_distance(distance)
        self.distp = compute_distance_params(distance)
        self.dim = ImageDim(img.shape[2], img.shape[1])
        self.cap = cap
        self.ow = ow
        g = self.dim.num_groups
        yb_arr = np.empty(g, np.int32)
        xb_arr = np.empty(g, np.int32)
        i = 0
        for gy in range(self.dim.ysize_groups):
            for gx in range(self.dim.xsize_groups):
                yb_arr[i] = div_ceil(min(256, img.shape[1] - gy * 256), 8)
                xb_arr[i] = div_ceil(min(256, img.shape[2] - gx * 256), 8)
                i += 1
        self.yb_arr, self.xb_arr = yb_arr, xb_arr
        # Mesh mode: same orchestration, but both device programs run under
        # shard_map with the group axis padded to a device multiple; words
        # and word offsets come back per shard (parallel.sharding).
        self.mesh = mesh
        # D2H conversion hook. Multi-host meshes pass a process_allgather
        # wrapper (parallel.multihost.host0_gather) because sharded outputs
        # are not fully addressable from any single process; every process
        # must then drive the job symmetrically (collective fetches).
        self._fetch = np.asarray if fetch is None else fetch
        self._n_shards = 1 if mesh is None else mesh.devices.size
        self._gpad = -(-g // self._n_shards) * self._n_shards
        gd = self.dim.num_dc_groups
        self._gd_pad = -(-gd // self._n_shards) * self._n_shards
        if self._gpad > g:
            pad = self._gpad - g
            self.yb_arr = np.concatenate([yb_arr, np.zeros(pad, np.int32)])
            self.xb_arr = np.concatenate([xb_arr, np.zeros(pad, np.int32)])

        if img.dtype == np.uint8:
            up = img  # sRGB u8: linearized on device (extract_groups_device)
        else:
            if (upload_dtype == np.float16
                    and img.shape[1] * img.shape[2] < F16_AUTO_F32_PIXELS):
                # f16 mantissa noise tilts the adaptive-quant heuristics on
                # very flat content; below ~2MP the f32 upload is cheap.
                upload_dtype = None
            if upload_dtype == np.float16:
                up = _split_f16_planes(img.astype(np.float16))
            else:
                up = img if upload_dtype is None else img.astype(upload_dtype)
        self._kwargs = dict(
            distance=float(self.distp.distance),
            inv_scale=float(self.distp.inv_scale),
            scale=float(self.distp.scale),
            scale_dc=float(self.distp.scale_dc),
            x_qm_mul=float(self.distp.x_qm_mul),
        )
        self._up = up
        self._run_a = self._make_run_a()
        self._compact_ac = True
        self._compact_dc = True
        self._packed = False
        self._static = not self.config.optimize_code
        if self._static:
            # One-pass tier: analysis + packing with static codes is a
            # single device program; dispatch it right away (no histogram
            # roundtrip at all — the reference's OPTIMIZE_CODE=0 design).
            from .entropy.entropy_write import load_static_codes

            self.meta = None
            self._static_codes = sc = load_static_codes()
            # Placeholders until the device reports its candidate picks
            # (the trailing two elements of `small`); result() resolves.
            self.full_code = sc.ac_codes[0]
            self.dc_code = sc.dc_codes[0]
            self._d_dev = jnp.asarray(sc.ac_tables)
            self._d_dc = jnp.asarray(sc.dc_tables)
            self._ac_depths = jnp.asarray(sc.ac_depths)
            self._dc_depths = jnp.asarray(sc.dc_depths)
            self._ow_dc = 8192
            self._dispatch_b()
        else:
            self.out_a = self._run_a(cap)  # dispatched; not synced

    def _make_run_a(self):
        import jax.numpy as jnp
        from .ops.pipeline_jax import analyze_image_packed

        if self.mesh is not None:
            from .parallel.sharding import analyze_image_packed_mesh

            def run_a(c):
                return analyze_image_packed_mesh(
                    jnp.asarray(self._up), jnp.asarray(self.yb_arr),
                    jnp.asarray(self.xb_arr), self.distp, self.mesh,
                    cap=c,
                    cfl=self.config.optimize_chroma_from_luma,
                    blocks=self.config.optimize_block_sizes,
                    ysize=self.dim.ysize, xsize=self.dim.xsize,
                )

            return run_a

        def run_a(c):
            return analyze_image_packed(
                jnp.asarray(self._up), jnp.asarray(self.yb_arr),
                jnp.asarray(self.xb_arr),
                cap=c,
                cfl=self.config.optimize_chroma_from_luma,
                blocks=self.config.optimize_block_sizes,
                **self._kwargs,
            )

        return run_a

    def ready_for_pack(self):
        """True when pack() would not block on the device (program A's
        small outputs are already host-fetchable). Used by the pipelined
        batch driver to pack queued jobs opportunistically."""
        try:
            arr = self.out_small if self._static else self.out_a["totals"]
            return bool(arr.is_ready())
        except Exception:
            return True  # conservative: let pack() do the blocking sync

    def pack(self):
        """Sync program A's small outputs; build the entropy codes; dispatch
        the section-packing program. Idempotent. (One-pass static tier: the
        combined program was already dispatched in __init__; only the
        token-capacity check remains.)"""
        import jax.numpy as jnp
        from .ops.pack_kernels import ac_base64_map
        from .entropy.entropy_write import (
            build_ac_device_code,
            build_dc_device_code,
        )

        if self._packed:
            return
        self._packed = True
        if self._static:
            g2 = 2 * (self._gpad + self._gd_pad)
            # Trailing two entries: the device's AC/DC candidate picks.
            totals = self._small_sync()[g2:-2]
            if int(totals.max(initial=0)) > self.cap:
                self.cap = _next_bucket(_CAP_BUCKETS, int(totals.max()))
                self._dispatch_b()
            return

        # totals + histograms in ONE device->host transfer (the tunneled
        # link costs ~25 ms latency per transfer and is half-duplex, so
        # every extra round trip steals time from the next image's upload
        # — VERDICT r4 task 4). The tiny device-side concat is compiled
        # once per shape. Mesh/multihost fetch hooks keep split fetches
        # (collective gathers need plain sharded arrays).
        def _sync_totals_hists():
            if self.mesh is None and self._fetch is np.asarray:
                import jax.numpy as jnp

                t = self.out_a["totals"]
                h = self.out_a["hists"]
                combo = self._fetch(
                    jnp.concatenate(
                        [t.astype(jnp.uint32).ravel(), h.ravel()]
                    )
                )
                return (
                    combo[: t.shape[0]].astype(np.int64),
                    combo[t.shape[0] :].reshape(h.shape),
                )
            return (
                self._fetch(self.out_a["totals"]),
                self._fetch(self.out_a["hists"]),
            )

        totals, hists = _sync_totals_hists()
        if int(totals.max(initial=0)) > self.cap:
            self.cap = _next_bucket(_CAP_BUCKETS, int(totals.max()))
            self.out_a = self._run_a(self.cap)
            totals, hists = _sync_totals_hists()
        self.meta = None  # host maps fetched only by the fallback path
        self.full_code, d_table = build_ac_device_code(
            hists[0], ac_base64_map()
        )
        self.dc_code, d_table_dc = build_dc_device_code(
            hists[1][: C.NUM_DC_CONTEXTS]
        )

        # Program B: AC + DC section packing, one dispatch. wcaps sized for
        # worst-case alignment slack; the [1, wcap] output blocks must fit
        # VMEM (enormous images would need a padded per-group download).
        self._stream = self.out_a["stream"][:, : self.cap]
        self._totals_d = self.out_a["totals"]
        self._d_dev = jnp.asarray(d_table)
        self._ow_dc = 8192
        self._d_dc = jnp.asarray(d_table_dc)
        self._dispatch_b()

    def _dispatch_b(self):
        import jax.numpy as jnp
        from .ops.dc_kernels import pack_all_sections, analyze_pack_static

        g = self.dim.num_groups
        gd = self.dim.num_dc_groups
        # Per-shard compaction buffers in mesh mode (each shard packs only
        # its slice of the group axis).
        gs = self._gpad // self._n_shards if self.mesh is not None else g
        gds = self._gd_pad // self._n_shards if self.mesh is not None else gd
        self.wcap = min(1 << (int(gs * self.ow)).bit_length(), 2 * 1024 * 1024)
        self._wcap_dc = min(
            1 << int(gds * self._ow_dc).bit_length(), 2 * 1024 * 1024
        )
        compacts = dict(
            compact_ac=self._compact_ac, compact_dc=self._compact_dc
        )
        if self.mesh is not None:
            self._dispatch_b_mesh(compacts)
            return
        if self._static:
            out = analyze_pack_static(
                jnp.asarray(self._up), jnp.asarray(self.yb_arr),
                jnp.asarray(self.xb_arr), self._d_dev, self._d_dc,
                self._ac_depths, self._dc_depths,
                cap=self.cap,
                cfl=self.config.optimize_chroma_from_luma,
                blocks=self.config.optimize_block_sizes,
                ow_ac=self.ow, wcap_ac=self.wcap,
                ow_dc=self._ow_dc, wcap_dc=self._wcap_dc,
                **compacts, **self._kwargs,
            )
        else:
            out = pack_all_sections(
                self._stream, self._totals_d, self._d_dev,
                self.out_a["dc_layout"], self._d_dc,
                ow_ac=self.ow, wcap_ac=self.wcap,
                ow_dc=self._ow_dc, wcap_dc=self._wcap_dc,
                **compacts,
            )
        self.out_b = dict(words=out["ac_words"])
        self.out_dc = dict(words=out["dc_words"])
        self.out_small = out["small"]
        self._small_np = None
        self._ac_list = None

    def _dispatch_b_mesh(self, compacts):
        from .parallel.sharding import (
            analyze_pack_static_mesh,
            pack_all_sections_mesh,
        )
        import jax.numpy as jnp

        if self._static:
            out = analyze_pack_static_mesh(
                jnp.asarray(self._up), jnp.asarray(self.yb_arr),
                jnp.asarray(self.xb_arr), self.distp, self._d_dev,
                self._d_dc, self._ac_depths, self._dc_depths, self.mesh,
                cap=self.cap,
                cfl=self.config.optimize_chroma_from_luma,
                blocks=self.config.optimize_block_sizes,
                ow_ac=self.ow, wcap_ac=self.wcap,
                ow_dc=self._ow_dc, wcap_dc=self._wcap_dc,
                ysize=self.dim.ysize, xsize=self.dim.xsize, **compacts,
            )
        else:
            out = pack_all_sections_mesh(
                self._stream, self._totals_d, self._d_dev,
                self.out_a["dc_layout"], self._d_dc, self.mesh,
                ow_ac=self.ow, ow_dc=self._ow_dc,
                wcap_ac=self.wcap, wcap_dc=self._wcap_dc, **compacts,
            )
        self.out_b = dict(words=out["ac_words"])
        self.out_dc = dict(words=out["dc_words"])
        self.out_small = out["small"]
        self._small_np = None
        self._ac_list = None

    def _small_sync(self):
        """One D2H transfer for all small section metadata (bits + offsets
        for both section kinds, plus totals in the one-pass tier)."""
        if self._small_np is None:
            self._small_np = self._fetch(self.out_small)
        return self._small_np

    @staticmethod
    def _used_words(bits, offs):
        """Words the compaction buffer actually needs for these sections."""
        nblk = (bits + (32 * 128 - 1)) // (32 * 128)
        return int(offs[-1] + nblk[-1] * 128) if len(offs) else 0

    def _dl_words(self, bits, offs, wcap, per_shard):
        """Download word count (65536-quantized) for a compacted buffer."""
        used = max(
            self._used_words(
                bits[s * per_shard : (s + 1) * per_shard],
                offs[s * per_shard : (s + 1) * per_shard],
            )
            for s in range(self._n_shards)
        )
        assert used <= wcap, "caller must fall back to uncompacted download"
        return min(wcap, -(-max(used, 1) // 65536) * 65536)

    def _download_writers(
        self, words_dev, bits, offs, wcap, n, per_shard, words_np=None
    ):
        """Slice the compacted section buffer(s) into per-section
        BitWriters. Mesh mode: words_dev is [n_shards, wcap] and offs are
        shard-local; section k lives in shard k // per_shard. words_np:
        pre-fetched host words (the combined-transfer fast path)."""
        if words_np is not None:
            words = words_np
        else:
            dl = self._dl_words(bits, offs, wcap, per_shard)
            if words_dev.ndim == 1:
                words = self._fetch(words_dev[:dl])[None]
            else:
                words = self._fetch(words_dev[:, :dl])
        return [
            _writer_from_bits(
                words[k // per_shard][
                    offs[k] : offs[k] + (bits[k] + 31) // 32
                ].view(np.uint8),
                int(bits[k]),
            )
            for k in range(n)
        ]

    def _download_writers_rows(self, words_dev, bits, n):
        """Per-section BitWriters from uncompacted [n, ow] padded rows (the
        wcap-overflow fallback path: one padded download, no capacity
        ceiling)."""
        maxw = (int(bits.max(initial=0)) + 31) // 32
        words = self._fetch(words_dev[:, : max(maxw, 1)])
        return [
            _writer_from_bits(
                np.ascontiguousarray(
                    words[k, : (int(bits[k]) + 31) // 32]
                ).view(np.uint8),
                int(bits[k]),
            )
            for k in range(n)
        ]

    def _fetch_sections(self):
        if self._ac_list is not None:
            return
        from .ops.pack_kernels import VAR_FAN, var_safe_words

        g = self.dim.num_groups
        gd = self.dim.num_dc_groups
        gp, gdp = self._gpad, self._gd_pad
        gps = gp // self._n_shards
        gdps = gdp // self._n_shards
        margin = VAR_FAN + 1
        while True:
            small = self._small_sync()
            ac_bits = small[:gp]
            ac_offs = small[gp : 2 * gp]
            dc_bits = small[2 * gp : 2 * gp + gdp]
            dc_offs = small[2 * gp + gdp : 2 * gp + 2 * gdp]
            # Retry against the var-packer's real safe capacity (ow minus
            # the fan margin its entry clamp needs), not the raw ow — a
            # section landing inside the margin would pack corrupt words
            # with no error. The bumped bucket is strictly larger than the
            # current ow whenever the check fails (see var_safe_words).
            need_ac = (int(ac_bits.max(initial=0)) + 31) // 32
            if need_ac > var_safe_words(self.ow):
                self.ow = _next_bucket(
                    (8192, 32768, 131072), need_ac + margin
                )
                self._dispatch_b()
                continue
            need_dc = (int(dc_bits.max(initial=0)) + 31) // 32
            if need_dc > var_safe_words(self._ow_dc):
                self._ow_dc = _next_bucket(
                    (8192, 32768, 131072), need_dc + margin
                )
                self._dispatch_b()
                continue
            # Total compacted words can exceed the VMEM-bounded wcap buffer
            # on very large images at low distance; switch that section kind
            # to the uncompacted per-group-row download (no capacity limit).
            # Mesh mode: the bound applies per shard-local buffer.
            def _max_used(bits, offs, per):
                return max(
                    self._used_words(
                        bits[s * per : (s + 1) * per],
                        offs[s * per : (s + 1) * per],
                    )
                    for s in range(self._n_shards)
                )

            if self._compact_ac and _max_used(ac_bits, ac_offs, gps) > self.wcap:
                self._compact_ac = False
                self._dispatch_b()
                continue
            if self._compact_dc and _max_used(dc_bits, dc_offs, gdps) > self._wcap_dc:
                self._compact_dc = False
                self._dispatch_b()
                continue
            break
        ac_np = dc_np = None
        if (
            self._compact_ac
            and self._compact_dc
            and self.mesh is None
            and self._fetch is np.asarray
        ):
            # Both compacted section buffers in ONE device->host transfer
            # (saves a ~25 ms link round trip per image on the tunneled
            # link; the device-side concat is trivial).
            import jax.numpy as jnp

            dl_ac = self._dl_words(ac_bits, ac_offs, self.wcap, gps)
            dl_dc = self._dl_words(dc_bits, dc_offs, self._wcap_dc, gdps)
            combo = self._fetch(
                jnp.concatenate(
                    [self.out_b["words"][:dl_ac], self.out_dc["words"][:dl_dc]]
                )
            )
            ac_np = combo[:dl_ac][None]
            dc_np = combo[dl_ac:][None]
        if self._compact_ac:
            self._ac_list = self._download_writers(
                self.out_b["words"], ac_bits, ac_offs, self.wcap, g, gps,
                words_np=ac_np,
            )
        else:
            self._ac_list = self._download_writers_rows(
                self.out_b["words"], ac_bits, g
            )
        if self._compact_dc:
            self._dc_list = self._download_writers(
                self.out_dc["words"], dc_bits, dc_offs, self._wcap_dc, gd, gdps,
                words_np=dc_np,
            )
        else:
            self._dc_list = self._download_writers_rows(
                self.out_dc["words"], dc_bits, gd
            )

    def _ac_writers(self):
        self._fetch_sections()
        return self._ac_list

    def _dc_writers(self):
        self._fetch_sections()
        return self._dc_list

    def result(self) -> bytes:
        if self._static:
            # ACGlobal/DCGlobal must serialize the candidate tables the
            # device packed with; the picks ride as the last two elements
            # of `small` (the argmins never change across ow/wcap
            # re-dispatches — same histograms).
            small = self._small_sync()
            self.full_code = self._static_codes.ac_codes[int(small[-2])]
            self.dc_code = self._static_codes.dc_codes[int(small[-1])]
        return assemble_codestream(
            None, self.dim, self.distp,
            ac_writers=self._ac_writers, ac_code=self.full_code,
            dc_code=self.dc_code, dc_writers=self._dc_writers,
        )


def encode_image_device(
    img: np.ndarray,
    distance: float = 1.0,
    upload_dtype=np.float16,
    cap: int = 32768,
    ow: int = 8192,
    config=None,
) -> bytes:
    """Flagship single-chip path: AC sections are entropy-packed on device
    (ops.pack_kernels); only histograms, per-group maps, and the final
    compressed bytes cross the device<->host link.

    Orchestration (two device programs + tiny host stage in between) mirrors
    the reference's two-pass OptimizeSections scheme (enc_frame.cc:765-802).

    img may be float (linear sRGB, reference-equivalent; uploaded as
    upload_dtype) or uint8 (sRGB-encoded 8-bit samples, linearized on device
    — the native path for 8-bit sources, quartering upload bytes).
    """
    job = DeviceEncodeJob(img, distance, upload_dtype, cap, ow, config=config)
    job.pack()
    return job.result()


def encode_image_device_mesh(
    img: np.ndarray,
    distance: float = 1.0,
    mesh=None,
    cap: int = 32768,
    ow: int = 8192,
    upload_dtype=np.float16,
    config=None,
) -> bytes:
    """Multi-chip flagship encode at full single-chip parity: the same
    DeviceEncodeJob orchestration (all capability tiers, u8/f16/f32 ingest,
    cap/ow/wcap auto-retry) with both device programs run under shard_map —
    the group axis sharded over `mesh`, the base-64 AC and DC histograms
    all-reduced as integer psums, and both AC and DC sections entropy-packed
    per shard on device (parallel.sharding; the reference's parallel-safe
    loops are enc_frame.cc:536-570,714-715,837-838). Output bytes are
    identical to the single-device path for any mesh shape (tested)."""
    from .parallel.sharding import make_mesh

    if mesh is None:
        mesh = make_mesh()
    job = DeviceEncodeJob(
        img, distance, upload_dtype, cap, ow, config=config, mesh=mesh
    )
    job.pack()
    return job.result()


class _BatchFetcher:
    """Download plumbing for encode_batch_device (the same writer-slicing
    methods DeviceEncodeJob uses, minus the per-image job state)."""

    def __init__(self, n_shards=1, fetch=None):
        self._n_shards = n_shards
        self._fetch = np.asarray if fetch is None else fetch

    _used_words = staticmethod(DeviceEncodeJob._used_words)
    _dl_words = DeviceEncodeJob._dl_words
    _download_writers = DeviceEncodeJob._download_writers
    _download_writers_rows = DeviceEncodeJob._download_writers_rows


def encode_batch_device(
    imgs,
    distance: float = 1.0,
    upload_dtype=np.float16,
    cap: int = 32768,
    ow: int = 8192,
    mesh=None,
    config=None,
) -> list:
    """Batched flagship encode: N same-sized images in ONE pair of device
    programs — one upload, one histogram download, one section download for
    the whole batch. Each image gets its own entropy codes and codestream.

    This is the serving path for small-image batches: per-image link
    round-trips (the cost that dominates `encode_images_device` on
    high-latency links) are amortized across the batch. Images must share
    one shape and dtype (u8 sRGB or float linear).

    mesh: shard the batch over a device mesh on the IMAGE axis — each chip
    encodes whole images, so the programs contain no collectives at all
    and batch throughput scales linearly by construction (the TPU-native
    analogue of the reference's per-image ThreadPool fan-out,
    base/data_parallel.h). Bytes are identical to the single-chip batch
    for any mesh shape (tested). N is padded to a device multiple with
    zero images internally.

    config: capability tiers. With optimize_code=False the whole batch runs
    as ONE fused device dispatch (analysis + per-image candidate selection
    + section packing, analyze_pack_batch_static) — no histogram download,
    no host code build."""
    import jax.numpy as jnp
    from .ops.pipeline_jax import analyze_batch_packed
    from .ops import pack_kernels as PK
    from .ops.pack_kernels import ac_base64_map
    from .ops.dc_kernels import pack_batch_sections
    from .entropy.entropy_write import (
        build_ac_device_code,
        build_dc_device_code,
    )

    batch = np.stack(imgs)
    n_real = batch.shape[0]
    n_shards = 1 if mesh is None else mesh.devices.size
    if mesh is not None and n_real % n_shards:
        pad = (-n_real) % n_shards
        batch = np.concatenate(
            [batch, np.zeros((pad,) + batch.shape[1:], batch.dtype)]
        )
    n = batch.shape[0]
    assert batch.ndim == 4 and batch.shape[1] == 3
    distance = clamp_distance(distance)
    distp = compute_distance_params(distance)
    dim = ImageDim(batch.shape[3], batch.shape[2])
    g = dim.num_groups
    gd = dim.num_dc_groups

    yb1 = np.empty(g, np.int32)
    xb1 = np.empty(g, np.int32)
    i = 0
    for gy in range(dim.ysize_groups):
        for gx in range(dim.xsize_groups):
            yb1[i] = div_ceil(min(256, batch.shape[2] - gy * 256), 8)
            xb1[i] = div_ceil(min(256, batch.shape[3] - gx * 256), 8)
            i += 1
    yb_flat = np.tile(yb1, n)
    xb_flat = np.tile(xb1, n)

    if batch.dtype != np.uint8:
        if (upload_dtype == np.float16
                and batch.shape[2] * batch.shape[3] < F16_AUTO_F32_PIXELS):
            upload_dtype = None
        if upload_dtype is not None:
            batch = batch.astype(upload_dtype)
    config = config or DEFAULT_CONFIG
    static = not config.optimize_code
    kwargs = dict(
        distance=float(distp.distance),
        inv_scale=float(distp.inv_scale),
        scale=float(distp.scale),
        scale_dc=float(distp.scale_dc),
        x_qm_mul=float(distp.x_qm_mul),
        cfl=config.optimize_chroma_from_luma,
        blocks=config.optimize_block_sizes,
    )

    def run_a(c):
        if mesh is not None:
            from .parallel.sharding import analyze_batch_packed_mesh

            return analyze_batch_packed_mesh(
                jnp.asarray(batch), jnp.asarray(yb_flat),
                jnp.asarray(xb_flat), mesh, cap=c, **kwargs,
            )
        return analyze_batch_packed(
            jnp.asarray(batch), jnp.asarray(yb_flat), jnp.asarray(xb_flat),
            cap=c, **kwargs,
        )

    if static:
        from .entropy.entropy_write import load_static_codes

        sc = load_static_codes()
        stream = totals_d = out_a = None
    else:
        out_a = run_a(cap)
        totals = np.asarray(out_a["totals"])
        if int(totals.max(initial=0)) > cap:
            cap = _next_bucket(_CAP_BUCKETS, int(totals.max()))
            out_a = run_a(cap)
        hists = np.asarray(out_a["hists"])  # [N, 2, 64, 64]

        base_map = ac_base64_map()
        full_codes, dc_codes = [], []
        d_ac = np.empty((n, 9, 64), np.float32)
        d_dc = np.empty((n, 9, 64), np.float32)
        for k in range(n):
            fc, d_ac[k] = build_ac_device_code(hists[k, 0], base_map)
            dcode, d_dc[k] = build_dc_device_code(
                hists[k, 1][: C.NUM_DC_CONTEXTS]
            )
            full_codes.append(fc)
            dc_codes.append(dcode)

        stream = out_a["stream"][:, :cap]
        totals_d = out_a["totals"]
    ow_dc = 8192
    compact_ac = compact_dc = True
    fetcher = _BatchFetcher(n_shards)
    # Per-shard sections (shard-local word offsets in mesh mode).
    gps, gdps = (n // n_shards) * g, (n // n_shards) * gd
    while True:
        wcap = min(1 << int(gps * ow).bit_length(), 2 * 1024 * 1024)
        wcap_dc = min(1 << int(gdps * ow_dc).bit_length(), 2 * 1024 * 1024)
        if static:
            # One fused dispatch: analysis + per-image candidate picks +
            # section packing (ow/wcap retries re-run the whole program;
            # picks are histogram-determined, so they never change).
            pk = dict(
                cap=cap, ow_ac=ow, wcap_ac=wcap, ow_dc=ow_dc,
                wcap_dc=wcap_dc, compact_ac=compact_ac,
                compact_dc=compact_dc,
            )
            if mesh is not None:
                from .parallel.sharding import analyze_pack_batch_static_mesh

                out_b = analyze_pack_batch_static_mesh(
                    jnp.asarray(batch), jnp.asarray(yb_flat),
                    jnp.asarray(xb_flat), sc.ac_tables, sc.dc_tables,
                    sc.ac_depths, sc.dc_depths, mesh, **pk, **kwargs,
                )
            else:
                from .ops.dc_kernels import analyze_pack_batch_static

                out_b = analyze_pack_batch_static(
                    jnp.asarray(batch), jnp.asarray(yb_flat),
                    jnp.asarray(xb_flat), jnp.asarray(sc.ac_tables),
                    jnp.asarray(sc.dc_tables), jnp.asarray(sc.ac_depths),
                    jnp.asarray(sc.dc_depths), **pk, **kwargs,
                )
        elif mesh is not None:
            from .parallel.sharding import pack_batch_sections_mesh

            out_b = pack_batch_sections_mesh(
                stream, totals_d, d_ac, out_a["dc_layout"], d_dc, mesh,
                ow_ac=ow, ow_dc=ow_dc, wcap_ac=wcap, wcap_dc=wcap_dc,
                compact_ac=compact_ac, compact_dc=compact_dc,
            )
        else:
            out_b = pack_batch_sections(
                stream, totals_d, jnp.asarray(d_ac),
                out_a["dc_layout"], jnp.asarray(d_dc),
                ow_ac=ow, wcap_ac=wcap, ow_dc=ow_dc, wcap_dc=wcap_dc,
                compact_ac=compact_ac, compact_dc=compact_dc,
            )
        small = np.asarray(out_b["small"])
        ng, ngd = n * g, n * gd
        if static:
            totals = small[2 * ng + 2 * ngd : 3 * ng + 2 * ngd]
            if int(totals.max(initial=0)) > cap:
                cap = _next_bucket(_CAP_BUCKETS, int(totals.max()))
                continue
            full_codes = [sc.ac_codes[k] for k in small[-2 * n : -n]]
            dc_codes = [sc.dc_codes[k] for k in small[-n:]]
        ac_bits = small[:ng]
        ac_offs = small[ng : 2 * ng]
        dc_bits = small[2 * ng : 2 * ng + ngd]
        dc_offs = small[2 * ng + ngd : 2 * ng + 2 * ngd]
        # var_safe_words check: see DeviceEncodeJob._fetch_sections.
        margin = PK.VAR_FAN + 1
        need_ac = (int(ac_bits.max(initial=0)) + 31) // 32
        if need_ac > PK.var_safe_words(ow):
            ow = _next_bucket((8192, 32768, 131072), need_ac + margin)
            continue
        need_dc = (int(dc_bits.max(initial=0)) + 31) // 32
        if need_dc > PK.var_safe_words(ow_dc):
            ow_dc = _next_bucket((8192, 32768, 131072), need_dc + margin)
            continue

        def _max_used(bits, offs, per):
            return max(
                fetcher._used_words(
                    bits[s * per : (s + 1) * per],
                    offs[s * per : (s + 1) * per],
                )
                for s in range(n_shards)
            )

        if compact_ac and _max_used(ac_bits, ac_offs, gps) > wcap:
            compact_ac = False
            continue
        if compact_dc and _max_used(dc_bits, dc_offs, gdps) > wcap_dc:
            compact_dc = False
            continue
        break

    if compact_ac:
        ac_w = fetcher._download_writers(
            out_b["ac_words"], ac_bits, ac_offs, wcap, n * g, gps
        )
    else:
        ac_w = fetcher._download_writers_rows(out_b["ac_words"], ac_bits, n * g)
    if compact_dc:
        dc_w = fetcher._download_writers(
            out_b["dc_words"], dc_bits, dc_offs, wcap_dc, n * gd, gdps
        )
    else:
        dc_w = fetcher._download_writers_rows(out_b["dc_words"], dc_bits, n * gd)
    results = []
    for k in range(n_real):
        results.append(
            assemble_codestream(
                None, dim, distp,
                ac_writers=ac_w[k * g : (k + 1) * g],
                ac_code=full_codes[k],
                dc_code=dc_codes[k],
                dc_writers=dc_w[k * gd : (k + 1) * gd],
            )
        )
    return results


def encode_images_device(
    imgs, distance=1.0, upload_dtype=np.float16, depth=3, config=None,
    retries=1,
):
    """Pipelined batch encode (generator of .jxl byte strings, input order).

    While image i's sections download and its codestream is assembled on the
    host, images i+1..i+depth-1's pixels stream up and run program A — the
    TPU-native replacement for the reference's per-image ThreadPool fan-out
    (base/data_parallel.h). Sustained throughput approaches
    max(link, device, host) instead of their sum. Depth 3 keeps the upload
    queue non-empty across image i's two download syncs on half-duplex
    links (measured overlap efficiency lever, tools/e2e_model.py).

    retries: per-image retry count (the batch-driver failure-recovery level;
    encoding is short-lived so transient backend errors are retried from the
    pixels rather than checkpointed, SURVEY.md section 5)."""
    from collections import deque

    def finish(job, img):
        for attempt in range(retries + 1):
            try:
                job.pack()
                return job.result()
            except Exception:
                if attempt == retries:
                    raise
                job = DeviceEncodeJob(img, distance, upload_dtype, config=config)

    def pack_ready(jobs):
        # Opportunistic: any queued job whose program A already finished
        # gets its entropy code built and program B dispatched NOW, so the
        # device works through B(i+1) while the host assembles image i —
        # and finish(i+1) later starts at the section fetch instead of
        # paying pack's sync round trips on the critical path.
        for j, _ in jobs:
            if not j._packed and j.ready_for_pack():
                try:
                    j.pack()
                except Exception:
                    pass  # finish() retries from pixels

    q = deque()
    for img in imgs:
        q.append((DeviceEncodeJob(img, distance, upload_dtype, config=config), img))
        if len(q) >= depth:
            job, im = q.popleft()
            pack_ready(q)
            yield finish(job, im)
    while q:
        job, im = q.popleft()
        pack_ready(q)
        yield finish(job, im)


def encode_file(pfm_path, out_path, distance=1.0, analyze_fn=None):
    from .io.pfm import read_pfm

    img = read_pfm(pfm_path)
    data = encode_image(img, distance, analyze_fn=analyze_fn)
    with open(out_path, "wb") as f:
        f.write(data)
    return len(data)
