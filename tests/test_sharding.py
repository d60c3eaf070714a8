"""Shard-count invariance of the flagship (device-packed) path.

The format's distribution model is pure data parallelism over groups with one
integer all-reduce (histograms); encoding on 1 device and on an 8-device mesh
must produce identical streams, histograms — and therefore identical final
bytes (SURVEY.md section 4, multi-chip test requirement)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jxl_tiny_tpu.common import compute_distance_params
from jxl_tiny_tpu.parallel.sharding import (
    analyze_groups_packed_sharded,
    pack_ac_sections_sharded,
    make_mesh,
)


def _groups(n=8):
    rng = np.random.RandomState(11)
    yy, xx = np.mgrid[0:256, 0:256].astype(np.float32)
    base = np.stack(
        [
            0.5 + 0.4 * np.sin(xx * 0.06) * np.cos(yy * 0.04),
            0.5 + 0.3 * np.sin((xx + yy) * 0.025),
            0.4 + 0.2 * np.cos(xx * 0.015),
        ]
    )
    g = np.stack(
        [
            np.clip(
                base * (0.6 + 0.05 * k) + rng.randn(3, 256, 256) * 0.02, 0, 1
            )
            for k in range(n)
        ]
    ).astype(np.float32)
    return g


@pytest.mark.slow  # 280s; covered by test_mesh_matches_single_chip_bytes[u8-None] default
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8-device mesh")
def test_mesh_encode_byte_identical_to_single_device():
    """Full encode through encode_image_device_mesh: identical bytes on a
    1-device and an 8-device mesh, and both decode."""
    from jxl_tiny_tpu.encoder import encode_image_device_mesh
    from jxl_tiny_tpu.decode.decoder import decode_jxl

    rng = np.random.RandomState(12)
    h, w = 300, 700  # 6 groups (pads to 8 on the mesh)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack(
        [
            0.5 + 0.4 * np.sin(xx * 0.04) * np.cos(yy * 0.05),
            0.5 + 0.3 * np.sin((xx + yy) * 0.02),
            0.4 + 0.2 * np.cos(xx * 0.012),
        ]
    ).astype(np.float32)
    img = np.clip(img + rng.randn(3, h, w).astype(np.float32) * 0.02, 0, 1)

    d1 = encode_image_device_mesh(img, 1.0, mesh=make_mesh(jax.devices()[:1]))
    d8 = encode_image_device_mesh(img, 1.0, mesh=make_mesh(jax.devices()[:8]))
    assert d1 == d8
    assert decode_jxl(d1).shape == (3, h, w)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8-device mesh")
def test_packed_path_shard_invariance():
    groups = _groups(8)
    yb = np.full(8, 32, np.int32)
    xb = np.full(8, 32, np.int32)
    distp = compute_distance_params(1.0)

    mesh1 = make_mesh(jax.devices()[:1])
    mesh8 = make_mesh(jax.devices()[:8])
    out1, g1 = analyze_groups_packed_sharded(groups, yb, xb, distp, mesh1)
    out8, g8 = analyze_groups_packed_sharded(groups, yb, xb, distp, mesh8)

    assert np.array_equal(np.asarray(out1["totals"]), np.asarray(out8["totals"]))
    assert np.array_equal(np.asarray(out1["hist"]), np.asarray(out8["hist"]))
    assert np.array_equal(np.asarray(out1["meta"]), np.asarray(out8["meta"]))
    s1 = np.asarray(out1["stream"])
    s8 = np.asarray(out8["stream"])
    for k in range(8):
        t = int(np.asarray(out1["totals"])[k])
        assert np.array_equal(s1[k, :t], s8[k, :t])

    # Through program B: identical section bits regardless of mesh shape.
    from jxl_tiny_tpu.entropy.entropy_write import build_ac_device_code
    from jxl_tiny_tpu.ops.pack_kernels import ac_base64_map

    _, d_table = build_ac_device_code(np.asarray(out1["hist"]), ac_base64_map())
    cap = 32768
    b1 = pack_ac_sections_sharded(
        out1["stream"][:, :cap], out1["totals"], d_table, mesh1
    )
    b8 = pack_ac_sections_sharded(
        out8["stream"][:, :cap], out8["totals"], d_table, mesh8
    )
    bits1 = np.asarray(b1["bits"])
    bits8 = np.asarray(b8["bits"])
    assert np.array_equal(bits1, bits8)
    w1 = np.asarray(b1["words"]).reshape(-1)
    w8 = np.asarray(b8["words"]).reshape(-1)
    offs1 = np.asarray(b1["word_offs"])
    offs8 = np.asarray(b8["word_offs"])
    wcap1 = np.asarray(b1["words"]).shape[-1]
    wcap8 = np.asarray(b8["words"]).shape[-1]
    for k in range(8):
        nw = (int(bits1[k]) + 31) // 32
        # shard-local buffer bases: every device holds its own compacted buf
        a = w1[0 * wcap1 + offs1[k] : 0 * wcap1 + offs1[k] + nw]
        b = w8[k * wcap8 + offs8[k] : k * wcap8 + offs8[k] + nw]
        # mask the final partial word (tail bits are unspecified)
        rem = int(bits1[k]) & 31
        if nw and rem:
            mask = (1 << rem) - 1
            assert np.array_equal(a[:-1], b[:-1])
            assert (int(a[-1]) & mask) == (int(b[-1]) & mask)
        else:
            assert np.array_equal(a, b)


def _test_image(h=300, w=700, seed=12):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack(
        [
            0.5 + 0.4 * np.sin(xx * 0.04) * np.cos(yy * 0.05),
            0.5 + 0.3 * np.sin((xx + yy) * 0.02),
            0.4 + 0.2 * np.cos(xx * 0.012),
        ]
    ).astype(np.float32)
    return np.clip(img + rng.randn(3, h, w).astype(np.float32) * 0.02, 0, 1)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8-device mesh")
@pytest.mark.parametrize(
    "dtype,cfg",
    [
        # [u8-None] (the flagship ingest, default config) is the default
        # run's representative; the other tiers are --runslow variants.
        pytest.param("f32", None, marks=pytest.mark.slow),
        ("u8", None),
        pytest.param("u8", "static", marks=pytest.mark.slow),
        pytest.param("f32", "min", marks=pytest.mark.slow),
    ],
)
def test_mesh_matches_single_chip_bytes(dtype, cfg):
    """Full flagship parity on the mesh: for each capability tier and ingest
    dtype, encode_image_device_mesh(8 devices) produces byte-identical
    output to the single-chip encode_image_device (VERDICT r1 item 2)."""
    from jxl_tiny_tpu.common import EncoderConfig
    from jxl_tiny_tpu.encoder import encode_image_device, encode_image_device_mesh
    from jxl_tiny_tpu.io.color import linear_to_srgb_u8

    config = {
        None: None,
        "static": EncoderConfig(optimize_code=False),
        "min": EncoderConfig(
            optimize_chroma_from_luma=False, optimize_block_sizes=False
        ),
    }[cfg]
    img = _test_image()
    inp = linear_to_srgb_u8(img) if dtype == "u8" else img
    single = encode_image_device(inp, 1.0, upload_dtype=None, config=config)
    mesh8 = encode_image_device_mesh(
        inp, 1.0, mesh=make_mesh(jax.devices()[:8]), upload_dtype=None,
        config=config,
    )
    assert single == mesh8


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8-device mesh")
def test_mesh_f16_plane_ingest_matches_single_chip():
    """The f16 byte-plane ingest path through the mesh program equals the
    single-chip program (unit level: analysis outputs; the full-encode f16
    default engages only >=2MP, too slow for the CPU mesh suite)."""
    from jxl_tiny_tpu.common import compute_distance_params
    from jxl_tiny_tpu.encoder import _split_f16_planes
    from jxl_tiny_tpu.ops.pipeline_jax import analyze_image_packed
    from jxl_tiny_tpu.parallel.sharding import analyze_image_packed_mesh

    img = _test_image()
    up = _split_f16_planes(img.astype(np.float16))
    h, w = img.shape[1], img.shape[2]
    ybs = np.array([32, 32, 32, 6, 6, 6, 0, 0], np.int32)
    xbs = np.array([32, 32, 24, 32, 32, 24, 0, 0], np.int32)
    distp = compute_distance_params(1.0)
    cap = 16384
    single = analyze_image_packed(
        jnp.asarray(up), jnp.asarray(ybs[:6]), jnp.asarray(xbs[:6]),
        cap=cap, cfl=True, blocks=True,
        distance=float(distp.distance), inv_scale=float(distp.inv_scale),
        scale=float(distp.scale), scale_dc=float(distp.scale_dc),
        x_qm_mul=float(distp.x_qm_mul),
    )
    mesh8 = analyze_image_packed_mesh(
        jnp.asarray(up), jnp.asarray(ybs), jnp.asarray(xbs), distp,
        make_mesh(jax.devices()[:8]), cap=cap, ysize=h, xsize=w,
    )
    assert np.array_equal(
        np.asarray(single["totals"]), np.asarray(mesh8["totals"])[:6]
    )
    assert np.array_equal(np.asarray(single["hists"]), np.asarray(mesh8["hists"]))
    assert np.array_equal(
        np.asarray(single["stream"]), np.asarray(mesh8["stream"])[:6]
    )
    assert np.array_equal(
        np.asarray(single["dc_layout"]), np.asarray(mesh8["dc_layout"])[:1]
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8-device mesh")
def test_dc_owner_exchange_byte_identical(monkeypatch):
    """JXL_DC_OWNER_EXCHANGE=1 (ppermute DC-group-owner routing instead of
    the per-group-map all_gather, SCALING.md's named reduction) must
    produce byte-identical output on the 8-device mesh — and identical to
    the single-chip encode. Uses a 2-DC-group-wide image so maps really
    cross shard boundaries."""
    from jxl_tiny_tpu.encoder import encode_image_device, encode_image_device_mesh

    img = _test_image(h=220, w=2300, seed=21)  # 9 groups, 2 DC groups
    base = encode_image_device_mesh(img, 1.0, mesh=make_mesh(jax.devices()[:8]))
    monkeypatch.setenv("JXL_DC_OWNER_EXCHANGE", "1")
    ex = encode_image_device_mesh(img, 1.0, mesh=make_mesh(jax.devices()[:8]))
    assert base == ex
    monkeypatch.delenv("JXL_DC_OWNER_EXCHANGE")
    single = encode_image_device(img, 1.0, upload_dtype=None)
    assert base == single


@pytest.mark.slow  # 659s; batch-mesh parity; fast batch coverage stays in test_utils
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8-device mesh")
def test_batch_mesh_byte_identical_to_single_device():
    """encode_batch_device over an image-axis-sharded mesh: identical
    bytes to the single-chip batch for 1- and 8-device meshes, including a
    batch size that needs internal padding (3 images over 8 devices)."""
    from jxl_tiny_tpu.encoder import encode_batch_device

    rng = np.random.RandomState(17)
    imgs = [
        np.clip(
            0.5
            + 0.3 * np.sin(np.mgrid[0:96, 0:128][1] * (0.03 + 0.01 * k))[None]
            + rng.randn(3, 96, 128) * 0.03,
            0,
            1,
        ).astype(np.float32)
        for k in range(3)
    ]
    ref = encode_batch_device(imgs, 1.0, upload_dtype=None)
    d1 = encode_batch_device(
        imgs, 1.0, upload_dtype=None, mesh=make_mesh(jax.devices()[:1])
    )
    d8 = encode_batch_device(
        imgs, 1.0, upload_dtype=None, mesh=make_mesh(jax.devices()[:8])
    )
    assert len(ref) == len(d1) == len(d8) == 3
    assert ref == d1 == d8

    # Static tier: the fused analyze+select+pack batch program, padded
    # 3-over-8 included.
    from jxl_tiny_tpu.common import EncoderConfig

    cfg = EncoderConfig(optimize_code=False)
    ref_s = encode_batch_device(imgs, 1.0, upload_dtype=None, config=cfg)
    d8_s = encode_batch_device(
        imgs, 1.0, upload_dtype=None, config=cfg,
        mesh=make_mesh(jax.devices()[:8]),
    )
    assert ref_s == d8_s and ref_s != ref
