"""TPU pipeline vs numpy golden model (runs on CPU backend; conftest forces
jax_platforms=cpu with 8 virtual devices)."""
import numpy as np
import pytest

from jxl_tiny_tpu.io.pfm import read_pfm
from jxl_tiny_tpu.common import compute_distance_params, ImageDim
from jxl_tiny_tpu.encoder import (
    analyze_group_numpy,
    encode_image,
    encode_image_jax,
)
from jxl_tiny_tpu.decode import decode_jxl

from conftest import psnr

import os


@pytest.fixture(scope="module")
def photo256(testdata):
    return read_pfm(os.path.join(testdata, "photo256.pfm"))


@pytest.fixture(scope="module")
def gradient512(testdata):
    return read_pfm(os.path.join(testdata, "gradient512.pfm"))


def test_jax_matches_numpy_golden(photo256):
    from jxl_tiny_tpu.ops import make_analyze_fn

    distp = compute_distance_params(1.0)
    gn = analyze_group_numpy(photo256, 0, 0, distp)
    gj = make_analyze_fn()(photo256, 0, 0, distp)
    for attr in [
        "strategy",
        "is_first",
        "raw_qf",
        "ytox",
        "ytob",
        "quant_dc",
        "counts",
        "tokens",
    ]:
        a = np.asarray(getattr(gn, attr))
        b = np.asarray(getattr(gj, attr))
        assert (a == b).all(), f"{attr} mismatch: {(a != b).sum()} cells"


def test_aq_kernel_matches_jnp_twin():
    """ops/aq_kernel must be bit-equal to the jnp twin on random groups
    (interpret mode here; elementwise IEEE ops + pinned fold orders)."""
    import jax.numpy as jnp
    from jxl_tiny_tpu.ops import pipeline_jax as PJ

    rng = np.random.RandomState(7)
    xyb = jnp.asarray(
        np.abs(rng.randn(3, 3, 256, 256)).astype(np.float32) * 0.3
    )
    for d in (0.5, 1.0, 2.0):
        distp = compute_distance_params(d)
        a = PJ.adaptive_quant_field(xyb, distp.distance, distp.inv_scale)
        b = PJ.adaptive_quant_field_jnp(xyb, distp.distance, distp.inv_scale)
        # ULP-level drift between separately compiled graphs (FMA
        # contraction is per-compilation); the quantized field may flip
        # only on knife-edge cells.
        np.testing.assert_allclose(
            np.asarray(a[0]), np.asarray(b[0]), rtol=1e-6, err_msg=str(d)
        )
        np.testing.assert_allclose(
            np.asarray(a[1]), np.asarray(b[1]), rtol=1e-6, err_msg=str(d)
        )
        dr = np.abs(np.asarray(a[2]) - np.asarray(b[2]))
        assert dr.max() <= 1 and (dr > 0).mean() < 1e-3, (d, "raw_qf")


def test_strategy_kernel_matches_jnp_twin():
    """ops/strategy_kernel partials must reproduce _estimate_entropy."""
    import jax.numpy as jnp
    from jxl_tiny_tpu.ops import pipeline_jax as PJ
    from jxl_tiny_tpu.ops.strategy_kernel import (
        combine_partials, estimate_partials,
    )
    from jxl_tiny_tpu import constants as C

    rng = np.random.RandomState(3)
    g = 2
    coef8 = jnp.asarray(rng.randn(g, 3, 32, 32, 64).astype(np.float32))
    coef_v = jnp.asarray(rng.randn(g, 3, 16, 32, 128).astype(np.float32))
    coef_h = jnp.asarray(rng.randn(g, 3, 32, 16, 128).astype(np.float32))
    qf = jnp.asarray(np.abs(rng.randn(g, 32, 32)).astype(np.float32))
    masking = jnp.asarray(np.abs(rng.randn(g, 32, 32)).astype(np.float32))
    fac_x = jnp.asarray(rng.randn(g, 32, 32).astype(np.float32) * 0.1)
    fac_b = jnp.asarray(
        1.0 + rng.randn(g, 32, 32).astype(np.float32) * 0.1
    )
    qm8 = np.asarray(C.QUANT_DCT8.reshape(3, 64))
    qm16 = np.asarray(C.QUANT_DCT16.reshape(3, 128))
    distance = 1.0
    slope = min(1.0, distance / 3.0)
    q_v = jnp.maximum(qf[:, ::2], qf[:, 1::2])
    m_v = jnp.maximum(masking[:, ::2], masking[:, 1::2])
    q_h = jnp.maximum(qf[:, :, ::2], qf[:, :, 1::2])
    m_h = jnp.maximum(masking[:, :, ::2], masking[:, :, 1::2])
    p8, pv, ph = estimate_partials(
        coef8, coef_v, coef_h, qf, q_v, q_h,
        masking, m_v, m_h,
        jnp.stack([fac_x, fac_b], axis=1),
        jnp.stack([fac_x[:, ::2], fac_b[:, ::2]], axis=1),
        jnp.stack([fac_x[:, :, ::2], fac_b[:, :, ::2]], axis=1),
        qm8, qm16, slope,
    )
    e8 = combine_partials(p8, masking, 1)
    ev = combine_partials(pv, m_v, 2)
    eh = combine_partials(ph, m_h, 2)
    r8 = PJ._estimate_entropy(
        coef8, jnp.asarray(qm8), qf, masking, fac_x, fac_b, distance
    )
    rv = PJ._estimate_entropy(
        coef_v, jnp.asarray(qm16), q_v, m_v, fac_x[:, ::2], fac_b[:, ::2],
        distance,
    )
    rh = PJ._estimate_entropy(
        coef_h, jnp.asarray(qm16), q_h, m_h, fac_x[:, :, ::2],
        fac_b[:, :, ::2], distance,
    )
    # Lane-reduction order and FMA contraction differ per compilation;
    # ~1e-5 relative is ULP-accumulation over 64-128-term float sums.
    np.testing.assert_allclose(np.asarray(e8), np.asarray(r8), rtol=5e-5)
    np.testing.assert_allclose(np.asarray(ev), np.asarray(rv), rtol=5e-5)
    np.testing.assert_allclose(np.asarray(eh), np.asarray(rh), rtol=5e-5)



def test_batched_encode_matches_per_group(gradient512):
    ref = encode_image(gradient512, 1.0)  # numpy pipeline
    jx = encode_image_jax(gradient512, 1.0)
    assert jx == ref  # identical bytes on CPU backend


def test_shard_count_invariance(gradient512):
    """Encoding must be byte-identical on 1-device and 8-device meshes."""
    import jax
    from jxl_tiny_tpu.parallel import make_mesh

    devs = jax.devices()
    assert len(devs) >= 8, "conftest should provide 8 virtual devices"
    one = encode_image_jax(gradient512, 1.0, mesh=make_mesh(devs[:1]))
    eight = encode_image_jax(gradient512, 1.0, mesh=make_mesh(devs[:8]))
    assert one == eight


def test_sharded_output_decodes(gradient512):
    from jxl_tiny_tpu.parallel import make_mesh

    data = encode_image_jax(gradient512, 1.0, mesh=make_mesh())
    dec = decode_jxl(data)
    assert psnr(np.clip(dec, 0, 1), gradient512) > 38.9
