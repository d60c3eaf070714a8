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
