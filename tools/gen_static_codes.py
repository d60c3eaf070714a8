#!/usr/bin/env python
"""Train the static entropy-code tables for the one-pass tier.

The reference ships hand-baked static prefix codes for its OPTIMIZE_CODE=0
configuration (static_entropy_codes.h:502-971). Ours are trained: encode the
repo's test corpus with the two-pass pipeline, accumulate the base-64 AC
histograms and the 45-context DC histograms, +1-smooth (so every symbol is
codeable), and save to jxl_tiny_tpu/constants/static_codes.npz.

Run on CPU: python tools/gen_static_codes.py
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import jxl_tiny_tpu.constants as C
from jxl_tiny_tpu.common import ImageDim, compute_distance_params, div_ceil
from jxl_tiny_tpu.io.pfm import read_pfm


def _pink_noise(rng, h, w, exponent, contrast):
    """1/f^exponent spectral noise — the classic second-order statistical
    model of natural photographs. Random phases, per-channel correlated
    luma + weaker chroma, gamma-mapped to linear light."""
    fy = np.fft.fftfreq(h)[:, None]
    fx = np.fft.rfftfreq(w)[None, :]
    f = np.sqrt(fy * fy + fx * fx)
    f[0, 0] = 1.0
    amp = f ** -exponent
    chans = []
    luma_phase = rng.uniform(0, 2 * np.pi, amp.shape)
    for k, (mix, gain) in enumerate(((1.0, 1.0), (0.85, 0.5), (0.9, 0.7))):
        phase = mix * luma_phase + (1 - mix) * rng.uniform(
            0, 2 * np.pi, amp.shape
        )
        spec = amp * np.exp(1j * phase) * gain
        x = np.fft.irfft2(spec, s=(h, w))
        x = (x - x.mean()) / (x.std() + 1e-9)
        chans.append(0.5 + contrast * x)
    img = np.clip(np.stack(chans), 0.0, 1.0).astype(np.float32)
    return img ** 2.2  # sRGB-ish gamma -> linear, like the PFM corpus


def corpus_images():
    td = os.path.join(os.path.dirname(__file__), "..", "testdata")
    # Real material first — the 8MP photo carries genuine natural-image
    # statistics (per-image normalization below keeps it from drowning the
    # variety classes).
    for name in (
        "photo8mp.pfm",
        "gradient512.pfm",
        "photo256.pfm",
        "odd131x77.pfm",
        "tiny64.pfm",
    ):
        p = os.path.join(td, name)
        if os.path.exists(p):
            yield read_pfm(p)
    # Photographic-statistics synthetics: 1/f spectra at several slopes and
    # contrasts (natural-image power spectra measure f^-1.8..-2.2 in power,
    # i.e. ~1.0 in amplitude), with and without sensor-like noise.
    rng = np.random.RandomState(7)
    yield _pink_noise(rng, 768, 1024, 1.0, 0.18)
    yield _pink_noise(rng, 512, 512, 1.2, 0.25)
    noisy = _pink_noise(rng, 512, 768, 0.9, 0.15)
    yield np.clip(
        noisy + rng.randn(*noisy.shape).astype(np.float32) * 0.004, 0, 1
    )
    # Hard-edge / flat / texture composite: graphics-like content.
    yy, xx = np.mgrid[0:512, 0:512].astype(np.float32)
    yield np.stack(
        [
            0.5 + 0.5 * np.sin(xx * 0.21) * np.sin(yy * 0.17),
            np.clip(rng.rand(512, 512).astype(np.float32), 0, 1),
            (np.floor(xx / 37) % 2 * 0.8 + 0.1).astype(np.float32),
        ]
    )


def accumulate_distance(dist):
    """Histograms for one distance over the whole corpus (run in its own
    process: XLA's CPU JIT never releases code memory, and ~30 compiled
    image shapes in one process exhaust it with 'Cannot allocate
    memory')."""
    from jxl_tiny_tpu.encoder import DeviceEncodeJob

    per_ac, per_dc = [], []
    for img in corpus_images():
        job = DeviceEncodeJob(img, dist, upload_dtype=None)
        job.pack()
        hists = np.asarray(job.out_a["hists"])
        per_ac.append(hists[0].astype(np.float64))
        per_dc.append(hists[1][: C.NUM_DC_CONTEXTS].astype(np.float64))
        print(f"d={dist} {img.shape} done", file=sys.stderr)
    return np.stack(per_ac), np.stack(per_dc)


SIDECAR = "/tmp/jxl_corpus_hists.npz"


def collect(force=False):
    """Per-(distance, image) histograms for the whole corpus, cached in
    SIDECAR (the expensive encode pass; table weighting happens offline)."""
    import subprocess
    import tempfile

    if os.path.exists(SIDECAR) and not force:
        d = np.load(SIDECAR)
        return d["ac"], d["dc"]
    acs, dcs = [], []
    for dist in (0.5, 1.0, 2.0):
        with tempfile.NamedTemporaryFile(suffix=".npz") as tf:
            subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--dist", str(dist), "--out", tf.name],
                check=True,
            )
            part = np.load(tf.name)
            acs.append(part["ac"])
            dcs.append(part["dc"])
    ac, dc = np.stack(acs), np.stack(dcs)  # [3, n_img, ...]
    np.savez(SIDECAR, ac=ac, dc=dc)
    return ac, dc


# Per-image weights (order of corpus_images): the 5 real images carry the
# photographic statistics the tier is for; equal-mass weighting let the 4
# synthetic classes tilt the tables (measured +22% overhead on a photo
# crop vs +8-12% with real-dominant weights; synthetics keep a floor so
# graphics content stays codeable, and +1 smoothing keeps every symbol
# legal).
IMAGE_WEIGHTS = (8.0, 2.0, 2.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0)

# Per-distance weights: token statistics drift with distance (smaller d ->
# denser coefficients -> flatter token histograms), and high-d streams are
# the percentage-sensitive ones (few total bits, so a mismatched code costs
# the most). Tilting toward d=2.0 cut the offline photo8mp overhead from
# +4/+11/+20% (d=0.5/1/2) to +4/+9/+7% while the worst corpus member
# stayed at +13% (tools/eval_static_weights.py on the cached histograms).
DIST_WEIGHTS = (1.0, 1.5, 3.0)


def main():
    ac, dc = collect()
    n_img = ac.shape[1]
    w = np.asarray(IMAGE_WEIGHTS[:n_img], np.float64)
    ac_hist = np.zeros((64, 64), np.float64)
    dc_hist = np.zeros((C.NUM_DC_CONTEXTS, C.ALPHABET_SIZE), np.float64)
    for di in range(ac.shape[0]):
        for ii in range(n_img):
            a, d = ac[di, ii], dc[di, ii]
            # Normalize each (image, distance) to equal mass, then apply
            # the class weight — code shapes reflect weighted corpus
            # variety, not the pixel count of the largest member.
            s = w[ii] * DIST_WEIGHTS[di] * 1e6
            ac_hist += a * (s / max(a.sum(), 1.0))
            dc_hist += d * (s / max(d.sum(), 1.0))

    # Rescale to integer counts; +1 smoothing so every possible symbol is
    # codeable in the static tier. DC contexts smooth only inside their
    # format-possible token sets (sections.dc_context_token_masks) — giving
    # codes to impossible tokens costs real code space (measured +17% DC
    # bits on the 8MP photo from whole-alphabet smoothing alone).
    from jxl_tiny_tpu.bitstream.sections import dc_context_token_masks

    mask = dc_context_token_masks()
    # Drift guard: if the corpus ever emits a token the masks call
    # impossible, the masks no longer match the DC-section emitters and the
    # static tier would assign it no code (corrupt stream, no error).
    outside = float((dc_hist * ~mask).sum())
    assert outside == 0.0, (
        f"{outside} corpus DC tokens fall outside dc_context_token_masks — "
        "update sections.dc_context_token_masks to match the emitters"
    )
    ac_hist = np.minimum(np.round(ac_hist) + 1, 2**31).astype(np.uint32)
    dc_hist = np.minimum(np.round(dc_hist) + mask, 2**31).astype(np.uint32)

    # Candidate tables for the device's per-image compute-all-select
    # (dc_kernels.select_code_table): token statistics vary across content
    # class and distance — one blended table costs +12-17% DC / +3-7% AC
    # bits on photographs; the best of these class x distance blends costs
    # +4-7% DC / +0.6-1.6% AC, corpus avg ~0 (tools/eval_static_weights.py).
    classes = {
        "photo": (0, 2),        # photo8mp, photo256
        "smooth": (1, 3, 4),    # gradient512, odd131x77, tiny64
        "noise": (5, 6, 7),     # pink-spectrum synthetics
        "graphics": (8,),       # hard-edge composite
    }
    ac_k, dc_k = [], []
    for cname, idxs in classes.items():
        members = [ii for ii in idxs if ii < n_img]
        if not members:
            # A memberless class would ship degenerate uniform tables that
            # waste candidate slots; skip it (fewer, meaningful candidates).
            print(f"class {cname!r} has no corpus members; skipped",
                  file=sys.stderr)
            continue
        for di in range(dc.shape[0]):
            ta = np.zeros_like(ac[0, 0], np.float64)
            td = np.zeros_like(dc[0, 0], np.float64)
            for ii in members:
                ta += ac[di, ii] * (1e6 / max(ac[di, ii].sum(), 1.0))
                td += dc[di, ii] * (1e6 / max(dc[di, ii].sum(), 1.0))
            ac_k.append(np.minimum(np.round(ta) + 1, 2**31).astype(np.uint32))
            dc_k.append(np.minimum(np.round(td) + mask, 2**31).astype(np.uint32))
    ac_hists_k = np.stack(ac_k)
    dc_hists_k = np.stack(dc_k)

    out = os.path.join(
        os.path.dirname(__file__), "..", "jxl_tiny_tpu", "constants",
        "static_codes.npz",
    )
    np.savez_compressed(
        out, ac_hist64=ac_hist, dc_hist=dc_hist,
        ac_hists_k=ac_hists_k, dc_hists_k=dc_hists_k,
    )
    print(
        f"wrote {out} (candidates: ac {ac_hists_k.shape[0]}, "
        f"dc {dc_hists_k.shape[0]})"
    )


if __name__ == "__main__":
    if "--dist" in sys.argv:
        i = sys.argv.index("--dist")
        o = sys.argv.index("--out")
        ac, dc = accumulate_distance(float(sys.argv[i + 1]))
        np.savez(sys.argv[o + 1], ac=ac, dc=dc)
    else:
        main()
