"""Observability: per-stage wall-clock timers, device traces, and the
megapixels/s report harness.

The reference has no profiler (libjxl's was stripped; only allocation stats
in base/cache_aligned.cc:38-40 remain). For a TPU encoder the needed signals
are different: stage wall-clock with explicit device syncs (async dispatch
otherwise hides device time in the next host sync) and XLA device traces.
"""
import contextlib
import json
import time

import numpy as np


def _sync(x):
    """Force completion of a jax value. jax.block_until_ready is unreliable
    on tunneled backends, so sync through a tiny D2H transfer."""
    import jax

    for leaf in jax.tree_util.tree_leaves(x):
        if hasattr(leaf, "ravel"):
            np.asarray(leaf.ravel()[:1])


class StageTimer:
    """Accumulates named stage timings across an encode.

    with timer.stage("analysis", sync=out): ...
    """

    def __init__(self):
        self.stages = {}

    @contextlib.contextmanager
    def stage(self, name, sync=None):
        t = time.perf_counter()
        box = {}
        try:
            yield box
        finally:
            v = box.get("sync", sync)
            if v is not None:
                _sync(v)
            self.stages[name] = self.stages.get(name, 0.0) + (
                time.perf_counter() - t
            )

    def report(self):
        total = sum(self.stages.values())
        return {
            "total_s": round(total, 4),
            "stages_ms": {k: round(v * 1e3, 1) for k, v in self.stages.items()},
        }


@contextlib.contextmanager
def profile_trace(logdir="/tmp/jxl_tpu_trace"):
    """XLA device trace around a block (view with tensorboard / xprof)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def encode_report(img, distance=1.0, repeats=3, **kw):
    """Timed encode with stage breakdown; returns (bytes, report dict).

    The megapixels/s/chip harness used by bench.py and ad-hoc profiling."""
    from ..encoder import encode_image_device

    mp = img.shape[1] * img.shape[2] / 1e6
    data = encode_image_device(img, distance, **kw)  # compile
    times = []
    for _ in range(repeats):
        t = time.perf_counter()
        data = encode_image_device(img, distance, **kw)
        times.append(time.perf_counter() - t)
    rep = {
        "megapixels": round(mp, 3),
        "bytes": len(data),
        "bpp": round(8 * len(data) / (mp * 1e6), 4),
        "times_s": [round(t, 4) for t in times],
        "mps_best": round(mp / min(times), 3),
    }
    return data, rep


def main(argv=None):
    import argparse

    from ..io.pfm import read_pfm

    p = argparse.ArgumentParser(prog="jxl_tiny_tpu.utils.profiling")
    p.add_argument("input")
    p.add_argument("-d", "--distance", type=float, default=1.0)
    p.add_argument("--trace", action="store_true", help="write an XLA trace")
    args = p.parse_args(argv)
    img = read_pfm(args.input)
    if args.trace:
        with profile_trace() as d:
            _, rep = encode_report(img, args.distance, repeats=1)
        rep["trace_dir"] = d
    else:
        _, rep = encode_report(img, args.distance)
    print(json.dumps(rep))


if __name__ == "__main__":
    main()
