#!/usr/bin/env python
"""A/B merge_levels for compact_stream on the attached TPU (slope method)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from jxl_tiny_tpu.ops import pack_kernels as PK


def main():
    g, cap = 135, 32768
    rng = np.random.RandomState(0)
    w = rng.rand(g, PK.ROWS)
    w[rng.rand(g, PK.ROWS) < 0.4] = 0.0
    tot = np.full((g,), 33000.0)
    cnt = np.floor(w / w.sum(1, keepdims=True) * tot[:, None]).astype(np.int32)
    rows_cnt = jnp.asarray(np.minimum(cnt, 127))
    rows_tok = jnp.asarray(
        rng.randint(0, 1 << 22, size=(g, PK.ROWS, PK.W)).astype(np.uint32)
    )

    for lv in (int(a) for a in sys.argv[1:] or (2, 3, 4)):
        ts = {}
        for k in (1, 5):
            @jax.jit
            def f(rt, rc):
                def body(c, _):
                    s, t = PK.compact_stream(rt ^ c, rc, cap, merge_levels=lv)
                    return s[0, 0] + t[0].astype(jnp.uint32), ()

                c, _ = lax.scan(body, jnp.uint32(0), None, length=k)
                return c

            f(rows_tok, rows_cnt)
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(f(rows_tok, rows_cnt).ravel()[:1])
                best = min(best, time.perf_counter() - t0)
            ts[k] = best
        print(f"levels={lv}: {(ts[5]-ts[1])/4*1e3:8.2f} ms/app")


if __name__ == "__main__":
    main()
