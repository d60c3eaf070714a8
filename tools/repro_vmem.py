#!/usr/bin/env python
"""Repro: tokenize_compact scoped-VMEM OOM at G=135 (8MP) on hardware."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from jxl_tiny_tpu.ops.tokenize_kernel import tokenize_compact, pack_row_meta

    g = int(sys.argv[1]) if len(sys.argv) > 1 else 135
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 32768
    rows = 3072
    rng = np.random.RandomState(0)
    ordered = jnp.asarray(rng.randint(-3, 4, (g, rows, 128)).astype(np.int32))
    covered = jnp.ones((g, rows), jnp.int32)
    nz = jnp.asarray((ordered != 0).sum(-1).astype(np.int32))
    meta = pack_row_meta(
        covered, nz, jnp.zeros((g, rows), jnp.int32),
        jnp.zeros((g, rows), jnp.int32), jnp.zeros((g, rows), jnp.int32),
        jnp.ones((g, rows), jnp.int32),
    )
    lastnz = 127 - jnp.argmax(jnp.asarray(ordered)[:, :, ::-1] != 0, axis=-1)
    cnt = jnp.where(nz > 0, lastnz + 1, 1).astype(jnp.int32)
    f = jax.jit(lambda o, m, c: tokenize_compact(o, m, c, cap))
    out = f(ordered, meta, cnt)
    jax.block_until_ready(out)
    print("ok", out[0].shape, int(np.asarray(out[1]).max()))


if __name__ == "__main__":
    main()
