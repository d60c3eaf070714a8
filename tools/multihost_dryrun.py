#!/usr/bin/env python
"""Two-process (multi-host) encode dryrun on CPU.

Spawns N jax.distributed processes (each with its own virtual CPU
devices), runs the full flagship mesh encode over the *global* mesh —
cross-process histogram psums, per-group map all_gather, per-shard
section packing, process_allgather section fetch, host-0 assembly — and
verifies the bytes are identical to a plain single-process encode of the
same image. This is the real multi-controller code path
(parallel.multihost.encode_image_multihost), not a simulation; on a TPU
pod the same program rides ICI/DCN instead of localhost TCP.

Usage: python tools/multihost_dryrun.py [n_processes] [local_devices]
Exit 0 = bytes identical and decodable.
"""
import os
import socket
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N_PROC = int(sys.argv[1]) if len(sys.argv) > 1 else 2
N_LOCAL = int(sys.argv[2]) if len(sys.argv) > 2 else 2


def make_image():
    import numpy as np

    # 2x3 group grid, 1 DC group — exercises mesh padding (6 groups over
    # N_PROC*N_LOCAL shards) and the cross-shard DC layout all_gather.
    h, w = 300, 700
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    return np.stack(
        [
            0.5 + 0.4 * np.sin(xx * 0.05) * np.cos(yy * 0.03),
            0.5 + 0.3 * np.sin((xx + yy) * 0.02),
            0.4 + 0.2 * np.cos(xx * 0.011),
        ]
    ).astype(np.float32)


def worker(pid, coord, out_path):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from jxl_tiny_tpu.parallel import multihost

    multihost.initialize(coord, N_PROC, pid, local_device_count=N_LOCAL)
    assert jax.process_count() == N_PROC
    assert len(jax.devices()) == N_PROC * N_LOCAL
    data = multihost.encode_image_multihost(make_image(), 1.0)
    if pid == 0:
        from jxl_tiny_tpu.decode.decoder import decode_jxl

        assert decode_jxl(data).shape == (3, 300, 700)
        with open(out_path, "wb") as f:
            f.write(data)
        print(f"worker0: {len(data)} bytes, decodes ok", file=sys.stderr)
    else:
        assert data is None
    jax.distributed.shutdown()


def main():
    out_path = "/tmp/jxl_multihost_dryrun.jxl"
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        coord = f"127.0.0.1:{s.getsockname()[1]}"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # workers force CPU via jax.config
    env["JXL_TPU_NO_CACHE"] = "1"
    procs = [
        subprocess.Popen(
            [sys.executable, __file__, str(N_PROC), str(N_LOCAL)],
            env={**env, "JXL_MH_PID": str(pid), "JXL_MH_COORD": coord,
                 "JXL_MH_OUT": out_path},
        )
        for pid in range(N_PROC)
    ]
    rcs = [p.wait(timeout=1200) for p in procs]
    assert rcs == [0] * N_PROC, f"worker exit codes {rcs}"

    # Single-process reference bytes on the same backend.
    import jax

    jax.config.update("jax_platforms", "cpu")
    from jxl_tiny_tpu.encoder import encode_image_device

    ref = encode_image_device(make_image(), 1.0, upload_dtype=None)
    got = open(out_path, "rb").read()
    assert got == ref, (
        f"multihost bytes differ from single-process: {len(got)} vs "
        f"{len(ref)} bytes"
    )
    print(
        f"multihost_dryrun: {N_PROC} processes x {N_LOCAL} devices ok — "
        f"{len(got)} bytes, identical to single-process encode"
    )


if __name__ == "__main__":
    if "JXL_MH_PID" in os.environ:
        worker(
            int(os.environ["JXL_MH_PID"]),
            os.environ["JXL_MH_COORD"],
            os.environ["JXL_MH_OUT"],
        )
    else:
        main()
