"""Command line interface, argument-compatible with the reference cjxl_tiny
(encoder/cjxl_main.cc:49-101): cjxl_tiny_tpu <input.pfm> <output.jxl> [-d D].

Batch mode: pass several inputs and an output *directory* — images are
pipelined through the device (encode_images_device).
"""
import argparse
import os
import sys
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(
        prog="cjxl_tiny_tpu",
        description="TPU-native JPEG XL encoder (VarDCT, photographic)",
    )
    p.add_argument("input", nargs="+",
                   help="input PFM file(s) (linear sRGB float)")
    p.add_argument("output",
                   help="output .jxl (single input) or directory (batch)")
    p.add_argument("-d", "--distance", type=float, default=1.0,
                   help="Butteraugli distance target (default 1.0)")
    p.add_argument(
        "--pipeline",
        choices=("device", "tpu", "numpy"),
        default="device",
        help="analysis backend: device = TPU analysis + on-device entropy "
        "packing (flagship), tpu = TPU analysis + host packing, numpy = "
        "host golden model",
    )
    p.add_argument("--f32-upload", action="store_true",
                   help="upload pixels as float32 (default float16; the "
                   "lossy encode masks f16 ingest error)")
    p.add_argument("--static-codes", action="store_true",
                   help="one-pass static entropy codes (reference "
                   "OPTIMIZE_CODE=0 tier): lower latency, larger output")
    p.add_argument("--no-cfl", action="store_true",
                   help="disable chroma-from-luma (OPTIMIZE_CHROMA_FROM_LUMA=0)")
    p.add_argument("--no-block-sizes", action="store_true",
                   help="disable 16x8/8x16 DCT selection (OPTIMIZE_BLOCK_SIZES=0)")
    p.add_argument("-q", "--quiet", action="store_true")
    args = p.parse_args(argv)

    from .common import EncoderConfig

    config = EncoderConfig(
        optimize_code=not args.static_codes,
        optimize_chroma_from_luma=not args.no_cfl,
        optimize_block_sizes=not args.no_block_sizes,
    )
    if config != EncoderConfig() and args.pipeline != "device":
        # The verification pipelines implement the full-capability tier
        # only; failing beats silently encoding at a different tier.
        p.error("capability-tier flags require --pipeline device")

    from .errors import JxlTinyError
    from .io.pfm import read_pfm

    upload = None if args.f32_upload else np.float16
    try:
        if len(args.input) > 1:
            return _batch(args, config, upload)
        img = read_pfm(args.input[0])
        if not args.quiet:
            print(f"Read {img.shape[2]}x{img.shape[1]} pixels input image.",
                  file=sys.stderr)
        t = time.time()
        if args.pipeline == "device":
            from .encoder import encode_image_device

            data = encode_image_device(
                img, args.distance, upload_dtype=upload, config=config
            )
        elif args.pipeline == "tpu":
            from .encoder import encode_image_jax

            data = encode_image_jax(img, args.distance, upload_dtype=upload)
        else:
            from .encoder import encode_image

            data = encode_image(img, args.distance)
        dt = time.time() - t
        with open(args.output, "wb") as f:
            f.write(data)
        if not args.quiet:
            mp = img.shape[1] * img.shape[2] / 1e6
            print(
                f"Compressed to {len(data)} bytes "
                f"({8*len(data)/(1e6*mp):.3f} bpp) "
                f"in {dt:.2f}s ({mp/dt:.1f} MP/s).",
                file=sys.stderr,
            )
        return 0
    except (JxlTinyError, OSError) as e:
        print(f"error: {e}", file=sys.stderr)
        return 1


def _batch(args, config, upload):
    """Pipelined multi-image encode into an output directory."""
    from .encoder import encode_images_device
    from .io.pfm import read_pfm

    if not os.path.isdir(args.output):
        print(f"error: batch mode needs an output directory: {args.output}",
              file=sys.stderr)
        return 1
    imgs = (read_pfm(path) for path in args.input)
    t = time.time()
    total_mp = 0.0
    for path, data in zip(
        args.input,
        encode_images_device(imgs, args.distance, upload_dtype=upload,
                             config=config),
    ):
        name = os.path.splitext(os.path.basename(path))[0] + ".jxl"
        out = os.path.join(args.output, name)
        with open(out, "wb") as f:
            f.write(data)
        if not args.quiet:
            print(f"{path} -> {out} ({len(data)} bytes)", file=sys.stderr)
    dt = time.time() - t
    if not args.quiet:
        print(f"Batch: {len(args.input)} images in {dt:.2f}s.",
              file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
