#!/usr/bin/env python
"""Extract JPEG XL format constant tables from the reference sources into an .npz.

The tables extracted here are *format data* (quantization weights, context
lookup tables, coefficient scan orders, the fixed modular context tree), not
code: a conforming VarDCT encoder must use these exact values for its output to
carry the intended meaning to any spec-conforming decoder.

Provenance (reference = libjxl-tiny checkout):
  - kQuantWeights            encoder/quant_weights.cc:17-134
  - kCoeffOrders             encoder/enc_group.cc:166-180
  - kCoeffFreqContext        encoder/ac_context.h:25-30
  - kCoeffNumNonzeroContext  encoder/ac_context.h:32-38
  - kBlockContextMap         encoder/ac_context.h:50-60
  - kCompactBlockContextMap  encoder/ac_context.h:45-49
  - kGradientContextLut      encoder/enc_frame.cc:226-281
  - kContextTreeTokens       encoder/enc_frame.cc:181-222

Run from the repo root (requires /root/reference to be mounted):
  python tools/gen_constants.py
The resulting jxl_tiny_tpu/constants/tables.npz is committed so the package is
standalone.
"""
import re
import sys

import numpy as np

REF = "/root/reference/encoder"


def _extract_braced_block(text, decl_regex):
    """Return the text between the braces of an array initializer."""
    m = re.search(decl_regex, text)
    if not m:
        raise ValueError(f"declaration not found: {decl_regex}")
    start = text.index("{", m.end())
    depth = 0
    for i in range(start, len(text)):
        if text[i] == "{":
            depth += 1
        elif text[i] == "}":
            depth -= 1
            if depth == 0:
                return text[start + 1 : i]
    raise ValueError("unbalanced braces")


def _floats(block):
    return np.array(
        [float(x) for x in re.findall(r"[-+0-9.eE]+f?", block.replace("f", ""))],
        dtype=np.float64,
    )


def _ints(block):
    return np.array([int(x) for x in re.findall(r"-?\d+", block)], dtype=np.int64)


def main():
    out = {}

    qw_src = open(f"{REF}/quant_weights.cc").read()
    qw = _floats(_extract_braced_block(qw_src, r"kQuantWeights\[\]\s*=\s*"))
    assert qw.shape == (576,), qw.shape
    # Layout (quant_weights.cc:135-137): three 8x8 tables (DCT8 x/y/b), then
    # three 8x16 tables (DCT16X8==DCT8X16, x/y/b).
    out["dequant_dct8"] = qw[: 3 * 64].reshape(3, 8, 8).astype(np.float32)
    out["dequant_dct16"] = qw[3 * 64 :].reshape(3, 8, 16).astype(np.float32)

    grp_src = open(f"{REF}/enc_group.cc").read()
    orders = _ints(_extract_braced_block(grp_src, r"kCoeffOrders\[\]\s*=\s*"))
    assert orders.shape == (64 + 128,)
    out["coeff_order8"] = orders[:64].astype(np.int32)
    out["coeff_order16"] = orders[64:].astype(np.int32)

    ctx_src = open(f"{REF}/ac_context.h").read()
    out["coeff_freq_ctx"] = _ints(
        _extract_braced_block(ctx_src, r"kCoeffFreqContext\[64\]\s*=\s*")
    ).astype(np.int32)
    out["coeff_nnz_ctx"] = _ints(
        _extract_braced_block(ctx_src, r"kCoeffNumNonzeroContext\[64\]\s*=\s*")
    ).astype(np.int32)
    bcm = _ints(_extract_braced_block(ctx_src, r"kBlockContextMap\[\]\s*=\s*"))
    assert bcm.shape == (3 * 27,)
    out["block_ctx_map"] = bcm.reshape(3, 27).astype(np.int32)  # rows: X, Y, B
    cbcm = _ints(_extract_braced_block(ctx_src, r"kCompactBlockContextMap\[\]\s*=\s*"))
    assert cbcm.shape == (39,)
    out["compact_block_ctx_map"] = cbcm.astype(np.int32)

    frm_src = open(f"{REF}/enc_frame.cc").read()
    glut = _ints(_extract_braced_block(frm_src, r"kGradientContextLut\[1024\]\s*=\s*"))
    assert glut.shape == (1024,)
    out["gradient_ctx_lut"] = glut.astype(np.int32)
    tree = _ints(_extract_braced_block(frm_src, r"kContextTreeTokens\[\w+\]\s*=\s*"))
    assert tree.shape == (313 * 2,)
    out["context_tree_tokens"] = tree.reshape(313, 2).astype(np.int32)

    np.savez_compressed("jxl_tiny_tpu/constants/tables.npz", **out)
    print("wrote jxl_tiny_tpu/constants/tables.npz:")
    for k, v in out.items():
        print(f"  {k}: {v.shape} {v.dtype}")


if __name__ == "__main__":
    sys.exit(main())
