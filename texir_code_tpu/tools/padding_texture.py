"""Pad + denoise a baked irradiance texture (standalone tool).

Reference tools/padding_texture.py:49-87: distance-transform nearest-texel
fill of the black chart seams, then OIDN (`oidnDenoise --hdr`) via shell.
Here the denoiser is the in-framework à-trous kernel (ops.postprocess) — no
external binary.

    python -m texir_code_tpu.tools.padding_texture in.hdr out.hdr [--no-denoise]
"""

from __future__ import annotations

import argparse

import numpy as np


def pad_and_denoise(tex: np.ndarray, denoise: bool = True) -> np.ndarray:
    import jax.numpy as jnp

    from texir_code_tpu.ops.postprocess import atrous_denoise, pad_texture

    valid = tex.sum(-1) > 0
    out = pad_texture(tex, valid)
    if denoise:
        out = np.asarray(atrous_denoise(jnp.asarray(out)))
    return out


def main(argv=None):
    from texir_code_tpu.data import hdrio

    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("--no-denoise", action="store_true")
    args = ap.parse_args(argv)
    tex = hdrio.read_hdr(args.input)
    out = pad_and_denoise(tex, denoise=not args.no_denoise)
    hdrio.write_hdr(args.output, out)
    print(f"wrote {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
