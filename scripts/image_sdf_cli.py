#!/usr/bin/env python
"""CLI: binary image file (.npy or image via PIL if available) -> SDF.

Equivalent of the reference's image_2d_sdf_node (ROS-free): writes the
two-channel pixel-distance field as .npy and a false-color preview as .npy
(or .png when PIL is importable).
Usage: python scripts/image_sdf_cli.py input.npy out_prefix
"""
import sys

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from sdf_tools_tpu.ops import image_sdf


def main():
    src, prefix = sys.argv[1], sys.argv[2]
    if src.endswith(".npy"):
        img = np.load(src)
    else:
        from PIL import Image

        img = np.asarray(Image.open(src).convert("L")) > 127
    signed, dp, dm = image_sdf.image_sdf(jnp.asarray(img.astype(np.float32)))
    np.save(prefix + "_signed.npy", np.asarray(signed))
    np.save(prefix + "_channels.npy", np.stack([np.asarray(dp), np.asarray(dm)], -1))
    rgb = image_sdf.false_color_preview(signed)
    try:
        from PIL import Image

        Image.fromarray(rgb).save(prefix + "_preview.png")
    except ImportError:
        np.save(prefix + "_preview.npy", rgb)
    print("wrote", prefix + "_signed.npy")


if __name__ == "__main__":
    main()
