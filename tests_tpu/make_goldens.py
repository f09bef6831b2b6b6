"""Regenerate the committed on-chip image goldens (run ON the TPU chip
after an INTENDED rendering change): python tests_tpu/make_goldens.py"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from tests_tpu.test_onchip import GOLDEN_CASES, GOLDEN_DIR, _shipping_render

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for cfg, w, h, spp in GOLDEN_CASES:
        img = _shipping_render(cfg, w, h, spp)
        path = os.path.join(GOLDEN_DIR, cfg.replace(".toml", f"_{w}x{h}_spp{spp}.npy"))
        np.save(path, img)
        print(f"wrote {path} mean={img.mean():.5f}")


if __name__ == "__main__":
    main()
