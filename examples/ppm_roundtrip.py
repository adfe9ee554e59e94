"""PPM P6 round-trip example — counterpart of the reference's
``ppm_p6_lib/examples/ppm_p6_test.cpp:40-87``: write a gradient 8-bit and
16-bit, read back, print corner/middle samples for comparison."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from raytracinginonesemester_tpu.io.image import read_ppm_p6, write_ppm_p6


def make_gradient(w=64, h=48):
    x = np.linspace(0, 1, w)[None, :, None]
    y = np.linspace(0, 1, h)[:, None, None]
    return np.concatenate([
        np.broadcast_to(x, (h, w, 1)),
        np.broadcast_to(y, (h, w, 1)),
        np.broadcast_to(0.25 + 0 * x, (h, w, 1)),
    ], axis=2)


def print_samples(tag, img):
    h, w, _ = img.shape
    for name, (yy, xx) in {
        "top-left": (0, 0), "top-right": (0, w - 1),
        "middle": (h // 2, w // 2),
        "bottom-left": (h - 1, 0), "bottom-right": (h - 1, w - 1),
    }.items():
        r, g, b = img[yy, xx]
        print(f"  {tag} {name}: ({r:.4f}, {g:.4f}, {b:.4f})")


if __name__ == "__main__":
    img = make_gradient()
    write_ppm_p6("gradient8.ppm", img, maxval=255, gamma2=False)
    write_ppm_p6("gradient16.ppm", img, maxval=65535, gamma2=False)
    back8, _ = read_ppm_p6("gradient8.ppm")
    back16, _ = read_ppm_p6("gradient16.ppm")
    print("original:")
    print_samples("orig", img)
    print("8-bit round trip:")
    print_samples("8bit", back8)
    print("16-bit round trip:")
    print_samples("16bit", back16)
