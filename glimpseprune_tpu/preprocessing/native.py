"""ctypes bindings for the native (C++) preprocessing path.

`preprocess_image_native` is a drop-in for `preprocessing.image.
preprocess_image` (same smart_resize geometry, fused C++ resize+normalize+
patchify). Falls back gracefully when the shared library isn't built;
`build()` compiles it with g++ (no pybind11 in the image — plain C ABI).

Run `python -m glimpseprune_tpu.preprocessing.native` to build + self-test.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

from glimpseprune_tpu.preprocessing.image import (
    DEFAULT_MAX_PIXELS,
    DEFAULT_MIN_PIXELS,
    OPENAI_CLIP_MEAN,
    OPENAI_CLIP_STD,
    smart_resize,
)

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libgp_preproc.so"))
_lib = None


def build(force: bool = False) -> str:
    """Compile the shared library (g++, one file)."""
    if os.path.exists(_LIB_PATH) and not force:
        return _LIB_PATH
    src = os.path.abspath(os.path.join(_NATIVE_DIR, "gp_preproc.cpp"))
    subprocess.run(
        ["g++", "-O3", "-march=native", "-fPIC", "-shared", "-std=c++17",
         "-o", _LIB_PATH, src],
        check=True,
    )
    return _LIB_PATH


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        build()
    lib = ctypes.CDLL(_LIB_PATH)
    u8p = np.ctypeslib.ndpointer(dtype=np.uint8, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(dtype=np.float32, flags="C_CONTIGUOUS")
    i = ctypes.c_int
    lib.gp_preprocess.argtypes = [u8p, i, i, i, i, i, f32p, f32p, i, i, i, f32p]
    lib.gp_preprocess.restype = None
    lib.gp_resize_bicubic.argtypes = [u8p, i, i, i, u8p, i, i]
    lib.gp_resize_bicubic.restype = None
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def resize_bicubic_native(image: np.ndarray, th: int, tw: int) -> np.ndarray:
    lib = _load()
    image = np.ascontiguousarray(image, dtype=np.uint8)
    h, w, c = image.shape
    out = np.empty((th, tw, c), dtype=np.uint8)
    lib.gp_resize_bicubic(image, h, w, c, out, th, tw)
    return out


def preprocess_image_native(
    image: np.ndarray,
    patch_size: int = 14,
    temporal_patch_size: int = 2,
    merge_size: int = 2,
    min_pixels: int = DEFAULT_MIN_PIXELS,
    max_pixels: int = DEFAULT_MAX_PIXELS,
    resized_hw: Optional[Tuple[int, int]] = None,
) -> Tuple[np.ndarray, Tuple[int, int, int]]:
    """Native fused pipeline; signature-compatible with preprocess_image."""
    lib = _load()
    if image.ndim == 2:
        image = np.stack([image] * 3, axis=-1)
    if image.shape[-1] == 4:
        image = image[..., :3]
    image = np.ascontiguousarray(image, dtype=np.uint8)
    h, w, c = image.shape
    factor = patch_size * merge_size
    if resized_hw is None:
        resized_hw = smart_resize(h, w, factor, min_pixels, max_pixels)
    th, tw = resized_hw
    grid = (1, th // patch_size, tw // patch_size)
    n_patches = grid[1] * grid[2]
    row_len = c * temporal_patch_size * patch_size * patch_size
    out = np.empty((n_patches, row_len), dtype=np.float32)
    mean = np.ascontiguousarray(OPENAI_CLIP_MEAN, dtype=np.float32)
    std = np.ascontiguousarray(OPENAI_CLIP_STD, dtype=np.float32)
    lib.gp_preprocess(image, h, w, c, th, tw, mean, std,
                      patch_size, temporal_patch_size, merge_size, out)
    return out, grid


if __name__ == "__main__":
    import time

    build(force=True)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (768, 1024, 3), dtype=np.uint8)

    from glimpseprune_tpu.preprocessing.image import preprocess_image

    t0 = time.perf_counter()
    ref, grid_ref = preprocess_image(img)
    t_py = time.perf_counter() - t0
    t0 = time.perf_counter()
    out, grid = preprocess_image_native(img)
    t_cc = time.perf_counter() - t0
    assert grid == tuple(grid_ref), (grid, grid_ref)
    err = np.abs(out - ref).max()
    print(f"python: {t_py*1e3:.1f} ms  native: {t_cc*1e3:.1f} ms  "
          f"speedup {t_py/t_cc:.1f}x  max|diff| {err:.4f}")
