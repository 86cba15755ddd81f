"""Host-side vision geometry for the windowed ViT.

All index machinery the reference computes on-device per call (window
permutation, cu_seqlens, vision RoPE position ids — reference
transformers_gp/models/qwen2_5_vl/model_gp.py:1757-1825 `_visual_forward`)
is host-known from `grid_thw` alone, so we compute it once in numpy and feed
the jitted ViT statically-shaped arrays:

- `window_index`: permutation over *merged* token positions grouping tokens
  into spatial windows (the ViT runs on the permuted sequence).
- segment ids instead of cu_seqlens: per-patch int arrays where attention is
  allowed iff seg[i] == seg[j] — the XLA/splash-attention-friendly encoding of
  block-diagonal masks.
- vision RoPE (h, w) position ids in merge-block raster order.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence, Tuple

import numpy as np


def cu_seqlens_from_grid(grid_thw: np.ndarray) -> np.ndarray:
    """Per-frame full-attention boundaries: repeat h*w by t, cumsum."""
    grid_thw = np.asarray(grid_thw)
    lens = np.repeat(grid_thw[:, 1] * grid_thw[:, 2], grid_thw[:, 0])
    return np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)


def get_window_index(
    grid_thw: np.ndarray,
    window_size: int,
    spatial_merge_size: int,
    patch_size: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Window permutation over merged tokens + patch-level window boundaries.

    Returns (window_index [num_merged_tokens], cu_window_seqlens [num_windows+1]).
    Semantics match Qwen2.5-VL's window partitioning: each image's merged
    token grid is padded up to a multiple of the merger window, windows are
    enumerated row-major, and in-window tokens keep raster order.
    """
    grid_thw = np.asarray(grid_thw)
    merge_unit = spatial_merge_size * spatial_merge_size
    win = window_size // spatial_merge_size // patch_size  # merged tokens per window side

    index_parts: List[np.ndarray] = []
    cu: List[int] = [0]
    base = 0
    for t, h, w in grid_thw:
        lh, lw = int(h) // spatial_merge_size, int(w) // spatial_merge_size
        idx = np.arange(int(t) * lh * lw).reshape(int(t), lh, lw)
        pad_h = (-lh) % win
        pad_w = (-lw) % win
        idx_p = np.full((int(t), lh + pad_h, lw + pad_w), -1, dtype=np.int64)
        idx_p[:, :lh, :lw] = idx
        nwh, nww = (lh + pad_h) // win, (lw + pad_w) // win
        idx_p = idx_p.reshape(int(t), nwh, win, nww, win)
        idx_p = idx_p.transpose(0, 1, 3, 2, 4).reshape(int(t), nwh * nww, win, win)
        seqlens = (idx_p != -1).sum(axis=(2, 3)).reshape(-1)
        flat = idx_p.reshape(-1)
        valid = flat[flat != -1]
        index_parts.append(valid + base)
        cu_part = np.cumsum(seqlens) * merge_unit + cu[-1]
        cu.extend(int(x) for x in cu_part)
        base += int(t) * lh * lw
    window_index = np.concatenate(index_parts).astype(np.int32)
    cu_window_seqlens = np.array(cu, dtype=np.int32)
    # drop empty windows from full-window padding
    keep = np.concatenate([[True], np.diff(cu_window_seqlens) != 0])
    return window_index, cu_window_seqlens[keep]


def segment_ids_from_cu_seqlens(cu_seqlens: np.ndarray, total_len: int) -> np.ndarray:
    """cu_seqlens boundaries -> per-position segment ids [total_len]."""
    seg = np.zeros(total_len, dtype=np.int32)
    for i in range(1, len(cu_seqlens) - 1):
        seg[cu_seqlens[i] :] += 1
    return seg


def vision_pos_ids(grid_thw: np.ndarray, spatial_merge_size: int) -> np.ndarray:
    """(h, w) RoPE position ids per patch in merge-block raster order [N, 2]."""
    grid_thw = np.asarray(grid_thw)
    parts = []
    for t, h, w in grid_thw:
        h, w = int(h), int(w)
        hpos = np.broadcast_to(np.arange(h)[:, None], (h, w))
        wpos = np.broadcast_to(np.arange(w)[None, :], (h, w))

        def merge_order(x):
            m = spatial_merge_size
            return (
                x.reshape(h // m, m, w // m, m).transpose(0, 2, 1, 3).reshape(-1)
            )

        p = np.stack([merge_order(hpos), merge_order(wpos)], axis=-1)
        parts.append(np.tile(p, (int(t), 1)))
    return np.concatenate(parts, axis=0).astype(np.int32)


@dataclass
class VisionGeometry:
    """Everything the jitted ViT needs, precomputed from grid_thw.

    All arrays are already padded to `padded_len` patches so the ViT compiles
    once per (padded_len,) bucket. `num_patches` is the true length.
    """

    grid_thw: np.ndarray                # [num_images, 3]
    num_patches: int                    # true total patch count
    padded_len: int                     # static bucket length (multiple of merge_unit)
    window_index: np.ndarray            # [padded_len // merge_unit] permutation (merged tokens)
    reverse_index: np.ndarray           # inverse permutation
    full_segment_ids: np.ndarray        # [padded_len] per-patch, in *window order*
    window_segment_ids: np.ndarray      # [padded_len] per-patch, in *window order*
    pos_ids: np.ndarray                 # [padded_len, 2] RoPE hw ids, in *window order*
    patch_valid: np.ndarray             # [padded_len] bool, in window order
    merged_valid: np.ndarray            # [padded_len // merge_unit] bool, natural order

    @property
    def num_merged_tokens(self) -> int:
        return self.num_patches // (self.padded_len // len(self.window_index))


def _pad_to(x: np.ndarray, n: int, fill) -> np.ndarray:
    if len(x) >= n:
        return x[:n]
    pad_shape = (n - len(x),) + x.shape[1:]
    return np.concatenate([x, np.full(pad_shape, fill, dtype=x.dtype)], axis=0)


def build_vision_geometry(
    grid_thw: np.ndarray,
    window_size: int,
    spatial_merge_size: int,
    patch_size: int,
    padded_len: int = None,
) -> VisionGeometry:
    """Precompute the full window-ordered geometry for one packed batch of images.

    The returned segment-id arrays are in *window order* (i.e. after applying
    window_index to merge-unit groups), which is the order the ViT runs in.
    Padding patches get segment id -1 (attends to nothing but itself slot via
    mask) and valid=False.
    """
    grid_thw = np.asarray(grid_thw)
    merge_unit = spatial_merge_size * spatial_merge_size
    num_patches = int((grid_thw[:, 0] * grid_thw[:, 1] * grid_thw[:, 2]).sum())
    if padded_len is None:
        padded_len = num_patches
    assert padded_len % merge_unit == 0 and padded_len >= num_patches

    window_index, cu_window = get_window_index(
        grid_thw, window_size, spatial_merge_size, patch_size
    )
    cu_full = cu_seqlens_from_grid(grid_thw)

    # per-patch segment ids in *natural* order
    full_seg_nat = segment_ids_from_cu_seqlens(cu_full, num_patches)
    # window segmentation is defined over the *window-ordered* sequence
    window_seg_win = segment_ids_from_cu_seqlens(cu_window, num_patches)

    # natural -> window permutation at patch level
    patch_perm = (
        window_index[:, None] * merge_unit + np.arange(merge_unit)[None, :]
    ).reshape(-1)
    full_seg_win = full_seg_nat[patch_perm]

    pos_nat = vision_pos_ids(grid_thw, spatial_merge_size)
    pos_win = pos_nat[patch_perm]

    n_merged = num_patches // merge_unit
    n_merged_padded = padded_len // merge_unit
    reverse_index = np.argsort(window_index).astype(np.int32)

    geo = VisionGeometry(
        grid_thw=grid_thw,
        num_patches=num_patches,
        padded_len=padded_len,
        window_index=_pad_to(window_index, n_merged_padded, n_merged),
        reverse_index=_pad_to(reverse_index, n_merged_padded, n_merged),
        full_segment_ids=_pad_to(full_seg_win, padded_len, -1),
        window_segment_ids=_pad_to(window_seg_win, padded_len, -1),
        pos_ids=_pad_to(pos_win, padded_len, 0),
        patch_valid=_pad_to(np.ones(num_patches, dtype=bool), padded_len, False),
        merged_valid=_pad_to(np.ones(n_merged, dtype=bool), n_merged_padded, False),
    )
    return geo
