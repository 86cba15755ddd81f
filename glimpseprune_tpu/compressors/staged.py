"""Staged in-LLM dropping (PyramidDrop / VScan's LLM stage).

Reference llava_pdrop/model/modeling_llama_pdrop.py:1222-1330 drops image
tokens at a list of layer ranks, keeping the top `ratio` by text-to-image
attention (last instruction token's attention over image keys). On TPU each
stage is: run a layer range -> harvest the last-token attention row ->
rank image tokens -> fixed-budget compaction -> continue. The stage budgets
are static (ratios x N), so the whole pipeline is one compiled program.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence, Tuple


@dataclass(frozen=True)
class StagedDropConfig:
    """stages: (layer_rank, keep_ratio) pairs, strictly increasing layers,
    decreasing ratios (reference layer_list / image_token_ratio_list)."""

    stages: Tuple[Tuple[int, float], ...] = ((8, 0.5), (16, 0.25), (24, 0.125))

    def validate(self, num_layers: int):
        prev_l, prev_r = -1, 1.01
        for l, r in self.stages:
            if not (0 <= l < num_layers):
                raise ValueError(f"stage layer {l} outside [0, {num_layers})")
            if l <= prev_l or r >= prev_r:
                raise ValueError("stages must have increasing layers and decreasing ratios")
            prev_l, prev_r = l, r
        return self


def staged_drop_schedule(
    n_img_max: int, seq_len: int, stages: Sequence[Tuple[int, float]],
    round_to: int = 64,
) -> List[int]:
    """Static out_len per stage: text budget stays, image budget shrinks."""

    def round_up(x):
        return ((x + round_to - 1) // round_to) * round_to

    outs = []
    text_budget = seq_len - n_img_max
    for _, ratio in stages:
        keep = max(int(ratio * n_img_max), 1)
        outs.append(round_up(text_budget + keep))
    return outs
