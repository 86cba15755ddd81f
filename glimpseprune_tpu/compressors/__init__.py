"""Baseline visual-token compressors (reference L3, SURVEY.md §2.4).

Every method becomes a *static-budget selector* over batched [B, N, D] image
tokens sharing the GP compaction machinery — a major simplification vs the
reference's five forked model trees (11k+ LoC of per-method model copies).

- visionzip: attention-dominant top-k + uniform-stride contextual merge
- divprune:  greedy max-min diversity (no attention, training-free)
- cdpruner:  conditional-DPP greedy MAP (relevance x similarity kernel)
- staged:    text-guided staged drops inside the LLM (PyramidDrop / VScan
             LLM stage), built on run_layers ranges + harvest + compaction
"""

from glimpseprune_tpu.registry import Registry

COMPRESSORS: Registry = Registry("compressor")

from glimpseprune_tpu.compressors.visionzip import visionzip_select
from glimpseprune_tpu.compressors.divprune import divprune_select
from glimpseprune_tpu.compressors.cdpruner import cdpruner_select
from glimpseprune_tpu.compressors.staged import StagedDropConfig, staged_drop_schedule

__all__ = [
    "COMPRESSORS",
    "visionzip_select",
    "divprune_select",
    "cdpruner_select",
    "StagedDropConfig",
    "staged_drop_schedule",
]
