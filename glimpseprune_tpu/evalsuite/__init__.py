"""Two-track evaluation harness (reference L5, SURVEY.md §2.6):

- free-form VisCoT inference (`infer.py`): generate / glimpse tasks over the
  12 VisCoT benchmark JSONs, jsonl + info.json artifacts, mask metrics,
  skip-if-done resume, per-host data sharding
- scoring (`scorers.py` / `judge.py`): LLM-judge over an OpenAI-compatible
  HTTP endpoint plus offline scorers (precise_match, single_choice,
  one_box_iou05) with line-level resume
- short-form VQA (`shortform.py`): exact-match / yes-no / multiple-choice
  scoring in-process (the TPU-side replacement for the lmms-eval plugin)
"""

from glimpseprune_tpu.evalsuite.data import (
    DATASET_MAPPERS,
    EvalSample,
    load_benchmark,
    shard_for_host,
)
from glimpseprune_tpu.evalsuite.infer import InferenceConfig, run_inference
from glimpseprune_tpu.evalsuite.scorers import SCORERS, score_results
from glimpseprune_tpu.evalsuite.judge import LLMClient

__all__ = [
    "DATASET_MAPPERS",
    "EvalSample",
    "load_benchmark",
    "shard_for_host",
    "InferenceConfig",
    "run_inference",
    "SCORERS",
    "score_results",
    "LLMClient",
]
