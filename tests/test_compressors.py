"""Baseline compressors: algorithm unit tests vs oracles + harness e2e."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from glimpseprune_tpu.compressors import (
    cdpruner_select,
    divprune_select,
    visionzip_select,
)
from glimpseprune_tpu.config import tiny_test_config
from glimpseprune_tpu.models.qwen2_5_vl.runner import GlimpsePruneRunner, prepare_inputs

from test_gp_pipeline import make_image, make_prompts


def oracle_divprune(feat, k):
    """Reference DivPrune greedy loop (llava_divprune llava_arch.py:152-172)."""
    f = feat / np.linalg.norm(feat, axis=1, keepdims=True)
    dist = 1.0 - f @ f.T
    s = []
    for i in range(k):
        if i == 0:
            scores = np.sort(dist, axis=0)[1, :]
        else:
            scores = dist[s].min(axis=0)
        cand = int(np.argmax(scores))
        s.append(cand)
    return sorted(s)


def test_divprune_matches_oracle():
    rng = np.random.default_rng(0)
    feat = rng.normal(size=(20, 8)).astype(np.float32)
    keep = divprune_select(jnp.array(feat)[None], jnp.ones((1, 20), dtype=bool), 6)
    ours = sorted(np.nonzero(np.asarray(keep)[0])[0].tolist())
    assert ours == oracle_divprune(feat, 6)


def oracle_cdpruner(feat, rel, k):
    """Reference conditional-DPP greedy MAP (llava_cdpruner llava_arch.py:162-186)."""
    f = feat / np.linalg.norm(feat, axis=-1, keepdims=True)
    sim = f @ f.T
    r = (rel - rel.min() + 1e-6) / (rel.max() - rel.min())
    kernel = r[:, None] * sim * r[None, :]
    n = feat.shape[0]
    cis = np.zeros((k, n))
    di2s = np.diagonal(kernel).copy()
    sel = []
    for i in range(k):
        j = int(np.argmax(di2s))
        sel.append(j)
        eis = (kernel[j] - cis[:i, j] @ cis[:i]) / np.sqrt(di2s[j])
        cis[i] = eis
        di2s = di2s - eis**2
        di2s[j] = -np.inf
    return sorted(sel)


def test_cdpruner_matches_oracle():
    rng = np.random.default_rng(1)
    feat = rng.normal(size=(24, 8)).astype(np.float32)
    rel = rng.random(24).astype(np.float32)
    keep = cdpruner_select(
        jnp.array(feat)[None], jnp.array(rel)[None], jnp.ones((1, 24), dtype=bool), 7
    )
    ours = sorted(np.nonzero(np.asarray(keep)[0])[0].tolist())
    assert ours == oracle_cdpruner(feat, rel, 7)


def test_visionzip_select_counts_and_merge():
    rng = np.random.default_rng(2)
    B, N, D = 1, 40, 8
    embeds = jnp.array(rng.normal(size=(B, N, D)).astype(np.float32))
    imp = jnp.array(rng.random((B, N)).astype(np.float32))
    keys = jnp.array(rng.normal(size=(B, N, 4)).astype(np.float32))
    valid = jnp.ones((B, N), dtype=bool)
    keep, new_embeds = visionzip_select(embeds, imp, keys, valid, 0.5, 0.1)
    keep = np.asarray(keep)[0]
    # 20 dominant + 4 contextual targets
    assert keep.sum() == 24
    # dominant tokens keep their embeddings; targets are modified
    dominant = np.argsort(-np.asarray(imp)[0])[:20]
    np.testing.assert_array_equal(
        np.asarray(new_embeds)[0, dominant], np.asarray(embeds)[0, dominant]
    )
    targets = sorted(set(np.nonzero(keep)[0]) - set(dominant.tolist()))
    assert not np.allclose(np.asarray(new_embeds)[0, targets], np.asarray(embeds)[0, targets])


@pytest.fixture(scope="module")
def harness():
    import test_gp_pipeline as g

    cfg = tiny_test_config()
    rng = np.random.default_rng(0)
    prompts = make_prompts(cfg, rng)
    images = [make_image(rng, 64, 96), make_image(rng, 56, 56)]
    prep = prepare_inputs(cfg, prompts, images, seq_multiple=8, patch_multiple=16)
    from glimpseprune_tpu.models.qwen2_5_vl.gp_model import Qwen2_5_VL_GP

    model = Qwen2_5_VL_GP(cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(prep.input_ids), jnp.asarray(prep.valid),
        jnp.asarray(prep.position_ids), jnp.asarray(prep.patches),
        jnp.asarray(prep.vis_pos_ids), jnp.asarray(prep.full_seg),
        jnp.asarray(prep.vis_valid), jnp.asarray(prep.packed_idx),
        jnp.asarray(prep.img_slots), jnp.asarray(prep.img_valid),
        jnp.asarray(prep.fuser.window_index), jnp.asarray(prep.fuser.reverse_index),
        jnp.asarray(prep.fuser.segment_ids), jnp.asarray(prep.fuser.pos_ids),
        jnp.asarray(prep.le_start), prep.out_len,
    )
    runner = GlimpsePruneRunner(cfg, variables["params"])
    return cfg, runner, prep


def test_vscan_window_capped_selection():
    from glimpseprune_tpu.compressors.vscan import vscan_select, merge_dropped_into_kept
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    B, h, w = 1, 8, 8
    N = h * w
    local = jnp.array(rng.random((B, N)).astype(np.float32))
    glob = jnp.array(rng.random((B, N)).astype(np.float32))
    valid = jnp.ones((B, N), dtype=bool)
    grid = jnp.array([[h, w]])
    k = 16
    keep = vscan_select(local, glob, valid, grid, k, window=4)
    keep_np = np.asarray(keep)[0]
    assert keep_np.sum() == k
    # local half respects the per-window cap: ceil(8 / 4 windows) = 2
    # (can only verify total due to local/global mixing; check merge instead)
    emb = jnp.array(rng.normal(size=(B, N, 8)).astype(np.float32))
    merged = merge_dropped_into_kept(emb, keep, valid)
    # kept tokens changed (absorbed neighbors), dropped unchanged
    changed = np.abs(np.asarray(merged) - np.asarray(emb)).max(-1)[0]
    assert (changed[keep_np] > 0).any()
    assert np.allclose(changed[~keep_np], 0)


def test_vscan_local_cap_exact():
    """With global scores zeroed, selection is pure window-capped local greedy:
    compare against a direct python implementation of the reference loop."""
    from glimpseprune_tpu.compressors.vscan import vscan_select
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    h, w, window = 8, 12, 4
    N = h * w
    local = rng.random(N).astype(np.float32)
    k = 12
    k_local = k // 2
    nwh, nww = h // window, w // window
    limit = int(np.ceil(k_local / (nwh * nww)))
    # reference greedy walk
    counter = {}
    sel = []
    for idx in np.argsort(-local):
        x = min(idx // w // window, nwh - 1)
        y = min(idx % w // window, nww - 1)
        if counter.get((x, y), 0) < limit:
            counter[(x, y)] = counter.get((x, y), 0) + 1
            sel.append(int(idx))
        if len(sel) >= k_local:
            break
    keep = vscan_select(
        jnp.array(local)[None], jnp.full((1, N), -1e9), jnp.ones((1, N), dtype=bool),
        jnp.array([[h, w]]), k, window=window,
    )
    ours_local = set(np.nonzero(np.asarray(keep)[0])[0].tolist())
    assert set(sel) <= ours_local  # local picks all present (rest are global)


@pytest.mark.parametrize("method", ["visionzip", "divprune", "cdpruner", "pdrop", "vscan"])
def test_compressed_generate_runs(harness, method):
    cfg, runner, prep = harness
    kwargs = dict(max_new_tokens=4)
    if method in ("divprune", "cdpruner", "vscan"):
        kwargs["visual_token_num"] = 2  # rows have 6 and 4 image tokens
    if method == "pdrop":
        kwargs["stages"] = ((1, 0.5), (2, 0.25))
    res = runner.generate_compressed(prep, method, **kwargs)
    assert res.sequences.shape == (2, 4)
    assert (res.prune_ratio > 0).all()
    if method in ("divprune", "cdpruner", "vscan"):
        np.testing.assert_array_equal(res.keep_img.sum(1), [2, 2])
