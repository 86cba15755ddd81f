"""ContinuousBatcher: admission-scheduled decode over a shared cache.

The scheduler must be a pure re-arrangement of work: every request's
greedy tokens must equal the plain generate() tokens for the same inputs
(the global-cursor gaps and garbage lanes are masked out of attention),
slot reuse must recycle capacity, and eos must complete a row early.
"""

import numpy as np

import jax
import jax.numpy as jnp

from glimpseprune_tpu.config import tiny_test_config
from glimpseprune_tpu.models.qwen2_5_vl.runner import GlimpsePruneRunner
from glimpseprune_tpu.serving import ContinuousBatcher

from test_training import build_batch, init_params


def _setup(max_new=8):
    cfg = tiny_test_config()
    rng = np.random.default_rng(3)
    prep, _ = build_batch(cfg, rng, with_labels=False)
    _, params = init_params(cfg, prep)
    runner = GlimpsePruneRunner(cfg, params)
    base = runner.generate(prep, max_new_tokens=max_new)
    dev_inputs = runner._device_inputs(prep, use_ref_masks=False)

    def prefill():
        # build_batch preps two rows; a serving request is row 0's B=1 slice
        o = runner._prefill({"params": runner.params}, dev_inputs,
                            out_len=prep.out_len, use_ref_masks=False)
        return (o.logits[:1], o.valid[:1], o.position_ids[:, :1],
                o.kv_k[:, :1], o.kv_v[:, :1])

    R = int(prefill()[1].shape[1])
    return runner, prep, base, prefill, R


def test_continuous_matches_generate_with_slot_reuse():
    max_new = 8
    runner, prep, base, prefill, R = _setup(max_new)
    # capacity 2 < 3 requests -> the third request waits for a freed slot
    b = ContinuousBatcher(runner, capacity=2, prefix_len=R,
                          max_new_tokens=max_new, inter_steps=2,
                          eos=-1, max_requests=3)
    seqs, n_gen, ttft, completion = b.serve([prefill] * 3)

    expect = np.asarray(base.sequences)[0]
    for i in range(3):
        np.testing.assert_array_equal(seqs[i], expect)
    assert (n_gen == max_new).all()
    # request 2 admits only after a slot frees: its ttft exceeds both others
    assert ttft[2] > max(ttft[0], ttft[1])
    assert (completion >= ttft).all()


def test_continuous_eos_early_exit_frees_slot():
    max_new = 8
    runner, prep, base, prefill, R = _setup(max_new)
    expect = np.asarray(base.sequences)[0]
    # force an early stop at the first token value not already emitted
    idx = next(i for i in range(1, max_new - 1) if expect[i] not in expect[:i])
    eos = int(expect[idx])
    b = ContinuousBatcher(runner, capacity=1, prefix_len=R,
                          max_new_tokens=max_new, inter_steps=2,
                          eos=eos, max_requests=2)
    seqs, n_gen, ttft, completion = b.serve([prefill] * 2)
    for i in range(2):
        # tokens match up to and including the first eos, eos-padded after
        np.testing.assert_array_equal(seqs[i, :idx + 1], expect[:idx + 1])
        assert (seqs[i, idx + 1:] == eos).all()
    assert (n_gen == idx + 1).all()
    # capacity 1: request 1 could only start after request 0 released
    assert ttft[1] > completion[0]


def test_continuous_overrun_guard():
    runner, prep, base, prefill, R = _setup(4)
    b = ContinuousBatcher(runner, capacity=1, prefix_len=R,
                          max_new_tokens=4, inter_steps=2, max_requests=1)
    try:
        b.serve([prefill] * 5)
        raise AssertionError("expected schedule-bound ValueError")
    except ValueError as e:
        assert "overrun" in str(e)


def test_continuous_sampled_admission_matches_generate():
    """temperature>0: the batcher must ride generate()'s sampling path for
    the first token after admission (runner._run_decode's categorical), not
    silently argmax it. With capacity=1 the rng streams align exactly
    (admission split == first-token split; chunk splits match when
    inter_steps == check_eos_every), so a single request's sampled tokens
    equal generate()'s row 0 token-for-token."""
    max_new = 8
    temp = 2.0
    cfg = tiny_test_config()
    rng = np.random.default_rng(3)
    prep, _ = build_batch(cfg, rng, with_labels=False)
    _, params = init_params(cfg, prep)
    runner = GlimpsePruneRunner(cfg, params)
    base = runner.generate(prep, max_new_tokens=max_new, temperature=temp,
                           rng=jax.random.PRNGKey(7), check_eos_every=2)
    dev_inputs = runner._device_inputs(prep, use_ref_masks=False)

    def prefill():
        o = runner._prefill({"params": runner.params}, dev_inputs,
                            out_len=prep.out_len, use_ref_masks=False)
        return (o.logits[:1], o.valid[:1], o.position_ids[:, :1],
                o.kv_k[:, :1], o.kv_v[:, :1])

    rlogits = prefill()[0]
    R = int(prefill()[1].shape[1])
    b = ContinuousBatcher(runner, capacity=1, prefix_len=R,
                          max_new_tokens=max_new, inter_steps=2,
                          eos=-1, temperature=temp, max_requests=1)
    seqs, n_gen, ttft, completion = b.serve(
        [prefill], rng=jax.random.PRNGKey(7))

    # pin the admission sampling directly: first token == categorical under
    # the admission split (and, at this seed, != the greedy argmax the old
    # code always produced)
    sub = jax.random.split(jax.random.PRNGKey(7))[1]
    want_first = int(jax.random.categorical(
        sub, rlogits[:, -1].astype(jnp.float32) / temp, axis=-1)[0])
    assert int(seqs[0, 0]) == want_first
    assert want_first != int(np.argmax(np.asarray(rlogits)[0, -1]))

    expect = np.asarray(base.sequences)[0]
    np.testing.assert_array_equal(seqs[0], expect)


def test_continuous_matches_generate_on_mesh():
    """Multi-chip serving: the batcher's greedy tokens over TP-sharded
    params (+ SP enabled for the prefill) equal the single-device
    generate() — serving on a pod slice is the same pure re-arrangement."""
    from glimpseprune_tpu.parallel import make_mesh, sequence_parallel, shard_params

    cfg = tiny_test_config()
    rng = np.random.default_rng(3)
    prep, _ = build_batch(cfg, rng, with_labels=False)
    _, params = init_params(cfg, prep)
    base = GlimpsePruneRunner(cfg, params).generate(prep, max_new_tokens=6)

    mesh = make_mesh(8, model_axis=2)
    runner = GlimpsePruneRunner(cfg, shard_params(params, mesh))
    dev_inputs = runner._device_inputs(prep, use_ref_masks=False)

    with sequence_parallel(mesh):
        def prefill():
            o = runner._prefill({"params": runner.params}, dev_inputs,
                                out_len=prep.out_len, use_ref_masks=False)
            return (o.logits[:1], o.valid[:1], o.position_ids[:, :1],
                    o.kv_k[:, :1], o.kv_v[:, :1])

        R = int(prefill()[1].shape[1])
        b = ContinuousBatcher(runner, capacity=2, prefix_len=R,
                              max_new_tokens=6, inter_steps=2,
                              eos=-1, max_requests=2)
        seqs, n_gen, ttft, completion = b.serve([prefill] * 2)

    expect = np.asarray(base.sequences)[0]
    for i in range(2):
        np.testing.assert_array_equal(seqs[i], expect[: seqs.shape[1]])
    assert (n_gen == 6).all()


def test_continuous_chunked_admission_matches_generate():
    """Chunked admissions (vanilla_prefill_chunked_steps generators) produce
    the same greedy tokens as whole-prefill admissions and as plain
    generate() — and the scheduler actually interleaves decode chunks inside
    an admission (later requests' prefills no longer stall running rows)."""
    cfg = tiny_test_config()
    rng = np.random.default_rng(3)
    prep, _ = build_batch(cfg, rng, with_labels=False)
    _, params = init_params(cfg, prep)
    runner = GlimpsePruneRunner(cfg, params, donate_cache=False)
    max_new = 8
    base = runner.generate(prep, max_new_tokens=max_new, do_selection=False)
    expect = np.asarray(base.sequences)[0]

    probe = runner.vanilla_prefill_chunked(prep, chunk_size=8)
    R = int(probe[1].shape[1])

    def one_row(t):
        logits, valid, pos, kc, vc = t
        return (logits[:1], valid[:1], pos[:, :1], kc[:, :1], vc[:, :1])

    def chunked_thunk():
        gen = runner.vanilla_prefill_chunked_steps(prep, chunk_size=8)
        while True:
            try:
                yield next(gen)
            except StopIteration as stop:
                return one_row(stop.value)

    b = ContinuousBatcher(runner, capacity=2, prefix_len=R,
                          max_new_tokens=max_new, inter_steps=2,
                          eos=-1, max_requests=3)
    seqs, n_gen, ttft, completion = b.serve([chunked_thunk] * 3)
    for i in range(3):
        np.testing.assert_array_equal(seqs[i], expect)
    assert (n_gen == max_new).all()
