"""Continuous-batching serving scheduler for one chip.

A real serving loop admits a request into the decode batch the moment its
prefill lands, instead of aggregating a full batch of prefills first (the
reference's eval loop, viscot_eval/infer_cot.py:315-347, is strictly
prefill-all-then-decode-all at B=1; vLLM-style admission has no reference
analogue). On a serial device continuous batching trades a bounded amount
of extra decode compute for far better time-to-first-token and per-request
completion latency, and eos early-exit frees slots for pending requests.

Design (TPU-first): ONE preallocated decode cache per batcher with a
GLOBAL write cursor shared by every slot, so the flat-scan
`decode_chunk` kernel (gp_model.py) is reused unchanged — no per-row
write indices, no scatter in the decode hot path, no recompilation per
admission:

  - a row admitted at global step s fills its prefix KV at [0, R), leaves
    the gap [R, R+s) masked in `kv_valid`, and starts writing at the
    cursor; attention correctness needs only the mask.
  - per-row positions stay correct via a per-slot base offset stored as
    (row_last_pos - s), so `base + global_step` is the row's true
    position at every chunk.
  - admission clears the slot's whole `kv_valid` lane first: garbage
    marked valid by other rows' global writes must not leak in.

The cache length must cover R + total_steps; `serve()` raises if the
schedule would overrun (long queues should re-shard into multiple serve
calls — steady-state servers would periodically re-compact, out of scope
here).

All jitted executables are built once per batcher (constructor) and keyed
by static (capacity, prefix_len, inter_steps, eos, temperature) — calling
`serve` repeatedly reuses the compiled programs (CLAUDE.md: never build a
jit per call).
"""

from __future__ import annotations

import functools
import time
from typing import Callable, List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from glimpseprune_tpu.ops.kv_cache import alloc_cache, cache_fill_rows


PrefillOut = Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]
# (logits [1, *, V], valid [1, R], position_ids [3, 1, R],
#  kv_k [L, 1, R, Hkv, D], kv_v [L, 1, R, Hkv, D])


class ContinuousBatcher:
    """Slot scheduler over a shared decode cache.

    runner: GlimpsePruneRunner (supplies model/params/config).
    capacity: decode batch slots (the KV-residency cap for the tier).
    prefix_len: R — every admitted row's (padded) prefill length. GP's
        fixed-budget compaction makes this static per config; mixed-length
        prompts pad to the bucket.
    max_new_tokens / inter_steps: tokens per request / decode steps per
        interleaved chunk (the latency-vs-overhead knob: each admission
        inserted mid-stream costs the already-running rows nothing, but
        the batch as a whole runs (n_admissions x inter_steps) extra
        steps vs an aggregated batch).
    max_requests: sizing bound for the cache length (queue longer than
        this must be split across serve() calls).
    """

    def __init__(self, runner, capacity: int, prefix_len: int,
                 max_new_tokens: int, inter_steps: int = 8,
                 eos: int = -1, temperature: float = 0.0,
                 max_requests: int = 0):
        cfg = runner.cfg
        self.runner = runner
        self.capacity = int(capacity)
        self.R = int(prefix_len)
        self.n_dec = int(max_new_tokens)
        self.inter = int(inter_steps)
        self.eos = int(eos)
        self.need = (self.n_dec + self.inter - 1) // self.inter
        n_req = max(int(max_requests), self.capacity)
        waves = (n_req + self.capacity - 1) // self.capacity
        # schedule bound: every admission interleaves <=1 chunk, plus
        # `need` drain chunks per wave
        self.total_chunks = n_req + waves * self.need + 1
        self.T = self.R + self.total_chunks * self.inter
        self.L = cfg.text.num_hidden_layers
        self.Hkv = cfg.text.num_key_value_heads
        self.D = cfg.text.head_dim
        tier = getattr(cfg.text, "kv_cache_quant", "none")
        self.cache_tier = "" if tier == "none" else tier
        self.dtype = runner.dtype

        T, R, inter, temp, eos_id = self.T, self.R, self.inter, temperature, self.eos

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3, 4))
        def _admit(kc, vc, kvv, ntok, lpb, ck, cv, rvalid, rlogits, rpos,
                   slot, gstep, key):
            kc = cache_fill_rows(kc, ck, slot)
            vc = cache_fill_rows(vc, cv, slot)
            row_valid = jnp.concatenate(
                [rvalid[0], jnp.zeros((T - rvalid.shape[1],), bool)])
            kvv = jax.lax.dynamic_update_slice(
                kvv, row_valid[None], (slot, jnp.int32(0)))
            # first token after admission rides the SAME temperature path as
            # generate() (runner._run_decode): sampled admissions must not
            # silently bias the first token to greedy argmax
            if temp and temp > 0:
                tok = jax.random.categorical(
                    key, rlogits[:, -1].astype(jnp.float32) / temp, axis=-1
                )[0].astype(jnp.int32)
            else:
                tok = jnp.argmax(rlogits[0, -1], axis=-1).astype(jnp.int32)
            ntok = jax.lax.dynamic_update_slice(ntok, tok[None], (slot,))
            lp = rpos[:, 0, -1].astype(jnp.int32) - gstep
            lpb = jax.lax.dynamic_update_slice(
                lpb, lp[:, None], (jnp.int32(0), slot))
            return kc, vc, kvv, ntok, lpb

        def _chunk(prm, tok, lpb, kc, vc, kvv, gstep, key):
            def run(m):
                return m.decode_chunk(
                    tok, lpb + gstep, kc, vc, kvv, jnp.int32(R) + gstep, key,
                    n_steps=inter, eos_token_id=eos_id, temperature=temp)
            return runner.model.apply(prm, method=run)

        self._admit = _admit
        self._chunk = jax.jit(_chunk, donate_argnums=(3, 4, 5))

    def warm(self, prefill_out: PrefillOut) -> None:
        """Compile the admission + decode-chunk executables against one
        throwaway state (a timed serve() then runs compile-free)."""
        shape = (self.L, self.capacity, self.T, self.Hkv, self.D)
        kc = alloc_cache(shape, self.dtype, self.cache_tier)
        vc = alloc_cache(shape, self.dtype, self.cache_tier)
        kvv = jnp.zeros((self.capacity, self.T), bool)
        ntok = jnp.zeros((self.capacity,), jnp.int32)
        lpb = jnp.zeros((3, self.capacity), jnp.int32)
        rlogits, rvalid, rpos, ck, cv = prefill_out
        kc, vc, kvv, ntok, lpb = self._admit(
            kc, vc, kvv, ntok, lpb, ck, cv, rvalid, rlogits, rpos,
            jnp.int32(0), jnp.int32(0), jax.random.PRNGKey(0))
        toks, *_ = self._chunk(
            {"params": self.runner.params}, ntok, lpb, kc, vc, kvv,
            jnp.int32(0), jax.random.PRNGKey(0))
        np.asarray(toks)

    def serve(self, prefills: Sequence[Callable[[], PrefillOut]],
              rng=None):
        """Run the admission loop over a queue of prefill thunks.

        Each thunk performs one request's B=1 prefill and returns the
        PrefillOut tuple; thunks run lazily as slots open. Returns
        (sequences [N, max_new_tokens] int64, n_generated [N],
        ttft_s [N], completion_s [N]) — sequences eos-trimmed like
        generate(); timings are wall-clock from serve() entry, with a
        host sync at every admission (TTFT is a real first-token-on-host
        time) and after every decode chunk.
        """
        import inspect

        n_req = len(prefills)
        waves = (n_req + self.capacity - 1) // self.capacity
        if n_req + waves * self.need + 1 > self.total_chunks:
            raise ValueError(
                f"{n_req} requests overrun the cache schedule bound "
                f"({self.total_chunks} chunks); raise max_requests or "
                "split the queue")
        B, T, R, inter, need = (self.capacity, self.T, self.R, self.inter,
                                self.need)
        t0 = time.perf_counter()
        shape = (self.L, B, T, self.Hkv, self.D)
        kc = alloc_cache(shape, self.dtype, self.cache_tier)
        vc = alloc_cache(shape, self.dtype, self.cache_tier)
        kvv = jnp.zeros((B, T), bool)
        ntok = jnp.zeros((B,), jnp.int32)
        lpb = jnp.zeros((3, B), jnp.int32)
        key = jax.random.PRNGKey(0) if rng is None else rng
        params = {"params": self.runner.params}

        seqs = np.full((n_req, need * inter), self.eos, dtype=np.int64)
        ttft = np.zeros(n_req)
        completion = np.zeros(n_req)
        slot_req = [-1] * B          # request occupying each slot
        admit_chunk = [0] * B
        free = list(range(B))
        pending = list(range(n_req))
        live: List[int] = []         # occupied slots
        state = {"gchunk": 0, "key": key, "kc": kc, "vc": vc, "kvv": kvv,
                 "ntok": ntok, "lpb": lpb}

        def run_chunk():
            """One interleaved decode chunk + per-slot bookkeeping."""
            state["key"], sub = jax.random.split(state["key"])
            toks, state["ntok"], done, state["kc"], state["vc"], state["kvv"] = \
                self._chunk(params, state["ntok"], state["lpb"], state["kc"],
                            state["vc"], state["kvv"],
                            jnp.int32(state["gchunk"] * inter), sub)
            toks = np.asarray(toks)  # sync: chunk landed
            state["gchunk"] += 1
            gchunk = state["gchunk"]
            now = time.perf_counter() - t0
            done = np.asarray(done)
            for slot in list(live):
                req = slot_req[slot]
                c0 = admit_chunk[slot]
                seqs[req, (gchunk - 1 - c0) * inter:(gchunk - c0) * inter] = \
                    toks[slot]
                if gchunk - c0 >= need or bool(done[slot]):
                    completion[req] = now
                    live.remove(slot)
                    free.append(slot)

        while pending or live:
            if pending and free:
                req = pending.pop(0)
                slot = free.pop(0)
                out = prefills[req]()
                if inspect.isgenerator(out):
                    # CHUNKED admission (vanilla_prefill_chunked_steps):
                    # interleave one decode chunk at every prefill-chunk
                    # boundary — running rows keep decoding while this
                    # request is still prefilling. Extra interleaves spend
                    # schedule budget the constructor sized for one chunk
                    # per admission, so stop interleaving (prefill chunks
                    # continue back-to-back) once the remaining budget just
                    # covers the mandatory admissions + drain chunks.
                    def budget_left():
                        # mandatory chunks still owed: one fall-through per
                        # unadmitted request, <= need per unadmitted wave,
                        # and the CONCURRENT drain of live rows (their
                        # remaining chunks overlap -> max, not sum)
                        n_unadmitted = len(pending) + 1
                        waves_left = (n_unadmitted + B - 1) // B
                        live_rem = max(
                            (need - (state["gchunk"] - admit_chunk[sl])
                             for sl in live), default=0)
                        reserved = n_unadmitted + waves_left * need + live_rem
                        return state["gchunk"] + reserved + 1 <= self.total_chunks

                    while True:
                        try:
                            next(out)
                        except StopIteration as stop:
                            out = stop.value
                            break
                        if live and budget_left():
                            run_chunk()
                rlogits, rvalid, rpos, ck, cv = out
                if rvalid.shape[0] != 1:
                    raise ValueError(
                        f"admission takes one row, got B={rvalid.shape[0]} "
                        "(slice the prefill output per request)")
                # split BEFORE the chunk splits, mirroring _run_decode's
                # (first-token split, then per-chunk splits) order — a
                # capacity-1 batcher therefore reproduces generate()'s
                # sampling stream exactly
                state["key"], sub = jax.random.split(state["key"])
                (state["kc"], state["vc"], state["kvv"], state["ntok"],
                 state["lpb"]) = self._admit(
                    state["kc"], state["vc"], state["kvv"], state["ntok"],
                    state["lpb"], ck, cv, rvalid, rlogits, rpos,
                    jnp.int32(slot), jnp.int32(state["gchunk"] * inter), sub)
                first = int(np.asarray(state["ntok"])[slot])  # sync: on host
                ttft[req] = time.perf_counter() - t0
                slot_req[slot] = req
                admit_chunk[slot] = state["gchunk"]
                live.append(slot)
                if first == self.eos:  # degenerate instant-eos request
                    completion[req] = ttft[req]
                    live.remove(slot)
                    free.append(slot)
                # fall through: one decode chunk between admissions — the
                # interleave that advances early rows while later requests
                # are still prefilling
            if not live:
                continue
            run_chunk()

        seqs, n_gen = self.runner._trim_eos(seqs, self.n_dec, self.eos)
        return seqs, n_gen, ttft, completion
