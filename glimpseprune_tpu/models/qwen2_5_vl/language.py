"""Qwen2.5/Llama text decoder: scanned stacked layers, harvest taps, KV cache.

The decoder stack is ONE set of stacked parameters ([L, ...] leading axis on
every leaf) driven by `lax.scan` — on TPU this keeps the HLO size constant in
depth (the axon-tunnel AOT compiler is minutes-per-program on unrolled-layer
graphs) and is the idiomatic XLA formulation. Layer ranges for the two-phase
pruned prefill are static slices of the stacked tree.

The glimpse "harvest" (reference modified attention classes,
model_gp.py:393-703) is a per-layer side output of the scan: one
q_glimpse @ K^T einsum, ~MFLOPs, masked/log-softmaxed after the scan for the
selected layers only.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from glimpseprune_tpu.config import TextConfig
from glimpseprune_tpu.ops.attention import (
    causal_segment_attention,
    decode_attention,
)
from glimpseprune_tpu.ops.rope import apply_rotary


# --------------------------------------------------------------------- #
# pure layer math (params = one layer's subtree, no leading L axis)


def _rms(x, weight, eps):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    return (weight.astype(jnp.float32) * xf).astype(x.dtype)


def _dense(x, p, dtype, a8: bool = False):
    if "kernel_q" in p and a8 and "lora_a" not in p:
        # dynamic W8A8 (quantization.matmul_w8a8): per-row activation int8 +
        # the v5e native int8 MXU mode (1.43x measured vs bf16 at the ViT
        # MLP shape). LoRA-bearing layers stay on the dequant path so the
        # low-rank update sees unquantized activations.
        from glimpseprune_tpu.quantization import matmul_w8a8

        y = matmul_w8a8(x, p["kernel_q"], p["kernel_scale"], dtype)
        if "bias" in p:
            y = y + p["bias"].astype(dtype)
        return y
    if "kernel_q" in p:
        # weight-only int8 (quantization.py): dequant fuses into the matmul;
        # only this layer's bf16 kernel materializes inside the scan
        w = p["kernel_q"].astype(dtype) * p["kernel_scale"].astype(dtype)
    elif "kernel_q4" in p:
        # 4-bit tier: two nibbles per int8 byte + group-64 scales. Small-M
        # (decode) matmuls route to the fused Pallas dequant kernel — the
        # XLA unpack chain materializes the bf16 kernel and is 17x slower
        # at the decode shape (quantization.matmul_int4_auto)
        from glimpseprune_tpu.quantization import matmul_int4_auto

        x = x.astype(dtype)
        # W4A8 (a8 + no adapter): in-VMEM requant + int8 MXU prefill kernel
        y = matmul_int4_auto(x, p, dtype, a8=a8 and "lora_a" not in p)
        if "lora_a" in p:
            y = y + (x @ p["lora_a"].astype(dtype)) @ p["lora_b"].astype(dtype)
        if "bias" in p:
            y = y + p["bias"].astype(dtype)
        return y
    else:
        w = p["kernel"].astype(dtype)
    x = x.astype(dtype)
    y = x @ w
    if "lora_a" in p:
        # in-scan LoRA (training/lora.insert_lora): no merged kernel copy
        y = y + (x @ p["lora_a"].astype(dtype)) @ p["lora_b"].astype(dtype)
    if "bias" in p:
        y = y + p["bias"].astype(dtype)
    return y


def _act_quant_on(cfg: TextConfig, decoding: bool) -> bool:
    """W8A8 applies where matmuls are compute-bound. "int8" = everywhere;
    "prefill" = prefill only — decode at small batch is HBM-bandwidth-bound
    (weight reads dominate; the int8 MXU mode buys nothing and the per-step
    activation-quant chain inside the flat decode scan only adds latency),
    so the serving tier keeps decode on the weight-only dequant path."""
    if cfg.act_quant == "int8":
        return True
    return cfg.act_quant == "prefill" and not decoding


def _qkv(cfg: TextConfig, pl, x, cos, sin, dtype, a8: bool = False):
    b, s, _ = x.shape
    a = pl["self_attn"]
    q = _dense(x, a["q_proj"], dtype, a8).reshape(b, s, cfg.num_attention_heads, cfg.head_dim)
    k = _dense(x, a["k_proj"], dtype, a8).reshape(b, s, cfg.num_key_value_heads, cfg.head_dim)
    v = _dense(x, a["v_proj"], dtype, a8).reshape(b, s, cfg.num_key_value_heads, cfg.head_dim)
    return apply_rotary(q, cos, sin), apply_rotary(k, cos, sin), v


def _mlp(cfg: TextConfig, pl, x, dtype, a8: bool = False):
    m = pl["mlp"]
    return _dense(
        nn.silu(_dense(x, m["gate_proj"], dtype, a8)) * _dense(x, m["up_proj"], dtype, a8),
        m["down_proj"], dtype, a8,
    )


def _layer_prefill(cfg: TextConfig, pl, x, cos, sin, valid, q_index, dtype):
    """One decoder layer -> (x, k, v, sel_q, q).

    sel_q is the glimpse token's post-rope query [B, Hq, D] — the only
    per-layer harvest state; the actual q@K^T rows are computed post-scan
    for the selected layers only (keeping the scan body free of per-layer
    harvest matmuls). The full post-rope q [B, S, Hq, D] is also returned
    for the multi-query visualization harvest (emitted from the scan only
    when requested)."""
    a8 = _act_quant_on(cfg, decoding=False)
    h = _rms(x, pl["input_layernorm"]["weight"], cfg.rms_norm_eps)
    q, k, v = _qkv(cfg, pl, h, cos, sin, dtype, a8)
    attn = causal_segment_attention(q, k, v, valid,
                                    int8_qk=a8 and cfg.attn_qk_int8,
                                    int8_pv=a8 and cfg.attn_pv_int8)
    b, s = x.shape[:2]
    x = x + _dense(attn.reshape(b, s, -1), pl["self_attn"]["o_proj"], dtype, a8)
    x = x + _mlp(cfg, pl, _rms(x, pl["post_attention_layernorm"]["weight"], cfg.rms_norm_eps), dtype, a8)
    sel_q = jnp.take_along_axis(q, q_index[:, None, None, None], axis=1)[:, 0]
    return x, k, v, sel_q, q


def _layer_decode(cfg: TextConfig, pl, l, x, cos, sin, k_cache, v_cache,
                  kv_valid, write_idx, dtype, new_valid=None):
    """One decode layer against the FULL stacked cache [L, B, T, Hkv, D].

    The cache lives in the layer-scan CARRY and only the new token slots are
    written (dynamic_update_slice at (l, :, write_idx)): XLA aliases while-
    loop carries, so the update is in place. The previous formulation
    threaded per-layer cache slices through scan xs->ys, which re-wrote the
    whole [B, T, Hkv, D] slice every layer every step — ~2x the cache bytes
    in HBM traffic per decode step on top of the unavoidable attention
    read.

    Order matters: the slice is READ before the update and the new tokens'
    k/v ride in registers (decode_attention k_new path). A carry that is
    dynamically read AFTER an in-body update costs a defensive whole-cache
    copy from XLA's copy insertion (+7.6 GB at 7B/16k/B=4 — measured);
    read-then-write aliases clean."""
    from glimpseprune_tpu.ops.kv_cache import cache_append, cache_layer

    a8 = _act_quant_on(cfg, decoding=True)
    h = _rms(x, pl["input_layernorm"]["weight"], cfg.rms_norm_eps)
    q, k, v = _qkv(cfg, pl, h, cos, sin, dtype, a8)
    kl = cache_layer(k_cache, l)
    vl = cache_layer(v_cache, l)
    attn = decode_attention(q, kl, vl, kv_valid, k_new=k, v_new=v,
                            write_idx=write_idx, new_valid=new_valid)
    k_cache = cache_append(k_cache, k, l, write_idx)
    v_cache = cache_append(v_cache, v, l, write_idx)
    b, s = x.shape[:2]
    x = x + _dense(attn.reshape(b, s, -1), pl["self_attn"]["o_proj"], dtype, a8)
    x = x + _mlp(cfg, pl, _rms(x, pl["post_attention_layernorm"]["weight"], cfg.rms_norm_eps), dtype, a8)
    return x, k_cache, v_cache


def harvest_postprocess(
    raw_row: jnp.ndarray,       # [B, S, Hq] raw scaled logits (the glimpse
                                # query's row — selection happens upstream)
    valid: jnp.ndarray,         # [B, S]
    use_attention_logits: bool,
) -> jnp.ndarray:
    """Reference harvest semantics — the PRODUCTION (flash-attn) path's
    `_cal_attn_weights` (model_gp.py:582-605): raw logits, or the log-softmax
    row masked by the PAD mask only. No causal term: the reference adds just
    `convert_2d_to_4d_mask(attention_mask)` to the extracted q row, so in the
    SFT/labels mode (glimpse token inserted BEFORE the answer,
    _append_le:1136-1158) the answer keys after the glimpse slot participate
    in the normalization. Identical to a causal-to-q normalization whenever
    the glimpse token is last (every inference path); differential-tested in
    both placements. (The reference's sdpa variant :487-496 DOES apply a
    causal row, but it crashes upstream and never runs — see
    tests/reference_shim.py note 6.)"""
    if use_attention_logits:
        return raw_row
    logits = jnp.where(valid[..., None], raw_row, -jnp.inf)
    return jax.nn.log_softmax(logits, axis=1)


def _init_layer_stack(cfg: TextConfig, param_dtype):
    """Initializer for the stacked layer pytree."""
    L = cfg.num_hidden_layers
    H = cfg.hidden_size
    dq = cfg.num_attention_heads * cfg.head_dim
    dkv = cfg.num_key_value_heads * cfg.head_dim
    I = cfg.intermediate_size

    def init(rng):
        keys = jax.random.split(rng, 8)

        def lecun(key, shape):
            fan_in = shape[-2]
            return (jax.random.normal(key, shape) / jnp.sqrt(fan_in)).astype(param_dtype)

        def dense(key, fan_in, fan_out, bias):
            d = {"kernel": lecun(key, (L, fan_in, fan_out))}
            if cfg.lora_rank > 0:
                # in-scan LoRA slots (training/lora.insert_lora); zeros = off
                r = cfg.lora_rank
                d["lora_a"] = jnp.zeros((L, fan_in, r), jnp.float32)
                d["lora_b"] = jnp.zeros((L, r, fan_out), jnp.float32)
            if bias:
                d["bias"] = jnp.zeros((L, fan_out), param_dtype)
            return d

        ab = cfg.attention_bias
        return {
            "input_layernorm": {"weight": jnp.ones((L, H), jnp.float32)},
            "post_attention_layernorm": {"weight": jnp.ones((L, H), jnp.float32)},
            "self_attn": {
                "q_proj": dense(keys[0], H, dq, ab),
                "k_proj": dense(keys[1], H, dkv, ab),
                "v_proj": dense(keys[2], H, dkv, ab),
                "o_proj": dense(keys[3], dq, H, False),
            },
            "mlp": {
                "gate_proj": dense(keys[4], H, I, False),
                "up_proj": dense(keys[5], H, I, False),
                "down_proj": dense(keys[6], I, H, False),
            },
        }

    return init


class TextDecoder(nn.Module):
    """Embedding + scanned decoder stack + final norm + LM head."""

    cfg: TextConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.embed_tokens = nn.Embed(c.vocab_size, c.hidden_size, dtype=self.dtype,
                                     param_dtype=self.param_dtype)
        init_fn = _init_layer_stack(c, self.param_dtype)
        if c.weight_quant in ("int8", "int4"):
            from glimpseprune_tpu.quantization import quantize_structure
            _base = init_fn
            _mode = c.weight_quant
            init_fn = lambda rng: quantize_structure(_base(rng), mode=_mode)
        self.layers = self.param("layers", init_fn)
        self.norm_weight = self.param(
            "norm", lambda rng: {"weight": jnp.ones((c.hidden_size,), jnp.float32)}
        )
        if not c.tie_word_embeddings:
            # raw param (not nn.Dense) so the int8/int4 weight tiers cover
            # the head too: the 7B bf16 head is 1.09 GB — the single largest
            # per-decode-step HBM read after the layer stack
            def _head_base(rng):
                k = nn.initializers.lecun_normal()(
                    rng, (c.hidden_size, c.vocab_size)
                ).astype(self.param_dtype)
                return {"kernel": k}

            head_init = _head_base
            if c.weight_quant in ("int8", "int4"):
                from glimpseprune_tpu.quantization import quantize_structure
                _hmode = c.weight_quant
                head_init = lambda rng: quantize_structure(_head_base(rng), mode=_hmode)
            self.lm_head_params = self.param("lm_head", head_init)

    def __call__(self, input_ids, cos, sin, valid):
        x = self.embed(input_ids)
        x, _, _ = self.run_layers(x, cos, sin, valid)
        return self.logits(self.final_norm(x))

    def embed(self, input_ids):
        return self.embed_tokens(input_ids)

    def final_norm(self, x):
        return _rms(x, self.norm_weight["weight"], self.cfg.rms_norm_eps)

    def logits(self, x):
        if self.cfg.tie_word_embeddings:
            return self.embed_tokens.attend(x)
        return _dense(x, self.lm_head_params, self.dtype,
                      self.cfg.act_quant == "int8")

    def chunked_nll(self, x, labels, chunk: int = 512):
        """Shifted next-token mean NLL WITHOUT materializing [B, S, V] logits.

        The 16k-token 7B train step OOMs if the LM loss runs the head over
        the whole sequence: XLA's memory dump shows two bf16
        [1,16448,152064] temps of 4.66 GB each (the head matmul output and
        the one-hot), 9.3 GB of a 21.8 GB total against 15.75 GB of HBM
        (docs/ROUND4.md). Here the head matmul + logsumexp + label gather
        run per C-token chunk under `jax.checkpoint` inside one `lax.scan`:
        the peak temp is a single [B, C, V] f32 chunk (~300 MB at C=512),
        recomputed in the backward pass. Mathematically identical to
        log_softmax + one-hot over the full sequence (reference loss
        semantics: shift + ignore_index=-100 token mean,
        train_qwen_gp.py:1531-1553 via the HF CausalLM loss).

        x: [B, S, H] post-final-norm hidden. labels: [B, S] with -100 pads.
        """
        B, S, H = x.shape
        xs = x[:, :-1]
        ys = labels[:, 1:].astype(jnp.int32)
        s1 = S - 1
        C = min(chunk, s1)
        pad = (-s1) % C
        if pad:
            xs = jnp.pad(xs, ((0, 0), (0, pad), (0, 0)))
            ys = jnp.pad(ys, ((0, 0), (0, pad)), constant_values=-100)
        n = (s1 + pad) // C
        xs = xs.reshape(B, n, C, H).transpose(1, 0, 2, 3)
        ys = ys.reshape(B, n, C).transpose(1, 0, 2)

        head = self._head_fn()

        def chunk_nll(xc, yc):
            lg = head(xc).astype(jnp.float32)
            lse = jax.nn.logsumexp(lg, axis=-1)
            m = yc != -100
            tgt = jnp.take_along_axis(
                lg, jnp.where(m, yc, 0)[..., None], axis=-1
            )[..., 0]
            return ((lse - tgt) * m).sum(), m.sum()

        chunk_nll = jax.checkpoint(chunk_nll)

        def body(carry, inp):
            tot, cnt = carry
            s, m = chunk_nll(*inp)
            return (tot + s, cnt + m), None

        (tot, cnt), _ = jax.lax.scan(
            body, (jnp.float32(0.0), jnp.int32(0)), (xs, ys)
        )
        return tot / jnp.maximum(cnt, 1).astype(jnp.float32)

    def _head_fn(self):
        """Pure closure computing head logits from hidden — usable inside
        lax.scan bodies (no flax module call there)."""
        if self.cfg.tie_word_embeddings:
            table = self.embed_tokens.embedding
            dt = self.dtype

            def head(xc):
                return jnp.dot(xc.astype(dt), table.astype(dt).T)
        else:
            hp = self.lm_head_params
            a8 = self.cfg.act_quant == "int8"
            dt = self.dtype

            def head(xc):
                return _dense(xc, hp, dt, a8)
        return head

    def chunked_token_logprobs(self, x, tokens, chunk: int = 512):
        """[B, T, H] hidden + [B, T] token ids -> [B, T] f32 log p(token),
        never materializing [B, T, V] logits (chunked_nll's memory argument,
        applied to the GRPO teacher-forcing logprob forward — at 7B the
        G=8-generation policy+reference logits would be ~2x 4.6 GB bf16)."""
        B, T, H = x.shape
        C = min(chunk, T)
        pad = (-T) % C
        ys = tokens.astype(jnp.int32)
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
            ys = jnp.pad(ys, ((0, 0), (0, pad)))
        n = (T + pad) // C
        xs = x.reshape(B, n, C, H).transpose(1, 0, 2, 3)
        ys = ys.reshape(B, n, C).transpose(1, 0, 2)
        head = self._head_fn()

        def chunk_lp(xc, yc):
            lg = head(xc).astype(jnp.float32)
            lse = jax.nn.logsumexp(lg, axis=-1)
            tgt = jnp.take_along_axis(lg, yc[..., None], axis=-1)[..., 0]
            return tgt - lse

        chunk_lp = jax.checkpoint(chunk_lp)
        _, out = jax.lax.scan(
            lambda c, inp: (c, chunk_lp(*inp)), None, (xs, ys)
        )
        return out.transpose(1, 0, 2).reshape(B, n * C)[:, :T]

    def run_layers(
        self,
        x: jnp.ndarray,
        cos: jnp.ndarray,
        sin: jnp.ndarray,
        valid: jnp.ndarray,
        layer_start: int = 0,
        layer_end: Optional[int] = None,
        le_vecs: Optional[jnp.ndarray] = None,   # [L_total, le_len, H] projected
        le_offset: Optional[jnp.ndarray] = None,  # [B, S] clipped index into le_len
        le_inside: Optional[jnp.ndarray] = None,  # [B, S] bool
        harvest_layers: Sequence[int] = (),
        q_index: Optional[jnp.ndarray] = None,
        use_attention_logits: bool = False,
        collect_kv: bool = True,
        harvest_q_start: Optional[int] = None,
    ):
        """Run layers [layer_start, layer_end] (inclusive) as one lax.scan.

        le_vecs (when given) are residually added at each layer's entry
        wherever le_inside marks glimpse slots — except layer 0, whose
        glimpse splice already happened at the embedding level (gp_model).
        Returns (x, (kv_k, kv_v) each [n, B, S, Hkv, D] | None,
        harvests {layer_id: [B, S, Hq] postprocessed rows}).

        harvest_q_start (static) switches the harvest to the reference Sep
        model's multi-query extraction (model_sep.py:53-72): harvests become
        {layer_id: [B, S-q_start, S, Hq]} SOFTMAXED rows for every query
        position from q_start on (causal+pad masked). Visualization-scale
        only — the scan additionally emits each layer's full q tensor.
        """
        cfg = self.cfg
        if layer_end is None:
            layer_end = cfg.num_hidden_layers - 1
        n_run = layer_end - layer_start + 1
        b, s, _ = x.shape
        if q_index is None:
            q_index = jnp.full((b,), s - 1, dtype=jnp.int32)

        if le_vecs is not None:
            le_sl = jax.lax.slice_in_dim(le_vecs, layer_start, layer_end + 1, axis=0)
            if layer_start == 0:
                le_sl = le_sl.at[0].set(0.0)
        else:
            le_sl = jnp.zeros((n_run, 1, x.shape[-1]), dtype=x.dtype)
            le_offset = jnp.zeros((b, s), dtype=jnp.int32)
            le_inside = jnp.zeros((b, s), dtype=bool)

        dtype = self.dtype
        layers = self.layers

        # scan over layer INDICES and dynamic-index the stacked params in the
        # body: slicing the stack up front would copy gigabytes of weights
        # per phase (two partial slices at 3B cost ~45ms of HBM traffic)
        emit_queries = harvest_q_start is not None

        def body(carry, scanned):
            xc = carry
            lidx, le_vec = scanned
            pl = jax.tree_util.tree_map(
                lambda a: jax.lax.dynamic_index_in_dim(a, lidx, 0, keepdims=False),
                layers,
            )
            le_rows = le_vec[le_offset]  # [B, S, H]
            xc = xc + jnp.where(le_inside[..., None], le_rows.astype(xc.dtype), 0)
            xc, k, v, sel_q, q = _layer_prefill(cfg, pl, xc, cos, sin, valid, q_index, dtype)
            outs = (k, v, sel_q) + ((q[:, harvest_q_start:],) if emit_queries else ())
            return xc, outs

        if cfg.remat:
            # training: rematerialize each layer in the backward pass instead
            # of storing activations for the full depth — the standard
            # FLOPs-for-HBM trade (3B glimpse train step OOMs at 16GB without)
            body = jax.checkpoint(body)
        layer_idx = jnp.arange(layer_start, layer_end + 1)
        x, outs = jax.lax.scan(body, x, (layer_idx, le_sl))
        ks, vs, sel_qs = outs[:3]

        harvests: Dict[int, jnp.ndarray] = {}
        hq, hkv = cfg.num_attention_heads, cfg.num_key_value_heads
        for lid in harvest_layers:
            li = lid - layer_start
            k_exp = jnp.repeat(ks[li], hq // hkv, axis=2)  # [B, S, Hq, D]
            if emit_queries:
                # Sep-model multi-query rows: softmax(q@K^T) for every query
                # from q_start, causal+pad masked (model_sep.py:53-72)
                qs = outs[3][li]  # [B, n_q, Hq, D]
                raw = jnp.einsum(
                    "bqhd,bthd->bqht", qs, k_exp,
                    preferred_element_type=jnp.float32,
                ) / jnp.sqrt(jnp.float32(cfg.head_dim))
                s = raw.shape[-1]
                qpos = harvest_q_start + jnp.arange(raw.shape[1])
                allowed = (jnp.arange(s)[None, None, :] <= qpos[None, :, None]) & valid[:, None, :]
                raw = jnp.where(allowed[:, :, None, :], raw, -jnp.inf)
                probs = jax.nn.softmax(raw, axis=-1)  # [B, n_q, Hq, S]
                harvests[lid] = probs.transpose(0, 1, 3, 2)  # [B, n_q, S, Hq]
            else:
                raw = jnp.einsum(
                    "bhd,bthd->bht", sel_qs[li], k_exp,
                    preferred_element_type=jnp.float32,
                )
                raw = (raw / jnp.sqrt(jnp.float32(cfg.head_dim))).transpose(0, 2, 1)
                harvests[lid] = harvest_postprocess(raw, valid, use_attention_logits)
        kv = (ks, vs) if collect_kv else None
        return x, kv, harvests

    def decode_step(
        self,
        input_ids: Optional[jnp.ndarray],   # [B, S_new]; None with inputs_embeds
        cos: jnp.ndarray,
        sin: jnp.ndarray,
        k_cache: jnp.ndarray,     # [L, B, T, Hkv, D]
        v_cache: jnp.ndarray,
        kv_valid: jnp.ndarray,    # [B, T] validity incl. the new slots
        write_idx: jnp.ndarray,   # scalar
        inputs_embeds: Optional[jnp.ndarray] = None,  # [B, S_new, H]:
        # pre-scattered embeddings (chunked prefill over image spans)
        logits_last_only: bool = False,
        logits_index: Optional[jnp.ndarray] = None,  # traced chunk slot:
        # run the lm_head on exactly this one slot (chunked prefill)
        new_valid: Optional[jnp.ndarray] = None,  # [B, S_new] chunk-internal
        # key validity (left-padded rows carry pads inside early chunks)
    ):
        """S_new tokens against the cache — the decode hot path (S_new=1,
        32-step scan chunks) AND the chunked-prefill step (S_new=C): the
        read-then-write cache carry, intra-chunk causality, and stale-slot
        masking are the same contract either way (decode_attention k_new
        path). Right-padded rows are safe within a chunk: causal ordering
        keeps real queries ahead of their row's pad keys, and kv_valid
        masks pad slots for every later chunk."""
        cfg = self.cfg
        dtype = self.dtype
        x = self.embed(input_ids) if inputs_embeds is None else inputs_embeds
        L = jax.tree.leaves(k_cache)[0].shape[0]

        def body(carry, scanned):
            xc, kc, vc = carry
            pl, l = scanned
            xc, kc, vc = _layer_decode(
                cfg, pl, l, xc, cos, sin, kc, vc, kv_valid, write_idx, dtype,
                new_valid=new_valid,
            )
            return (xc, kc, vc), None

        (x, k_new, v_new), _ = jax.lax.scan(
            body, (x, k_cache, v_cache), (self.layers, jnp.arange(L))
        )
        x = self.final_norm(x)
        if logits_index is not None:
            # chunked prefill: the full [B, C, V] head matmul per chunk
            # would re-pay the whole-sequence lm_head cost — slice the one
            # needed slot BEFORE the head
            x = jax.lax.dynamic_slice_in_dim(x, logits_index, 1, axis=1)
        elif logits_last_only:
            x = x[:, -1:]
        return self.logits(x), k_new, v_new
