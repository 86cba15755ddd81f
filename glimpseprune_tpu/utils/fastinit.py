"""Fast host-side random param init for benches and profiling tools.

The exact flax init (jitted threefry on the host CPU) takes 20+ minutes for
the 7B tree on this machine's single core — unusable as a bench default.
Real-weight benches (BENCH_REAL_WEIGHTS, profile_train_step --quant) only
need REALISTIC weight magnitudes so logits/sampling/eos behave like real
serving (the values are random either way; there are no checkpoints in this
environment). This generates the same tree via numpy's PCG:

- shapes come from jax.eval_shape over model.init — zero compute, exact
  tree structure;
- the init law mirrors the model's _init_weights intent
  (gp_model docstrings; reference model_gp.py:910-931): normal(0, fan_in
  ** -0.5) for kernels/embeddings (xavier/lecun-magnitude), zeros for
  biases, ones for norm scales, normal(0, 0.02) for the glimpse
  embeddings, zeros for LoRA slots (adapter off, matching flax init).

Quantized trees are filled DIRECTLY (round 4): when `model` carries int8/
int4 weight declarations (quantize_structure placeholders in its init),
`kernel_q`/`kernel_q4` leaves are drawn from a discretized normal via a
16-bit inverse-CDF table — one uint16 draw + one int8 gather per value, no
fp32 materialization, no quantization pass. `kernel_scale` is the constant
that restores the lecun law (dequantized std == fan_in ** -0.5), which is
exactly what symmetric per-channel quantization of a lecun-normal kernel
produces up to per-channel amax jitter. At 7B this is ~90 s of host work
vs ~40 min for the old generate-fp32 -> cast-bf16 -> quantize chain
(measured r4; the multi-pass chain over ~30 GB was the serving headline's
whole setup cost).

NOT for training convergence runs where matching the shipped init exactly
matters — those keep the flax path (convergence_run --quant default).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

# absmax-to-sigma ratio for the direct quantized draw: a lecun-normal
# kernel column (fan_in ~ 10^3-10^4 draws) has amax ≈ 3.5-4 sigma, so
# symmetric quantization maps sigma to ~qmax/4 integer units.
_AMAX_SIGMAS = 4.0


@lru_cache(maxsize=None)
def _inv_cdf_table(sigma_q: float, qmax: int) -> np.ndarray:
    """65536-entry int8 quantile table of round(N(0, sigma_q)) clipped to
    ±qmax — drawing uniform uint16 indices through it yields an exactly
    discretized normal."""
    from statistics import NormalDist

    nd = NormalDist()
    n = 1 << 16
    vals = np.asarray([nd.inv_cdf((i + 0.5) / n) for i in range(n)])
    return np.clip(np.rint(vals * sigma_q), -qmax, qmax).astype(np.int8)


def _draw_q(rng: np.random.Generator, shape, qmax: int) -> np.ndarray:
    table = _inv_cdf_table(qmax / _AMAX_SIGMAS, qmax)
    return table[rng.integers(0, 1 << 16, size=shape, dtype=np.uint16)]


def device_random_params(model, init_args, out_len, seed: int = 0):
    """On-device analogue of fast_random_params: ONE jitted program draws
    the whole tree (quantized kernels directly as int8) on the accelerator.

    Two wins over generating on the host and device_put-ing (both measured
    round 4):
    - the 7B tree is ~7.2 GB; shipping it through the axon tunnel plus the
      single-core host generation cost minutes, where on-device threefry is
      seconds;
    - a device_put of ~500 separate leaves lands in allocation order and
      FRAGMENTS HBM — the B=48 serving frontier that fits after the compact
      jitted placeholder init OOMed after a leaf-by-leaf device_put. One
      jitted generator allocates exactly like the placeholder-init path.

    Stacked 3-D draws run under lax.map over the layer axis so the f32
    normal temp is one layer's slice, not the 7.6 GB full stack.
    """
    shapes = jax.eval_shape(
        lambda *a: model.init(*a, out_len), *init_args
    )["params"]

    def draw_q(key, shape, qmax, dtype):
        scale = qmax / _AMAX_SIGMAS

        def one(k, shp):
            z = jax.random.normal(k, shp, jnp.float32)
            return jnp.clip(jnp.round(z * scale), -qmax, qmax).astype(dtype)

        if len(shape) >= 3:
            keys = jax.random.split(key, shape[0])
            return jax.lax.map(lambda k: one(k, shape[1:]), keys)
        return one(key, shape)

    def draw_normal(key, shape, std, dtype):
        def one(k, shp):
            return (jax.random.normal(k, shp, jnp.float32) * std).astype(dtype)

        if len(shape) >= 3:
            keys = jax.random.split(key, shape[0])
            return jax.lax.map(lambda k: one(k, shape[1:]), keys)
        return one(key, shape)

    def leaf_key(key, path):
        import zlib

        return jax.random.fold_in(key, zlib.crc32("/".join(path).encode()))

    def gen(key):
        def walk(node, path):
            out = {}
            if "kernel_q" in node:
                qsd, ssd = node["kernel_q"], node["kernel_scale"]
                fan_in = qsd.shape[-2]
                out["kernel_q"] = draw_q(
                    leaf_key(key, path + ("kernel_q",)), qsd.shape, 127,
                    qsd.dtype)
                out["kernel_scale"] = jnp.full(
                    ssd.shape, float(fan_in) ** -0.5 * _AMAX_SIGMAS / 127.0,
                    ssd.dtype)
            if "kernel_q4" in node:
                qsd, ssd = node["kernel_q4"], node["kernel_scale4"]
                fin = 2 * qsd.shape[-2]
                k4 = leaf_key(key, path + ("kernel_q4",))
                lo = draw_q(k4, qsd.shape, 7, jnp.int8)
                hi = draw_q(jax.random.fold_in(k4, 1), qsd.shape, 7, jnp.int8)
                out["kernel_q4"] = ((lo & 0x0F) | (hi << 4)).astype(qsd.dtype)
                out["kernel_scale4"] = jnp.full(
                    ssd.shape, float(fin) ** -0.5 * _AMAX_SIGMAS / 7.0,
                    ssd.dtype)
            for name, sub in node.items():
                if name in ("kernel_q", "kernel_scale", "kernel_q4",
                            "kernel_scale4"):
                    continue
                if isinstance(sub, dict):
                    out[name] = walk(sub, path + (name,))
                    continue
                shape, dtype = tuple(sub.shape), sub.dtype
                k = leaf_key(key, path + (name,))
                if name == "bias" or not shape:
                    out[name] = jnp.zeros(shape, dtype)
                elif name in ("scale", "weight") and len(shape) <= 2:
                    out[name] = jnp.ones(shape, dtype)
                elif name in ("lora_a", "lora_b"):
                    out[name] = jnp.zeros(shape, dtype)
                elif name == "learnable_embeddings":
                    out[name] = draw_normal(k, shape, 0.02, dtype)
                elif len(shape) >= 2:
                    out[name] = draw_normal(
                        k, shape, float(shape[-2]) ** -0.5, dtype)
                else:
                    out[name] = jnp.zeros(shape, dtype)
            return out

        return walk(shapes, ())

    return jax.jit(gen)(jax.random.PRNGKey(seed))


def fast_random_params(model, init_args, out_len, seed: int = 0):
    """Host-generated random params matching model.init's tree/shapes/dtypes.

    `init_args` are the positional args model.init takes (rng first);
    they may be numpy arrays — eval_shape never touches values. Works for
    fp AND quantized (weight_quant="int8"/"int4") model configs.
    """
    shapes = jax.eval_shape(
        lambda *a: model.init(*a, out_len), *init_args
    )["params"]
    rng = np.random.default_rng(seed)

    def leaf(name, sd):
        shape = tuple(sd.shape)
        if name == "bias" or not shape:
            arr = np.zeros(shape, np.float32)
        elif name in ("scale", "weight") and len(shape) <= 2:
            # norm scales: RMSNorm params are named "weight" in this tree
            # (models/layers.py:29; stacked [L, H] in the scan decoders),
            # flax LayerNorm uses "scale"
            arr = np.ones(shape, np.float32)
        elif name in ("lora_a", "lora_b"):
            # flax init zeros these (adapter off) — random values here
            # would silently enable a random low-rank delta
            arr = np.zeros(shape, np.float32)
        elif name == "learnable_embeddings":
            arr = rng.standard_normal(shape, dtype=np.float32) * 0.02
        elif len(shape) >= 2:
            fan_in = shape[-2]
            arr = rng.standard_normal(shape, dtype=np.float32) * (
                float(fan_in) ** -0.5
            )
        else:
            arr = np.zeros(shape, np.float32)
        return jnp.asarray(arr, dtype=sd.dtype)

    def walk(node):
        out = {}
        if "kernel_q" in node:
            qsd, ssd = node["kernel_q"], node["kernel_scale"]
            fan_in = qsd.shape[-2]
            out["kernel_q"] = jnp.asarray(_draw_q(rng, qsd.shape, 127),
                                          dtype=qsd.dtype)
            # constant per-channel scale restoring std = fan_in ** -0.5
            out["kernel_scale"] = jnp.asarray(
                np.full(ssd.shape,
                        float(fan_in) ** -0.5 * _AMAX_SIGMAS / 127.0,
                        np.float32),
                dtype=ssd.dtype,
            )
        if "kernel_q4" in node:
            qsd, ssd = node["kernel_q4"], node["kernel_scale4"]
            fan_in = 2 * qsd.shape[-2]  # block-halves packing (quantization.py)
            q = _draw_q(rng, qsd.shape[:-2] + (fan_in, qsd.shape[-1]), 7)
            lo = q[..., : fan_in // 2, :]
            hi = q[..., fan_in // 2 :, :]
            out["kernel_q4"] = jnp.asarray(
                ((lo & 0x0F) | (hi << 4)).astype(np.int8), dtype=qsd.dtype)
            out["kernel_scale4"] = jnp.asarray(
                np.full(ssd.shape, float(fan_in) ** -0.5 * _AMAX_SIGMAS / 7.0,
                        np.float32),
                dtype=ssd.dtype,
            )
        for name, sub in node.items():
            if name in ("kernel_q", "kernel_scale", "kernel_q4",
                        "kernel_scale4"):
                continue
            out[name] = walk(sub) if isinstance(sub, dict) else leaf(name, sub)
        return out

    return walk(shapes)
