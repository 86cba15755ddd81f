"""DivPrune: greedy max-min diversity selection (training-free).

Reference llava_divprune/model/llava_arch.py:152-172: iteratively add the
token whose minimum cosine *distance* to the already-selected set is largest;
the first pick is the token with the largest nearest-other distance. Fixed
iteration count -> one lax.fori_loop, batched.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def divprune_select(
    features: jnp.ndarray,  # [B, N, D]
    valid: jnp.ndarray,     # [B, N]
    k: int,
) -> jnp.ndarray:
    """Returns keep mask [B, N] with exactly min(k, n_valid) True per row."""
    B, N, _ = features.shape
    f = features.astype(jnp.float32)
    f = f / jnp.maximum(jnp.linalg.norm(f, axis=-1, keepdims=True), 1e-8)
    sim = jnp.einsum("bnd,bmd->bnm", f, f)
    dist = 1.0 - sim  # [B, N, N]

    pair_ok = valid[:, :, None] & valid[:, None, :]
    big = jnp.float32(1e9)
    dist = jnp.where(pair_ok, dist, big)

    # first pick: largest second-smallest column distance (self-distance ~0
    # occupies the smallest slot, matching the reference topk(...,2)[1])
    d_sorted = jnp.sort(dist, axis=1)
    first_scores = jnp.where(valid, d_sorted[:, 1, :], -big)
    first = jnp.argmax(first_scores, axis=-1)  # [B]

    keep = jnp.zeros((B, N), dtype=bool)
    keep = keep.at[jnp.arange(B), first].set(True)
    min_d = dist[jnp.arange(B), first]  # [B, N] distance to selected set

    def body(i, carry):
        keep, min_d = carry
        scores = jnp.where(valid & ~keep, min_d, -big)
        j = jnp.argmax(scores, axis=-1)
        can_add = (i < valid.sum(-1)) & (scores[jnp.arange(B), j] > -big)
        keep = keep.at[jnp.arange(B), j].set(keep[jnp.arange(B), j] | can_add)
        min_d = jnp.minimum(min_d, dist[jnp.arange(B), j])
        return keep, min_d

    keep, _ = jax.lax.fori_loop(1, k, body, (keep, min_d))
    return keep & valid
