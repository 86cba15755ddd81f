"""CDPruner: conditional-DPP greedy MAP selection.

Reference llava_cdpruner/model/llava_arch.py:141-188: kernel =
relevance ⊙ cosine-similarity ⊙ relevance; fast greedy MAP picks the token
with the largest conditional marginal gain (di2s) each step, updating
Cholesky-style residuals (cis). Fixed budget -> lax.fori_loop, batched.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cdpruner_select(
    features: jnp.ndarray,   # [B, N, D] projector outputs (similarity space)
    relevance: jnp.ndarray,  # [B, N] query-relevance scores (higher = keep)
    valid: jnp.ndarray,      # [B, N]
    k: int,
) -> jnp.ndarray:
    """Returns keep mask [B, N] with min(k, n_valid) True per row.

    `relevance` is normalized to [~0, 1] per row (reference min-max with the
    negated CLIP text-image similarity; callers supply whatever relevance
    proxy their tower provides and we normalize identically).
    """
    B, N, _ = features.shape
    f = features.astype(jnp.float32)
    f = f / jnp.maximum(jnp.linalg.norm(f, axis=-1, keepdims=True), 1e-8)
    sim = jnp.einsum("bnd,bmd->bnm", f, f)

    r = relevance.astype(jnp.float32)
    r = jnp.where(valid, r, jnp.nan)
    rmin = jnp.nanmin(r, axis=-1, keepdims=True)
    rmax = jnp.nanmax(r, axis=-1, keepdims=True)
    r = (r - rmin + 1e-6) / jnp.maximum(rmax - rmin, 1e-6)
    r = jnp.where(valid, r, 0.0)

    kernel = r[:, :, None] * sim * r[:, None, :]
    kernel = jnp.where(valid[:, :, None] & valid[:, None, :], kernel, 0.0)

    neg_inf = jnp.float32(-1e30)
    di2s = jnp.diagonal(kernel, axis1=1, axis2=2)
    di2s = jnp.where(valid, di2s, neg_inf)
    cis = jnp.zeros((k, B, N), dtype=jnp.float32)
    keep = jnp.zeros((B, N), dtype=bool)
    barange = jnp.arange(B)

    def body(i, carry):
        cis, di2s, keep = carry
        j = jnp.argmax(di2s, axis=-1)  # [B]
        can_add = di2s[barange, j] > neg_inf / 2
        keep = keep.at[barange, j].set(keep[barange, j] | can_add)

        kj = kernel[barange, j]  # [B, N]
        cj = cis[:, barange, j]  # [k, B]
        proj = jnp.einsum("tb,tbn->bn", cj, cis)
        denom = jnp.sqrt(jnp.maximum(di2s[barange, j], 1e-12))[:, None]
        eis = (kj - proj) / denom
        eis = jnp.where(can_add[:, None], eis, 0.0)
        cis = cis.at[i].set(eis)
        di2s = di2s - jnp.square(eis)
        di2s = di2s.at[barange, j].set(neg_inf)
        return cis, di2s, keep

    _, _, keep = jax.lax.fori_loop(0, k, body, (cis, di2s, keep))
    return keep & valid
