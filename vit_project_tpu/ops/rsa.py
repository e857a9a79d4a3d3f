"""On-device behavioral RSA: RDM construction + Spearman rho with tie handling.

The reference computes this on the host every epoch with numpy + scipy
(behavioral_RSA, new_cvpr_train_behavior_things_pipeline.py:605-654): RDM =
1 - corrcoef(embeddings) with zeroed diagonal, then Spearman rho between the strict
upper triangles of the model RDM and the human triplet RDM.

Here the whole computation is one jitted XLA call, so per-epoch alignment probing
adds no measurable host round-trip. The rank transform handles ties with average
ranks via an O(n^2) pairwise comparison (n = 1128 values for a 48x48 RDM — a single
small VPU-friendly broadcast), and the p-value uses the same t-distribution
approximation as scipy.stats.spearmanr.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp


def rdm_from_embeddings(emb: jax.Array) -> jax.Array:
    """1 - corrcoef over rows of [N, F] embeddings, diagonal zeroed."""
    emb = emb.astype(jnp.float32)
    xc = emb - jnp.mean(emb, axis=1, keepdims=True)
    cov = jnp.dot(xc, xc.T, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    d = jnp.sqrt(jnp.diag(cov))
    corr = cov / (d[:, None] * d[None, :])
    rdm = 1.0 - corr
    n = rdm.shape[0]
    return rdm * (1.0 - jnp.eye(n, dtype=rdm.dtype))


def upper_tri(x: jax.Array) -> jax.Array:
    """Strict upper triangle of a square [N, N] matrix in row-major order
    (matches np.triu_indices_from(k=1))."""
    n = x.shape[0]
    iu = jnp.triu_indices(n, k=1)
    return x[iu]


def rankdata_average(a: jax.Array) -> jax.Array:
    """Average ranks (1-based) with tie handling, matching scipy.stats.rankdata.

    rank_i = #(a_j < a_i) + (#(a_j == a_i) + 1) / 2, computed as one [n, n]
    pairwise broadcast.
    """
    a = a.astype(jnp.float32)
    less = (a[None, :] < a[:, None]).sum(axis=1).astype(jnp.float32)
    equal = (a[None, :] == a[:, None]).sum(axis=1).astype(jnp.float32)
    return less + (equal + 1.0) * 0.5


def _pearson(x: jax.Array, y: jax.Array) -> jax.Array:
    xc = x - jnp.mean(x)
    yc = y - jnp.mean(y)
    return jnp.sum(xc * yc) / jnp.sqrt(jnp.sum(xc * xc) * jnp.sum(yc * yc))


def spearman(x: jax.Array, y: jax.Array):
    """Spearman rho and two-sided t-approximation p-value (scipy-compatible).

    p = 2 * sf_t(|t|, df=n-2) with t = rho * sqrt(df / (1 - rho^2));
    sf_t(t, df) = 0.5 * betainc(df/2, 1/2, df / (df + t^2)) for t >= 0.
    """
    rx = rankdata_average(x)
    ry = rankdata_average(y)
    rho = _pearson(rx, ry)
    n = x.shape[0]
    df = n - 2
    denom = jnp.maximum(1.0 - rho * rho, 1e-12)
    t2 = rho * rho * df / denom
    p = jax.scipy.special.betainc(df / 2.0, 0.5, df / (df + t2))
    p = jnp.where(jnp.abs(rho) >= 1.0, 0.0, p)
    return rho, p


@jax.jit
def behavioral_rsa(embeddings: jax.Array, reference_rdm: jax.Array):
    """Full per-epoch RSA in one device call.

    embeddings: [48, 66] model predictions on the held-out THINGS images (in the
    reference-RDM row order). reference_rdm: [48, 48] human triplet RDM.
    Returns (rho, p_value, model_rdm).
    """
    model_rdm = rdm_from_embeddings(embeddings)
    mv = upper_tri(model_rdm)
    rv = upper_tri(reference_rdm.astype(jnp.float32))
    rho, p = spearman(rv, mv)
    return rho, p, model_rdm
