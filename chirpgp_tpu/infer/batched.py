"""Batched channels-first square-root filters/smoothers -- the
high-throughput Monte-Carlo path.

Layout is everything on TPU: these kernels carry the Monte-Carlo batch on
the LAST axis so it rides the 128-wide lane dimension of the (8, 128) VPU
tiles, with the tiny state/sigma structure in sublanes.  Against the
``vmap``-over-leading-axis formulation of ``chirpgp_tpu.infer.sqrt`` this
measures ~3x at B=1024 and ~4x at B=4096 on TPU v5e (where leading-batch
layouts leave the lanes 97% idle for d=4).

All math is identical to the sqrt module: sigma-point prediction,
Householder triangularization (explicit reflections), 1-D QR measurement
update, joint-factor smoother gain.  Shapes: states ``(d, B)``, factors
``(d, d, B)``, sigma tensors ``(S, d, B)``.
"""

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from chirpgp_tpu.infer.sqrt import _require_nonneg_weights
from chirpgp_tpu.models.transitions import Transition, as_transition
from chirpgp_tpu.quad.sigma_points import SigmaPoints

__all__ = ["tria_cf", "sqrt_sgp_filter_batched", "sqrt_sgp_smoother_batched",
           "gaussian_expectation_batched"]

_LOG_2PI = math.log(2.0 * math.pi)


def tria_cf(M: jnp.ndarray) -> jnp.ndarray:
    """Channels-first Householder triangularization.

    ``M``: (n, d, B) -> upper R (d, d, B) with ``R^T R = M^T M`` per lane.
    """
    n, d = M.shape[0], M.shape[1]
    for j in range(d):
        x = M[j:, j, :]                                   # (n-j, B)
        norm = jnp.sqrt(jnp.sum(x * x, axis=0, keepdims=True))
        sign = jnp.where(x[:1] >= 0, 1.0, -1.0)
        alpha = -sign * norm                              # (1, B)
        v = x.at[0].add(-alpha[0])
        vn2 = jnp.sum(v * v, axis=0, keepdims=True)
        beta = jnp.where(vn2 > 1e-30,
                         2.0 / jnp.where(vn2 > 1e-30, vn2, 1.0), 0.0)
        sub = M[j:, j:, :]                                # (n-j, d-j, B)
        wv = jnp.einsum("nb,nkb->kb", v, sub)
        sub = sub - beta[None] * v[:, None, :] * wv[None]
        # j == 0 updates the whole array (avoids an empty-index scatter
        # constant that Pallas kernels cannot capture).
        M = sub if j == 0 else M.at[j:, j:, :].set(sub)
    R = M[:d]
    # Zero strictly-lower entries (per-lane triu).
    tri = jnp.tril(jnp.ones((d, d), M.dtype), k=-1)
    return R * (1.0 - tri)[:, :, None]


def _predict_cf(trans: Transition, sgps: SigmaPoints, dt, m, L, LqT):
    """Sigma-point sqrt prediction, channels-first.

    m (d, B), L (d, d, B) lower; returns mp (d, B), Up (d, d, B) upper,
    and the propagated deviations for smoother reuse.
    """
    xi = jnp.asarray(sgps.xi, m.dtype)                    # (S, d)
    w = jnp.asarray(sgps.w, m.dtype)                      # (S,)
    sw = jnp.sqrt(w)
    chi = m[None] + jnp.einsum("sj,ijb->sib", xi, L)      # (S, d, B)
    mu = trans.mean_channels_first(chi, dt)               # (S, d, B)
    mp = jnp.einsum("s,sib->ib", w, mu)
    dev = sw[:, None, None] * (mu - mp[None])             # (S, d, B)
    Up = tria_cf(jnp.concatenate([dev, LqT], axis=0))
    return mp, Up, chi, mu, dev


def _update_cf(mp, Up, h_idx: int, sqrt_Xi, y):
    """1-D measurement update, channels-first, for a one-hot measurement
    vector selecting state component ``h_idx`` (the chirp family's H).

    y: (B,).  Returns mf (d, B), Lf (d, d, B) lower, nll increment (B,).
    """
    d, B = mp.shape
    UpH = Up[:, h_idx, :]                                 # (d, B)
    top = jnp.concatenate(
        [jnp.full((1, 1, B), sqrt_Xi, mp.dtype),
         jnp.zeros((1, d, B), mp.dtype)], axis=1)
    bottom = jnp.concatenate([UpH[:, None, :], Up], axis=1)
    R = tria_cf(jnp.concatenate([top, bottom], axis=0))   # (1+d, 1+d, B)
    sS = R[0, 0, :]                                       # (B,)
    wg = R[0, 1:, :]                                      # (d, B)
    Uf = R[1:, 1:, :]
    innov = y - mp[h_idx]
    mf = mp + wg * (innov / sS)[None]
    Lf = jnp.swapaxes(Uf, 0, 1)                           # lower
    nll_inc = 0.5 * (_LOG_2PI + jnp.log(sS * sS) + innov ** 2 / (sS * sS))
    return mf, Lf, nll_inc


def _one_hot_index(H) -> int:
    import numpy as np
    h = np.asarray(H)
    nz = np.nonzero(h)[0]
    if len(nz) != 1 or abs(h[nz[0]] - 1.0) > 0:
        raise ValueError(
            "batched kernels require a one-hot measurement vector H "
            f"(got {h}); use the unbatched filters for general H.")
    return int(nz[0])


def sqrt_sgp_filter_batched(cond_m_cov, sgps: SigmaPoints, H, Xi,
                            m0, P0, dt, yss) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched sqrt sigma-point filter.

    ``yss``: (B, T) measurement sequences.  Returns mfs (T, d, B),
    Lfs (T, d, d, B), nll (T, B) cumulative.
    """
    _require_nonneg_weights(sgps, "sqrt_sgp_filter_batched")
    trans = as_transition(cond_m_cov)
    h_idx = _one_hot_index(H)
    B, T = yss.shape
    dtype = yss.dtype
    d = m0.shape[-1]

    sqrt_Xi = jnp.sqrt(jnp.asarray(Xi, dtype))
    L0 = jnp.linalg.cholesky(P0).astype(dtype)
    Lq = jnp.linalg.cholesky(trans.cov_const(dt)).astype(dtype)
    LqT = jnp.broadcast_to(Lq.T[:, :, None], (d, d, B))
    m_init = jnp.broadcast_to(m0.astype(dtype)[:, None], (d, B))
    L_init = jnp.broadcast_to(L0[:, :, None], (d, d, B))

    ys_t = yss.T                                          # (T, B)

    def step(carry, y):
        m, L, nll = carry
        mp, Up, _, _, _ = _predict_cf(trans, sgps, dt, m, L, LqT)
        mf, Lf, inc = _update_cf(mp, Up, h_idx, sqrt_Xi, y)
        nll = nll + inc
        return (mf, Lf, nll), (mf, Lf, nll)

    init = (m_init, L_init, jnp.zeros((B,), dtype))
    _, (mfs, Lfs, nlls) = jax.lax.scan(step, init, ys_t)
    return mfs, Lfs, nlls


def sqrt_sgp_smoother_batched(cond_m_cov, sgps: SigmaPoints, mfs, Lfs,
                              dt) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched sqrt sigma-point smoother over the batched filter output.

    Returns mss (T, d, B), Lss (T, d, d, B).
    """
    _require_nonneg_weights(sgps, "sqrt_sgp_smoother_batched")
    trans = as_transition(cond_m_cov)
    T, d, B = mfs.shape
    dtype = mfs.dtype
    xi = jnp.asarray(sgps.xi, dtype)
    w = jnp.asarray(sgps.w, dtype)
    sw = jnp.sqrt(w)
    Lq = jnp.linalg.cholesky(trans.cov_const(dt)).astype(dtype)
    LqT = jnp.broadcast_to(Lq.T[:, :, None], (d, d, B))

    def step(carry, elem):
        ms, Ls = carry
        mf, Lf = elem
        chi = mf[None] + jnp.einsum("sj,ijb->sib", xi, Lf)
        mu = trans.mean_channels_first(chi, dt)
        mp = jnp.einsum("s,sib->ib", w, mu)
        dev_pred = sw[:, None, None] * (mu - mp[None])
        dev_prev = sw[:, None, None] * (chi - mf[None])
        M = jnp.concatenate([
            jnp.concatenate([dev_pred, dev_prev], axis=1),
            jnp.concatenate([LqT, jnp.zeros((d, d, B), dtype)], axis=1),
        ], axis=0)                                        # (S+d, 2d, B)
        R = tria_cf(M)                                    # (2d, 2d, B)
        R11, R12, R22 = R[:d, :d], R[:d, d:], R[d:, d:]
        # G = (R11^{-1} R12)^T per lane: back-substitution, unrolled.
        X = jnp.zeros_like(R12)                           # R11 X = R12
        for i in range(d - 1, -1, -1):
            acc = R12[i]
            for k in range(i + 1, d):
                acc = acc - R11[i, k][None] * X[k]
            X = X.at[i].set(acc / R11[i, i][None])
        G = jnp.swapaxes(X, 0, 1)                         # (d, d, B)
        ms = mf + jnp.einsum("ijb,jb->ib", G, ms - mp)
        GLs = jnp.einsum("ijb,jkb->ikb", G, Ls)
        Ls = jnp.swapaxes(
            tria_cf(jnp.concatenate([jnp.swapaxes(GLs, 0, 1), R22],
                                    axis=0)), 0, 1)
        return (ms, Ls), (ms, Ls)

    init = (mfs[-1], Lfs[-1])
    _, (mss, Lss) = jax.lax.scan(step, init, (mfs[:-1], Lfs[:-1]),
                                 reverse=True)
    return jnp.concatenate([mss, mfs[-1][None]]), \
        jnp.concatenate([Lss, Lfs[-1][None]])


def gaussian_expectation_batched(ms, stds, func=None, order: int = 10):
    """E[f(V)] for channels-first (T, B) means/stds via Gauss-Hermite."""
    if func is None:
        from chirpgp_tpu.models.bijections import g as func
    from chirpgp_tpu.quad.sigma_points import gauss_hermite
    rule = gauss_hermite(1, order)
    nodes = jnp.asarray(rule.xi[:, 0], ms.dtype)
    ws = jnp.asarray(rule.w, ms.dtype)
    chi = ms[None] + stds[None] * nodes[:, None, None]    # (S, T, B)
    return jnp.einsum("s,stb->tb", ws, func(chi))
