"""Pallas TPU kernel: fused square-root sigma-point filter for the chirp
model.

One ``pallas_call`` runs the whole filter: the grid iterates over time
chunks (TPU grids execute sequentially, so the filter carry lives in VMEM
scratch across chunks), and within a chunk a ``fori_loop`` performs the
predict / triangularize / update recursion entirely on-chip -- the
sigma-point intermediates never round-trip HBM.

Mosaic-friendly construction: every tensor the kernel touches is 2-D
``(rows, B)`` with the Monte-Carlo batch on the lane axis -- the state is
``(4, B)``, the Cholesky factor is unrolled to ``(16, B)``, and the
triangularization works on Python lists of 2-D columns with iota row
masks (Mosaic supports only 2-D gathers, and 3-D ``stack``/``at.set``
patterns lower to unsupported ops).  The kernel is specialized to the
chirp LCD transition with concrete (Python float) parameters, since
Pallas kernels cannot capture traced constants.

This is an optional fast path; the XLA batched kernels
(``chirpgp_tpu.infer.batched``) remain the default.  ``available()``
probes whether the kernel compiles on the current backend.  Status: the
kernel is validated against the batched XLA path in interpret mode; on
the current experimental remote-compile TPU backend, Mosaic compilation
of the unrolled reflections exceeds practical limits, so production runs
use the XLA path (which already sustains ~48M filter steps/s/chip).
"""

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from chirpgp_tpu.quad.sigma_points import SigmaPoints

__all__ = ["ghfs_chirp_filter_pallas", "available"]

_LOG_2PI = math.log(2.0 * math.pi)
_TWO_PI = 2.0 * math.pi


def _tria_cols(cols, n: int):
    """Householder triangularization of a matrix given as a list of d
    2-D columns ``(n, B)``.  Returns the list with the R factor in the
    first d rows of each column (rows below d untouched garbage).

    Row masking replaces slicing: the reflection at step j only sees rows
    >= j, and since the reflector is zero on rows < j, updating full
    columns preserves the already-finished R rows automatically.
    """
    d = len(cols)
    B = cols[0].shape[1]
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (n, B), 0)
    for j in range(d):
        active = (row_idx >= j).astype(cols[0].dtype)        # (n, B)
        pivot_row = (row_idx == j).astype(cols[0].dtype)
        x = cols[j] * active
        norm = jnp.sqrt(jnp.sum(x * x, axis=0, keepdims=True))
        xj = jnp.sum(cols[j] * pivot_row, axis=0, keepdims=True)  # (1, B)
        sign = jnp.where(xj >= 0, 1.0, -1.0)
        alpha = -sign * norm
        v = x - alpha * pivot_row
        vn2 = jnp.sum(v * v, axis=0, keepdims=True)
        beta = jnp.where(vn2 > 1e-30,
                         2.0 / jnp.where(vn2 > 1e-30, vn2, 1.0), 0.0)
        for k in range(j, d):
            wk = jnp.sum(v * cols[k], axis=0, keepdims=True)
            cols[k] = cols[k] - beta * v * wk
    return cols


def _row(col, j: int):
    """Extract row j of a 2-D column as (1, B) (static index)."""
    return col[j:j + 1, :]


def ghfs_chirp_filter_pallas(params, Xi, dt, sgps: SigmaPoints, yss,
                             chunk: int = 128, bblock: int = 512,
                             interpret: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused sqrt GHFS filter for the chirp model (d=4, H = e_1).

    Parameters
    ----------
    params : sequence of 6 floats ``[lam, b, delta, ell, sigma, m0_v]``
        (constrained space; concrete values).
    Xi, dt : floats.
    sgps : sigma-point rule for d=4.
    yss : (B, T) float32 measurements; T must be a multiple of ``chunk``
        and B a multiple of ``bblock`` (or smaller than it).
    bblock : lanes per grid step.  The kernel's working set is
        O((S + d) * bblock) floats; blocking the batch axis keeps it a
        few hundred KB of VMEM regardless of B (at B=4096 and GH-3 the
        unblocked working set was ~20 MB -- beyond a v5e core's VMEM,
        which is what broke Mosaic compilation at production shapes in
        round 1).

    Returns ``(mfs (T, 4, B), Lfs (T, 4, 4, B), nll (T, B))`` -- the same
    contract as ``sqrt_sgp_filter_batched``.
    """
    lam, b, delta, ell, sigma, m0_v = [float(v) for v in np.asarray(params)]
    Xi = float(Xi)
    dt = float(dt)
    B, T = yss.shape
    if T % chunk:
        raise ValueError(f"T={T} must be a multiple of chunk={chunk}")
    bblock = min(bblock, B)
    if B % bblock:
        raise ValueError(f"B={B} must be a multiple of bblock={bblock}")
    d = 4
    dtype = yss.dtype
    S = sgps.n_points

    # Model constants, concrete at trace time even under an outer jit.
    with jax.ensure_compile_time_eval():
        from chirpgp_tpu.models.matern import m32_solution, stationary_cov_m32
        from chirpgp_tpu.utils.numerics import ou_variance
        F32 = np.asarray(m32_solution(ell, sigma, dt)[0], np.float64)
        S32 = np.asarray(m32_solution(ell, sigma, dt)[1], np.float64)
        q = float(ou_variance(b, lam, dt))
        P0_sta = np.asarray(stationary_cov_m32(ell, sigma), np.float64)
    Lq = np.zeros((4, 4))
    Lq[0, 0] = Lq[1, 1] = math.sqrt(q)
    Lq[2:, 2:] = np.linalg.cholesky(S32)
    P0 = np.zeros((4, 4))
    P0[:2, :2] = delta * np.eye(2)
    P0[2:, 2:] = P0_sta
    L0 = np.linalg.cholesky(P0)
    decay = math.exp(-lam * dt)
    sqrt_Xi = math.sqrt(Xi)
    F00, F01, F10, F11 = (float(F32[0, 0]), float(F32[0, 1]),
                          float(F32[1, 0]), float(F32[1, 1]))
    LqT = Lq.T  # row r, col i

    xi_cols = np.asarray(sgps.xi, dtype)                    # (S, 4)
    w_in = np.asarray(sgps.w, dtype)[:, None]               # (S, 1)
    sw_in = np.sqrt(np.asarray(sgps.w, dtype))[:, None]     # (S, 1)
    l0_flat = L0.reshape(16, 1).astype(dtype)               # (16, 1)
    m0_col = np.array([0.0, 0.0, m0_v, 0.0],
                      dtype)[:, None]                       # (4, 1)
    lq_cols = LqT.astype(dtype)                             # (4, 4): [:, i]

    Bb = bblock

    def kernel(ys_ref, xi_ref, w_ref, sw_ref, lq_ref, l0_ref, m0_ref,
               mfs_ref, lfs_ref, nll_ref, m_scr, l_scr, nll_scr):
        ones_b = jnp.ones((1, Bb), dtype)

        # Grid order is (batch-block, time-chunk) with time innermost:
        # the filter carry in scratch is re-initialized at the start of
        # each batch block's time sweep.
        @pl.when(pl.program_id(1) == 0)
        def _init():
            m_scr[:] = m0_ref[:] * jnp.ones((d, Bb), dtype)
            l_scr[:] = l0_ref[:] * jnp.ones((16, Bb), dtype)
            nll_scr[:] = jnp.zeros((1, Bb), dtype)

        def body(i, _):
            y = ys_ref[i, :][None, :]                       # (1, Bb)
            xi_c = xi_ref[:]                                # (S, 4)
            w_c = w_ref[:]                                  # (S, 1)
            sw_c = sw_ref[:]                                # (S, 1)

            # State rows and factor rows (all (1, B) / (S, B) 2-D).
            m_rows = [m_scr[i0:i0 + 1, :] for i0 in range(d)]
            L_rows = [[l_scr[4 * i0 + j0:4 * i0 + j0 + 1, :]
                       for j0 in range(d)] for i0 in range(d)]

            # chi_i = m_i + sum_j xi[:, j] L[i, j]   -> (S, B)
            chi = []
            for i0 in range(d):
                acc = m_rows[i0] * jnp.ones((S, 1), dtype)
                for j0 in range(d):
                    acc = acc + xi_c[:, j0:j0 + 1] * L_rows[i0][j0]
                chi.append(acc)

            # Chirp LCD conditional mean.
            wfreq = _TWO_PI * jax.nn.softplus(chi[2])
            c = jnp.cos(dt * wfreq) * decay
            sn = jnp.sin(dt * wfreq) * decay
            mu = [c * chi[0] - sn * chi[1],
                  sn * chi[0] + c * chi[1],
                  F00 * chi[2] + F01 * chi[3],
                  F10 * chi[2] + F11 * chi[3]]

            mp = [jnp.sum(w_c * mu_i, axis=0, keepdims=True)
                  for mu_i in mu]                           # 4 x (1, B)

            # Predict pre-array columns: [sqrt(w)(mu - mp); Lq^T] (S+4, B).
            cols = []
            for i0 in range(d):
                dev = sw_c * (mu[i0] - mp[i0])
                lq_col = lq_ref[:, i0:i0 + 1] * jnp.ones((1, Bb), dtype)
                cols.append(jnp.concatenate([dev, lq_col], axis=0))
            cols = _tria_cols(cols, S + d)
            # Up[r, i] = cols[i][r] for r <= i.

            # Update pre-array (5 columns of (5, B)):
            #   col0 = [sqrt(Xi); Up[:, 1]], col(1+k) = [0; Up[:, k]].
            up_col = lambda i0: jnp.concatenate(
                [_row(cols[i0], r) for r in range(d)], axis=0)  # (4, B)
            zero_b = jnp.zeros((1, Bb), dtype)
            ucols = [jnp.concatenate([sqrt_Xi * ones_b, up_col(1)], axis=0)]
            for k in range(d):
                ucols.append(jnp.concatenate([zero_b, up_col(k)], axis=0))
            ucols = _tria_cols(ucols, 1 + d)
            sS = _row(ucols[0], 0)                          # (1, B)
            innov = y - mp[1]
            ratio = innov / sS
            mf_rows = [mp[k] + _row(ucols[1 + k], 0) * ratio
                       for k in range(d)]
            # Lf = Uf^T: Lf[i, j] = Uf[j, i] = ucols[1+i] row (1+j).
            nll_new = nll_scr[:] + 0.5 * (
                _LOG_2PI + jnp.log(sS * sS) + innov * innov / (sS * sS))

            m_new = jnp.concatenate(mf_rows, axis=0)        # (4, B)
            lf_rows = []
            for i0 in range(d):
                for j0 in range(d):
                    if j0 <= i0:
                        lf_rows.append(_row(ucols[1 + i0], 1 + j0))
                    else:
                        lf_rows.append(zero_b)
            l_new = jnp.concatenate(lf_rows, axis=0)        # (16, B)

            m_scr[:] = m_new
            l_scr[:] = l_new
            nll_scr[:] = nll_new
            mfs_ref[i, :, :] = m_new
            lfs_ref[i, :, :] = l_new
            nll_ref[i, :] = nll_new[0]
            return 0

        jax.lax.fori_loop(0, chunk, body, 0)

    # 2-D grid: batch blocks outer, time chunks inner (TPU grids iterate
    # the LAST axis fastest and sequentially, so the carry scratch is
    # coherent across one batch block's whole time sweep).
    grid = (B // bblock, T // chunk)
    out_shapes = (
        jax.ShapeDtypeStruct((T, d, B), dtype),
        jax.ShapeDtypeStruct((T, 16, B), dtype),
        jax.ShapeDtypeStruct((T, B), dtype),
    )
    mfs, lfs_flat, nll = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((chunk, bblock), lambda bi, ti: (ti, bi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, d), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 1), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 1), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, 1), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 1), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((chunk, d, bblock), lambda bi, ti: (ti, 0, bi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 16, bblock), lambda bi, ti: (ti, 0, bi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, bblock), lambda bi, ti: (ti, bi),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((d, bblock), dtype),
            pltpu.VMEM((16, bblock), dtype),
            pltpu.VMEM((1, bblock), dtype),
        ],
        interpret=interpret,
    )(yss.T, jnp.asarray(xi_cols), jnp.asarray(w_in), jnp.asarray(sw_in),
      jnp.asarray(lq_cols), jnp.asarray(l0_flat), jnp.asarray(m0_col))
    lfs = lfs_flat.reshape(T, d, d, B)
    return mfs, lfs, nll


@functools.lru_cache(maxsize=1)
def available() -> bool:
    """Whether the Pallas filter compiles and runs on the current default
    backend (tiny smoke problem)."""
    try:
        from chirpgp_tpu.quad import gauss_hermite
        rule = gauss_hermite(4, 2)
        yss = jnp.zeros((128, 8), jnp.float32)
        out = ghfs_chirp_filter_pallas(
            (0.1, 0.1, 0.1, 1.0, 1.0, 7.0), 0.1, 1e-3, rule, yss, chunk=8)
        jax.block_until_ready(out[0])
        return bool(jnp.all(jnp.isfinite(out[0])))
    except Exception:
        return False
