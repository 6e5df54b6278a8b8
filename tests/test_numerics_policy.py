"""Regression guard on the package-wide matmul-precision policy.

Round-3's central numerics discovery (PARITY.md r3 §1): XLA's default f32
matmul lowering on TPU is single-pass bfloat16, and the per-step ~1e-3
relative rounding in the d<=8 filter algebra accumulates over the T=3141
sequential scan into estimate-level error (CKFS seed-0 IF RMSE x10 =
0.918 under the default vs 0.776 under "high" vs 0.7762 for the f64
reference).  The fix is the package-default
``jax_default_matmul_precision = "high"`` set on import
(``chirpgp_tpu/__init__.py``).  These tests make reverting that default a
suite failure; the on-TPU accuracy reproduction lives in
``experiments/check_precision_policy.py`` (the TPU lowering cannot be
exercised from the CPU-pinned test suite).
"""

import os
import subprocess
import sys

import jax

import chirpgp_tpu  # noqa: F401  (the import applies the policy)


def test_package_sets_matmul_precision_high():
    # The env override must win when set (it is how benchmarks measure
    # the unfixed default), so assert against the effective expectation.
    expected = os.environ.get("CHIRPGP_TPU_MATMUL_PRECISION", "high")
    assert jax.config.jax_default_matmul_precision == expected


def test_default_is_high_without_env_override():
    """Import the package in a clean subprocess with the override unset:
    the default MUST be "high".  This is the line that fails if someone
    reverts the ``__init__`` default."""
    env = {k: v for k, v in os.environ.items()
           if k != "CHIRPGP_TPU_MATMUL_PRECISION"}
    out = subprocess.run(
        [sys.executable, "-c",
         "import chirpgp_tpu, jax; "
         "print(jax.config.jax_default_matmul_precision)"],
        capture_output=True, text=True, env=env, timeout=120,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert out.returncode == 0, out.stderr
    assert out.stdout.strip().splitlines()[-1] == "high", out.stdout


def test_env_override_respected():
    env = dict(os.environ, CHIRPGP_TPU_MATMUL_PRECISION="highest")
    out = subprocess.run(
        [sys.executable, "-c",
         "import chirpgp_tpu, jax; "
         "print(jax.config.jax_default_matmul_precision)"],
        capture_output=True, text=True, env=env, timeout=120,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert out.returncode == 0, out.stderr
    assert out.stdout.strip().splitlines()[-1] == "highest", out.stdout


def test_solve_small_matches_linalg():
    """Unrolled no-pivot GE == jnp.linalg.solve on the well-conditioned
    batched systems it is specified for (I + PSD@PSD combines)."""
    import numpy as np
    import jax.numpy as jnp
    from chirpgp_tpu.utils.numerics import solve_small

    rng = np.random.default_rng(0)
    for d in (2, 3, 4, 6):
        M = rng.standard_normal((7, d, d))
        C = M @ np.swapaxes(M, -1, -2)          # PSD
        N = rng.standard_normal((7, d, d))
        J = N @ np.swapaxes(N, -1, -2)          # PSD
        A = np.eye(d) + C @ J
        B = rng.standard_normal((7, d, d))
        X = solve_small(jnp.asarray(A), jnp.asarray(B))
        X_ref = np.linalg.solve(A, B)
        np.testing.assert_allclose(np.asarray(X), X_ref,
                                   rtol=1e-9, atol=1e-9)


def test_psd_solve_batched_matches_linalg():
    import numpy as np
    import jax.numpy as jnp
    from chirpgp_tpu.utils.numerics import psd_solve_batched

    rng = np.random.default_rng(1)
    for d in (2, 4, 10):
        M = rng.standard_normal((5, d, d))
        P = M @ np.swapaxes(M, -1, -2) + 0.1 * np.eye(d)
        B = rng.standard_normal((5, d, 3))
        X = psd_solve_batched(jnp.asarray(P), jnp.asarray(B))
        np.testing.assert_allclose(np.asarray(X), np.linalg.solve(P, B),
                                   rtol=1e-8, atol=1e-9)
