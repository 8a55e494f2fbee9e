"""The MXU four-step NTT experiment stays bit-exact (DESIGN.md §9).

The perf verdict lives in DESIGN.md; this guards the *correctness* of
the experiment harness (exact stage-matrix extraction + the
class-concatenated int8-limb modular matmul) so the A/B remains
re-runnable in later rounds.
"""

import numpy as np
import jax.numpy as jnp

from lol_tpu import numtheory as nt, zq
from lol_tpu.bench import mxu_ntt
from lol_tpu.ops import ntt


def test_four_step_matches_oracle(rng):
    n, P = 1024, 64
    q = nt.ntt_primes(2 * n, 30, 1)[0]
    plan = ntt.ntt_plan(n, q)
    x = rng.integers(0, q, (n, 64), dtype=np.uint64).astype(np.uint32)
    got = np.asarray(mxu_ntt.mxu_ntt(jnp.asarray(x), plan, P))
    want = ntt.np_ntt_forward(x.T, plan).T
    np.testing.assert_array_equal(got, want)


def test_stage_matrices_compose(rng):
    """M_B[b] @ (M_A @ x)[b] == the full NTT, per block."""
    n, P = 512, 32
    q = nt.ntt_primes(2 * n, 30, 1)[0]
    plan = ntt.ntt_plan(n, q)
    M_A, M_B = mxu_ntt.stage_matrices(plan, P)
    tS = n // P
    x = rng.integers(0, q, (n,), dtype=np.uint64).astype(np.uint32)
    # exact modular matmuls (a plain int64 matmul overflows: P * q^2 > 2^63)
    a = zq.np_matvec_mod(M_A, x.reshape(P, tS), q)
    out = np.stack([
        zq.np_matvec_mod(M_B[b], a[b].astype(np.uint32)[:, None], q)[:, 0]
        for b in range(P)
    ])
    want = ntt.np_ntt_forward(x[None], plan)[0]
    np.testing.assert_array_equal(out.reshape(-1).astype(np.uint32), want)
