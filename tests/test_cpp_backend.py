"""Native C++ backend vs numpy oracle — the CT-vs-RT agreement test
(SURVEY §5.1 cross-backend bit-exactness)."""

import numpy as np
import pytest

from lol_tpu import numtheory as nt
from lol_tpu.ops import general as gen, ntt
from lol_tpu.tensor import cpp_backend as cpp

Q = nt.ntt_primes(8192, 30, 1)[0]


def test_zq_ops(rng):
    a = rng.integers(0, Q, 1000, dtype=np.uint64).astype(np.uint32)
    b = rng.integers(0, Q, 1000, dtype=np.uint64).astype(np.uint32)
    np.testing.assert_array_equal(
        cpp.zq_mul(a, b, Q), (a.astype(np.uint64) * b % Q).astype(np.uint32)
    )
    np.testing.assert_array_equal(
        cpp.zq_add(a, b, Q), ((a.astype(np.uint64) + b) % Q).astype(np.uint32)
    )


@pytest.mark.parametrize("n", [64, 1024, 4096])
def test_ntt_matches_numpy(n, rng):
    q = nt.ntt_primes(2 * n, 30, 1)[0]
    plan = ntt.ntt_plan(n, q)
    x = rng.integers(0, q, (3, n), dtype=np.uint64).astype(np.uint32)
    np.testing.assert_array_equal(
        cpp.ntt_forward(x, plan), ntt.np_ntt_forward(x, plan)
    )
    np.testing.assert_array_equal(
        cpp.ntt_inverse(x, plan), ntt.np_ntt_inverse(x, plan)
    )
    np.testing.assert_array_equal(
        cpp.ntt_inverse(cpp.ntt_forward(x, plan), plan), x
    )


def test_axis_matvec_matches(rng):
    q = nt.ntt_primes(63, 30, 1)[0]
    plan = gen.general_plan(9, q)
    M = plan.axes[0].M  # phi(9) = 6 dense CRT matrix
    x = rng.integers(0, q, (5, 6), dtype=np.uint64).astype(np.uint32)
    import jax.numpy as jnp

    want = np.asarray(gen.matvec_mod_jnp(jnp.asarray(M), jnp.asarray(x), q))
    np.testing.assert_array_equal(cpp.axis_matvec(M, x, q), want)


def test_axis_matvec_large_phi_lazy_reduction(rng):
    # exercise the every-16-lazy-reduction path with phi > 16
    q = (1 << 30) - 35
    phi = 40
    M = rng.integers(0, q, (phi, phi), dtype=np.uint64).astype(np.uint32)
    x = rng.integers(0, q, (2, phi), dtype=np.uint64).astype(np.uint32)
    want = np.stack([
        np.array([sum(int(M[i, j]) * int(x[b, j]) for j in range(phi)) % q
                  for i in range(phi)], dtype=np.uint32)
        for b in range(2)
    ])
    np.testing.assert_array_equal(cpp.axis_matvec(M, x, q), want)


def test_l_and_g_match_jnp(rng):
    import jax.numpy as jnp

    q = nt.ntt_primes(63, 30, 1)[0]
    plan = gen.general_plan(9, q)  # p=3, e=2: (p-1)=2 level, inner=3
    x = rng.integers(0, q, (4, 6), dtype=np.uint64).astype(np.uint32)
    want_l = np.asarray(gen.l(plan, jnp.asarray(x)))
    np.testing.assert_array_equal(cpp.l_fwd(x, 3, 3, q), want_l)
    np.testing.assert_array_equal(cpp.l_inv(want_l, 3, 3, q), x)
    want_g = np.asarray(gen.mul_g_pow(plan, jnp.asarray(x)))
    np.testing.assert_array_equal(cpp.mul_g_pow(x, 3, 3, q), want_g)


def test_gsq_norm(rng):
    n = 64
    x = rng.integers(0, Q, (2, n), dtype=np.uint64).astype(np.uint32)
    got = cpp.gsq_norm_pow2(x, Q)
    lifted = x.astype(np.int64)
    lifted = np.where(lifted >= (Q + 1) // 2, lifted - Q, lifted)
    want = (lifted.astype(np.float64) ** 2).sum(axis=1)
    np.testing.assert_allclose(got, want)


def test_div_g_and_dec_basis_g(rng):
    """divG pow/dec + mulG dec vs the plan oracle (VERDICT r1 #8)."""
    import jax.numpy as jnp

    q = nt.ntt_primes(63, 30, 1)[0]
    plan = gen.general_plan(9, q)
    x = rng.integers(0, q, (4, 6), dtype=np.uint64).astype(np.uint32)
    xj = jnp.asarray(x)
    np.testing.assert_array_equal(
        cpp.div_g_pow(x, 3, 3, q), np.asarray(gen.div_g_pow(plan, xj))
    )
    np.testing.assert_array_equal(
        cpp.div_g_pow(cpp.mul_g_pow(x, 3, 3, q), 3, 3, q), x
    )
    np.testing.assert_array_equal(
        cpp.mul_g_dec(x, 3, 3, q), np.asarray(gen.mul_g_dec(plan, xj))
    )
    np.testing.assert_array_equal(
        cpp.div_g_dec(x, 3, 3, q), np.asarray(gen.div_g_dec(plan, xj))
    )


@pytest.mark.parametrize("m_sub,m_sup", [(16, 64), (12, 36), (6, 18)])
def test_twace_embed_cpp(m_sub, m_sup, rng):
    import jax.numpy as jnp
    from lol_tpu.factored import fact

    q = nt.ntt_primes(int(np.lcm(m_sub, m_sup)), 30, 1)[0]
    n_sub, n_sup = fact(m_sub).phi, fact(m_sup).phi
    xs = rng.integers(0, q, (3, n_sub), dtype=np.uint64).astype(np.uint32)
    xS = rng.integers(0, q, (3, n_sup), dtype=np.uint64).astype(np.uint32)
    np.testing.assert_array_equal(
        cpp.embed_pow(xs, m_sub, m_sup, q),
        np.asarray(gen.embed_pow(m_sub, m_sup, jnp.asarray(xs))),
    )
    np.testing.assert_array_equal(
        cpp.twace_pow(xS, m_sub, m_sup, q),
        np.asarray(gen.twace_pow(m_sub, m_sup, jnp.asarray(xS))),
    )
    np.testing.assert_array_equal(
        cpp.embed_crt(xs, m_sub, m_sup, q),
        np.asarray(gen.embed_crt(m_sub, m_sup, q, jnp.asarray(xs))),
    )
    np.testing.assert_array_equal(
        cpp.twace_crt(xS, m_sub, m_sup, q),
        np.asarray(gen.twace_crt(m_sub, m_sup, q, jnp.asarray(xS))),
    )
    np.testing.assert_array_equal(
        cpp.coeffs_rel(xS, m_sub, m_sup),
        np.asarray(gen.coeffs_rel(m_sub, m_sup, jnp.asarray(xS))),
    )


def test_gsq_norm_gram_cpp(rng):
    from lol_tpu.cyc import Cyc, Rep
    from lol_tpu.ring import ring_context

    m = 36
    qs = tuple(nt.ntt_primes(m, 30, 1))
    ctx = ring_context(m, qs)
    x = rng.integers(-1000, 1000, (3, ctx.n))
    got = cpp.gsq_norm_gram(x, m)
    for b in range(3):
        want = Cyc.from_ints(ctx, x[b], rep=Rep.DEC).gsq_norm()
        assert float(np.atleast_1d(want)[0]) == got[b]
