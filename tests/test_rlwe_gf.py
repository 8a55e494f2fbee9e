"""RLWE samplers, GF(p^d), ZmStar, RRq — L1/L4 breadth (SURVEY §3.2/§3.5)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lol_tpu import gf, numtheory as nt, rlwe, rrq, sampling, zmstar
from lol_tpu.cyc import Cyc
from lol_tpu.ring import ring_context

QS = tuple(nt.ntt_primes(512, 30, 2))
CTX = ring_context(512, QS)


def test_rlwe_discrete_error_recovery(rng):
    key = jax.random.PRNGKey(0)
    ks, kw = jax.random.split(key)
    s = sampling.gaussian_cyc(CTX, ks, 4.0)
    samp = rlwe.sample_discrete(CTX, s, 9.0, kw)
    e = rlwe.error_term(s, samp)
    mags = [abs(int(v)) for v in e.reshape(-1)]
    assert max(mags) < 30  # ~ 9-sigma of var 9
    assert rlwe.valid_instance(s, samp, bound=CTX.n**2 * 30**2)  # Gram norm ~ n * sum e^2
    assert not rlwe.valid_instance(s, samp, bound=0)


def test_rlwe_continuous_shapes():
    key = jax.random.PRNGKey(1)
    s = sampling.gaussian_cyc(CTX, key, 4.0)
    a, b = rlwe.sample_continuous(CTX, s, 1.0, key)
    assert b.shape == (CTX.n,)
    assert b.dtype == np.float64  # full-precision host coords (VERDICT r1 #7)
    # derived bounds: the actual error passes its own bound, zero doesn't
    e = b - np.array(
        [float(int(v)) for v in (a * s).to_dec().lift_ints()], dtype=np.float64
    )
    bnd = rlwe.gaussian_quad_bound(CTX, 1.0, gram="id", rounded=False)
    assert float(np.sum(e * e)) <= bnd
    assert bnd < 10 * CTX.n  # tight-ish: E[sum e^2] = n*var = n


def test_rlwr_deterministic():
    ctx1 = ring_context(64, QS[:1])
    ctx2 = ring_context(64, (257,))
    key = jax.random.PRNGKey(2)
    s = sampling.gaussian_cyc(ctx1, key, 4.0)
    s1 = rlwe.sample_rlwr(ctx1, ctx2, s, key)
    s2 = rlwe.sample_rlwr(ctx1, ctx2, s, key)
    assert s1.b == s2.b  # rounding is deterministic
    # b is close to (q2/q1) * a*s
    prod = (s1.a * s).to_dec().lift_ints()
    q1, q2 = ctx1.basis.qs[0], 257
    want = np.array([round(int(v) * q2 / q1) % q2 for v in prod])
    got = np.asarray(s1.b.data)[0]
    diff = (got.astype(np.int64) - want) % q2
    assert all(d in (0, 1, q2 - 1) for d in diff)


@pytest.mark.parametrize("p,d", [(2, 1), (2, 4), (3, 2), (5, 3), (257, 2)])
def test_gf_field_laws(p, d, rng):
    def rand():
        return gf.GF.of(p, d, [int(x) for x in rng.integers(0, p, d)])

    a, b, c = rand(), rand(), rand()
    one = gf.GF.one(p, d)
    assert (a + b) * c == a * c + b * c
    assert a * b == b * a
    assert a * one == a
    if any(v != 0 for v in a.cs):
        assert a * a.inv() == one
    # Frobenius is the identity on the prime subfield
    e = gf.GF.of(p, d, [7])
    assert e.frobenius() == e
    # Frobenius^d = id
    x = a
    for _ in range(d):
        x = x.frobenius()
    assert x == a
    assert 0 <= a.trace() < p


def test_zmstar():
    assert zmstar.units(12) == (1, 5, 7, 11)
    assert zmstar.order(12) == 4
    t = zmstar.mul_table(12)
    assert t.shape == (4, 4)
    us = zmstar.units(12)
    assert us[t[1, 2]] == us[1] * us[2] % 12


def test_automorphism_permutes_slots(rng):
    m, q = 36, nt.ntt_primes(36, 30, 1)[0]
    from lol_tpu.ops import general as gen

    plan = gen.general_plan(m, q)
    x = jnp.asarray(rng.integers(0, q, 12, dtype=np.uint64).astype(np.uint32))
    xc = gen.crt(plan, x)
    perm = zmstar.automorphism_slot_perm(m, q, 5)
    # applying sigma_5 then evaluating == permuting evaluations
    assert sorted(perm.tolist()) == list(range(12))


def test_rrq_ops():
    q = 100.0
    x = jnp.asarray([0.0, 49.9, 50.1, 99.0, -70.0])
    r = rrq.reduce(x, q)
    assert float(jnp.max(jnp.abs(r))) <= 50.0
    # additive group: reduce(a+b) == add(reduce a, reduce b)
    a, b = jnp.asarray([60.0]), jnp.asarray([70.0])
    np.testing.assert_allclose(
        np.asarray(rrq.add(rrq.reduce(a, q), rrq.reduce(b, q), q)),
        np.asarray(rrq.reduce(a + b, q)), atol=1e-5,
    )
    np.testing.assert_array_equal(
        np.asarray(rrq.round_to_zq(jnp.asarray([-1.2, 3.6]), 7)),
        np.array([6, 4], dtype=np.uint32),
    )
    # rescale maps 0 to 0 and respects the quotient
    np.testing.assert_allclose(
        np.asarray(rrq.rescale(jnp.asarray([25.0]), 100.0, 10.0)),
        np.array([2.5]), atol=1e-5,
    )
