"""Cyc-layer algebraic identities — Lol CycTests/TensorTests analog (SURVEY §5.1)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lol_tpu import numtheory as nt, sampling
from lol_tpu.cyc import Cyc, Rep
from lol_tpu.ops import ntt
from lol_tpu.ring import ring_context
import lol_tpu.ring as rg

QS = tuple(nt.ntt_primes(512, 30, 3))
CTX = ring_context(256 * 2, QS)  # m=512, n=256
CTX1 = ring_context(512, QS[:1])


def rand_cyc(rng, ctx, rep=Rep.POW):
    ints = rng.integers(-1000, 1000, ctx.n)
    return Cyc.from_ints(ctx, ints, rep), ints


def test_ring_laws(rng):
    a, _ = rand_cyc(rng, CTX)
    b, _ = rand_cyc(rng, CTX)
    c, _ = rand_cyc(rng, CTX)
    assert (a + b) == (b + a)
    assert ((a + b) + c) == (a + (b + c))
    assert (a * b) == (b * a)
    assert (a * (b + c)) == (a * b + a * c)
    one = Cyc.scalar(CTX, 1)
    assert (a * one).to_pow() == a
    assert (a - a) == Cyc.zero(CTX)


def test_mul_matches_schoolbook(rng):
    ctx = ring_context(32, QS[:2])  # n = 16
    a_ints = rng.integers(-50, 50, ctx.n)
    b_ints = rng.integers(-50, 50, ctx.n)
    a = Cyc.from_ints(ctx, a_ints)
    b = Cyc.from_ints(ctx, b_ints)
    prod = (a * b).to_pow()
    for i, q in enumerate(ctx.basis.qs):
        want = ntt.np_negacyclic_mul_schoolbook(
            (a_ints % q).astype(np.uint32), (b_ints % q).astype(np.uint32), q
        )
        np.testing.assert_array_equal(np.asarray(prod.data)[i], want)


def test_rep_roundtrips(rng):
    a, _ = rand_cyc(rng, CTX)
    assert a.to_crt().to_pow() == a
    assert a.to_dec().to_pow() == a
    assert a.to_crt().to_dec().to_crt().to_pow() == a


def test_scalar_and_int_ops(rng):
    a, _ = rand_cyc(rng, CTX)
    assert (a + 5) - 5 == a
    assert a * 3 == a + a + a


def test_lift_reduce_roundtrip(rng):
    a_ints = rng.integers(-1000, 1000, CTX.n)
    a = Cyc.from_ints(CTX, a_ints)
    lifted = a.lift_ints()
    np.testing.assert_array_equal(
        np.array([int(v) for v in lifted]), a_ints
    )


def test_embed_twace_identity(rng):
    sub = ring_context(64, QS)
    a, _ = rand_cyc(rng, sub)
    emb = a.embed(CTX)
    back = emb.twace(sub)
    assert back == a
    # CRT-basis embed agrees with POW-basis embed
    emb_crt = a.to_crt().embed(CTX)
    assert emb_crt.to_pow() == emb.to_pow()
    # CRT twace of CRT embed is identity too
    assert emb_crt.twace(sub).to_pow() == a


def test_embed_is_ring_hom(rng):
    sub = ring_context(64, QS)
    a, _ = rand_cyc(rng, sub)
    b, _ = rand_cyc(rng, sub)
    assert (a * b).embed(CTX).to_pow() == (a.embed(CTX) * b.embed(CTX)).to_pow()
    assert (a + b).embed(CTX).to_pow() == (a.embed(CTX) + b.embed(CTX)).to_pow()


def test_twace_embed_tower_compat():
    # canonical plan roots are tower-compatible: psi_{2n}^d == psi_{2n'}
    q = QS[0]
    p_big = ntt.ntt_plan(256, q)
    p_small = ntt.ntt_plan(32, q)
    assert pow(p_big.psi, 256 // 32, q) == p_small.psi


def test_coeffs_reconstruction(rng):
    sub = ring_context(64, QS)
    a, _ = rand_cyc(rng, CTX)
    cs = a.coeffs(sub)
    assert len(cs) == CTX.n // sub.n
    # x == sum_i x^i * embed(coeff_i)
    acc = Cyc.zero(CTX)
    for i, ci in enumerate(cs):
        mono = np.zeros(CTX.n, dtype=np.int64)
        mono[i] = 1
        acc = acc + Cyc.from_ints(CTX, mono) * ci.embed(CTX)
    assert acc.to_pow() == a.to_pow()


def test_twace_of_embed_product(rng):
    # twace(embed(a) * b) == a * twace(b)  (Tw is an R_{m'}-module map)
    sub = ring_context(64, QS)
    a, _ = rand_cyc(rng, sub)
    b, _ = rand_cyc(rng, CTX)
    lhs = (a.embed(CTX) * b).twace(sub)
    rhs = a * b.twace(sub)
    assert lhs.to_pow() == rhs.to_pow()


def test_uniform_and_gaussian_deterministic():
    key = jax.random.PRNGKey(7)
    u1 = sampling.uniform(CTX, key)
    u2 = sampling.uniform(CTX, key)
    assert u1 == u2
    g1 = sampling.gaussian_cyc(CTX, key, 9.0)
    g2 = sampling.gaussian_cyc(CTX, key, 9.0)
    assert g1 == g2
    ints = np.asarray(sampling.gaussian_dec_ints(CTX, key, 9.0))
    assert abs(float(np.mean(ints))) < 2.0
    assert 1.0 < float(np.std(ints)) < 6.0


def test_cross_ring_op_rejected(rng):
    a, _ = rand_cyc(rng, CTX)
    b, _ = rand_cyc(rng, ring_context(64, QS))
    with pytest.raises(ValueError):
        _ = a + b


def test_rescale_cyc(rng):
    a_ints = rng.integers(-10**6, 10**6, CTX.n)
    a = Cyc.from_ints(CTX, a_ints)
    r = a.rescale_drop_last()
    assert r.ctx.basis.qs == QS[:-1]
    ql = QS[-1]
    lifted = r.lift_ints()
    for got, v in zip(lifted, a_ints):
        want = (int(v) - _centered(int(v), ql)) // ql
        assert int(got) == want


def _centered(v, q):
    r = v % q
    return r - q if r >= (q + 1) // 2 else r


def test_rescale_cyc_dec_basis(rng):
    """rescale_drop_last(rep=DEC): rounding happens on DECODING-basis
    coefficients (Lol's RescaleCyc D instance).  Defining property per
    coefficient: ql * c' = c - r with r's dec coefficients centered mod
    ql.  For 2-power m it coincides with the POW variant."""
    from lol_tpu import numtheory as nt

    # general m: POW and DEC rounding genuinely differ
    m = 36
    qs = tuple(nt.ntt_primes(m, 30, 2))
    ctx = ring_context(m, qs)
    ql = qs[-1]
    a_ints = rng.integers(-10**6, 10**6, ctx.n)
    a = Cyc.from_ints(ctx, a_ints, rep=Rep.DEC)
    r = a.rescale_drop_last(rep=Rep.DEC)
    assert r.rep is Rep.DEC and r.ctx.basis.qs == qs[:-1]
    lifted = r.lift_ints(rep=Rep.DEC)
    for got, v in zip(lifted, a_ints):
        want = (int(v) - _centered(int(v), ql)) // ql
        assert int(got) == want
    # 2-power: both variants agree (bases coincide)
    a2_ints = rng.integers(-10**6, 10**6, CTX.n)
    a2 = Cyc.from_ints(CTX, a2_ints)
    np.testing.assert_array_equal(
        a2.rescale_drop_last().data, a2.rescale_drop_last(rep=Rep.DEC).data
    )


# ---------------------------------------------------------------------------
# E-route multiplication (Lol UCyc rep E / CRTEmbed) for CRT-less moduli
# ---------------------------------------------------------------------------


def test_e_route_mul_matches_negacyclic_oracle(rng):
    """Multiplication in R_{2^k} (no CRT basis) via the exact aux-chain
    embedding equals the schoolbook negacyclic product."""
    from lol_tpu import she

    ctx = ring_context(16, (8,))
    assert not ctx.has_crt()
    params = she.SHEParams(m=16, p=8, qs=(97,), var=1.0)  # pt_mul helper
    for _ in range(5):
        a = rng.integers(0, 8, 8)
        b = rng.integers(0, 8, 8)
        got = (Cyc.from_ints(ctx, a) * Cyc.from_ints(ctx, b)).lift_ints(
            rep=Rep.POW) % 8
        np.testing.assert_array_equal(got, she.pt_mul(params, a, b))


def test_e_route_mul_general_m_ring_laws(rng):
    """R_9 over m=12 (CRT-less): distributivity and commutativity of the
    E-route product."""
    ctx = ring_context(12, (9,))
    assert not ctx.has_crt()
    a = Cyc.from_ints(ctx, rng.integers(0, 9, ctx.n))
    b = Cyc.from_ints(ctx, rng.integers(0, 9, ctx.n))
    c = Cyc.from_ints(ctx, rng.integers(0, 9, ctx.n))
    lhs = (a * (b + c)).lift_ints(rep=Rep.POW) % 9
    rhs = (a * b + a * c).lift_ints(rep=Rep.POW) % 9
    np.testing.assert_array_equal(lhs, rhs)
    np.testing.assert_array_equal(
        (a * b).lift_ints(rep=Rep.POW) % 9, (b * a).lift_ints(rep=Rep.POW) % 9
    )
