"""KH-PRF + HomomPRF — Lol KHPRFTests analog (SURVEY §5.3)."""

import numpy as np
import pytest
import jax

from lol_tpu import gadget as gd
from lol_tpu import linear as lin
from lol_tpu import numtheory as nt
from lol_tpu import prf, she
from lol_tpu.cyc import Cyc, Rep
from lol_tpu.ring import ring_context

Q = nt.ntt_primes(64, 20, 1)[0]  # small PRF modulus
CTX = ring_context(32, (Q,))
SPEC = gd.BaseBGad(8)


def test_tree_shapes():
    for mk in (prf.left_spine, prf.right_spine, prf.balanced):
        t = mk(5)
        assert t.size == 5
    assert prf.leaf().size == 1


@pytest.fixture(scope="module")
def fam():
    return prf.PRFFamily.random(CTX, SPEC, prf.balanced(4), jax.random.PRNGKey(0))


def test_prf_deterministic_and_input_sensitive(fam, rng):
    s = Cyc.from_ints(CTX, rng.integers(-9, 9, CTX.n))
    out1 = prf.prf(fam, s, (0, 1, 1, 0), 2)
    out2 = prf.prf(fam, s, (0, 1, 1, 0), 2)
    np.testing.assert_array_equal(out1, out2)
    out3 = prf.prf(fam, s, (0, 1, 1, 1), 2)
    assert not np.array_equal(out1, out3)
    assert set(np.unique(out1)) <= {0, 1}


def test_prf_key_homomorphic(fam, rng):
    p_out = 2
    s1 = Cyc.from_ints(CTX, rng.integers(-9, 9, CTX.n))
    s2 = Cyc.from_ints(CTX, rng.integers(-9, 9, CTX.n))
    bits = (1, 0, 1, 1)
    f12 = prf.prf(fam, s1 + s2, bits, p_out)
    f1 = prf.prf(fam, s1, bits, p_out)
    f2 = prf.prf(fam, s2, bits, p_out)
    # equal up to +-1 rounding slack per coefficient (mod p_out)
    diff = (f12 - f1 - f2) % p_out
    frac_exact = float(np.mean(diff == 0))
    assert frac_exact > 0.6


def test_incremental_matches_fresh(fam, rng):
    s = Cyc.from_ints(CTX, rng.integers(-9, 9, CTX.n))
    bits = (0, 0, 0, 0)
    base = prf.prf(fam, s, bits, 2)
    fresh = prf.PRFFamily(fam.ctx, fam.spec, fam.tree, fam.a0, fam.a1)
    # gray-code walk: flip one bit at a time; cached family == fresh family
    for flip in (0, 1, 2, 3, 2):
        bits = tuple(b ^ (1 if i == flip else 0) for i, b in enumerate(bits))
        np.testing.assert_array_equal(
            prf.prf(fam, s, bits, 2), prf.prf(fresh, s, bits, 2)
        )
    assert len(fam._cache) > 0


def test_homom_prf_matches_clear(rng):
    # SHE plaintext modulus = PRF modulus p; tower 32 -> 16 (E = 16)
    p = 257
    qs = tuple(nt.ntt_primes(64, 30, 3))
    fam = prf.PRFFamily.random(
        ring_context(32, (p,)), gd.BaseBGad(4), prf.balanced(3),
        jax.random.PRNGKey(1),
    )
    pr = she.SHEParams(m=32, p=p, qs=qs, var=2.0)
    ps = she.SHEParams(m=16, p=p, qs=qs, var=2.0)
    key = jax.random.PRNGKey(2)
    k1, k2, kh, ke = jax.random.split(key, 4)
    sk_r = she.gen_sk(pr, k1)
    sk_s = she.gen_sk(ps, k2)
    hints, sk_out = prf.make_eval_hints(
        fam, [sk_r, sk_s], [32, 16], [16], gd.RnsGad(), kh, p_final=p,
        maps="project",
    )
    # PRF key s as plaintext (dec-encoded)
    s_ints = rng.integers(0, p, 16)
    s_full = np.zeros(16, dtype=np.int64)
    s_full[:] = s_ints
    m_s = np.resize(s_full, pr.ctx.n) % p
    ct_s = she.encrypt(sk_r, m_s, ke)
    bits = (1, 0, 1)
    out_ct = prf.homom_prf_component(fam, hints, ct_s, bits, 0)
    got = she.decrypt(sk_out, out_ct)
    # clear pipeline: same ops on the plaintext
    at0 = fam.a_t(bits)[0]
    a0_pt = np.array(
        [int(v) % p for v in at0.lift_ints(rep=Rep.POW)], dtype=np.int64
    )
    from lol_tpu import linear as lin
    aux = tuple(nt.ntt_primes(64, 30, 3))
    Ra, Sa, Ea = (ring_context(m, aux) for m in (32, 16, 16))
    x = Cyc.from_ints(Ra, m_s, rep=Rep.DEC) * Cyc.from_ints(Ra, _lift_c(a0_pt, p))
    ys = [Cyc.zero(Sa) for _ in range(2)]
    ys[0] = Cyc.scalar(Sa, 1)
    fa = lin.linear_pow(Ea, Ra, Sa, ys)
    want_elt = lin.eval_lin(fa, x)
    want = np.array(
        [int(v) % p for v in want_elt.lift_ints(rep=Rep.DEC)], dtype=np.int64
    )
    np.testing.assert_array_equal(got, want)


def _lift_c(v, p):
    v = np.asarray(v, dtype=np.int64) % p
    return np.where(v >= (p + 1) // 2, v - p, v)


def test_homom_prf_with_homomorphic_rounding(rng):
    """Full reference pipeline: PRF modulus 2^k, tunnel tower 32 -> 2
    (projecting to the scalar output coefficient), then TRUE homomorphic
    rounding (she.pt_round) to Z_2 — decrypts to the same bit as the
    clear pipeline."""
    p = 8
    qs = tuple(nt.ntt_primes(64, 30, 6))
    fam = prf.PRFFamily.random(ring_context(32, (p,)), gd.BaseBGad(2),
                               prf.balanced(3), jax.random.PRNGKey(1))
    pr = she.SHEParams(m=32, p=p, qs=qs, var=2.0)
    ps = she.SHEParams(m=2, p=p, qs=qs, var=2.0)
    k1, k2, kh, ke = jax.random.split(jax.random.PRNGKey(2), 4)
    sk_r = she.gen_sk(pr, k1)
    sk_s = she.gen_sk(ps, k2)
    hints, sk_out = prf.make_eval_hints(fam, [sk_r, sk_s], [32, 2], [2],
                                        gd.RnsGad(), kh, p_final=2,
                                        homomorphic_round=True,
                                        maps="project")
    ctx8r = ring_context(32, (p,))
    ctx8s = ring_context(2, (p,))
    ys = [Cyc.zero(ctx8s) for _ in range(16)]
    ys[0] = Cyc.scalar(ctx8s, 1)
    fa = lin.linear_pow(ctx8s, ctx8r, ctx8s, ys)
    for trial, bits in enumerate([(1, 0, 1), (0, 1, 1), (1, 1, 0)]):
        m_s = rng.integers(0, p, pr.ctx.n).astype(np.int64)
        ct_s = she.encrypt(sk_r, m_s, jax.random.fold_in(ke, trial))
        out_ct = prf.homom_prf_component(fam, hints, ct_s, bits, 0)
        assert out_ct.params.p == 2 and out_ct.params.m == 2
        got = she.decrypt(sk_out, out_ct)
        # clear pipeline in R_8: mul by A_T(x)[0], project, round-half-up
        at0 = fam.a_t(bits)[0]
        a0 = np.array([int(v) % p for v in at0.lift_ints(rep=Rep.POW)],
                      dtype=np.int64)
        a0c = np.where(a0 >= (p + 1) // 2, a0 - p, a0)
        x = Cyc.from_ints(ctx8r, m_s, rep=Rep.DEC) * Cyc.from_ints(ctx8r, a0c)
        v = int(lin.eval_lin(fa, x).lift_ints(rep=Rep.DEC)[0]) % p
        want = ((v + 2) >> 2) & 1
        assert got[0] == want



def test_homom_prf_full_vector_identity_chain(rng):
    """Full ell-vector (VERDICT r1 #6): with an empty tower, every
    component of the homomorphic PRF decrypts to the clear linear phase
    s * A_T(x) — all ell components, exact."""
    p = 257
    qs = tuple(nt.ntt_primes(64, 30, 2))
    fam = prf.PRFFamily.random(ring_context(32, (p,)), gd.BaseBGad(16),
                               prf.balanced(2), jax.random.PRNGKey(7))
    pr = she.SHEParams(m=32, p=p, qs=qs, var=2.0)
    sk = she.gen_sk(pr, jax.random.PRNGKey(8))
    hints = prf.EvalHints(tunnels=(), p_final=p)
    s_ints = rng.integers(0, p, pr.ctx.n).astype(np.int64)
    ct_s = she.encrypt(sk, s_ints, jax.random.PRNGKey(9))
    bits = (1, 0)
    outs = prf.homom_prf(fam, hints, ct_s, bits)
    s_elt = Cyc.from_ints(ring_context(32, (p,)), s_ints, rep=Rep.DEC)
    clear = prf.prf_pre_round(fam, s_elt, bits)
    assert len(outs) == len(clear) == 3  # ell = 3 digits base 16 for Q=257
    for ct_i, v_i in zip(outs, clear):
        got = she.decrypt(sk, ct_i)
        want = np.array([int(c) % p for c in v_i.lift_ints(rep=Rep.DEC)])
        np.testing.assert_array_equal(got, want)


def test_homom_prf_full_vector_slot_maps(rng):
    """Full ell-vector through the CRT-set-derived slot-projection tower
    (VERDICT r1 #6): every component decrypts to the slot map applied to
    the clear linear phase."""
    p = 257
    qs = tuple(nt.ntt_primes(64, 30, 3))
    fam = prf.PRFFamily.random(ring_context(32, (p,)), gd.BaseBGad(16),
                               prf.balanced(2), jax.random.PRNGKey(10))
    pr = she.SHEParams(m=32, p=p, qs=qs, var=2.0)
    ps = she.SHEParams(m=16, p=p, qs=qs, var=2.0)
    k1, k2, kh, ke = jax.random.split(jax.random.PRNGKey(11), 4)
    sk_r = she.gen_sk(pr, k1)
    sk_s = she.gen_sk(ps, k2)
    hints, sk_out = prf.make_eval_hints(
        fam, [sk_r, sk_s], [32, 16], [16], gd.RnsGad(), kh, p_final=p,
        maps="slots",
    )
    s_ints = rng.integers(0, p, pr.ctx.n).astype(np.int64)
    ct_s = she.encrypt(sk_r, s_ints, ke)
    bits = (0, 1)
    outs = prf.homom_prf(fam, hints, ct_s, bits)
    # plaintext-level slot map: the hint's Linear with images reduced mod p
    th = hints.tunnels[0]
    Rp, Sp = ring_context(32, (p,)), ring_context(16, (p,))
    fp = lin.Linear(Sp, Rp, Sp, tuple(
        Cyc.from_ints(Sp, np.array([int(v) % p for v in y.lift_ints(rep=Rep.POW)]))
        for y in th.lin.ys
    ))
    s_elt = Cyc.from_ints(Rp, s_ints, rep=Rep.DEC)
    clear = prf.prf_pre_round(fam, s_elt, bits)
    assert len(outs) == len(clear)
    for ct_i, v_i in zip(outs, clear):
        got = she.decrypt(sk_out, ct_i)
        want_elt = lin.eval_lin(fp, v_i)
        want = np.array([int(c) % p for c in want_elt.lift_ints(rep=Rep.DEC)])
        np.testing.assert_array_equal(got, want)
