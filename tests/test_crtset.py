"""Hensel-lifted CRT sets (plaintext slot idempotents) — Lol crtSetDec."""

import numpy as np
import pytest

from lol_tpu import crtset
from lol_tpu.cyc import Cyc
from lol_tpu.ring import ring_context


def poly_mulmod(a, b, m, mod):
    phi = list(crtset.cyclotomic_poly(m))
    out = [0] * (len(a) + len(b) - 1)
    for i, ai in enumerate(a):
        if ai:
            for j, bj in enumerate(b):
                out[i + j] = (out[i + j] + ai * bj) % mod
    # reduce mod Phi_m (monic)
    dn = len(phi) - 1
    for i in range(len(out) - 1, dn - 1, -1):
        c = out[i] % mod
        if c:
            for j in range(dn + 1):
                out[i - dn + j] = (out[i - dn + j] - c * phi[j]) % mod
    return [v % mod for v in out[:dn]]


CASES = [(7, 2, 1), (7, 2, 3), (12, 5, 2), (15, 2, 1), (16, 7, 2), (9, 2, 2)]


@pytest.mark.parametrize("m,p,k", CASES)
def test_crt_set_idempotent_system(m, p, k):
    E = crtset.crt_set_powerful(m, p, k)
    mod = p**k
    nslots = crtset.num_slots(m, p)
    assert E.shape[0] == nslots
    d = crtset.slot_degree(m, p)
    from lol_tpu.factored import fact

    assert nslots * d == fact(m).phi
    # idempotency + orthogonality + partition of unity
    total = [0] * E.shape[1]
    for i in range(nslots):
        ei = [int(v) for v in E[i]]
        sq = poly_mulmod(ei, ei, m, mod)
        assert sq == [v % mod for v in ei], f"e_{i} not idempotent mod {mod}"
        for j in range(i + 1, nslots):
            pr = poly_mulmod(ei, [int(v) for v in E[j]], m, mod)
            assert all(v % mod == 0 for v in pr), f"e_{i} e_{j} != 0"
        total = [(a + b) % mod for a, b in zip(total, ei)]
    one = [1] + [0] * (E.shape[1] - 1)
    assert total == one


def test_crt_set_cyc_sum_is_one():
    m, p, k = 12, 5, 2
    es = crtset.crt_set_cyc(m, p, k)
    acc = es[0]
    for e in es[1:]:
        acc = acc + e
    one = Cyc.scalar(ring_context(m, (p**k,)), 1)
    assert acc.to_pow() == one.to_pow()


def test_cyclotomic_poly():
    assert crtset.cyclotomic_poly(1) == (-1, 1)
    assert crtset.cyclotomic_poly(2) == (1, 1)
    assert crtset.cyclotomic_poly(4) == (1, 0, 1)
    assert crtset.cyclotomic_poly(6) == (1, -1, 1)
    assert crtset.cyclotomic_poly(12) == (1, 0, -1, 0, 1)


def test_power_to_powerful_identity_for_prime():
    # for m prime, powerful basis == power basis on exponents < p-1
    T = crtset.power_to_powerful(7)
    np.testing.assert_array_equal(T[:, :6], np.eye(6, dtype=np.int64))
    # zeta^6 = -(1 + zeta + ... + zeta^5)
    np.testing.assert_array_equal(T[:, 6], -np.ones(6, dtype=np.int64))


def test_slot_restriction():
    r = crtset.slot_restriction(3, 21, 2)
    assert r.shape[0] == crtset.num_slots(21, 2)
    assert set(r.tolist()) <= set(range(crtset.num_slots(3, 2)))
    # every sub-slot is covered
    assert set(r.tolist()) == set(range(crtset.num_slots(3, 2)))


def test_power_to_powerful_monomial_identity_multiprime():
    """T must send zeta^exps[t] to basis vector e_t for MULTI-prime m —
    the round-1 table used the CRT-idempotent axis-root convention
    (a hidden Galois twist whenever m/p^e != 1 mod p^e)."""
    from lol_tpu.linear import _powerful_exponents

    for m in (12, 21, 63, 36):
        T = crtset.power_to_powerful(m)
        exps = _powerful_exponents(m)
        for t, a in enumerate(exps):
            e = np.zeros(len(exps), dtype=np.int64)
            e[t] = 1
            np.testing.assert_array_equal(T[:, a], e, err_msg=f"m={m} t={t}")


def test_crt_set_cyc_multiplies_like_slots():
    """crt_set_cyc elements must be idempotent UNDER CYC MULTIPLICATION
    (catches power->powerful convention mismatches that the power-basis
    polynomial tests cannot see)."""
    for m, p, k in [(21, 2, 1), (63, 2, 1), (12, 5, 1)]:
        es = crtset.crt_set_cyc(m, p, k)
        for e in es[:3]:
            assert (e * e).to_pow() == e.to_pow(), (m, p)
        z = es[0] * es[1]
        assert z.to_pow() == Cyc.zero(es[0].ctx).to_pow(), (m, p)


def test_slot_projection_odd_tower_hensel(rng):
    """slot_projection over the 63 -> 21 tower at pk = 4 (Hensel-lifted
    CRT sets): selected-slot values survive the descent."""
    from lol_tpu import linear as lin
    from lol_tpu import numtheory as nt
    from lol_tpu.cyc import Rep

    pk = 4
    qs = tuple(nt.ntt_primes(63, 30, 2))
    R, S = ring_context(63, qs), ring_context(21, qs)
    f = lin.slot_projection(R, S, pk, mode="select")
    cR = crtset.crt_set_cyc(63, 2, k=2)
    cS = crtset.crt_set_cyc(21, 2, k=2)
    restr = crtset.slot_restriction(21, 63, 2)
    Rp, Sp = ring_context(63, (pk,)), ring_context(21, (pk,))
    fp = lin.Linear(Sp, Rp, Sp, tuple(
        Cyc.from_ints(Sp, np.array([int(v) % pk for v in y.lift_ints(rep=Rep.POW)]))
        for y in f.ys))
    vals = rng.integers(0, pk, len(cR))
    x = Cyc.zero(Rp)
    for j, c in enumerate(cR):
        x = x + c * int(vals[j])
    fibers = {}
    for j in range(len(cR)):
        fibers.setdefault(int(restr[j]), []).append(j)
    exp = Cyc.zero(Sp)
    for i, c in enumerate(cS):
        exp = exp + c * int(vals[fibers[i][0]])
    assert lin.eval_lin(fp, x).to_pow() == exp.to_pow()
