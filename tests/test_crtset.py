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
