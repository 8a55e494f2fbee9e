"""RNS chain + gadget properties — Lol ZqTests decompose/correct analog (SURVEY §5.2)."""

import numpy as np
import pytest
import jax.numpy as jnp

from lol_tpu import gadget as gd
from lol_tpu import numtheory as nt
from lol_tpu.rns import rns_basis

QS3 = tuple(nt.ntt_primes(8192, 30, 3))
B1 = rns_basis(QS3[:1])
B3 = rns_basis(QS3)


def rand_rns(rng, basis, n=64, shape=()):
    return np.stack(
        [rng.integers(0, q, (*shape, n), dtype=np.uint64).astype(np.uint32) for q in basis.qs],
        axis=-2,
    )


def test_rns_roundtrip(rng):
    xs = [int(x) for x in rng.integers(0, 2**60, 20, dtype=np.uint64)]
    r = B3.to_rns(np.array(xs, dtype=object))
    back = B3.from_rns(r)
    assert [int(b) % B3.modulus for b in back] == [x % B3.modulus for x in xs]


def test_lift_centered():
    Q = B3.modulus
    vals = np.array([0, 1, Q - 1, Q // 2, Q // 2 + 1], dtype=object)
    r = B3.to_rns(vals)
    lifted = B3.lift_centered(r)
    for v, l in zip(vals, lifted):
        assert (int(l) - int(v)) % Q == 0
        assert -Q // 2 - 1 <= int(l) < (Q + 1) // 2


def test_rns_arith(rng):
    a = rand_rns(rng, B3)
    b = rand_rns(rng, B3)
    ja, jb = jnp.asarray(a), jnp.asarray(b)
    A = np.array(B3.from_rns(np.moveaxis(a, -2, 0)), dtype=object)
    Bv = np.array(B3.from_rns(np.moveaxis(b, -2, 0)), dtype=object)
    Q = B3.modulus
    got = np.array(B3.from_rns(np.moveaxis(np.asarray(B3.mul(ja, jb)), -2, 0)), dtype=object)
    assert all(int(g) == int(x) * int(y) % Q for g, x, y in zip(got, A, Bv))
    got = np.array(B3.from_rns(np.moveaxis(np.asarray(B3.add(ja, jb)), -2, 0)), dtype=object)
    assert all(int(g) == (int(x) + int(y)) % Q for g, x, y in zip(got, A, Bv))


def test_rescale_drop_last_is_rounded_division(rng):
    a = rand_rns(rng, B3, n=128)
    got = np.asarray(B3.rescale_drop_last(jnp.asarray(a)))
    ql = B3.qs[-1]
    B2 = B3.drop_last()
    A = B3.from_rns(np.moveaxis(a, -2, 0))
    want_int = [
        (int(v) - _centered(int(v), ql)) // ql for v in A
    ]
    want = B2.to_rns(np.array(want_int, dtype=object))
    np.testing.assert_array_equal(np.moveaxis(got, -2, 0), want)


def _centered(v, q):
    r = v % q
    return r - q if r >= (q + 1) // 2 else r


@pytest.mark.parametrize("spec_basis", [
    (gd.TrivGad(), B1),
    (gd.BaseBGad(4), B1),
    (gd.BaseBGad(256), B3),
    (gd.RnsGad(), B3),
    (gd.RnsGad(), B1),
])
def test_decompose_recompose_host(spec_basis, rng):
    spec, basis = spec_basis
    a = rand_rns(rng, basis, n=16)
    digs = gd.decompose_host(spec, basis, a)
    g = gd.gadget_ints(spec, basis)
    Q = basis.modulus
    A = basis.from_rns(np.moveaxis(a, -2, 0))
    acc = np.zeros_like(A)
    for j, gj in enumerate(g):
        D = basis.lift_centered(np.moveaxis(digs[j], -2, 0))
        acc = acc + D * gj
    assert all(int(x) % Q == int(y) % Q for x, y in zip(acc.ravel(), A.ravel()))


@pytest.mark.parametrize("spec_basis", [
    (gd.RnsGad(), B3),
    (gd.BaseBGad(4), B1),
    (gd.TrivGad(), B1),
])
def test_decompose_jnp_matches_host(spec_basis, rng):
    spec, basis = spec_basis
    a = rand_rns(rng, basis, n=16)
    got = np.asarray(gd.decompose(spec, basis, jnp.asarray(a)))
    want = gd.decompose_host(spec, basis, a)
    # digit residues may differ only by representative; compare recomposition
    Q = basis.modulus
    g = gd.gadget_ints(spec, basis)
    for arr in (got, want):
        acc = None
        for j, gj in enumerate(g):
            D = basis.lift_centered(np.moveaxis(arr[j], -2, 0))
            acc = D * gj if acc is None else acc + D * gj
        A = basis.from_rns(np.moveaxis(a, -2, 0))
        assert all(int(x) % Q == int(y) % Q for x, y in zip(acc.ravel(), A.ravel()))
    # digit magnitudes stay small (decomposition quality)
    for j in range(got.shape[0]):
        D = basis.lift_centered(np.moveaxis(got[j], -2, 0))
        bound = max(basis.qs) if isinstance(spec, (gd.RnsGad, gd.TrivGad)) else spec.b
        assert max(abs(int(d)) for d in D.ravel()) <= bound


def test_correct_base_b(rng):
    spec, basis = gd.BaseBGad(4), B1
    Q = basis.modulus
    x = 12345
    enc = gd.encode_int(spec, basis, x)
    ell = len(enc)
    noise = rng.integers(-1, 2, ell)  # |e| < b/2 = 2: the correctable regime
    noisy = np.array([(e + int(dn)) % Q for e, dn in zip(enc, noise)], dtype=object)
    w = np.stack([basis.to_rns(np.array([v], dtype=object)) for v in noisy])
    w = np.moveaxis(w, 1, -2)
    xh, errs = gd.correct_host(spec, basis, w)
    assert int(np.ravel(xh)[0]) == x
    np.testing.assert_array_equal(
        np.array([int(e) for e in errs.reshape(ell)]), noise
    )


def test_correct_rns_gadget(rng):
    """RnsGad Correct (VERDICT r1 #10): recover x and the per-digit errors
    from noisy CRT-gadget encodings."""
    spec, basis = gd.RnsGad(), B3
    Q = basis.modulus
    x = 987654321987654321 % Q
    enc = gd.encode_int(spec, basis, x)
    ell = len(enc)
    noise = [int(v) for v in rng.integers(-50, 51, ell)]
    noisy = np.array([(g + e) % Q for g, e in zip(enc, noise)], dtype=object)
    w = np.stack([basis.to_rns(np.array([v], dtype=object)) for v in noisy])
    w = np.moveaxis(w, 1, -2)  # (ell, 1, nrns) -> wait: (ell, nrns, 1)? match base test
    xh, errs = gd.correct_host(spec, basis, w)
    assert int(np.ravel(xh)[0]) == x
    np.testing.assert_array_equal(
        np.array([int(e) for e in errs.reshape(ell)]), np.array(noise)
    )


def test_correct_rns_gadget_vector(rng):
    """Vector form: a whole ring element's worth of coefficients."""
    spec, basis = gd.RnsGad(), B3
    Q = basis.modulus
    n = 8
    xs = np.array([int(v) for v in rng.integers(0, 2**60, n)], dtype=object) % Q
    g = gd.gadget_ints(spec, basis)
    ell = len(g)
    noise = rng.integers(-100, 101, (ell, n))
    noisy = np.stack([
        basis.to_rns((xs * gj + noise[j]) % Q) for j, gj in enumerate(g)
    ])  # (ell, nrns, n)
    w = np.moveaxis(noisy, 1, -2)
    xh, errs = gd.correct_host(spec, basis, w)
    assert all(int(a) == int(b) for a, b in zip(np.ravel(xh), xs))
    np.testing.assert_array_equal(
        np.array([[int(v) for v in row] for row in errs.reshape(ell, n)]), noise
    )
