"""Z_q scalar layer properties — analog of Lol's ZqTests (SURVEY.md §5.2)."""

import numpy as np
import pytest

from lol_tpu import numtheory as nt
from lol_tpu import zq
from lol_tpu.factored import fact

import jax.numpy as jnp

PRIMES = [2, 3, 257, 7681, 12289, (1 << 30) - 35, 1073479681]  # last: 30-bit NTT prime


def test_is_prime():
    assert nt.is_prime(2) and nt.is_prime(3) and nt.is_prime(12289)
    assert not nt.is_prime(1) and not nt.is_prime(561) and not nt.is_prime(2 ** 30)
    assert nt.is_prime((1 << 31) - 1)


def test_factorize_phi():
    assert nt.factorize(360) == ((2, 3), (3, 2), (5, 1))
    assert nt.euler_phi(1) == 1
    assert nt.euler_phi(8192) == 4096
    assert nt.euler_phi(360) == 96
    assert nt.radical(360) == 30


def test_factored_reflection():
    f = fact(360)
    assert f.value == 360 and f.phi == 96 and f.mhat == 180 and f.radical == 30
    assert f.phi_shape == (4, 6, 4)
    assert fact(8).mhat == 4 and fact(9).mhat == 9
    assert fact(4).divides(fact(8)) and not fact(8).divides(fact(4))
    assert fact(8).coprime(fact(9))
    assert fact(4096).is_pow2() and not fact(12).is_pow2()


def test_primitive_root_and_ntt_primes():
    q = 12289
    g = nt.primitive_root(q)
    assert nt.multiplicative_order(g, q) == q - 1
    w = nt.principal_root_of_unity(4096, q)
    assert pow(w, 4096, q) == 1 and pow(w, 2048, q) != 1
    ps = nt.ntt_primes(8192, 30, 3)
    assert len(ps) == 3
    for p in ps:
        assert nt.is_prime(p) and p % 8192 == 1 and p < 2 ** 30


def test_crt_reconstruct():
    mods = [7681, 12289, 40961]
    x = 123456789
    res = [x % q for q in mods]
    assert nt.crt_reconstruct(res, mods) == x


@pytest.mark.parametrize("q", [q for q in PRIMES])
def test_mul_mod_exhaustive_random(q, rng):
    n = 2048
    a = rng.integers(0, q, n, dtype=np.uint64).astype(np.uint32)
    b = rng.integers(0, q, n, dtype=np.uint64).astype(np.uint32)
    want = (a.astype(np.uint64) * b) % q
    got = np.asarray(zq.mul_mod(jnp.asarray(a), jnp.asarray(b), q))
    np.testing.assert_array_equal(got, want.astype(np.uint32))


@pytest.mark.parametrize("q", PRIMES)
def test_add_sub_neg_mod(q, rng):
    n = 1024
    a = rng.integers(0, q, n, dtype=np.uint64).astype(np.uint32)
    b = rng.integers(0, q, n, dtype=np.uint64).astype(np.uint32)
    ja, jb = jnp.asarray(a), jnp.asarray(b)
    np.testing.assert_array_equal(
        np.asarray(zq.add_mod(ja, jb, q)), ((a.astype(np.uint64) + b) % q).astype(np.uint32)
    )
    np.testing.assert_array_equal(
        np.asarray(zq.sub_mod(ja, jb, q)),
        ((a.astype(np.int64) - b.astype(np.int64)) % q).astype(np.uint32),
    )
    np.testing.assert_array_equal(
        np.asarray(zq.neg_mod(ja, q)), ((-a.astype(np.int64)) % q).astype(np.uint32)
    )


def test_mul_mod_shoup_matches(rng):
    q = 1073479681  # 30-bit, q = 1 mod 2^13
    n = 4096
    a = rng.integers(0, q, n, dtype=np.uint64).astype(np.uint32)
    w = int(rng.integers(1, q))
    w_sh = zq.shoup(w, q)
    want = (a.astype(np.uint64) * w) % q
    got = np.asarray(
        zq.mul_mod_shoup(jnp.asarray(a), jnp.uint32(w), jnp.uint32(w_sh), q)
    )
    np.testing.assert_array_equal(got, want.astype(np.uint32))


def test_mul_mod_edge_cases():
    # worst-case operands near q for the largest allowed modulus
    q = (1 << 30) - 35
    vals = np.array([0, 1, 2, q - 1, q - 2, q // 2, q // 2 + 1], dtype=np.uint32)
    a, b = np.meshgrid(vals, vals)
    a, b = a.ravel(), b.ravel()
    want = (a.astype(np.uint64) * b) % q
    got = np.asarray(zq.mul_mod(jnp.asarray(a), jnp.asarray(b), q))
    np.testing.assert_array_equal(got, want.astype(np.uint32))


def test_np_matvec_mod(rng):
    q = 1073479681
    A = rng.integers(0, q, (64, 64), dtype=np.uint64).astype(np.uint32)
    x = rng.integers(0, q, 64, dtype=np.uint64).astype(np.uint32)
    want = np.array(
        [sum(int(A[i, j]) * int(x[j]) for j in range(64)) % q for i in range(64)],
        dtype=np.uint32,
    )
    np.testing.assert_array_equal(zq.np_matvec_mod(A, x, q), want)
