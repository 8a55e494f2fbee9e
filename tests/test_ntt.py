"""Negacyclic NTT properties — Lol TensorTests crt/crtInv analog (SURVEY §5.1)."""

import numpy as np
import pytest
import jax.numpy as jnp

from lol_tpu import numtheory as nt, zq
from lol_tpu.ops import ntt

# config-1 / config-2 style parameters from BASELINE.json
CASES = [
    (8, 257),  # tiny, hand-checkable
    (256, nt.ntt_primes(512, 30, 1)[0]),  # config 1: m=512, 30-bit prime
    (1024, 12289),
    (4096, nt.ntt_primes(8192, 30, 1)[0]),  # config 2 shape
]


def rand_poly(rng, n, q, shape=()):
    return rng.integers(0, q, (*shape, n), dtype=np.uint64).astype(np.uint32)


@pytest.mark.parametrize("n,q", CASES)
def test_roundtrip_jnp(n, q, rng):
    plan = ntt.ntt_plan(n, q)
    a = rand_poly(rng, n, q, (3,))
    out = np.asarray(ntt.ntt_inverse(ntt.ntt_forward(jnp.asarray(a), plan), plan))
    np.testing.assert_array_equal(out, a)


@pytest.mark.parametrize("n,q", CASES)
def test_roundtrip_numpy(n, q, rng):
    plan = ntt.ntt_plan(n, q)
    a = rand_poly(rng, n, q)
    np.testing.assert_array_equal(ntt.np_ntt_inverse(ntt.np_ntt_forward(a, plan), plan), a)


@pytest.mark.parametrize("n,q", CASES)
def test_jnp_matches_numpy_bit_exact(n, q, rng):
    plan = ntt.ntt_plan(n, q)
    a = rand_poly(rng, n, q, (2,))
    np.testing.assert_array_equal(
        np.asarray(ntt.ntt_forward(jnp.asarray(a), plan)), ntt.np_ntt_forward(a, plan)
    )
    np.testing.assert_array_equal(
        np.asarray(ntt.ntt_inverse(jnp.asarray(a), plan)), ntt.np_ntt_inverse(a, plan)
    )


@pytest.mark.parametrize("n,q", [(8, 257), (64, 12289)])
def test_output_order_is_direct_evaluation(n, q, rng):
    """forward(a)[i] == a(psi^(2*brv(i)+1)) — pins the CRT-domain ordering."""
    plan = ntt.ntt_plan(n, q)
    a = rand_poly(rng, n, q)
    got = ntt.np_ntt_forward(a, plan)
    exps = ntt.crt_output_exponents(n)
    for i in range(n):
        pt = pow(plan.psi, int(exps[i]), q)
        want = sum(int(a[j]) * pow(pt, j, q) for j in range(n)) % q
        assert int(got[i]) == want, f"index {i}"


@pytest.mark.parametrize("n,q", [(8, 257), (256, nt.ntt_primes(512, 30, 1)[0])])
def test_pointwise_mult_is_negacyclic_convolution(n, q, rng):
    plan = ntt.ntt_plan(n, q)
    a = rand_poly(rng, n, q)
    b = rand_poly(rng, n, q)
    want = ntt.np_negacyclic_mul_schoolbook(a, b, q)
    ja, jb = ntt.ntt_forward(jnp.asarray(a), plan), ntt.ntt_forward(jnp.asarray(b), plan)
    got = np.asarray(ntt.ntt_inverse(zq.mul_mod(ja, jb, q), plan))
    np.testing.assert_array_equal(got, want)


def test_linearity_and_scalar(rng):
    n, q = 256, 12289
    plan = ntt.ntt_plan(n, q)
    a = rand_poly(rng, n, q)
    b = rand_poly(rng, n, q)
    fa = ntt.np_ntt_forward(a, plan).astype(np.int64)
    fb = ntt.np_ntt_forward(b, plan).astype(np.int64)
    fab = ntt.np_ntt_forward(((a.astype(np.int64) + b) % q).astype(np.uint32), plan)
    np.testing.assert_array_equal((fa + fb) % q, fab)
    # constant poly c maps to the all-c vector
    c = np.zeros(n, dtype=np.uint32)
    c[0] = 42
    np.testing.assert_array_equal(ntt.np_ntt_forward(c, plan), np.full(n, 42, np.uint32))


def test_plan_validation():
    with pytest.raises(ValueError):
        ntt.ntt_plan(48, 12289)  # not a power of 2
    with pytest.raises(ValueError):
        ntt.ntt_plan(4096, 257)  # 8192 does not divide 256
