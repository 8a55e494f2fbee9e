"""Complex CRT embedding (CRTEmbed analog) + Galois automorphisms."""

import numpy as np
import pytest

from lol_tpu import complexfield as cf
from lol_tpu import numtheory as nt
from lol_tpu.cyc import Cyc
from lol_tpu.ring import ring_context


@pytest.mark.parametrize("m", [8, 12, 36, 7])
def test_complex_crt_roundtrip_and_mult(m, rng):
    n = cf.fact(m).phi
    a = rng.integers(-50, 50, n)
    b = rng.integers(-50, 50, n)
    ya, yb = cf.crt_embed(a, m), cf.crt_embed(b, m)
    # roundtrip
    np.testing.assert_array_equal(cf.round_complex(cf.crt_embed_inv(ya, m)), a)
    # multiplicativity: pointwise product is the ring product's embedding
    prod = cf.crt_embed_inv(ya * yb, m)
    # compare against exact mod-q computation
    q = nt.ntt_primes(m if m % 2 == 1 else m, 30, 1)[0]
    ctx = ring_context(m, (q,))
    pq = (Cyc.from_ints(ctx, a) * Cyc.from_ints(ctx, b)).lift_ints(
        rep=__import__("lol_tpu.cyc", fromlist=["Rep"]).Rep.POW
    )
    np.testing.assert_array_equal(
        cf.round_complex(prod), np.array([int(v) for v in pq])
    )


def test_complex_slot_order_matches_modq(rng):
    m = 12
    q = nt.ntt_primes(12, 30, 1)[0]
    from lol_tpu.ops import general as gen

    plan = gen.general_plan(m, q)
    units_q = gen._global_units(plan)
    units_c = np.array(cf._canonical_units_c(m))
    np.testing.assert_array_equal(units_q % m, units_c % m)


@pytest.mark.parametrize("m", [16, 36])
def test_galois_is_ring_automorphism(m, rng):
    qs = tuple(nt.ntt_primes(m, 30, 2))
    ctx = ring_context(m, qs)
    a = Cyc.from_ints(ctx, rng.integers(-99, 99, ctx.n))
    b = Cyc.from_ints(ctx, rng.integers(-99, 99, ctx.n))
    import math

    k = next(k for k in range(2, m) if math.gcd(k, m) == 1)
    assert a.galois(1).to_pow() == a.to_pow()
    assert (a.galois(k) * b.galois(k)).to_pow() == (a * b).galois(k).to_pow()
    assert (a.galois(k) + b.galois(k)).to_pow() == (a + b).galois(k).to_pow()
    # composition: sigma_k . sigma_k2 = sigma_{k k2}
    k2 = next(x for x in range(k + 1, m) if math.gcd(x, m) == 1)
    assert a.galois(k).galois(k2).to_pow() == a.galois(k * k2 % m).to_pow()
    # sigma_k on an integer-coefficient element permutes monomials:
    # apply phi(m) automorphism group order times returns to start
    cur = a
    import lol_tpu.zmstar as zm

    order = nt.multiplicative_order(k, m)
    for _ in range(order):
        cur = cur.galois(k)
    assert cur.to_pow() == a.to_pow()
