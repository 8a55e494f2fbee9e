"""Linear maps and ring tunneling — Lol's signature feature (SURVEY §3.6)."""

import numpy as np
import pytest
import jax

from lol_tpu import gadget as gd
from lol_tpu import linear as lin
from lol_tpu import numtheory as nt
from lol_tpu import she
from lol_tpu.cyc import Cyc, Rep
from lol_tpu.ring import ring_context

QS = tuple(nt.ntt_primes(1152, 30, 3))  # 1152 = 2^7*9: supports m | 1152 towers


def rand_cyc(rng, ctx, lo=-100, hi=100):
    return Cyc.from_ints(ctx, rng.integers(lo, hi, ctx.n))


@pytest.mark.parametrize("me,mr,ms", [(16, 32, 64), (4, 8, 16), (12, 36, 24), (6, 18, 12)])
def test_eval_lin_is_e_linear(me, mr, ms, rng):
    qs = tuple(nt.ntt_primes(int(np.lcm(np.lcm(me, mr), ms)), 30, 2))
    E, R, S = (ring_context(m, qs) for m in (me, mr, ms))
    ys = [rand_cyc(rng, S) for _ in range(R.n // E.n)]
    f = lin.linear_pow(E, R, S, ys)
    x = rand_cyc(rng, R)
    y = rand_cyc(rng, R)
    c = rand_cyc(rng, E)
    # additivity
    assert lin.eval_lin(f, x + y).to_pow() == (
        lin.eval_lin(f, x) + lin.eval_lin(f, y)
    ).to_pow()
    # E-linearity: f(embed(c) * x) = embed(c) * f(x)
    lhs = lin.eval_lin(f, c.embed(R) * x).to_pow()
    rhs = (c.embed(S) * lin.eval_lin(f, x)).to_pow()
    assert lhs == rhs
    # basis images: f(b_i) == ys_i
    for b_i, y_i in zip(Cyc.rel_pow_basis(R, E), ys):
        assert lin.eval_lin(f, b_i).to_pow() == y_i.to_pow()


def test_rel_decomposition_identity(rng):
    for me, mr in [(16, 64), (12, 36), (6, 18), (3, 45)]:
        qs = tuple(nt.ntt_primes(int(np.lcm(me, mr)), 30, 2))
        E, R = ring_context(me, qs), ring_context(mr, qs)
        x = rand_cyc(rng, R)
        basis = Cyc.rel_pow_basis(R, E)
        coeffs = x.coeffs(E, rep=Rep.POW)
        acc = Cyc.zero(R)
        for b, a in zip(basis, coeffs):
            acc = acc + b * a.embed(R)
        assert acc.to_pow() == x.to_pow()


@pytest.mark.parametrize("me,mr,ms,p", [(16, 32, 64, 257), (8, 16, 32, 5), (12, 36, 24, 5)])
def test_tunnel_matches_plaintext_evallin(me, mr, ms, p, rng):
    mlcm = int(np.lcm(np.lcm(me, mr), ms))
    qs = tuple(nt.ntt_primes(mlcm, 30, 3))
    E, R, S = (ring_context(m, qs) for m in (me, mr, ms))
    pr = she.SHEParams(m=mr, p=p, qs=qs, var=2.0)
    ps = she.SHEParams(m=ms, p=p, qs=qs, var=2.0)
    key = jax.random.PRNGKey(3)
    kr, ks_, kh, kenc = jax.random.split(key, 4)
    sk_r = she.gen_sk(pr, kr)
    sk_s = she.gen_sk(ps, ks_)
    ys = [Cyc.from_ints(S, rng.integers(-2, 3, S.n)) for _ in range(R.n // E.n)]
    f = lin.linear_pow(E, R, S, ys)
    th = she.tunnel_hint(f, sk_s, sk_r, gd.RnsGad(), kh)
    m = she.pt_random(pr, rng)
    ct = she.encrypt(sk_r, m, kenc)
    out = she.tunnel(th, ct)
    got = she.decrypt(sk_s, out)
    # expected: evalLin applied to the plaintext over an exact aux modulus
    aux = tuple(nt.ntt_primes(mlcm, 30, 3))
    Ea, Ra, Sa = (ring_context(mm, aux) for mm in (me, mr, ms))
    ysa = [Cyc.from_ints(Sa, y.lift_ints(rep=Rep.POW)) for y in ys]
    fa = lin.linear_pow(Ea, Ra, Sa, ysa)
    # message is DEC-encoded in R_p: the ring element is (elt with dec coeffs m)
    x = Cyc.from_ints(Ra, m, rep=Rep.DEC)
    want_elt = lin.eval_lin(fa, x)
    want = np.array(
        [int(v) % p for v in want_elt.lift_ints(rep=Rep.DEC)], dtype=np.int64
    )
    np.testing.assert_array_equal(got, want)
