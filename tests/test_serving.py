"""Batched serving orchestration (serving.py) vs the object-level path."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lol_tpu import gadget as gd
from lol_tpu import numtheory as nt
from lol_tpu import prf, serving, she
from lol_tpu.cyc import Cyc, Rep
from lol_tpu.ring import ring_context
from lol_tpu.she_batched import BatchedBGV


@pytest.mark.parametrize("p", [8, 9])
def test_batched_pt_round_matches_object(p):
    """batched_pt_round == she.pt_round component-wise for both bases
    (2^k LSB stripping, 3^k balanced-ternary stripping), with the same
    hint set and scale bookkeeping."""
    nprimes = she.pt_round_mults(p) + 2
    qs = tuple(nt.ntt_primes(32, 30, nprimes))
    params = she.SHEParams(m=16, p=p, qs=qs, var=2.0)
    sk = she.gen_sk(params, jax.random.PRNGKey(70))
    rh = she.pt_round_hints(sk, gd.RnsGad(), jax.random.PRNGKey(71))
    n = params.ctx.n
    B = 3
    vals = [1, p - 2, p // 2]
    cts = []
    for b, v in enumerate(vals):
        m = np.zeros(n, dtype=np.int64)
        m[0] = v
        cts.append(she.encrypt(sk, m, jax.random.PRNGKey(72 + b)))
    bb = BatchedBGV(params)
    c0, c1 = bb.pack(cts)
    run, bb_out, f_out = serving.build_pt_round(bb, rh)
    e0, e1 = run(c0, c1)
    # the builder is reusable: a second invocation on a permuted batch
    # gives the same per-column results (stages were built once)
    p0, p1 = run(c0[..., ::-1], c1[..., ::-1])
    np.testing.assert_array_equal(np.asarray(p0)[..., ::-1], np.asarray(e0))
    refs = [she.pt_round(ct, rh) for ct in cts]
    pr = 2 if p == 8 else 3
    assert bb_out.params.p == pr
    assert bb_out.params.qs == refs[0].params.qs
    assert f_out == refs[0].f
    outs = bb_out.unpack((e0, e1), f=f_out)
    sk_out = she.SK(refs[0].params, sk.s_ints, sk.var)
    for b, (ref, v) in enumerate(zip(refs, vals)):
        for comp in range(2):
            np.testing.assert_array_equal(
                np.asarray(outs[b].cs[comp].data),
                np.asarray(ref.cs[comp].to_crt().data),
            )
        got = she.decrypt(sk_out, outs[b])
        want = ((2 * v * pr + p) // (2 * p)) % pr  # round-half-up v*pr/p
        assert got[0] == want and not got[1:].any(), (p, v, got[:3], want)


def test_batched_homom_prf_matches_object(rng):
    """The full serving HomomPRF stack (mulPublic -> tunnel tower ->
    homomorphic rounding) over a batch == prf.homom_prf_component per
    column, bit-exact, and decrypts to the clear PRF bit."""
    p = 8
    qs = tuple(nt.ntt_primes(64, 30, 6))
    fam = prf.PRFFamily.random(ring_context(32, (p,)), gd.BaseBGad(2),
                               prf.balanced(3), jax.random.PRNGKey(80))
    pr_params = she.SHEParams(m=32, p=p, qs=qs, var=2.0)
    ps_params = she.SHEParams(m=2, p=p, qs=qs, var=2.0)
    k1, k2, kh, ke = jax.random.split(jax.random.PRNGKey(81), 4)
    sk_r = she.gen_sk(pr_params, k1)
    sk_s = she.gen_sk(ps_params, k2)
    hints, sk_out = prf.make_eval_hints(fam, [sk_r, sk_s], [32, 2], [2],
                                        gd.RnsGad(), kh, p_final=2,
                                        homomorphic_round=True,
                                        maps="project")
    bits = (1, 0, 1)
    B = 2
    cts = []
    for b in range(B):
        m_s = rng.integers(0, p, pr_params.ctx.n).astype(np.int64)
        cts.append(she.encrypt(sk_r, m_s, jax.random.fold_in(ke, b)))
    bb = BatchedBGV(pr_params)
    c0, c1 = bb.pack(cts)
    bb_out, f_out, (e0, e1) = serving.batched_homom_prf_component(
        fam, hints, bb, c0, c1, bits, 0
    )
    outs = bb_out.unpack((e0, e1), f=f_out)
    for b in range(B):
        ref = prf.homom_prf_component(fam, hints, cts[b], bits, 0)
        assert bb_out.params.p == ref.params.p == 2
        assert f_out == ref.f
        for comp in range(2):
            np.testing.assert_array_equal(
                np.asarray(outs[b].cs[comp].data),
                np.asarray(ref.cs[comp].to_crt().data),
            )
        np.testing.assert_array_equal(
            she.decrypt(sk_out, outs[b]), she.decrypt(sk_out, ref)
        )


@pytest.mark.parametrize("p", [8, 9])
def test_batched_pt_round_msd(p):
    """MSD through the serving rounding chain (VERDICT r4 missing #1):
    build_pt_round(encoding='msd') == she.pt_round on MSD ciphertexts,
    component-bit-exact, and the output decrypts to the rounded digit
    in MSD.  The chain itself is intrinsically LSD (DESIGN §12); both
    paths ride the same exact encoding switches at the boundary."""
    nprimes = she.pt_round_mults(p) + 2
    qs = tuple(nt.ntt_primes(32, 30, nprimes))
    params = she.SHEParams(m=16, p=p, qs=qs, var=2.0)
    sk = she.gen_sk(params, jax.random.PRNGKey(75))
    rh = she.pt_round_hints(sk, gd.RnsGad(), jax.random.PRNGKey(76))
    n = params.ctx.n
    vals = [1, p - 2, p // 2]
    cts = []
    for b, v in enumerate(vals):
        m = np.zeros(n, dtype=np.int64)
        m[0] = v
        cts.append(she.encrypt_msd(sk, m, jax.random.PRNGKey(77 + b)))
    assert cts[0].encoding == "msd"
    bb = BatchedBGV(params)
    c0, c1 = bb.pack(cts)
    run, bb_out, f_out = serving.build_pt_round(bb, rh, encoding="msd")
    e0, e1 = run(c0, c1)
    refs = [she.pt_round(ct, rh) for ct in cts]
    pr = 2 if p == 8 else 3
    assert refs[0].encoding == "msd"
    assert bb_out.params.p == pr
    assert bb_out.params.qs == refs[0].params.qs
    assert f_out == refs[0].f
    outs = bb_out.unpack((e0, e1), f=f_out, encoding="msd")
    sk_out = she.SK(refs[0].params, sk.s_ints, sk.var)
    for b, (ref, v) in enumerate(zip(refs, vals)):
        for comp in range(2):
            np.testing.assert_array_equal(
                np.asarray(outs[b].cs[comp].to_crt().data),
                np.asarray(ref.cs[comp].to_crt().data),
            )
        got = she.decrypt(sk_out, outs[b])
        want = ((2 * v * pr + p) // (2 * p)) % pr
        assert got[0] == want and not got[1:].any(), (p, v, got[:3], want)


def test_batched_homom_prf_msd_reinterpret(rng):
    """The MSD reinterpretation branch of batched_homom_prf_component
    (no rounding hints): matches prf.homom_prf_component on MSD inputs
    bit-exactly (mod_switch_pt's MSD route through exact switches)."""
    p = 8
    qs = tuple(nt.ntt_primes(64, 30, 4))
    fam = prf.PRFFamily.random(ring_context(32, (p,)), gd.BaseBGad(2),
                               prf.balanced(3), jax.random.PRNGKey(85))
    pr_params = she.SHEParams(m=32, p=p, qs=qs, var=2.0)
    ps_params = she.SHEParams(m=2, p=p, qs=qs, var=2.0)
    k1, k2, kh, ke = jax.random.split(jax.random.PRNGKey(86), 4)
    sk_r = she.gen_sk(pr_params, k1)
    sk_s = she.gen_sk(ps_params, k2)
    hints, sk_out = prf.make_eval_hints(fam, [sk_r, sk_s], [32, 2], [2],
                                        gd.RnsGad(), kh, p_final=2,
                                        maps="project")
    bits = (1, 0, 1)
    B = 2
    cts = []
    for b in range(B):
        m_s = rng.integers(0, p, pr_params.ctx.n).astype(np.int64)
        cts.append(she.encrypt_msd(sk_r, m_s, jax.random.fold_in(ke, b)))
    bb = BatchedBGV(pr_params)
    c0, c1 = bb.pack(cts)
    bb_out, f_out, (e0, e1) = serving.batched_homom_prf_component(
        fam, hints, bb, c0, c1, bits, 0, encoding="msd"
    )
    outs = bb_out.unpack((e0, e1), f=f_out, encoding="msd")
    for b in range(B):
        ref = prf.homom_prf_component(fam, hints, cts[b], bits, 0)
        assert ref.encoding == "msd"
        assert bb_out.params.p == ref.params.p == 2
        assert f_out == ref.f
        for comp in range(2):
            np.testing.assert_array_equal(
                np.asarray(outs[b].cs[comp].to_crt().data),
                np.asarray(ref.cs[comp].to_crt().data),
            )
