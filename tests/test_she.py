"""SHE correctness properties — Lol SHETests analog (SURVEY.md §5.3)."""

import numpy as np
import pytest
import jax

from lol_tpu import gadget as gd
from lol_tpu import numtheory as nt
from lol_tpu import she
from lol_tpu.cyc import Rep as _Rep

M = 64  # n = 32: small-but-real (Lol-style concrete param stack)
QS = tuple(nt.ntt_primes(512, 30, 3))  # support the m=64..256 tower
PARAMS = she.SHEParams(m=M, p=257, qs=QS, var=4.0)
PARAMS_P2 = she.SHEParams(m=M, p=2, qs=QS, var=4.0)


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(42)
    ks, k1, k2, k3, kh, kh2 = jax.random.split(key, 6)
    sk = she.gen_sk(PARAMS, ks)
    return sk, (k1, k2, k3, kh, kh2)


@pytest.mark.parametrize("params", [PARAMS, PARAMS_P2])
def test_encrypt_decrypt_roundtrip(params, rng):
    key = jax.random.PRNGKey(1)
    sk = she.gen_sk(params, key)
    m = she.pt_random(params, rng)
    ct = she.encrypt(sk, m, jax.random.PRNGKey(2))
    np.testing.assert_array_equal(she.decrypt(sk, ct), m)


def test_homomorphic_add_sub(setup, rng):
    sk, (k1, k2, *_) = setup
    m1, m2 = she.pt_random(PARAMS, rng), she.pt_random(PARAMS, rng)
    c1, c2 = she.encrypt(sk, m1, k1), she.encrypt(sk, m2, k2)
    np.testing.assert_array_equal(
        she.decrypt(sk, she.ct_add(c1, c2)), she.pt_add(PARAMS, m1, m2)
    )
    np.testing.assert_array_equal(
        she.decrypt(sk, she.ct_sub(c1, c2)), (m1 - m2) % PARAMS.p
    )


def test_homomorphic_mul(setup, rng):
    sk, (k1, k2, *_) = setup
    m1, m2 = she.pt_random(PARAMS, rng), she.pt_random(PARAMS, rng)
    c1, c2 = she.encrypt(sk, m1, k1), she.encrypt(sk, m2, k2)
    prod = she.ct_mul(c1, c2)
    assert prod.degree == 2
    np.testing.assert_array_equal(
        she.decrypt(sk, prod), she.pt_mul(PARAMS, m1, m2)
    )


@pytest.mark.parametrize("spec", [gd.RnsGad(), gd.BaseBGad(2**15)])
def test_key_switch_quad(setup, rng, spec):
    sk, (k1, k2, _, kh, _) = setup
    m1, m2 = she.pt_random(PARAMS, rng), she.pt_random(PARAMS, rng)
    c1, c2 = she.encrypt(sk, m1, k1), she.encrypt(sk, m2, k2)
    hint = she.ks_quad_circ_hint(sk, spec, kh)
    lin = she.key_switch_quad_circ(hint, she.ct_mul(c1, c2))
    assert lin.degree == 1
    np.testing.assert_array_equal(
        she.decrypt(sk, lin), she.pt_mul(PARAMS, m1, m2)
    )


def test_key_switch_linear_changes_key(setup, rng):
    sk, (k1, _, _, _, kh2) = setup
    sk2 = she.gen_sk(PARAMS, jax.random.PRNGKey(77))
    m = she.pt_random(PARAMS, rng)
    ct = she.encrypt(sk, m, k1)
    hint = she.ks_linear_hint(sk2, sk, gd.RnsGad(), kh2)
    ct2 = she.key_switch_linear(hint, ct)
    np.testing.assert_array_equal(she.decrypt(sk2, ct2), m)


def test_mod_switch_preserves_message(setup, rng):
    sk, (k1, *_) = setup
    m = she.pt_random(PARAMS, rng)
    ct = she.encrypt(sk, m, k1)
    n0 = she.noise_bits(sk, ct)
    ct2 = she.mod_switch(ct)
    assert ct2.ctx.basis.qs == QS[:-1]
    sk2 = she.SK(ct2.params, sk.s_ints, sk.var)
    np.testing.assert_array_equal(she.decrypt(sk2, ct2), m)
    # error shrinks (by ~log2 ql bits)
    assert she.noise_bits(sk2, ct2) <= max(n0 - 20, 8)
    # twice
    ct3 = she.mod_switch(ct2)
    sk3 = she.SK(ct3.params, sk.s_ints, sk.var)
    np.testing.assert_array_equal(she.decrypt(sk3, ct3), m)


def test_full_pipeline_mul_relin_rescale(setup, rng):
    sk, (k1, k2, _, kh, _) = setup
    m1, m2 = she.pt_random(PARAMS, rng), she.pt_random(PARAMS, rng)
    c1, c2 = she.encrypt(sk, m1, k1), she.encrypt(sk, m2, k2)
    hint = she.ks_quad_circ_hint(sk, gd.RnsGad(), kh)
    out = she.mod_switch(she.key_switch_quad_circ(hint, she.ct_mul(c1, c2)))
    sk2 = she.SK(out.params, sk.s_ints, sk.var)
    np.testing.assert_array_equal(
        she.decrypt(sk2, out), she.pt_mul(PARAMS, m1, m2)
    )


def test_add_mul_public(setup, rng):
    sk, (k1, *_) = setup
    m = she.pt_random(PARAMS, rng)
    pub = she.pt_random(PARAMS, rng)
    ct = she.encrypt(sk, m, k1)
    np.testing.assert_array_equal(
        she.decrypt(sk, she.add_public(ct, pub)), she.pt_add(PARAMS, m, pub)
    )
    np.testing.assert_array_equal(
        she.decrypt(sk, she.mul_public(ct, pub)), she.pt_mul(PARAMS, m, pub)
    )
    # mul_public after a mod_switch (f != 1) still correct
    ct2 = she.mod_switch(ct)
    sk2 = she.SK(ct2.params, sk.s_ints, sk.var)
    np.testing.assert_array_equal(
        she.decrypt(sk2, she.mul_public(ct2, pub)), she.pt_mul(PARAMS, m, pub)
    )


def test_error_term_small(setup, rng):
    sk, (k1, *_) = setup
    m = she.pt_random(PARAMS, rng)
    ct = she.encrypt(sk, m, k1)
    e = she.error_term(sk, ct)
    Q = ct.ctx.basis.modulus
    assert max(abs(int(v)) for v in e.reshape(-1)) < Q // (4 * PARAMS.p)
    assert she.noise_bits(sk, ct) < 25


def test_embed_twace_ct(setup, rng):
    sk, (k1, *_) = setup
    m = she.pt_random(PARAMS, rng)
    ct = she.encrypt(sk, m, k1)
    # embed ct and sk into m=256; decrypt there
    sk_up = she.embed_sk(sk, 256)
    ct_up = she.embed_ct(ct, 256)
    dec_up = she.decrypt(sk_up, ct_up)
    # embedded message = stride-scattered coefficients
    emb = she.Cyc.from_ints(PARAMS.ctx, m).embed(she.ring_context(256, QS))
    want = np.array([int(v) % PARAMS.p for v in emb.lift_ints()], dtype=np.int64)
    np.testing.assert_array_equal(dec_up, want)
    # twace back down: decrypts to the original under the original sk
    ct_down = she.twace_ct(ct_up, M)
    np.testing.assert_array_equal(she.decrypt(sk, ct_down), m)


def test_mod_switch_pt(setup, rng):
    sk, (k1, *_) = setup
    params4 = she.SHEParams(m=M, p=4, qs=QS, var=2.0)
    sk4 = she.gen_sk(params4, jax.random.PRNGKey(5))
    m = she.pt_random(params4, rng)
    ct = she.encrypt(sk4, m, k1)
    ct2 = she.mod_switch_pt(ct, 2)
    sk2 = she.SK(ct2.params, sk4.s_ints, sk4.var)
    np.testing.assert_array_equal(she.decrypt(sk2, ct2), m % 2)


def test_mod_switch_pt_msd(rng):
    """MSD modSwitchPT routes through the exact encoding switches
    (VERDICT r2 #7): an MSD ct over p=4 decrypts mod 2 after the switch."""
    params4 = she.SHEParams(m=M, p=4, qs=QS, var=2.0)
    sk4 = she.gen_sk(params4, jax.random.PRNGKey(15))
    m = she.pt_random(params4, rng)
    ct = she.encrypt_msd(sk4, m, jax.random.PRNGKey(16))
    ct2 = she.mod_switch_pt(ct, 2)
    assert ct2.encoding == "msd" and ct2.params.p == 2
    sk2 = she.SK(ct2.params, sk4.s_ints, sk4.var)
    np.testing.assert_array_equal(she.decrypt(sk2, ct2), m % 2)


def test_pt_mul_matches_schoolbook(rng):
    """The aux-chain numpy-NTT pt_mul == O(n^2) schoolbook negacyclic
    convolution (the implementation it replaced, VERDICT r2 #8)."""
    n = PARAMS.ctx.n
    p = PARAMS.p
    a, b = she.pt_random(PARAMS, rng), she.pt_random(PARAMS, rng)
    out = np.zeros(n, dtype=np.int64)
    for i in range(n):
        out[i:] += int(a[i]) * b[: n - i]
        out[:i] -= int(a[i]) * b[n - i :]
    np.testing.assert_array_equal(she.pt_mul(PARAMS, a, b), out % p)
    # general m falls back to the exact Cyc aux-chain path
    params36 = she.SHEParams(m=36, p=5, qs=tuple(nt.ntt_primes(36, 30, 2)))
    a6, b6 = she.pt_random(params36, rng), she.pt_random(params36, rng)
    np.testing.assert_array_equal(
        she.pt_mul(params36, a6, b6), _pt_mul_general(params36, a6, b6)
    )


@pytest.mark.parametrize("m_idx", [36, 42])
def test_she_general_m(m_idx, rng):
    """BGV over non-2-power cyclotomics: m = 36 = 2^2*3^2 and
    m = 42 = 2*3*7 (three distinct prime factors)."""
    qs = tuple(nt.ntt_primes(m_idx, 30, 2))
    params = she.SHEParams(m=m_idx, p=5, qs=qs, var=3.0)
    sk = she.gen_sk(params, jax.random.PRNGKey(9))
    m1 = she.pt_random(params, rng)
    m2 = she.pt_random(params, rng)
    c1 = she.encrypt(sk, m1, jax.random.PRNGKey(10))
    c2 = she.encrypt(sk, m2, jax.random.PRNGKey(11))
    np.testing.assert_array_equal(she.decrypt(sk, c1), m1)
    np.testing.assert_array_equal(
        she.decrypt(sk, she.ct_add(c1, c2)), she.pt_add(params, m1, m2)
    )
    hint = she.ks_quad_circ_hint(sk, gd.RnsGad(), jax.random.PRNGKey(12))
    lin = she.key_switch_quad_circ(hint, she.ct_mul(c1, c2))
    got = she.decrypt(sk, lin)
    want = _pt_mul_general(params, m1, m2)
    np.testing.assert_array_equal(got, want)
    # mod switch
    ct2 = she.mod_switch(c1)
    sk2 = she.SK(ct2.params, sk.s_ints, sk.var)
    np.testing.assert_array_equal(she.decrypt(sk2, ct2), m1)


def _pt_mul_general(params, a, b):
    """Plaintext product for general m via an exact big-modulus CRT ring."""
    from lol_tpu.cyc import Cyc
    from lol_tpu.ring import ring_context
    aux_qs = tuple(nt.ntt_primes(params.m, 30, 2))
    ctx = ring_context(params.m, aux_qs)
    # messages are decoding-basis encoded: multiply the ring elements whose
    # DEC coefficients are a and b, read the product's DEC coefficients
    prod = (
        Cyc.from_ints(ctx, a, rep=_Rep.DEC) * Cyc.from_ints(ctx, b, rep=_Rep.DEC)
    ).lift_ints(rep=_Rep.DEC)
    return np.array([int(v) % params.p for v in prod], dtype=np.int64)


def test_msd_general_m(rng):
    """MSD encoding at a composite index: roundtrip, hom add, and the
    MSD*MSD multiply (object path; Delta = Q//p is a big int even at
    small m once the chain has 2+ primes)."""
    m_idx = 36
    qs = tuple(nt.ntt_primes(m_idx, 30, 2))
    params = she.SHEParams(m=m_idx, p=5, qs=qs, var=2.0)
    sk = she.gen_sk(params, jax.random.PRNGKey(140))
    m1, m2 = she.pt_random(params, rng), she.pt_random(params, rng)
    c1 = she.encrypt_msd(sk, m1, jax.random.PRNGKey(141))
    c2 = she.encrypt_msd(sk, m2, jax.random.PRNGKey(142))
    np.testing.assert_array_equal(she.decrypt(sk, c1), m1)
    np.testing.assert_array_equal(
        she.decrypt(sk, she.ct_add(c1, c2)), she.pt_add(params, m1, m2)
    )
    hint = she.ks_quad_circ_hint(sk, gd.RnsGad(), jax.random.PRNGKey(143))
    lin = she.key_switch_quad_circ(hint, she.ct_mul(c1, c2))
    assert lin.encoding == "msd"
    np.testing.assert_array_equal(
        she.decrypt(sk, lin), she.pt_mul(params, m1, m2)
    )


def test_msd_encoding_roundtrip_and_add(rng):
    sk = she.gen_sk(PARAMS, jax.random.PRNGKey(21))
    m1, m2 = she.pt_random(PARAMS, rng), she.pt_random(PARAMS, rng)
    c1 = she.encrypt_msd(sk, m1, jax.random.PRNGKey(22))
    c2 = she.encrypt_msd(sk, m2, jax.random.PRNGKey(23))
    np.testing.assert_array_equal(she.decrypt(sk, c1), m1)
    s = she.ct_add(c1, c2)
    assert s.encoding == "msd"
    np.testing.assert_array_equal(she.decrypt(sk, s), she.pt_add(PARAMS, m1, m2))


def test_error_coset_sampling():
    from lol_tpu import sampling
    ctx = PARAMS.ctx
    coset = np.arange(ctx.n) % PARAMS.p
    e = sampling.error_coset(ctx, jax.random.PRNGKey(5), 4.0, coset, PARAMS.p)
    lifted = e.lift_ints()
    got = np.array([int(v) % PARAMS.p for v in lifted])
    np.testing.assert_array_equal(got, coset)


def test_extended_modulus_keyswitch(setup, rng):
    sk, (k1, k2, _, kh, _) = setup
    m1, m2 = she.pt_random(PARAMS, rng), she.pt_random(PARAMS, rng)
    c1, c2 = she.encrypt(sk, m1, k1), she.encrypt(sk, m2, k2)
    prod = she.ct_mul(c1, c2)
    special = tuple(q for q in nt.ntt_primes(512, 29, 6) if q not in QS)[:2]
    hint = she.ks_quad_circ_hint_ext(sk, gd.RnsGad(), jax.random.PRNGKey(31),
                                     special)
    lin = she.key_switch_quad_circ_ext(hint, prod)
    assert lin.degree == 1
    np.testing.assert_array_equal(
        she.decrypt(sk, lin), she.pt_mul(PARAMS, m1, m2)
    )
    # noise advantage vs the plain RNS-gadget keyswitch
    plain_hint = she.ks_quad_circ_hint(sk, gd.RnsGad(), jax.random.PRNGKey(32))
    plain = she.key_switch_quad_circ(plain_hint, prod)
    nb_ext = she.noise_bits(sk, lin)
    nb_plain = she.noise_bits(sk, plain)
    assert nb_ext < nb_plain - 10  # P ~ 2^58: dramatic noise reduction


# ---------------------------------------------------------------------------
# homomorphic plaintext rounding (the reference's PTRound; she.pt_round)
# ---------------------------------------------------------------------------


def test_div_2_exact():
    qs = tuple(nt.ntt_primes(32, 30, 3))
    params = she.SHEParams(m=16, p=8, qs=qs, var=2.0)
    sk = she.gen_sk(params, jax.random.PRNGKey(40))
    n = params.ctx.n
    m = (2 * (np.arange(n) % 4)).astype(np.int64)  # even coefficients
    ct = she.encrypt(sk, m, jax.random.PRNGKey(41))
    half = she.div_2(ct)
    assert half.params.p == 4
    np.testing.assert_array_equal(she.decrypt(sk, half), (m // 2) % 4)
    # noise unchanged (same e): div_2 is exact
    np.testing.assert_array_equal(
        she.error_term(sk, half).astype(np.int64) * 2,
        she.error_term(sk, ct).astype(np.int64) * 2,
    )


@pytest.mark.parametrize("p", [4, 8, 16])
def test_pt_round_all_values(p):
    """pt_round(Enc(v*1)) decrypts to round_half_up(v / 2^{k-1}) mod 2
    for every v in Z_{2^k}."""
    k = p.bit_length() - 1
    nprimes = she.pt_round_mults(p) + 2
    qs = tuple(nt.ntt_primes(32, 30, nprimes))
    params = she.SHEParams(m=16, p=p, qs=qs, var=2.0)
    sk = she.gen_sk(params, jax.random.PRNGKey(42))
    rh = she.pt_round_hints(sk, gd.RnsGad(), jax.random.PRNGKey(43))
    n = params.ctx.n
    for v in range(p):
        m = np.zeros(n, dtype=np.int64)
        m[0] = v
        ct = she.encrypt(sk, m, jax.random.fold_in(jax.random.PRNGKey(44), v))
        out = she.pt_round(ct, rh)
        assert out.params.p == 2
        got = she.decrypt(sk, out)
        want = ((v + (1 << (k - 2))) >> (k - 1)) & 1
        assert got[0] == want and not got[1:].any(), (p, v, got[:3], want)


@pytest.mark.parametrize("p", [9, 27])
def test_pt_round_ternary_all_values(p):
    """pt_round for p = 3^k (VERDICT r3 #9): decrypts to
    round_nearest(v / 3^{k-1}) mod 3 for every v in Z_{3^k} — balanced-
    ternary (Teichmueller) digit stripping via homomorphic cubings;
    ties are impossible, no pre-add."""
    k = {9: 2, 27: 3}[p]
    nprimes = she.pt_round_mults(p) + 2
    qs = tuple(nt.ntt_primes(32, 30, nprimes))
    params = she.SHEParams(m=16, p=p, qs=qs, var=2.0)
    sk = she.gen_sk(params, jax.random.PRNGKey(60))
    rh = she.pt_round_hints(sk, gd.RnsGad(), jax.random.PRNGKey(61))
    n = params.ctx.n
    for v in range(p):
        m = np.zeros(n, dtype=np.int64)
        m[0] = v
        ct = she.encrypt(sk, m, jax.random.fold_in(jax.random.PRNGKey(62), v))
        out = she.pt_round(ct, rh)
        assert out.params.p == 3
        got = she.decrypt(sk, out)
        want = ((2 * v + 3 ** (k - 1)) // (2 * 3 ** (k - 1))) % 3
        assert got[0] == want and not got[1:].any(), (p, v, got[:3], want)


def test_pt_round_rejects_unsupported_base():
    with pytest.raises(ValueError, match="2\\^k or 3\\^k"):
        she.pt_round_mults(10)
    with pytest.raises(ValueError, match="2\\^k or 3\\^k"):
        she.pt_round_mults(25)


def test_pt_round_hints_need_enough_primes():
    qs = tuple(nt.ntt_primes(32, 30, 2))
    params = she.SHEParams(m=16, p=8, qs=qs, var=2.0)
    sk = she.gen_sk(params, jax.random.PRNGKey(45))
    with pytest.raises(ValueError, match="RNS primes"):
        she.pt_round_hints(sk, gd.RnsGad(), jax.random.PRNGKey(46))


# ---------------------------------------------------------------------------
# MSD|LSD encoding tracking through (*) (Lol's toMSD/toLSD interleaving)
# ---------------------------------------------------------------------------


def test_encoding_conversions_roundtrip(setup, rng):
    sk, (k1, k2, *_rest) = setup
    m = she.pt_random(PARAMS, rng)
    c_lsd = she.encrypt(sk, m, k1)
    c_msd = she.encrypt_msd(sk, m, k2)
    np.testing.assert_array_equal(she.decrypt(sk, she.to_lsd(c_msd)), m % PARAMS.p)
    np.testing.assert_array_equal(she.decrypt(sk, she.to_msd(c_lsd)), m % PARAMS.p)
    # idempotent
    assert she.to_lsd(c_lsd) is c_lsd and she.to_msd(c_msd) is c_msd


def test_ct_mul_tracks_encodings(setup, rng):
    sk, (k1, k2, k3, *_rest) = setup
    m1, m2 = she.pt_random(PARAMS, rng), she.pt_random(PARAMS, rng)
    want = she.pt_mul(PARAMS, m1, m2)
    c1_lsd = she.encrypt(sk, m1, k1)
    c1_msd = she.encrypt_msd(sk, m1, k2)
    c2_msd = she.encrypt_msd(sk, m2, k3)
    for a, b, enc in [(c1_msd, she.encrypt(sk, m2, k1), "msd"),
                      (c1_lsd, c2_msd, "msd"),
                      (c1_msd, c2_msd, "msd")]:
        prod = she.ct_mul(a, b)
        assert prod.encoding == enc
        np.testing.assert_array_equal(she.decrypt(sk, prod), want)


def test_ct_galois_matches_plaintext_automorphism(setup, rng):
    """ct_galois(hint, k, Enc(m)) decrypts to sigma_k(m) (extension: the
    reference has ring-element automorphisms but no CT-level op)."""
    from lol_tpu.cyc import Cyc, Rep
    from lol_tpu.ring import ring_context

    sk, (k1, *_rest) = setup
    m = she.pt_random(PARAMS, rng)
    ct = she.encrypt(sk, m, k1)
    p = PARAMS.p
    aux = ring_context(PARAMS.m, QS[:1])
    mc = np.where(m >= (p + 1) // 2, m - p, m)
    for k in (3, 2 * PARAMS.m - 1):
        hint = she.ks_galois_hint(k % PARAMS.m, sk, gd.RnsGad(),
                                  jax.random.PRNGKey(60 + k))
        got = she.decrypt(sk, she.ct_galois(hint, k % PARAMS.m, ct))
        want = Cyc.from_ints(aux, mc, rep=_Rep.DEC).galois(
            k % PARAMS.m).lift_ints() % p
        np.testing.assert_array_equal(got, np.array([int(v) for v in want]))


# ---------------------------------------------------------------------------
# MSD encoding through the FULL op set (VERDICT r1 #1: every CT op must
# thread the encoding; mod_switch must use the MSD rescale)
# ---------------------------------------------------------------------------


def test_msd_sub_and_public_ops(setup, rng):
    sk = she.gen_sk(PARAMS, jax.random.PRNGKey(70))
    m1, m2 = she.pt_random(PARAMS, rng), she.pt_random(PARAMS, rng)
    pub = she.pt_random(PARAMS, rng)
    c1 = she.encrypt_msd(sk, m1, jax.random.PRNGKey(71))
    c2 = she.encrypt_msd(sk, m2, jax.random.PRNGKey(72))
    d = she.ct_sub(c1, c2)
    assert d.encoding == "msd"
    np.testing.assert_array_equal(she.decrypt(sk, d), (m1 - m2) % PARAMS.p)
    ap = she.add_public(c1, pub)
    assert ap.encoding == "msd"
    np.testing.assert_array_equal(
        she.decrypt(sk, ap), she.pt_add(PARAMS, m1, pub)
    )
    mp = she.mul_public(c1, pub)
    assert mp.encoding == "msd"
    np.testing.assert_array_equal(
        she.decrypt(sk, mp), she.pt_mul(PARAMS, m1, pub)
    )


def test_msd_mod_switch(rng):
    sk = she.gen_sk(PARAMS, jax.random.PRNGKey(73))
    m = she.pt_random(PARAMS, rng)
    ct = she.encrypt_msd(sk, m, jax.random.PRNGKey(74))
    ct2 = she.mod_switch(ct)
    assert ct2.encoding == "msd" and ct2.f == ct.f
    sk2 = she.SK(ct2.params, sk.s_ints, sk.var)
    np.testing.assert_array_equal(she.decrypt(sk2, ct2), m)
    ct3 = she.mod_switch(ct2)
    sk3 = she.SK(ct3.params, sk.s_ints, sk.var)
    np.testing.assert_array_equal(she.decrypt(sk3, ct3), m)


def test_msd_keyswitch_quad(setup, rng):
    sk = she.gen_sk(PARAMS, jax.random.PRNGKey(75))
    m1, m2 = she.pt_random(PARAMS, rng), she.pt_random(PARAMS, rng)
    c1 = she.encrypt_msd(sk, m1, jax.random.PRNGKey(76))
    c2 = she.encrypt_msd(sk, m2, jax.random.PRNGKey(77))
    hint = she.ks_quad_circ_hint(sk, gd.RnsGad(), jax.random.PRNGKey(78))
    lin = she.key_switch_quad_circ(hint, she.ct_mul(c1, c2))
    assert lin.degree == 1 and lin.encoding == "msd"
    np.testing.assert_array_equal(
        she.decrypt(sk, lin), she.pt_mul(PARAMS, m1, m2)
    )


def test_msd_keyswitch_linear_and_galois(setup, rng):
    sk = she.gen_sk(PARAMS, jax.random.PRNGKey(79))
    sk2 = she.gen_sk(PARAMS, jax.random.PRNGKey(80))
    m = she.pt_random(PARAMS, rng)
    ct = she.encrypt_msd(sk, m, jax.random.PRNGKey(81))
    hint = she.ks_linear_hint(sk2, sk, gd.RnsGad(), jax.random.PRNGKey(82))
    out = she.key_switch_linear(hint, ct)
    assert out.encoding == "msd"
    np.testing.assert_array_equal(she.decrypt(sk2, out), m)


def test_msd_embed_twace(setup, rng):
    sk = she.gen_sk(PARAMS, jax.random.PRNGKey(83))
    m = she.pt_random(PARAMS, rng)
    ct = she.encrypt_msd(sk, m, jax.random.PRNGKey(84))
    ct_up = she.embed_ct(ct, 256)
    assert ct_up.encoding == "msd"
    ct_down = she.twace_ct(ct_up, M)
    assert ct_down.encoding == "msd"
    np.testing.assert_array_equal(she.decrypt(sk, ct_down), m)


def test_msd_full_pipeline_mul_ks_modswitch_tunnel(rng):
    """The VERDICT's done-condition: drive one MSD ct through
    mul -> keyswitch -> modswitch -> tunnel -> decrypt."""
    from lol_tpu import linear as lin
    from lol_tpu.cyc import Cyc
    from lol_tpu.ring import ring_context

    me, mr, ms, p = 16, 32, 64, 257
    qs = tuple(nt.ntt_primes(int(np.lcm(np.lcm(me, mr), ms)), 30, 3))
    E, R, S = (ring_context(m, qs) for m in (me, mr, ms))
    pr = she.SHEParams(m=mr, p=p, qs=qs, var=2.0)
    key = jax.random.PRNGKey(90)
    kr, ks_, kh, kt, k1, k2 = jax.random.split(key, 6)
    sk_r = she.gen_sk(pr, kr)
    m1, m2 = she.pt_random(pr, rng), she.pt_random(pr, rng)
    c1 = she.encrypt_msd(sk_r, m1, k1)
    c2 = she.encrypt_msd(sk_r, m2, k2)
    # mul (MSD*MSD) + relinearize at the full chain
    hint = she.ks_quad_circ_hint(sk_r, gd.RnsGad(), kh)
    ct = she.key_switch_quad_circ(hint, she.ct_mul(c1, c2))
    # modswitch down one prime (MSD rescale, f unchanged)
    ct = she.mod_switch(ct)
    assert ct.encoding == "msd"
    qs2 = ct.params.qs
    R2, S2, E2 = (ring_context(m, qs2) for m in (mr, ms, me))
    sk_r2 = she.SK(ct.params, sk_r.s_ints, sk_r.var)
    ps2 = she.SHEParams(m=ms, p=p, qs=qs2, var=2.0)
    sk_s = she.gen_sk(ps2, ks_)
    ys = [Cyc.from_ints(S2, rng.integers(-2, 3, S2.n)) for _ in range(R2.n // E2.n)]
    f = lin.linear_pow(E2, R2, S2, ys)
    th = she.tunnel_hint(f, sk_s, sk_r2, gd.RnsGad(), kt)
    out = she.tunnel(th, ct)
    assert out.encoding == "msd"
    got = she.decrypt(sk_s, out)
    # expected: evalLin over an exact aux chain applied to m1*m2
    prod_pt = she.pt_mul(pr, m1, m2)
    aux = tuple(nt.ntt_primes(int(np.lcm(np.lcm(me, mr), ms)), 29, 3))
    Ea, Ra, Sa = (ring_context(mm, aux) for mm in (me, mr, ms))
    ysa = [Cyc.from_ints(Sa, y.lift_ints(rep=_Rep.POW)) for y in ys]
    fa = lin.linear_pow(Ea, Ra, Sa, ysa)
    x = Cyc.from_ints(Ra, prod_pt, rep=_Rep.DEC)
    want_elt = lin.eval_lin(fa, x)
    want = np.array(
        [int(v) % p for v in want_elt.lift_ints(rep=_Rep.DEC)], dtype=np.int64
    )
    np.testing.assert_array_equal(got, want)


def test_msd_ext_keyswitch(setup, rng):
    sk = she.gen_sk(PARAMS, jax.random.PRNGKey(95))
    m1, m2 = she.pt_random(PARAMS, rng), she.pt_random(PARAMS, rng)
    c1 = she.encrypt_msd(sk, m1, jax.random.PRNGKey(96))
    c2 = she.encrypt_msd(sk, m2, jax.random.PRNGKey(97))
    prod = she.ct_mul(c1, c2)
    special = tuple(q for q in nt.ntt_primes(512, 29, 6) if q not in QS)[:2]
    hint = she.ks_quad_circ_hint_ext(sk, gd.RnsGad(), jax.random.PRNGKey(98),
                                     special)
    lin = she.key_switch_quad_circ_ext(hint, prod)
    assert lin.encoding == "msd"
    np.testing.assert_array_equal(
        she.decrypt(sk, lin), she.pt_mul(PARAMS, m1, m2)
    )


def test_msd_align_different_scales(rng):
    """_align under MSD: scale-mismatched adds still decrypt correctly
    (f differs after an LSD->MSD conversion chain)."""
    sk = she.gen_sk(PARAMS, jax.random.PRNGKey(99))
    m1, m2 = she.pt_random(PARAMS, rng), she.pt_random(PARAMS, rng)
    c1 = she.encrypt_msd(sk, m1, jax.random.PRNGKey(100))
    # c2 via LSD->MSD conversion: picks up f = -Q^{-1} mod p != 1
    c2 = she.to_msd(she.encrypt(sk, m2, jax.random.PRNGKey(101)))
    assert c1.f != c2.f
    s = she.ct_add(c1, c2)
    np.testing.assert_array_equal(she.decrypt(sk, s), she.pt_add(PARAMS, m1, m2))
    d = she.ct_sub(c1, c2)
    np.testing.assert_array_equal(she.decrypt(sk, d), (m1 - m2) % PARAMS.p)
