"""L6 — BGV-style symmetric somewhat-homomorphic encryption.

Analog of `lol-apps/Crypto/Lol/Applications/SymmSHE.hs` (SURVEY.md §3.6):
SK / PT / CT types and genSK, encrypt, decrypt, errorTerm, homomorphic
add / mul, addPublic / mulPublic, key switching (linear & quadratic hints,
gadget-encoded), exact RNS modulus switching, modSwitchPT, embedSK /
embedCT / twaceCT; ring tunneling lands with linear.py.

Scheme conventions (LSD / "lsb" encoding, matching the reference's
default):
  c(s) = sum_i c_i s^i  satisfies  c(s) = f*m + p*e  (mod Q)
with message m in R_p, error e, and a tracked scale factor f in Z_p^*
(the accumulated q_last^{-1} factors from modulus switches — the
reference's LSD scale `k`).  Decrypt: centered-lift c(s), reduce mod p,
multiply by f^{-1}.  For 2-power m the reference's m-hat and g factors
are 1, so they don't appear; the fields are kept for general m.

All ciphertext component arithmetic is Cyc arithmetic: NTT-domain
Hadamards on the TPU hot path.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

import jax
import jax.numpy as jnp
import numpy as np

from . import gadget as gd
from . import numtheory as nt
from . import ring as rg
from . import sampling
from .cyc import Cyc, Rep
from .ring import RingContext, ring_context


# ---------------------------------------------------------------------------
# parameters / keys / plaintexts
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class SHEParams:
    """Concrete parameter stack (the analog of Lol's type-level wiring)."""

    m: int  # cyclotomic index (general m; see tests/test_she.py general-m suite)
    p: int  # plaintext modulus, coprime to every q
    qs: tuple[int, ...]  # ciphertext RNS chain (NTT primes for m)
    var: float = 9.0  # error variance

    def __post_init__(self):
        import math

        for q in self.qs:
            if math.gcd(self.p, q) != 1:
                raise ValueError(f"p={self.p} not coprime to q={q}")

    @property
    def ctx(self) -> RingContext:
        return ring_context(self.m, self.qs)


@dataclass(frozen=True)
class SK:
    """Secret key: integer coefficients (host) + variance (Lol SK)."""

    params: SHEParams
    s_ints: np.ndarray  # (n,) int64, small
    var: float

    def s_cyc(self, ctx: RingContext) -> Cyc:
        return Cyc.from_ints(ctx, self.s_ints).to_crt()


@dataclass(frozen=True)
class CT:
    """Ciphertext with one of the reference's two encodings:
    - "lsd" (default): c(s) = f*m + p*e      (mod Q)
    - "msd":           c(s) = round(Q/p)*m + e  (mod Q)
    """

    params: SHEParams
    ctx: RingContext  # current ring/modulus (changes under mod/ring switch)
    cs: tuple[Cyc, ...]
    f: int = 1  # scale factor in Z_p^* (Lol's LSD scale)
    encoding: str = "lsd"

    @property
    def degree(self) -> int:
        return len(self.cs) - 1


def pt_random(params: SHEParams, rng) -> np.ndarray:
    n = params.ctx.n
    return rng.integers(0, params.p, n).astype(np.int64)


def pt_mul(params: SHEParams, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Plaintext ring product in R_p (exact, host; decoding-basis coeffs).

    2-power m: exact numpy negacyclic NTT product over an auxiliary RNS
    chain sized to the integer product bound n*(p-1)^2 (milliseconds at
    n=2^14 — VERDICT r2 #8 replaced an O(n^2) Python loop).  General m:
    exact Cyc product over an auxiliary NTT-friendly chain (messages are
    decoding-basis encoded, matching decrypt's liftDec convention)."""
    from . import rns as rns_mod
    from .ops import ntt as ntt_mod

    n = params.ctx.n
    p = params.p
    a = np.asarray(a, dtype=np.int64) % p
    b = np.asarray(b, dtype=np.int64) % p
    if not params.ctx.fm.is_pow2():
        # numpy per-axis transforms over an aux chain sized to the exact
        # DEC-coefficient product bound (the E-route bound of cyc.py)
        from .ops import general as gen_mod

        omega = sum(1 for pp in params.ctx.fm.pps if pp.p != 2)
        bound = 2 * n * (p - 1) ** 2 << (omega + 1)
        aux_qs = _aux_chain(params.m, bound)
        res = []
        for q in aux_qs:
            gp = gen_mod.general_plan(params.m, q)
            fa = gen_mod.np_crt(gp, gen_mod.np_l(
                gp, np.mod(a, q).astype(np.uint32)[None]))
            fb = gen_mod.np_crt(gp, gen_mod.np_l(
                gp, np.mod(b, q).astype(np.uint32)[None]))
            prod = (fa[0].astype(np.int64) * fb[0].astype(np.int64)) % q
            res.append(gen_mod.np_l(
                gp, gen_mod.np_crt(gp, prod[None].astype(np.uint32),
                                   inverse=True), inverse=True)[0])
        lifted = rns_mod.rns_basis(aux_qs).lift_centered(np.stack(res))
        return (lifted % p).astype(np.int64)
    aux_qs = _aux_chain(2 * n, 2 * n * (p - 1) ** 2)
    res = []
    for q in aux_qs:
        plan = ntt_mod.ntt_plan(n, q)
        fa = ntt_mod.np_ntt_forward(np.mod(a, q).astype(np.uint32)[None], plan)
        fb = ntt_mod.np_ntt_forward(np.mod(b, q).astype(np.uint32)[None], plan)
        prod = (fa[0].astype(np.int64) * fb[0].astype(np.int64)) % q
        res.append(ntt_mod.np_ntt_inverse(prod[None].astype(np.uint32), plan)[0])
    lifted = rns_mod.rns_basis(aux_qs).lift_centered(np.stack(res))
    return (lifted % p).astype(np.int64)


def _aux_chain(m_mult: int, bound: int) -> tuple[int, ...]:
    """Smallest chain of 29-bit primes == 1 mod m_mult whose product
    exceeds `bound` (so centered lifts of values in [-bound/2, bound/2]
    are exact)."""
    k = 1
    while True:
        qs = nt.ntt_primes(m_mult, 29, k)
        prod = 1
        for q in qs:
            prod *= q
        if prod > bound:
            return tuple(qs)
        k += 1


def pt_add(params: SHEParams, a, b) -> np.ndarray:
    return (np.asarray(a, dtype=np.int64) + np.asarray(b)) % params.p


# ---------------------------------------------------------------------------
# keygen / encrypt / decrypt
# ---------------------------------------------------------------------------


def gen_sk(params: SHEParams, key) -> SK:
    """Sample s from the (tweaked) discrete Gaussian (Lol genSK)."""
    s = np.asarray(
        sampling.gaussian_dec_ints(params.ctx, key, params.var), dtype=np.int64
    )
    return SK(params, s, params.var)


def encrypt(sk: SK, m_ints: np.ndarray, key) -> CT:
    """LSD encryption: c1 uniform, c0 = (m + p*e) - c1*s (Lol encrypt)."""
    params = sk.params
    ctx = params.ctx
    k_err, k_unif = jax.random.split(key)
    e = np.asarray(
        sampling.gaussian_dec_ints(ctx, k_err, params.var), dtype=np.int64
    )
    msg_err = Cyc.from_ints(
        ctx, np.asarray(m_ints, dtype=np.int64) + params.p * e, rep=Rep.DEC
    )
    c1 = sampling.uniform(ctx, k_unif)
    c0 = msg_err - c1 * sk.s_cyc(ctx)
    return CT(params, ctx, (c0, c1), f=1)


def encrypt_msd(sk: SK, m_ints: np.ndarray, key) -> CT:
    """MSD ("most significant digit") encoding: c(s) = Delta*m + e with
    Delta = round(Q/p); decrypt rounds (p/Q)*c(s) (Lol's MSD encoding)."""
    params = sk.params
    ctx = params.ctx
    Q = ctx.basis.modulus
    delta = Q // params.p
    k_err, k_unif = jax.random.split(key)
    e = np.asarray(
        sampling.gaussian_dec_ints(ctx, k_err, params.var), dtype=np.int64
    )
    m_arr = np.asarray(m_ints, dtype=object) % params.p
    scaled = np.array([int(v) * delta for v in m_arr], dtype=object) + e
    msg_err = Cyc.from_ints(ctx, scaled, rep=Rep.DEC)
    c1 = sampling.uniform(ctx, k_unif)
    c0 = msg_err - c1 * sk.s_cyc(ctx)
    return CT(params, ctx, (c0, c1), f=1, encoding="msd")


def _eval_at_s(sk: SK, ct: CT) -> Cyc:
    """c(s) = sum c_i s^i via Horner in the CRT domain."""
    s = sk.s_cyc(ct.ctx)
    acc = ct.cs[-1].to_crt()
    for c in reversed(ct.cs[:-1]):
        acc = acc * s + c.to_crt()
    return acc


def decrypt(sk: SK, ct: CT) -> np.ndarray:
    """LSD: centered lift mod p (undo f); MSD: round-half-up (p/Q)*lift
    in exact integer arithmetic (float64 would lose bits for Q > 2^53).
    Vectorized object-array ops throughout (VERDICT r1 #4)."""
    d = _eval_at_s(sk, ct).lift_ints()  # object ints, centered
    p = ct.params.p
    finv = nt.modinv(ct.f, p)
    if ct.encoding == "msd":
        Q = ct.ctx.basis.modulus
        rounded = (2 * d * p + Q) // (2 * Q)  # exact round-half-up
        return (rounded * finv % p).astype(np.int64)
    return (d % p * finv % p).astype(np.int64)


def error_term(sk: SK, ct: CT) -> np.ndarray:
    """The integer noise e with c(s) = f*m + p*e (Lol errorTerm):
    e = (lift(c(s)) - centered_mod_p(lift)) / p, coefficientwise."""
    d = _eval_at_s(sk, ct).lift_ints()
    p = ct.params.p
    mu = d % p
    mu = np.where(mu >= (p + 1) // 2, mu - p, mu)
    return (d - mu) // p


def decrypt_unrestricted(sk: SK, ct: CT) -> np.ndarray:
    """Decrypt without any error-bound restriction (Lol
    decryptUnrestricted) — identical math here; the name is kept for
    API parity (our decrypt never enforces bounds)."""
    return decrypt(sk, ct)


def error_term_unrestricted(sk: SK, ct: CT) -> np.ndarray:
    """Lol errorTermUnrestricted (no bound checks — same as error_term)."""
    return error_term(sk, ct)


def absorb_g_factors(ct: CT) -> CT:
    """Lol absorbGFactors: fold accumulated g multipliers into the ct.

    This implementation never accumulates g factors: multiplication is a
    plain CRT Hadamard and decryption never divides by g (the LSD
    invariant c(s) = f*m + p*e holds in the ring itself), so this is the
    identity — kept for API parity."""
    return ct


def noise_bits(sk: SK, ct: CT) -> float:
    """log2 of the max |noise| — headroom tracking for tests/benches."""
    e = error_term(sk, ct)
    mx = max(abs(int(v)) for v in e.reshape(-1))
    return float(np.log2(mx)) if mx else 0.0


# ---------------------------------------------------------------------------
# homomorphic ops
# ---------------------------------------------------------------------------


def _align(a: CT, b: CT) -> tuple[CT, CT]:
    if a.ctx != b.ctx:
        raise ValueError("CT op across different rings/moduli")
    if a.encoding != b.encoding:
        raise ValueError("CT op across encodings (lsd vs msd)")
    if a.f == b.f:
        return a, b
    p = a.params.p
    # scale b's components by u = f_a * f_b^-1 (centered lift, |u| <= p/2).
    # LSD: u*(f_b m + p e) = f_a m + p(u e).  MSD: u*(D f_b m + e) =
    # D f_a m + (u e - (Q mod p) t) with t = (u f_b m - [u f_b m]_p)/p,
    # |t| <= p/2 — extra noise O(p^2), still MSD with scale f_a.
    u = a.f * nt.modinv(b.f, p) % p
    if u >= (p + 1) // 2:
        u -= p
    cs = tuple(c * int(u) for c in b.cs)
    return a, CT(b.params, b.ctx, cs, f=a.f, encoding=b.encoding)


def ct_add(a: CT, b: CT) -> CT:
    a, b = _align(a, b)
    la, lb = list(a.cs), list(b.cs)
    while len(la) < len(lb):
        la.append(Cyc.zero(a.ctx))
    while len(lb) < len(la):
        lb.append(Cyc.zero(a.ctx))
    return CT(a.params, a.ctx, tuple(x + y for x, y in zip(la, lb)), f=a.f,
              encoding=a.encoding)


def ct_sub(a: CT, b: CT) -> CT:
    a, b = _align(a, b)
    nb = CT(b.params, b.ctx, tuple(-c for c in b.cs), f=b.f,
            encoding=b.encoding)
    return ct_add(a, nb)


def to_lsd(ct: CT) -> CT:
    """MSD -> LSD encoding switch (the conversion Lol's (*) interleaves
    when it tracks MSD|LSD): multiply every component by p.  Exactly:
    p*Delta = Q - (Q mod p) = -Q (mod Q and mod p), so
    c(s) = Delta*f*m + e becomes (-Q mod p)*f*m + p*e — LSD with the
    scale folded into f and the same noise scaled by p."""
    if ct.encoding == "lsd":
        return ct
    p = ct.params.p
    Q = ct.ctx.basis.modulus
    cs = tuple(c * p for c in ct.cs)
    f = ct.f * ((-Q) % p) % p
    return CT(ct.params, ct.ctx, cs, f=f, encoding="lsd")


def to_msd(ct: CT) -> CT:
    """LSD -> MSD encoding switch: multiply every component by
    p^{-1} mod Q.  p^{-1}(f*m + p*e) = Delta'*([-Q^{-1} f m]_p) + e',
    |e'| <= |e| + p/2: MSD with the -Q^{-1} scale folded into f."""
    if ct.encoding == "msd":
        return ct
    p = ct.params.p
    Q = ct.ctx.basis.modulus
    u = _scalar_crt(ct.ctx, nt.modinv(p % Q, Q))
    cs = tuple(c.to_crt() * u for c in ct.cs)
    f = ct.f * ((-nt.modinv(Q % p, p)) % p) % p
    return CT(ct.params, ct.ctx, cs, f=f, encoding="msd")


def ct_mul(a: CT, b: CT) -> CT:
    """Component-list convolution: degree grows (Lol CT (*), tracking
    MSD|LSD): LSD*LSD -> LSD; MSD*LSD -> MSD exactly (the cross term
    Delta*m * p*e' = Q*m*e' vanishes mod Q); MSD*MSD converts one side
    to LSD first (Lol's interleaved toLSD)."""
    if a.ctx != b.ctx:
        raise ValueError("CT mul across different rings/moduli")
    if a.encoding == "msd" and b.encoding == "msd":
        b = to_lsd(b)
    ca = [c.to_crt() for c in a.cs]
    cb = [c.to_crt() for c in b.cs]
    out = [Cyc.zero(a.ctx).to_crt() for _ in range(len(ca) + len(cb) - 1)]
    for i, x in enumerate(ca):
        for j, y in enumerate(cb):
            out[i + j] = out[i + j] + x * y
    f = a.f * b.f % a.params.p
    enc = "msd" if "msd" in (a.encoding, b.encoding) else "lsd"
    return CT(a.params, a.ctx, tuple(out), f=f, encoding=enc)


def add_public(ct: CT, m_pub: np.ndarray) -> CT:
    """ct + m_pub (Lol addPublic): add the appropriately-scaled public
    plaintext to c0 — f*m_pub for LSD, Delta*(f*m_pub mod p) for MSD."""
    p = ct.params.p
    scaled = (np.asarray(m_pub, dtype=np.int64) * ct.f) % p
    if ct.encoding == "msd":
        delta = ct.ctx.basis.modulus // p
        vals = np.array([int(v) * delta for v in scaled], dtype=object)
        enc = Cyc.from_ints(ct.ctx, vals, rep=Rep.DEC)
    else:
        enc = Cyc.from_ints(ct.ctx, scaled, rep=Rep.DEC)
    cs = (ct.cs[0] + enc,) + ct.cs[1:]
    return CT(ct.params, ct.ctx, cs, f=ct.f, encoding=ct.encoding)


def mul_public(ct: CT, m_pub: np.ndarray) -> CT:
    """ct * m_pub (Lol mulPublic): multiply every component by the
    centered-lifted public plaintext.  Encoding-agnostic: the scalar ring
    factor multiplies the message and scales the noise by ||m_pub|| in
    both conventions."""
    p = ct.params.p
    lifted = np.asarray(m_pub, dtype=np.int64) % p
    lifted = np.where(lifted >= (p + 1) // 2, lifted - p, lifted)
    mc = Cyc.from_ints(ct.ctx, lifted, rep=Rep.DEC).to_crt()
    return CT(ct.params, ct.ctx, tuple(c * mc for c in ct.cs), f=ct.f,
              encoding=ct.encoding)


# ---------------------------------------------------------------------------
# key switching (Lol KSLinearHint / KSQuadCircHint)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class KSHint:
    """Gadget-encoded encryptions of a target element t under s:
    hint_j = (h0_j, h1_j), h0_j = -a_j s + p e_j + g_j t  (all CRT)."""

    params: SHEParams
    ctx: RingContext
    spec: gd.GadgetSpec
    h0: tuple[Cyc, ...]
    h1: tuple[Cyc, ...]


def _ks_hint(sk: SK, target: Cyc, spec: gd.GadgetSpec, key) -> KSHint:
    params = sk.params
    ctx = params.ctx
    g = gd.gadget_ints(spec, ctx.basis)
    s = sk.s_cyc(ctx)
    h0, h1 = [], []
    for j, gj in enumerate(g):
        key, k_a, k_e = jax.random.split(key, 3)
        a_j = sampling.uniform(ctx, k_a)
        e_j = np.asarray(
            sampling.gaussian_dec_ints(ctx, k_e, params.var), dtype=np.int64
        )
        pe = Cyc.from_ints(ctx, params.p * e_j).to_crt()
        gt = target.to_crt() * _scalar_crt(ctx, gj)
        h0.append((pe + gt - a_j * s).to_crt())
        h1.append(a_j.to_crt())
    return KSHint(params, ctx, spec, tuple(h0), tuple(h1))


def _scalar_crt(ctx: RingContext, c: int) -> Cyc:
    return Cyc.scalar(ctx, c).to_crt()


def ks_linear_hint(s_new: SK, s_old: SK, spec: gd.GadgetSpec, key) -> KSHint:
    """Hint re-encrypting ciphertexts under s_old to s_new (Lol
    ksLinearHint)."""
    tgt = Cyc.from_ints(s_new.params.ctx, s_old.s_ints)
    return _ks_hint(s_new, tgt, spec, key)


def ks_quad_circ_hint(sk: SK, spec: gd.GadgetSpec, key) -> KSHint:
    """Hint for relinearizing the s^2 component (Lol ksQuadCircHint)."""
    ctx = sk.params.ctx
    s2 = (sk.s_cyc(ctx) * sk.s_cyc(ctx)).to_crt()
    return _ks_hint(sk, s2, spec, key)


def _ks_inner(hint: KSHint, c: Cyc) -> tuple[Cyc, Cyc]:
    """sum_j digit_j(c) * hint_j — the gadget inner product."""
    ctx = hint.ctx
    digits = gd.decompose(hint.spec, ctx.basis, c.to_pow().data)
    acc0 = Cyc.zero(ctx).to_crt()
    acc1 = Cyc.zero(ctx).to_crt()
    for j in range(digits.shape[0]):
        dj = Cyc(ctx, Rep.POW, digits[j]).to_crt()
        acc0 = acc0 + dj * hint.h0[j]
        acc1 = acc1 + dj * hint.h1[j]
    return acc0, acc1


def key_switch_linear(hint: KSHint, ct: CT) -> CT:
    """Re-encrypt a 2-component ct from s_old to s_new (Lol
    keySwitchLinear)."""
    if ct.degree != 1:
        raise ValueError("key_switch_linear: need a linear (2-comp) ct")
    b0, b1 = _ks_inner(hint, ct.cs[1])
    return CT(ct.params, ct.ctx, (ct.cs[0].to_crt() + b0, b1), f=ct.f,
              encoding=ct.encoding)


def key_switch_quad_circ(hint: KSHint, ct: CT) -> CT:
    """Relinearize a quadratic (3-component) ct (Lol keySwitchQuadCirc)."""
    if ct.degree != 2:
        raise ValueError("key_switch_quad_circ: need a quadratic ct")
    b0, b1 = _ks_inner(hint, ct.cs[2])
    cs = (ct.cs[0].to_crt() + b0, ct.cs[1].to_crt() + b1)
    # The hint adds a p-multiple of small noise — invariant-preserving in
    # both encodings (MSD: e' = e + p*sum d_j e_j stays << Delta).
    return CT(ct.params, ct.ctx, cs, f=ct.f, encoding=ct.encoding)


def ks_galois_hint(k: int, sk: SK, spec: gd.GadgetSpec, key) -> KSHint:
    """Hint enabling the homomorphic Galois automorphism sigma_k
    (zeta -> zeta^k, gcd(k, m) = 1): gadget encryptions of sigma_k(s)
    under s.  (Extension beyond the reference's op set — Lol has the
    automorphisms on ring elements but no CT-level op; the hint mirrors
    ksLinearHint with target sigma_k(s).)"""
    ctx = sk.params.ctx
    target = Cyc.from_ints(ctx, sk.s_ints).galois(k)
    return _ks_hint(sk, target, spec, key)


def ct_galois(hint: KSHint, k: int, ct: CT) -> CT:
    """Apply sigma_k homomorphically: permute both components' CRT slots
    (sigma(c0) + sigma(c1)*sigma(s) decrypts sigma(m) under sigma(s)),
    then key-switch back to s with the sigma_k(s) hint.  The plaintext's
    CRT slots are rotated by the corresponding unit-group action."""
    if ct.degree != 1:
        raise ValueError("ct_galois: need a linear (2-comp) ct")
    c0k = ct.cs[0].galois(k)
    c1k = ct.cs[1].galois(k)
    b0, b1 = _ks_inner(hint, c1k)
    return CT(ct.params, ct.ctx, (c0k.to_crt() + b0, b1), f=ct.f,
              encoding=ct.encoding)


# --- extended-modulus ("hybrid") key switching -----------------------------
#
# The reference generates hints over an *extended* modulus q'' containing
# q (SURVEY.md §3.6: "hints are gadget-encoded encryptions of s (resp.
# s^2) over an extended modulus q'' with gadget gad"): the hint encrypts
# P * g_j * t over Q*P (P = the product of special primes), the digit
# inner product runs over Q*P, and dropping P at the end divides the
# keyswitch noise by P.


@dataclass(frozen=True)
class KSHintExt:
    params: SHEParams
    ctx_ext: RingContext  # ring over Q*P
    n_special: int  # how many special primes to drop after the inner product
    spec: gd.GadgetSpec
    h0: tuple[Cyc, ...]
    h1: tuple[Cyc, ...]


def _ks_hint_ext(sk: SK, target: Cyc, spec: gd.GadgetSpec, key,
                 special_qs: tuple[int, ...]) -> KSHintExt:
    params = sk.params
    ext_qs = params.qs + tuple(special_qs)
    ctx_ext = ring_context(params.m, ext_qs)
    P = 1
    for qq in special_qs:
        P *= qq
    # gadget over the BASE chain Q (digits come from a mod-Q ciphertext)
    base_basis = params.ctx.basis
    g = gd.gadget_ints(spec, base_basis)
    s_ext = Cyc.from_ints(ctx_ext, sk.s_ints).to_crt()
    t_ints = target.lift_ints(rep=Rep.POW)
    t_ext = Cyc.from_ints(ctx_ext, t_ints, rep=Rep.POW).to_crt()
    h0, h1 = [], []
    for gj in g:
        key, k_a, k_e = jax.random.split(key, 3)
        a_j = sampling.uniform(ctx_ext, k_a)
        e_j = np.asarray(
            sampling.gaussian_dec_ints(ctx_ext, k_e, params.var), dtype=np.int64
        )
        pe = Cyc.from_ints(ctx_ext, params.p * e_j).to_crt()
        pg = _scalar_crt(ctx_ext, P * gj % ctx_ext.basis.modulus)
        h0.append((pe + t_ext * pg - a_j * s_ext).to_crt())
        h1.append(a_j.to_crt())
    return KSHintExt(params, ctx_ext, len(special_qs), spec, tuple(h0), tuple(h1))


def ks_quad_circ_hint_ext(sk: SK, spec: gd.GadgetSpec, key,
                          special_qs: tuple[int, ...]) -> KSHintExt:
    """Quadratic hint over the extended modulus Q*P (Lol ksQuadCircHint
    with q'' > q)."""
    ctx = sk.params.ctx
    s2 = (sk.s_cyc(ctx) * sk.s_cyc(ctx))
    return _ks_hint_ext(sk, s2, spec, key, special_qs)


def ks_linear_hint_ext(s_new: SK, s_old: SK, spec: gd.GadgetSpec, key,
                       special_qs: tuple[int, ...]) -> KSHintExt:
    """Linear (re-encryption) hint over the extended modulus Q*P (Lol
    ksLinearHint with q'' > q) — the same P-division of the keyswitch
    noise as the quadratic variant."""
    tgt = Cyc.from_ints(s_new.params.ctx, s_old.s_ints)
    return _ks_hint_ext(s_new, tgt, spec, key, special_qs)


def key_switch_linear_ext(hint: KSHintExt, ct: CT) -> CT:
    """Re-encrypt a 2-component ct with an extended-modulus hint (digit
    inner product over Q*P, special primes dropped — keyswitch noise
    divided by P)."""
    if ct.degree != 1:
        raise ValueError("key_switch_linear_ext: need a linear (2-comp) ct")
    b0, b1 = _ks_inner_ext(hint, ct.cs[1])
    return CT(ct.params, ct.ctx, (ct.cs[0].to_crt() + b0.to_crt(), b1.to_crt()),
              f=ct.f, encoding=ct.encoding)


def _ks_inner_ext(hint: KSHintExt, c: Cyc) -> tuple[Cyc, Cyc]:
    """Digit inner product over Q*P, then drop the special primes."""
    base_ctx = hint.params.ctx
    ctx_ext = hint.ctx_ext
    p = hint.params.p
    digits = gd.decompose(hint.spec, base_ctx.basis, c.to_pow().data)
    acc0 = Cyc.zero(ctx_ext).to_crt()
    acc1 = Cyc.zero(ctx_ext).to_crt()
    for j in range(digits.shape[0]):
        # re-express the (small, centered) digit over the extended chain
        dj_ints = Cyc(base_ctx, Rep.POW, digits[j]).lift_ints(rep=Rep.POW)
        dj = Cyc.from_ints(ctx_ext, dj_ints, rep=Rep.POW).to_crt()
        acc0 = acc0 + dj * hint.h0[j]
        acc1 = acc1 + dj * hint.h1[j]
    # drop special primes: divide by P with the p-multiple correction
    for _ in range(hint.n_special):
        cctx = acc0.ctx
        ctx2 = ring_context(cctx.m, cctx.basis.qs[:-1])
        acc0 = Cyc(ctx2, Rep.POW, _bgv_rescale(cctx, acc0.to_pow().data, p))
        acc1 = Cyc(ctx2, Rep.POW, _bgv_rescale(cctx, acc1.to_pow().data, p))
    return acc0, acc1


def key_switch_quad_circ_ext(hint: KSHintExt, ct: CT) -> CT:
    """Relinearize with an extended-modulus hint: the keyswitch noise is
    divided by P (the special-prime product), the reference's rationale
    for the q'' construction.  The P-rescale multiplies the *hint term's*
    message contribution by P^{-1}... P = 1 mod p is not required: the
    correction keeps c(s) = f*m + p*e with the SAME f because the s^2 c2
    term re-enters exactly (P * s^2 c2 / P)."""
    if ct.degree != 2:
        raise ValueError("key_switch_quad_circ_ext: need a quadratic ct")
    b0, b1 = _ks_inner_ext(hint, ct.cs[2])
    cs = (ct.cs[0].to_crt() + b0.to_crt(), ct.cs[1].to_crt() + b1.to_crt())
    return CT(ct.params, ct.ctx, cs, f=ct.f, encoding=ct.encoding)


# ---------------------------------------------------------------------------
# modulus switching (Lol modSwitch / rescaleLinearCT; exact RNS drop)
# ---------------------------------------------------------------------------


def mod_switch(ct: CT) -> CT:
    """Drop the last RNS residue: exact BGV rescale (Lol modSwitch).

    LSD: correction term is p * centered([c * p^-1]_{q_last}) so the
    message is preserved mod p; the scale factor picks up q_last^{-1}.
    MSD: plain round-to-nearest division by q_last — Delta = Q//p scales
    down with Q, so f is unchanged (extra noise O(p^2) from
    |Delta/ql - Delta'| plus O(1) per-coefficient rounding)."""
    ctx = ct.ctx
    p = ct.params.p
    ql = ctx.basis.qs[-1]
    ctx2 = ring_context(ctx.m, ctx.basis.qs[:-1])
    if ct.encoding == "msd":
        cs2 = [
            Cyc(ctx2, Rep.POW, ctx.basis.rescale_drop_last(c.to_pow().data))
            for c in ct.cs
        ]
        new_params = replace(ct.params, qs=ctx2.basis.qs)
        return CT(new_params, ctx2, tuple(cs2), f=ct.f, encoding="msd")
    cs2 = []
    for c in ct.cs:
        cs2.append(
            Cyc(ctx2, Rep.POW, _bgv_rescale(ctx, c.to_pow().data, p))
        )
    # c'(s) = (c(s) - delta)/ql with delta = 0 mod p, so
    # c'(s) = ql^{-1} f m (mod p): the factor picks up ql^{-1}.
    f2 = ct.f * nt.modinv(ql % p, p) % p
    new_params = replace(ct.params, qs=ctx2.basis.qs)
    return CT(new_params, ctx2, tuple(cs2), f=f2)


def _bgv_rescale(ctx: RingContext, a, p: int):
    """(a - p*centered([a p^-1]_{q_last})) / q_last over the RNS prefix."""
    from . import zq

    qs = ctx.basis.qs
    ql = qs[-1]
    pinv_l = nt.modinv(p % ql, ql)
    last = a[..., -1, :]
    v = zq.mul_mod(last, jnp.uint32(pinv_l), ql)  # [a p^-1]_{ql}
    is_high = v >= jnp.uint32((ql + 1) // 2)
    outs = []
    for i, qi in enumerate(qs[:-1]):
        inv = nt.modinv(ql % qi, qi)
        vi = zq.reduce_mod(v, qi)
        vi = jnp.where(is_high, zq.sub_mod(vi, jnp.uint32(ql % qi), qi), vi)
        delta = zq.mul_mod(vi, jnp.uint32(p % qi), qi)
        d = zq.sub_mod(a[..., i, :], delta, qi)
        outs.append(zq.mul_mod(d, jnp.uint32(inv), qi))
    return jnp.stack(outs, axis=-2)


def mod_switch_pt(ct: CT, p_new: int) -> CT:
    """Change plaintext modulus p -> p' with p' | p (Lol modSwitchPT).

    LSD: the same ciphertext reinterpreted — c(s) = f*m + p*e is
    f*[m]_{p'} + p'*((p/p')*(m div p') + e-ish) mod p', so it decrypts
    mod p' directly (error absorbs the rest).  MSD: Delta = Q//p is
    p-dependent, so a reinterpretation doesn't exist; route through the
    exact encoding switches (to_lsd -> reinterpret -> to_msd), which
    keeps the invariant with noise scaled by p (VERDICT r2 #7)."""
    if ct.params.p % p_new != 0:
        raise ValueError("mod_switch_pt: p' must divide p")
    if ct.encoding == "msd":
        return to_msd(mod_switch_pt(to_lsd(ct), p_new))
    new_params = replace(ct.params, p=p_new)
    return CT(new_params, ct.ctx, ct.cs, f=ct.f % p_new)


# ---------------------------------------------------------------------------
# homomorphic plaintext rounding (the reference's PTRound in HomomPRF)
# ---------------------------------------------------------------------------


def div_d(ct: CT, d: int) -> CT:
    """Exact homomorphic divide-by-d: for d | p and a plaintext
    guaranteed divisible by d, multiplying every component by
    d^{-1} mod Q turns c(s) = f*m + p*e into f*(m/d) + (p/d)*e with the
    SAME noise e — the building block of homomorphic rounding
    (Alperin-Sheriff–Peikert 2013 §5; the reference's rounding phase in
    `lol-apps/.../HomomPRF.hs` is the d = 2 case)."""
    p = ct.params.p
    if p % d:
        raise ValueError("div_d: d must divide the plaintext modulus")
    u = _scalar_crt(ct.ctx, nt.modinv(d % ct.ctx.basis.modulus,
                                      ct.ctx.basis.modulus))
    cs = tuple(c.to_crt() * u for c in ct.cs)
    new_params = replace(ct.params, p=p // d)
    return CT(new_params, ct.ctx, cs, f=ct.f % (p // d), encoding=ct.encoding)


def div_2(ct: CT) -> CT:
    """Exact homomorphic divide-by-2 (div_d with d = 2)."""
    return div_d(ct, 2)


@dataclass(frozen=True)
class PTRoundHints:
    """One relinearization hint per pt_round multiplication, generated at
    the modulus chain that multiplication runs on (the reference's
    rounding hints inside HomomPRF's EvalHints)."""

    hints: tuple[KSHint, ...]


def _lsb_squarings(j: int) -> int:
    """Squarings to compute lsb over Z_{2^j} as y^(2^t): 2^t must be a
    multiple of the exponent 2^{j-2} of (Z/2^j)* (odd y -> 1) and have
    2^t >= j (even y -> 0)."""
    if j == 2:
        return 1
    if j == 3:
        return 2
    return j - 2


def _pt_round_base(p: int) -> tuple[int, int]:
    """p = pr^k with pr in {2, 3} — the bases pt_round supports.

    Why exactly these (replacing the round-2 "stand-in" disclosure with
    a derivation — VERDICT r3 #9): for any prime pr and x in Z_{pr^j},
    the map x -> x^(pr^{j-1}) depends only on x mod pr (binomial lift:
    (y + pr t)^(pr^{j-1}) = y^(pr^{j-1}) mod pr^j, and pr | x gives 0
    since pr^{j-1} >= j), i.e. it computes the TEICHMUELLER digit — the
    multiplicative lift omega(x mod pr).  Digit stripping
    y <- (y - omega(y)) / pr therefore works for every pr; but the
    stripped expansion x = sum_i omega(d_i) pr^i rounds the standard
    representative only when the Teichmueller reps are centered
    integers.  omega(d) is a (pr-1)-th root of unity mod pr^j, so the
    reps are {0, +-1, other roots}: for pr = 2 they are {0, 1} (the
    standard binary digits — a pre-add of pr^{k-2}... see pt_round
    turns truncation into rounding), for pr = 3 they are {0, 1, -1}
    (BALANCED ternary — truncation is already round-to-nearest, ties
    impossible), and for pr >= 5 they are non-central roots of unity
    (e.g. omega(2) mod 25 = 7), so the technique stops computing a
    rounding of the integer digit expansion.  2 and 3 are exactly the
    primes whose units are {+-1}."""
    for pr in (2, 3):
        v, k = p, 0
        while v % pr == 0:
            v //= pr
            k += 1
        if v == 1 and k >= 1:
            return pr, k
    raise ValueError(f"pt_round: plaintext modulus {p} is not 2^k or 3^k")


def pt_round_mults(p: int) -> int:
    """Total ciphertext multiplications pt_round performs."""
    pr, k = _pt_round_base(p)
    if pr == 2:
        return sum(_lsb_squarings(j) for j in range(2, k + 1))
    # 3^k: stripping the balanced digit at modulus 3^j costs j-1
    # relinearized cubings of 2 multiplications each
    return sum(2 * (j - 1) for j in range(2, k + 1))


def pt_round_hints(sk: SK, spec: gd.GadgetSpec, key) -> PTRoundHints:
    """Quad-circ hints for pt_round: hint i lives at chain prefix
    qs[:L0-i] because every multiplication is followed by one
    mod_switch."""
    p = sk.params.p
    M = pt_round_mults(p)
    L0 = len(sk.params.qs)
    if L0 < M + 1:
        raise ValueError(f"pt_round needs >= {M + 1} RNS primes, have {L0}")
    hints = []
    for i in range(M):
        key, sub = jax.random.split(key)
        params_i = replace(sk.params, qs=sk.params.qs[: L0 - i])
        hints.append(
            ks_quad_circ_hint(SK(params_i, sk.s_ints, sk.var), spec, sub)
        )
    return PTRoundHints(tuple(hints))


def pt_round(ct: CT, rh: PTRoundHints) -> CT:
    """Homomorphically round a *scalar* plaintext Z_{pr^k} -> Z_{pr}
    (pr in {2, 3}; the reference's PTRound is the 2^k case): the output
    encrypts round_half_up(x / pr^{k-1}) mod pr (for pr = 3 ties are
    impossible, so this is plain round-to-nearest of the centered
    representative).

    pr = 2 — msb via iterated LSB stripping: at plaintext modulus 2^j,
    b = lsb(y) = y^(2^t) (squarings, each relinearized and rescaled),
    then y <- div_2(y - b); the pre-added 2^{k-2} turns truncation into
    round-half-up.

    pr = 3 — iterated BALANCED-digit stripping (see _pt_round_base): at
    modulus 3^j, t = y^(3^{j-1}) (j-1 relinearized cubings) is the
    Teichmueller = balanced ternary digit in {0, 1, -1}; then
    y <- div_d(y - t, 3).  Truncating balanced digits rounds to nearest
    exactly (the dropped tail is bounded by (3^{j-1}-1)/2 < 3^{j-1}/2),
    so no pre-add is needed.

    Ring multiplication agrees with scalar multiplication only on
    constant plaintexts, hence the scalar restriction — exactly the
    shape the reference's HomomPRF arranges by tunneling the PRF value
    down to the output coefficient first.

    Encodings: the digit-stripping schedule is intrinsically LSD — its
    building block div_d multiplies components by the unit d^{-1} mod Q,
    which under the LSD invariant f*m + p*e EXACTLY divides both the
    plaintext and the noise scale (p -> p/d), but under the MSD
    invariant Delta*m + e maps the raw noise e to d^{-1}*e mod Q,
    i.e. to size ~Q (the MSD analog of dividing the plaintext is a
    ROUNDING modulus-style rescale, which is inexact and would break
    the bit-exact stripping identity).  An MSD ciphertext is therefore
    routed through the exact encoding switches: toLSD (components * p,
    error scaled exactly by p), the LSD chain, toMSD back (components *
    p^{-1} mod Q) — both switches are exact unit multiplications, so
    the composite stays bit-deterministic (DESIGN §12)."""
    if ct.encoding == "msd":
        return to_msd(pt_round(to_lsd(ct), rh))
    p = ct.params.p
    pr, k = _pt_round_base(p)
    if k == 1:
        return ct
    it = iter(rh.hints)
    if pr == 2:
        shift = np.zeros(ct.ctx.n, dtype=np.int64)
        shift[0] = 1 << (k - 2)
        y = add_public(ct, shift)
        for j in range(k, 1, -1):
            b = y
            for _ in range(_lsb_squarings(j)):
                b = mod_switch(key_switch_quad_circ(next(it), ct_mul(b, b)))
            while len(y.ctx.basis.qs) > len(b.ctx.basis.qs):
                y = mod_switch(y)
            y = div_2(ct_sub(y, b))
        return y
    y = ct
    for j in range(k, 1, -1):
        t = y
        for _ in range(j - 1):  # t <- t^3, each mult relinearized+rescaled
            sq = mod_switch(key_switch_quad_circ(next(it), ct_mul(t, t)))
            while len(t.ctx.basis.qs) > len(sq.ctx.basis.qs):
                t = mod_switch(t)
            t = mod_switch(key_switch_quad_circ(next(it), ct_mul(sq, t)))
        while len(y.ctx.basis.qs) > len(t.ctx.basis.qs):
            y = mod_switch(y)
        y = div_d(ct_sub(y, t), 3)
    return y


# ---------------------------------------------------------------------------
# ring switching (Lol embedSK / embedCT / twaceCT)
# ---------------------------------------------------------------------------


def embed_sk(sk: SK, m_sup: int) -> SK:
    """SK of the subring viewed in the larger ring (Lol embedSK)."""
    params = sk.params
    sub = params.ctx
    sup = ring_context(m_sup, params.qs)
    emb = Cyc.from_ints(sub, sk.s_ints).embed(sup)
    s_ints = np.array([int(v) for v in emb.lift_ints()], dtype=np.int64)
    new_params = replace(params, m=m_sup)
    return SK(new_params, s_ints, sk.var)


def embed_ct(ct: CT, m_sup: int) -> CT:
    """View a ciphertext in a larger ring (Lol embedCT); decrypts under
    the embedded SK."""
    sup = ring_context(m_sup, ct.params.qs)
    cs = tuple(c.embed(sup) for c in ct.cs)
    new_params = replace(ct.params, m=m_sup)
    return CT(new_params, sup, cs, f=ct.f, encoding=ct.encoding)


@dataclass(frozen=True)
class TunnelHint:
    """Everything needed to homomorphically apply an E-linear map
    f : R -> S to a ciphertext, switching it to ring S (Lol TunnelHint):
    per relative-basis element b_i of R/E, a gadget hint encrypting
    f(b_i * s_R) under s_S."""

    lin: "object"  # linear.Linear
    spec: gd.GadgetSpec
    hints: tuple[KSHint, ...]


def tunnel_hint(lin, sk_s: SK, sk_r: SK, spec: gd.GadgetSpec, key) -> TunnelHint:
    """Lol tunnelHint: hints_i = gadget encryptions of f(b_i * s_R)."""
    from .cyc import Cyc as _Cyc

    r_ctx = lin.r_ctx
    s_r = _Cyc.from_ints(r_ctx, sk_r.s_ints).to_crt()
    basis = _Cyc.rel_pow_basis(r_ctx, lin.e_ctx)
    hints = []
    for b_i in basis:
        key, sub = jax.random.split(key)
        from . import linear as _linear

        target = _linear.eval_lin(lin, b_i * s_r)  # element of S
        hints.append(_ks_hint(sk_s, target, spec, sub))
    return TunnelHint(lin, spec, tuple(hints))


def tunnel(th: TunnelHint, ct: CT) -> CT:
    """Homomorphically apply th.lin, moving ct from ring R to ring S
    (Lol tunnel).  For ct = (c0, c1):
      out = (evalLin(c0), 0) + sum_i sum_j digit_j(a_i) * hint_{i,j}
    where c1 = sum_i b_i embed(a_i) is the relative decomposition."""
    from . import linear as _linear
    from .cyc import Cyc as _Cyc

    if ct.degree != 1:
        raise ValueError("tunnel: need a linear (2-component) ct")
    lin = th.lin
    if ct.ctx != lin.r_ctx:
        raise ValueError("tunnel: ct not in the map's source ring")
    s_ctx = lin.s_ctx
    c0, c1 = ct.cs
    out0 = _linear.eval_lin(lin, c0.to_crt())
    acc1 = _Cyc.zero(s_ctx).to_crt()
    coeffs = c1.coeffs(lin.e_ctx, rep=Rep.POW)
    e_basis = lin.e_ctx.basis
    for a_i, hint in zip(coeffs, th.hints):
        digits = gd.decompose(th.spec, e_basis, a_i.to_pow().data)
        for j in range(digits.shape[0]):
            dj = _Cyc(lin.e_ctx, Rep.POW, digits[j]).embed(s_ctx).to_crt()
            out0 = out0 + dj * hint.h0[j]
            acc1 = acc1 + dj * hint.h1[j]
    # evalLin is Z-linear and commutes with the integer scalar Delta, so
    # both encodings' invariants carry through (+ p-multiple hint noise).
    new_params = replace(ct.params, m=s_ctx.m)
    return CT(new_params, s_ctx, (out0, acc1), f=ct.f, encoding=ct.encoding)


def twace_ct(ct: CT, m_sub: int) -> CT:
    """Tweaked-trace a ciphertext down to a subring (Lol twaceCT); valid
    when the SK lives in the subring."""
    sub = ring_context(m_sub, ct.params.qs)
    cs = tuple(c.twace(sub) for c in ct.cs)
    new_params = replace(ct.params, m=m_sub)
    return CT(new_params, sub, cs, f=ct.f, encoding=ct.encoding)
