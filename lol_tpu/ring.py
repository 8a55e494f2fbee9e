"""L3 — the Tensor layer: cyclotomic-ring transforms over RNS arrays.

Analog of `lol/Crypto/Lol/Cyclotomic/Tensor.hs`'s `class Tensor t` plus the
C++ kernels of lol-cpp (SURVEY.md §3.3/§3.4).  A `RingContext` bundles the
cyclotomic index (Factored m) with the RNS chain and caches per-residue
transform plans; the Tensor methods are free functions over uint32 arrays
of shape (..., nrns, n), n = phi(m).

2-power path (m = 2^k) implemented first — there the toolkit algebra
degenerates pleasantly: the decoding basis equals the powerful basis
(L = identity), g = prod_{odd p|m}(1 - zeta_p) = 1 (empty product), and
the CRT transform is the negacyclic NTT (fused Pallas kernels).  The
general-m tensor-product transforms land in ops/general.py and hook in
through the same RingContext plan dispatch.

Method map to the reference Tensor class (SURVEY.md §3.4):
  scalarPow -> scalar_pow      l/lInv -> l / l_inv
  crt/crtInv -> crt / crt_inv  mulG*/divG* -> mul_g_* / div_g_*
  twacePowDec/twaceCRT -> twace_pow / twace_crt
  embedPow/embedDec/embedCRT -> embed_pow / embed_crt
  coeffs -> coeffs_pow         powBasisPow -> pow_basis
  tweakedGaussianDec -> sampling.gaussian_dec (sampling.py)
  gSqNormDec -> gsq_norm_dec   fmapT/zipWithT -> plain jnp ops
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from . import numtheory as nt
from . import zq
from .factored import Factored, fact
from .ops import general as gen
from .ops import ntt
from .rns import RnsBasis, rns_basis


@dataclass(frozen=True)
class RingContext:
    """(cyclotomic index m, RNS chain) + cached transform plans.

    The runtime analog of Lol's type-level (m, q) pair: two Cyc values
    interoperate iff their contexts are equal."""

    fm: Factored
    basis: RnsBasis

    @property
    def m(self) -> int:
        return self.fm.m

    @property
    def n(self) -> int:
        return self.fm.phi

    @property
    def nrns(self) -> int:
        return self.basis.nrns

    def __post_init__(self):
        # CRT availability is checked lazily (crt() raises) — plaintext
        # rings R_{p^k} legitimately have no CRT basis (Lol CRTSentinel
        # E-route; the complex-embedding fallback covers char-0 needs).
        pass

    def has_crt(self) -> bool:
        return all(mod.has_crt(2 * self.n if self.fm.is_pow2() else self.m)
                   for mod in self.basis.moduli)

    def ntt_plans(self) -> list[ntt.NTTPlan]:
        if not self.fm.is_pow2():
            raise NotImplementedError("general-m plans: use general_plans()")
        return [_pow2_plan(self.n, q) for q in self.basis.qs]

    def general_plans(self) -> list["gen.GeneralPlan"]:
        return [gen.general_plan(self.m, q) for q in self.basis.qs]

    def child(self, m2: int) -> "RingContext":
        """Same moduli, different index (for embed/twace towers)."""
        return ring_context(m2, self.basis.qs)

    def __repr__(self):
        return f"RingContext(m={self.m}, qs={self.basis.qs})"


@lru_cache(maxsize=512)
def _pow2_plan(n: int, q: int) -> ntt.NTTPlan:
    return ntt.ntt_plan(n, q)


@lru_cache(maxsize=512)
def ring_context(m: int, qs: tuple[int, ...]) -> RingContext:
    return RingContext(fact(m), rns_basis(tuple(qs)))


# ---------------------------------------------------------------------------
# basic constructors
# ---------------------------------------------------------------------------


def scalar_pow(ctx: RingContext, c) -> jnp.ndarray:
    """Embed a scalar as a constant in the powerful basis (Lol scalarPow).

    c: Python int (taken mod each q_i) or per-residue (nrns,) array."""
    out = np.zeros((ctx.nrns, ctx.n), dtype=np.uint32)
    if isinstance(c, (int, np.integer)):
        for i, q in enumerate(ctx.basis.qs):
            out[i, 0] = int(c) % q
    else:
        c = np.asarray(c)
        out[:, 0] = c
    return jnp.asarray(out)


def zero(ctx: RingContext, batch: tuple[int, ...] = ()) -> jnp.ndarray:
    return jnp.zeros((*batch, ctx.nrns, ctx.n), dtype=jnp.uint32)


# ---------------------------------------------------------------------------
# basis conversions
# ---------------------------------------------------------------------------


def _per_residue(ctx: RingContext, x, fn):
    """Apply fn(residue_channel, plan) along the rns axis (-2)."""
    plans = ctx.ntt_plans()
    outs = [fn(x[..., i, :], plans[i]) for i in range(ctx.nrns)]
    return jnp.stack(outs, axis=-2)


def _per_residue_gen(ctx: RingContext, x, fn):
    plans = ctx.general_plans()
    outs = [fn(x[..., i, :], plans[i]) for i in range(ctx.nrns)]
    return jnp.stack(outs, axis=-2)


def crt(ctx: RingContext, x) -> jnp.ndarray:
    """Powerful -> CRT basis (Lol Tensor.crt).  2-power: negacyclic NTT;
    general m: prime-power tensor transforms (ops/general.py)."""
    if ctx.m > 1 and not ctx.has_crt():
        raise ValueError(
            f"no CRT basis over qs={ctx.basis.qs} for m={ctx.m} "
            "(need m | q-1; Lol's CSentinel unavailable)"
        )
    if ctx.fm.is_pow2():
        return _per_residue(ctx, x, lambda c, p: ntt.ntt_forward_stages(c, p))
    return _per_residue_gen(ctx, x, lambda c, p: gen.crt(p, c))


def crt_inv(ctx: RingContext, x) -> jnp.ndarray:
    if ctx.fm.is_pow2():
        return _per_residue(ctx, x, lambda c, p: ntt.ntt_inverse_stages(c, p))
    return _per_residue_gen(ctx, x, lambda c, p: gen.crt_inv(p, c))


def l(ctx: RingContext, x) -> jnp.ndarray:
    """Decoding -> powerful basis (Lol Tensor.l); identity for 2-power m."""
    if ctx.fm.is_pow2():
        return x
    return _per_residue_gen(ctx, x, lambda c, p: gen.l(p, c))


def l_inv(ctx: RingContext, x) -> jnp.ndarray:
    if ctx.fm.is_pow2():
        return x
    return _per_residue_gen(ctx, x, lambda c, p: gen.l_inv(p, c))


# --- g multiplication (g = prod over odd primes; = 1 for 2-power m) -------


def mul_g_pow(ctx: RingContext, x) -> jnp.ndarray:
    if ctx.fm.odd_radical == 1:
        return x
    return _per_residue_gen(ctx, x, lambda c, p: gen.mul_g_pow(p, c))


def mul_g_dec(ctx: RingContext, x) -> jnp.ndarray:
    if ctx.fm.odd_radical == 1:
        return x
    return _per_residue_gen(ctx, x, lambda c, p: gen.mul_g_dec(p, c))


def mul_g_crt(ctx: RingContext, x) -> jnp.ndarray:
    if ctx.fm.odd_radical == 1:
        return x
    return _per_residue_gen(ctx, x, lambda c, p: gen.mul_g_crt(p, c))


def div_g_pow(ctx: RingContext, x):
    if ctx.fm.odd_radical == 1:
        return x
    return _per_residue_gen(ctx, x, lambda c, p: gen.div_g_pow(p, c))


def div_g_dec(ctx: RingContext, x):
    if ctx.fm.odd_radical == 1:
        return x
    return _per_residue_gen(ctx, x, lambda c, p: gen.div_g_dec(p, c))


def div_g_crt(ctx: RingContext, x):
    if ctx.fm.odd_radical == 1:
        return x
    return _per_residue_gen(ctx, x, lambda c, p: gen.div_g_crt(p, c))


# ---------------------------------------------------------------------------
# ring arithmetic helpers (pointwise; Lol zipWithT / fmapT)
# ---------------------------------------------------------------------------


def add(ctx: RingContext, a, b):
    return ctx.basis.add(a, b)


def sub(ctx: RingContext, a, b):
    return ctx.basis.sub(a, b)


def neg(ctx: RingContext, a):
    return ctx.basis.neg(a)


def mul_pointwise(ctx: RingContext, a, b):
    """Hadamard product — ring multiplication when both are in CRT basis."""
    return ctx.basis.mul(a, b)


def mul_scalar_int(ctx: RingContext, a, c: int):
    outs = [
        zq.mul_mod(a[..., i, :], jnp.uint32(int(c) % q), q)
        for i, q in enumerate(ctx.basis.qs)
    ]
    return jnp.stack(outs, axis=-2)


# ---------------------------------------------------------------------------
# subring structure: embed / twace / coeffs for 2-power towers
# ---------------------------------------------------------------------------
#
# For m' | m both 2-powers (n' | n): zeta_{m'} = zeta_m^(m/m'), so the
# powerful-basis embedding sends x'^j -> x^(j * n/n') — a stride scatter.
# The tweaked trace Tw: R_m -> R_{m'} satisfies Tw(embed(b')) = b' and
# kills the other powerful-basis monomials: a stride *gather* of the
# coefficients at multiples of n/n'.  (Reference: twacePowDec / embedPow
# index tables; LPR toolkit §2.)  In the CRT basis, embed replicates
# across the m/m' evaluation cosets and twace averages them.


def embed_pow(sub: RingContext, sup: RingContext, x) -> jnp.ndarray:
    if not sub.fm.divides(sup.fm):
        raise ValueError(f"embed: {sub.m} does not divide {sup.m}")
    if sub.basis.qs != sup.basis.qs:
        raise ValueError("embed: moduli must match")
    return gen.embed_pow(sub.m, sup.m, x)


def embed_dec(sub: RingContext, sup: RingContext, x) -> jnp.ndarray:
    """Decoding-basis embedding (Lol embedDec): same index table as the
    powerful basis — the relative factors live in the prime level, which
    L does not move (see ops/general.py rel_coeff_table)."""
    return embed_pow(sub, sup, x)


def twace_pow(sup: RingContext, sub: RingContext, x) -> jnp.ndarray:
    """Tweaked trace in the powerful/decoding basis: coordinate gather."""
    if not sub.fm.divides(sup.fm):
        raise ValueError(f"twace: {sub.m} does not divide {sup.m}")
    return gen.twace_pow(sub.m, sup.m, x)


def _crt_embed_index(sub: RingContext, sup: RingContext) -> np.ndarray:
    """index table: CRT slot j of R_m reads CRT slot tbl[j] of R_{m'}.

    Slot j of R_m evaluates at psi^e, e = 2*brv(j)+1 (ops/ntt.py order
    spec); the embedded element evaluates at (psi^e)^(m/m') = psi'^e, i.e.
    sub-slot with exponent e mod 2n'."""
    n_sup, n_sub = sup.n, sub.n
    exps_sup = ntt.crt_output_exponents(n_sup)  # length n_sup, odd values
    exps_sub = ntt.crt_output_exponents(n_sub)
    pos = {int(e): i for i, e in enumerate(exps_sub)}
    tbl = np.array([pos[int(e) % (2 * n_sub)] for e in exps_sup], dtype=np.int32)
    return tbl


def embed_crt(sub: RingContext, sup: RingContext, x) -> jnp.ndarray:
    outs = [
        gen.embed_crt(sub.m, sup.m, q, x[..., i, :])
        for i, q in enumerate(sub.basis.qs)
    ]
    return jnp.stack(outs, axis=-2)


def twace_crt(sup: RingContext, sub: RingContext, x) -> jnp.ndarray:
    """CRT-basis tweaked trace: Tw(x) = t' * Tr(x/t) — twist, coset-sum,
    untwist (ops/general.py); degenerates to the coset mean for 2-powers."""
    if not sub.fm.divides(sup.fm):
        raise ValueError(f"twace: {sub.m} does not divide {sup.m}")
    outs = [
        gen.twace_crt(sub.m, sup.m, q, x[..., i, :])
        for i, q in enumerate(sup.basis.qs)
    ]
    return jnp.stack(outs, axis=-2)


def coeffs_pow(sup: RingContext, sub: RingContext, x) -> jnp.ndarray:
    """Relative coefficient decomposition (Lol Tensor.coeffs): express
    x = sum_rel b_rel * embed(a_rel) over the relative powerful basis;
    returns the a_rel coefficient stack (d, ..., nrns, n_sub).  The same
    gather serves powerful and decoding coefficients."""
    if not sub.fm.divides(sup.fm):
        raise ValueError(f"coeffs: {sub.m} does not divide {sup.m}")
    return gen.coeffs_rel(sub.m, sup.m, x)


def pow_basis(sup: RingContext, sub: RingContext) -> np.ndarray:
    """Flat coefficient positions of the relative powerful basis monomials
    (Lol powBasisPow): basis elt rel = indicator at these positions."""
    if not sub.fm.divides(sup.fm):
        raise ValueError(f"pow_basis: {sub.m} does not divide {sup.m}")
    return gen.rel_pow_basis_positions(sub.m, sup.m)


# ---------------------------------------------------------------------------
# norms / lifts
# ---------------------------------------------------------------------------


def lift_centered_host(ctx: RingContext, x) -> np.ndarray:
    """(..., nrns, n) -> object ints in [-Q/2, Q/2), coefficientwise."""
    return ctx.basis.lift_centered(np.moveaxis(np.asarray(x), -2, 0))


def gsq_norm_dec_host(ctx: RingContext, x) -> np.ndarray:
    """||g x||^2 (canonical-embedding norm) from decoding-basis residues
    (Lol gSqNormDec), exact on host: x^T G x with the integer Gram matrix
    of the g-scaled decoding basis.  For 2-power m, G = n*I.

    Exact for arbitrary Q via signed base-2^16 limb decomposition:
    x = sum_l 2^{16 l} X_l with |X_l| < 2^16, so
    x^T G x = sum_{l,l'} 2^{16(l+l')} X_l^T (G X_{l'}) — L int64 Gram
    matvecs (vectorized numpy) plus O(L^2 n) exact Python-int dot sums;
    replaces the old O(n^2)-per-row pure-Python double loop (VERDICT r1
    #5: n ~ 1000 general-m norms now take milliseconds)."""
    lifted = lift_centered_host(ctx, x)
    flat = lifted.reshape(-1, ctx.n) if lifted.ndim > 1 else lifted[None]
    G = None if ctx.fm.is_pow2() else gen.gram_g_dec(ctx.m)
    out = [_quad_form_exact(row, G, ctx.n) for row in flat]
    return np.array(out, dtype=object).reshape(lifted.shape[:-1] or (1,))


_LIMB_BITS = 16


def _quad_form_exact(row, G, n: int):
    """Exact x^T G x (G=None means n*I) for an object-int vector x."""
    mask = (1 << _LIMB_BITS) - 1
    vals = [int(v) for v in row]
    nlimbs = max(
        1, (max((abs(v) for v in vals), default=0).bit_length()
            + _LIMB_BITS - 1) // _LIMB_BITS
    )
    limbs = np.empty((nlimbs, n), dtype=np.int64)
    for j, v in enumerate(vals):
        s, a = (1, v) if v >= 0 else (-1, -v)
        for l in range(nlimbs):
            limbs[l, j] = s * ((a >> (_LIMB_BITS * l)) & mask)
    # z_l = G @ X_l fits int64: n * max|G| * 2^16 < 2^63 for n,|G| < 2^23
    zs = limbs * np.int64(n) if G is None else limbs @ G.T  # G symmetric
    total = 0
    for l in range(nlimbs):
        xo = limbs[l].astype(object)
        for lp in range(nlimbs):
            total += int(np.sum(xo * zs[lp])) << (_LIMB_BITS * (l + lp))
    return total
