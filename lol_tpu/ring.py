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
        if not self.fm.is_pow2():
            # general-m support arrives with ops/general.py plans
            for mod in self.basis.moduli:
                if not mod.has_crt(self.m):
                    raise ValueError(
                        f"modulus {mod.q} admits no CRT for m={self.m}"
                    )

    def has_crt(self) -> bool:
        return all(mod.has_crt(2 * self.n if self.fm.is_pow2() else self.m)
                   for mod in self.basis.moduli)

    def ntt_plans(self) -> list[ntt.NTTPlan]:
        if not self.fm.is_pow2():
            raise NotImplementedError("general-m plans live in ops/general.py")
        return [_pow2_plan(self.n, q) for q in self.basis.qs]

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


def crt(ctx: RingContext, x) -> jnp.ndarray:
    """Powerful -> CRT basis (Lol Tensor.crt).  2-power: negacyclic NTT."""
    if ctx.fm.is_pow2():
        return _per_residue(ctx, x, lambda c, p: ntt.ntt_forward_stages(c, p))
    raise NotImplementedError("general-m crt: ops/general.py")


def crt_inv(ctx: RingContext, x) -> jnp.ndarray:
    if ctx.fm.is_pow2():
        return _per_residue(ctx, x, lambda c, p: ntt.ntt_inverse_stages(c, p))
    raise NotImplementedError("general-m crtInv: ops/general.py")


def l(ctx: RingContext, x) -> jnp.ndarray:
    """Decoding -> powerful basis (Lol Tensor.l); identity for 2-power m."""
    if ctx.fm.is_pow2():
        return x
    raise NotImplementedError


def l_inv(ctx: RingContext, x) -> jnp.ndarray:
    if ctx.fm.is_pow2():
        return x
    raise NotImplementedError


# --- g multiplication (g = prod over odd primes; = 1 for 2-power m) -------


def mul_g_pow(ctx: RingContext, x) -> jnp.ndarray:
    if ctx.fm.odd_radical == 1:
        return x
    raise NotImplementedError


def mul_g_dec(ctx: RingContext, x) -> jnp.ndarray:
    if ctx.fm.odd_radical == 1:
        return x
    raise NotImplementedError


def mul_g_crt(ctx: RingContext, x) -> jnp.ndarray:
    if ctx.fm.odd_radical == 1:
        return x
    raise NotImplementedError


def div_g_pow(ctx: RingContext, x):
    if ctx.fm.odd_radical == 1:
        return x
    raise NotImplementedError


def div_g_dec(ctx: RingContext, x):
    if ctx.fm.odd_radical == 1:
        return x
    raise NotImplementedError


def div_g_crt(ctx: RingContext, x):
    if ctx.fm.odd_radical == 1:
        return x
    raise NotImplementedError


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
    if not (sub.fm.is_pow2() and sup.fm.is_pow2() and sub.fm.divides(sup.fm)):
        raise NotImplementedError("embed_pow: 2-power towers only (for now)")
    if sub.basis.qs != sup.basis.qs:
        raise ValueError("embed: moduli must match")
    stride = sup.n // sub.n
    out = jnp.zeros((*x.shape[:-1], sup.n), dtype=jnp.uint32)
    return out.at[..., ::stride].set(x)


def twace_pow(sup: RingContext, sub: RingContext, x) -> jnp.ndarray:
    """Tweaked trace in the powerful/decoding basis: coordinate gather."""
    if not (sub.fm.is_pow2() and sup.fm.is_pow2() and sub.fm.divides(sup.fm)):
        raise NotImplementedError("twace_pow: 2-power towers only (for now)")
    stride = sup.n // sub.n
    return x[..., ::stride]


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
    tbl = jnp.asarray(_crt_embed_index(sub, sup))
    return x[..., tbl]


def twace_crt(sup: RingContext, sub: RingContext, x) -> jnp.ndarray:
    """CRT-basis tweaked trace: average the m/m' evaluation cosets.

    Tw = (hat(m')/hat(m)) * Tr, and Tr in CRT coords sums the slots lying
    over each sub-slot; with hat(m)/hat(m') = n/n' cosets the scale is
    exactly the coset mean."""
    if not (sub.fm.is_pow2() and sup.fm.is_pow2() and sub.fm.divides(sup.fm)):
        raise NotImplementedError
    tbl = _crt_embed_index(sub, sup)  # sup-slot -> sub-slot
    k = sup.n // sub.n
    order = np.argsort(tbl, kind="stable")  # group sup slots by sub slot
    outs = []
    for i, q in enumerate(sup.basis.qs):
        xi = x[..., i, :]
        g = xi[..., order].reshape(*xi.shape[:-1], sub.n, k)
        # tree-sum mod q then divide by k (k a power of 2, invertible)
        s = g[..., 0]
        for j in range(1, k):
            s = zq.add_mod(s, g[..., j], q)
        kinv = nt.modinv(k, q)
        outs.append(zq.mul_mod(s, jnp.uint32(kinv), q))
    return jnp.stack(outs, axis=-2)


def coeffs_pow(sup: RingContext, sub: RingContext, x) -> jnp.ndarray:
    """Relative coefficient decomposition (Lol Tensor.coeffs): express
    x in R_m as sum_i coeff_i * b_i over the relative powerful basis
    b_i = x^i, i < n/n'.  For 2-power towers this is a reshape: coeff_i
    collects coefficients with index = i (mod n/n')."""
    if not (sub.fm.is_pow2() and sup.fm.is_pow2() and sub.fm.divides(sup.fm)):
        raise NotImplementedError
    d = sup.n // sub.n
    # x[..., j]: j = j_sub * d + i  ->  coeff_i[..., j_sub]
    shaped = x.reshape(*x.shape[:-1], sub.n, d)
    return jnp.moveaxis(shaped, -1, 0)  # (d, ..., nrns, n_sub)


def pow_basis(sup: RingContext, sub: RingContext) -> np.ndarray:
    """Relative powerful basis exponents: b_i = x^i, i < m-ratio (Lol
    powBasisPow).  Returned as exponent list; elements via embed of
    monomials."""
    if not (sub.fm.is_pow2() and sup.fm.is_pow2() and sub.fm.divides(sup.fm)):
        raise NotImplementedError
    return np.arange(sup.n // sub.n, dtype=np.int32)


# ---------------------------------------------------------------------------
# norms / lifts
# ---------------------------------------------------------------------------


def lift_centered_host(ctx: RingContext, x) -> np.ndarray:
    """(..., nrns, n) -> object ints in [-Q/2, Q/2), coefficientwise."""
    return ctx.basis.lift_centered(np.moveaxis(np.asarray(x), -2, 0))


def gsq_norm_dec_host(ctx: RingContext, x) -> np.ndarray:
    """||g x||^2 in the decoding basis (Lol gSqNormDec), exact on host.

    For 2-power m, g = 1 and the decoding basis is orthogonal in the
    canonical embedding up to scale: the norm is n * sum_j lift(x_j)^2
    ... we report the coefficient sum-of-squares (the quantity the
    challenge verifier bounds); general-m adds the Gram form."""
    if not ctx.fm.is_pow2():
        raise NotImplementedError
    lifted = lift_centered_host(ctx, x)
    flat = lifted.reshape(-1, ctx.n) if lifted.ndim > 1 else lifted[None]
    return np.array(
        [sum(int(v) * int(v) for v in row) for row in flat], dtype=object
    ).reshape(lifted.shape[:-1] or (1,))
