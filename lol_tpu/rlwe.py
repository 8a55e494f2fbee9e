"""L4 — RLWE / RLWR sample generation and validity checks.

Analog of `lol/Crypto/Lol/RLWE/{Continuous,Discrete,RLWR}.hs`
(SURVEY.md §3.5): `sample` draws (a, b = a*s + e) pairs with e continuous
(real decoding-basis Gaussian), discrete (rounded), or deterministic
rounding (RLWR: b = round(a * s, q -> q')); `error_term` recomputes e
from (a, b) and the secret; `valid_instance` checks the norm bound
(via gSqNorm, as the challenge verifier does).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from . import sampling, zq
from .cyc import Cyc, Rep
from .ring import RingContext, ring_context


@dataclass(frozen=True)
class RLWESample:
    a: Cyc
    b: Cyc  # b = a*s + e (or rounded a*s for RLWR)


def sample_discrete(ctx: RingContext, s: Cyc, var: float, key) -> RLWESample:
    """Discrete RLWE: e <- rounded Gaussian in the decoding basis."""
    ka, ke = jax.random.split(key)
    a = sampling.uniform(ctx, ka)
    e = sampling.gaussian_cyc(ctx, ke, var)
    return RLWESample(a, (a * s + e).to_crt())


def sample_continuous(ctx: RingContext, s: Cyc, var: float, key):
    """Continuous RLWE: b lives in K/qK (float decoding coords).

    Returns (a, b_float64) with b = dec-coords of a*s plus real Gaussian —
    the challenge generator's continuous flavor (RRq values).  b is HOST
    float64: the centered lift of a*s reaches |v| ~ q/2 < 2^29, beyond
    float32's 24-bit mantissa (up to ~32 ulp of error, which round 1
    papered over with a x4 verifier fudge); float64's 53-bit mantissa
    represents int + sub-unit noise exactly enough (<2^-23 abs error).
    The noise itself is still drawn from the deterministic threefry
    stream (f32 — genuine reals, representation precision irrelevant)."""
    ka, ke = jax.random.split(key)
    a = sampling.uniform(ctx, ka)
    e_real = np.asarray(
        sampling.real_gaussians(ke, var, (ctx.n,))
    ).astype(np.float64)
    as_dec = (a * s).to_dec()
    lifted = as_dec.lift_ints()
    b = np.array([float(int(v)) for v in lifted], dtype=np.float64) + e_real
    return a, b


def _round_scale(ctx: RingContext, ctx2: RingContext, prod: Cyc) -> Cyc:
    """b = round(q2/q * x) over ctx2, exact int64 host rounding (dec basis)."""
    q = ctx.basis.qs[0]
    q2 = ctx2.basis.qs[0]
    x = prod.to_dec().data[..., 0, :]
    xv = np.asarray(x).astype(np.int64)
    b = ((xv * q2 + q // 2) // q) % q2
    return Cyc(ctx2, Rep.DEC, jnp.asarray(b[..., None, :].astype(np.uint32)))


def sample_rlwr(ctx: RingContext, ctx2: RingContext, s: Cyc, key) -> RLWESample:
    """RLWR: b = round(q2/q * (a*s)) over the rounding modulus chain ctx2
    (single-modulus chains; deterministic given a and s)."""
    if ctx.nrns != 1 or ctx2.nrns != 1:
        raise ValueError("sample_rlwr: single-modulus chains")
    a = sampling.uniform(ctx, key)
    return RLWESample(a, _round_scale(ctx, ctx2, a * s))


def sample_rlwr_recompute(ctx: RingContext, ctx2: RingContext, a: Cyc, s: Cyc) -> Cyc:
    """Recompute the deterministic RLWR b from (a, s) — verifier path."""
    return _round_scale(ctx, ctx2, a * s)


def error_term(s: Cyc, samp: RLWESample) -> np.ndarray:
    """Recover e = b - a*s as centered integers (Lol RLWE errorTerm)."""
    e = (samp.b - samp.a * s).to_dec()
    return e.lift_ints()


def gsq_norm_error(s: Cyc, samp: RLWESample):
    """||g*e||^2 — the quantity the challenge verifier bounds
    (via gSqNormDec; 2-power: plain sum of squares)."""
    e = (samp.b - samp.a * s)
    return e.gsq_norm()


def valid_instance(s: Cyc, samp: RLWESample, bound: float) -> bool:
    """Check the error bound (Lol validInstance)."""
    nrm = gsq_norm_error(s, samp)
    return all(int(v) <= bound for v in np.atleast_1d(nrm).reshape(-1))


# ---------------------------------------------------------------------------
# derived verification bounds (reference: the challenges' validInstance
# bound, ePrint 2016/782 — a high-probability tail bound computed from the
# Gaussian parameter, not an ad-hoc slack)
# ---------------------------------------------------------------------------


def gaussian_quad_bound(ctx: RingContext, var: float, gram: str = "g",
                        t: float = 40.0, rounded: bool = True) -> int:
    """High-probability upper bound on the error quadratic form.

    The sampler (sampling.gaussian_dec_ints) draws decoding coefficients
    x = round(sqrt(n) L z), z iid N(0, var), with L L^T = Gram_dec^{-1}.
    The verifier checks x^T G x with G = gram_g_dec (gram="g", the
    discrete ||g e||^2 check) or G = I (gram="id", the continuous
    sum-of-squares check).  Pre-rounding the form is z^T A z with
    A = n var L^T G L = sum_i lam_i chi^2_1; Laurent-Massart:
        P[Q > mu + 2 sqrt(s2 t) + 2 lmax t] <= e^{-t}
    (mu = tr A, s2 = tr A^2, lmax = ||A||).  t=40 => miss prob < 5e-18.
    Rounding moves each coefficient by <= 1/2, adding at most
    sqrt(lmax(G) n) / 2 to the G-norm: the bound inflates to
    (sqrt(Q_bound) + sqrt(lmax(G) n)/2)^2."""
    from .ops import general as _gen
    from .sampling import _dec_mixing_matrix

    n = ctx.n
    if ctx.fm.is_pow2():
        # L = I/sqrt(n) (net identity after the sqrt(n) scale);
        # G_g = n I, so A = n var G-scale: lam_i = n var (g) or var (id)
        lam = np.full(n, n * var if gram == "g" else var)
        g_lmax = float(n if gram == "g" else 1)
    else:
        L = _dec_mixing_matrix(ctx.m) * np.sqrt(n)
        G = (_gen.gram_g_dec(ctx.m).astype(np.float64)
             if gram == "g" else np.eye(n))
        A = var * (L.T @ G @ L)
        lam = np.linalg.eigvalsh((A + A.T) / 2)
        g_lmax = float(np.linalg.eigvalsh((G + G.T) / 2)[-1])
    mu = float(np.sum(lam))
    s2 = float(np.sum(lam * lam))
    lmax = float(np.max(lam))
    q_bound = mu + 2.0 * np.sqrt(s2 * t) + 2.0 * lmax * t
    if rounded:
        q_bound = (np.sqrt(q_bound) + 0.5 * np.sqrt(g_lmax * n)) ** 2
    return int(np.ceil(q_bound))
