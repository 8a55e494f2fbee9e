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

    Returns (a, b_float) with b = dec-coords of a*s plus real Gaussian —
    the challenge generator's continuous flavor (RRq values)."""
    ka, ke = jax.random.split(key)
    a = sampling.uniform(ctx, ka)
    e_real = sampling.real_gaussians(ke, var, (ctx.n,))
    as_dec = (a * s).to_dec()
    # lift residues of first channel? continuous b is over R/qR with q = full
    # modulus: represent as float coords of a*s (centered) + e
    lifted = as_dec.lift_ints()
    b = jnp.asarray(
        np.array([float(int(v)) for v in lifted], dtype=np.float32)
    ) + e_real
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
