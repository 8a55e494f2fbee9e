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


def sample_rlwr(ctx: RingContext, ctx2: RingContext, s: Cyc, key) -> RLWESample:
    """RLWR: b = round(p/q * (a*s)) over the rounding modulus chain ctx2.

    Implemented as the exact scaled-rounding of the decoding coefficients
    (single-modulus chains)."""
    if ctx.nrns != 1 or ctx2.nrns != 1:
        raise ValueError("sample_rlwr: single-modulus chains")
    q = ctx.basis.qs[0]
    q2 = ctx2.basis.qs[0]
    a = sampling.uniform(ctx, key)
    prod = (a * s).to_dec()
    x = prod.data[..., 0, :]
    # round(x * q2 / q) mod q2, computed exactly in int64 on host
    xv = np.asarray(x).astype(np.int64)
    b = ((xv * q2 + q // 2) // q) % q2
    bc = Cyc(ctx2, Rep.DEC, jnp.asarray(b[None].astype(np.uint32)).reshape(
        *x.shape[:-1], 1, x.shape[-1]))
    return RLWESample(a, bc)


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
