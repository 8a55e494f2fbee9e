"""L4 — E-linear maps between cyclotomic rings (`Linear`, `evalLin`).

Analog of `lol/Crypto/Lol/Cyclotomic/Linear.hs` (SURVEY.md §3.5): an
E-linear function f : R -> S (E a common subring, e | gcd(r, s) indices)
represented by its images ys_i = f(b_i) on the relative powerful basis
of R/E (monomials b_i; the reference's linearDec uses the decoding basis
— an invertible change of representation, equivalent map class).
Evaluation: write x = sum_i b_i * embed_R(a_i) with a_i in E (relative
powerful coefficients, a pure index gather), then
f(x) = sum_i ys_i * embed_S(a_i).

This is the object ring tunneling evaluates homomorphically (she.tunnel).
"""

from __future__ import annotations

from dataclasses import dataclass

from .cyc import Cyc, Rep
from .ring import RingContext


@dataclass(frozen=True)
class Linear:
    """f : R -> S, E-linear, via images of R/E's relative decoding basis."""

    e_ctx: RingContext
    r_ctx: RingContext
    s_ctx: RingContext
    ys: tuple[Cyc, ...]  # elements of S, one per relative basis elt

    def __post_init__(self):
        if not self.e_ctx.fm.divides(self.r_ctx.fm):
            raise ValueError(f"Linear: E={self.e_ctx.m} must divide R={self.r_ctx.m}")
        if not self.e_ctx.fm.divides(self.s_ctx.fm):
            raise ValueError(f"Linear: E={self.e_ctx.m} must divide S={self.s_ctx.m}")
        d = self.r_ctx.n // self.e_ctx.n
        if len(self.ys) != d:
            raise ValueError(f"Linear: need {d} basis images, got {len(self.ys)}")


def linear_pow(e_ctx: RingContext, r_ctx: RingContext, s_ctx: RingContext,
               ys) -> Linear:
    """Construct from the list of images of the relative powerful basis
    monomials (the reference's linearDec, in the powerful representation)."""
    return Linear(e_ctx, r_ctx, s_ctx, tuple(ys))


def rel_basis_elements(r_ctx: RingContext, e_ctx: RingContext):
    """The relative powerful basis monomials b_i as elements of R."""
    return Cyc.rel_pow_basis(r_ctx, e_ctx)


def eval_lin(lin: Linear, x: Cyc) -> Cyc:
    """Apply the E-linear map to x in R (Lol evalLin)."""
    if x.ctx != lin.r_ctx:
        raise ValueError("eval_lin: x not in the map's source ring")
    coeffs = x.coeffs(lin.e_ctx, rep=Rep.POW)
    acc = Cyc.zero(lin.s_ctx)
    if lin.s_ctx.has_crt():
        acc = acc.to_crt()
    for y, a in zip(lin.ys, coeffs):
        acc = acc + y * a.embed(lin.s_ctx)
    return acc
