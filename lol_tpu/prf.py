"""L6 — key-homomorphic PRF (BP14) and its homomorphic evaluation.

Analog of `lol-apps/Crypto/Lol/Applications/KeyHomomorphicPRF.hs` and
`HomomPRF.hs` (SURVEY.md §3.6).

KH-PRF (Banerjee–Peikert 2014, ring version): public parameters are two
gadget-dimension vectors a0, a1 in R_q^ell; a full binary tree T over the
input bits defines
    A_T(x) = a_{x}                        (leaf)
    A_T(x) = A_l(x_l) * G^{-1}(A_r(x_r))  (internal)
with G^{-1} the (balanced) gadget decomposition applied entrywise; the
PRF is  F_s(x) = round_{q->p}( s * A_T(x) ).  Key homomorphism:
F_{s+t}(x) = F_s(x) + F_t(x) up to +-1 rounding slack per coefficient.

`evalTree`-style incremental evaluation: per-node caches keyed on the
input assignment; flipping one bit (Gray-code stepping) recomputes only
the root path.

HomomPRF: EvalHints = a chain of tunnel hints walking down a ring tower
+ PTRound relinearization hints + the final plaintext modulus; the
encrypted PRF value rides the SHE plaintext space (p = the PRF modulus).
The linear phase (s * A_T(x)), the ring-tower walk, and — for PRF
modulus 2^k — the true homomorphic MSB rounding (she.pt_round, iterated
LSB-strip-and-halve) all match the reference; the plaintext mod-switch
remains available as the cheap stand-in for non-2^k moduli.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import numpy as np

from . import gadget as gd
from . import linear as lin
from . import numtheory as nt
from . import sampling, she
from .cyc import Cyc, Rep
from .ring import RingContext


# ---------------------------------------------------------------------------
# full binary trees (Lol FullBinTree)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Tree:
    """Full binary tree with `size` leaves (input bits)."""

    left: "Tree | None" = None
    right: "Tree | None" = None

    @property
    def is_leaf(self) -> bool:
        return self.left is None

    @property
    def size(self) -> int:
        if self.is_leaf:
            return 1
        return self.left.size + self.right.size


def leaf() -> Tree:
    return Tree()


def left_spine(n: int) -> Tree:
    """((((x1 x2) x3) x4) ...): Lol leftSpineTree."""
    t = leaf()
    for _ in range(n - 1):
        t = Tree(t, leaf())
    return t


def right_spine(n: int) -> Tree:
    t = leaf()
    for _ in range(n - 1):
        t = Tree(leaf(), t)
    return t


def balanced(n: int) -> Tree:
    if n == 1:
        return leaf()
    h = n // 2
    return Tree(balanced(n - h), balanced(h))


# ---------------------------------------------------------------------------
# PRF family
# ---------------------------------------------------------------------------


@dataclass
class PRFFamily:
    """Public params + tree + per-assignment node cache (Lol PRFState)."""

    ctx: RingContext
    spec: gd.GadgetSpec
    tree: Tree
    a0: tuple[Cyc, ...]
    a1: tuple[Cyc, ...]
    _cache: dict = field(default_factory=dict)

    @staticmethod
    def random(ctx: RingContext, spec: gd.GadgetSpec, tree: Tree, key) -> "PRFFamily":
        ell = gd.num_digits(spec, ctx.basis)
        ks = jax.random.split(key, 2 * ell)
        a0 = tuple(sampling.uniform(ctx, k) for k in ks[:ell])
        a1 = tuple(sampling.uniform(ctx, k) for k in ks[ell:])
        return PRFFamily(ctx, spec, tree, a0, a1)

    # -- A_T(x) with per-node caching --------------------------------------
    def _eval_node(self, tree: Tree, bits: tuple[int, ...]) -> tuple[Cyc, ...]:
        key = (id(tree), bits)
        hit = self._cache.get(key)
        if hit is not None:
            return hit
        if tree.is_leaf:
            out = self.a1 if bits[0] else self.a0
        else:
            nl = tree.left.size
            al = self._eval_node(tree.left, bits[:nl])
            ar = self._eval_node(tree.right, bits[nl:])
            out = self._mul_ginv(al, ar)
        self._cache[key] = out
        return out

    def _mul_ginv(self, al, ar) -> tuple[Cyc, ...]:
        """al * G^{-1}(ar): decompose each component of ar, inner products.

        Multiplication dispatches through Cyc.* so CRT-friendly PRF
        moduli ride the NTT and CRT-less ones (e.g. 2^k, the reference's
        rounding-ready choice) ride the exact E-route."""
        ell = len(al)
        has_crt = self.ctx.has_crt()
        cols = []
        for i in range(ell):
            digits = gd.decompose(self.spec, self.ctx.basis, ar[i].to_pow().data)
            acc = Cyc.zero(self.ctx)
            if has_crt:
                acc = acc.to_crt()
            for j in range(ell):
                dj = Cyc(self.ctx, Rep.POW, digits[j])
                acc = acc + al[j] * dj
            cols.append(acc)
        return tuple(cols)

    def a_t(self, bits) -> tuple[Cyc, ...]:
        bits = tuple(int(b) & 1 for b in bits)
        if len(bits) != self.tree.size:
            raise ValueError(f"PRF input needs {self.tree.size} bits")
        return self._eval_node(self.tree, bits)


def prf_pre_round(fam: PRFFamily, s: Cyc, bits) -> tuple[Cyc, ...]:
    """s * A_T(x) over R_q — the value before rounding."""
    at = fam.a_t(bits)
    sc = s.to_crt() if fam.ctx.has_crt() else s
    return tuple(sc * a for a in at)


def prf(fam: PRFFamily, s: Cyc, bits, p_out: int) -> np.ndarray:
    """F_s(x): round each decoding coefficient q -> p_out (round-half-UP,
    floor(c*p_out/q + 1/2) — matching the homomorphic pt_round chain).
    Output shape (ell, n) ints mod p_out."""
    q = fam.ctx.basis.modulus
    vals = prf_pre_round(fam, s, bits)
    out = []
    for v in vals:
        lifted = v.lift_ints()  # centered
        out.append(
            np.array(
                [(2 * int(c) * p_out + q) // (2 * q) % p_out for c in lifted],
                dtype=np.int64,
            )
        )
    return np.stack(out)


# ---------------------------------------------------------------------------
# homomorphic PRF evaluation (Lol HomomPRF)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class EvalHints:
    """Lol EvalHints: the chain of tunnel hints walking down a cyclotomic
    tower, the rounding hints (relinearization hints for the homomorphic
    PTRound chain — present when the PRF modulus is 2^k and true
    homomorphic rounding is requested), and the final plaintext
    modulus.  (Relinearization after public mults is not needed —
    mulPublic keeps degree 1 — but the rounding phase multiplies
    ciphertexts.)"""

    tunnels: tuple[she.TunnelHint, ...]
    p_final: int
    rounds: "she.PTRoundHints | None" = None


def make_eval_hints(fam: PRFFamily, sks: list[she.SK], rings: list[int],
                    e_rings: list[int], spec: gd.GadgetSpec, key,
                    p_final: int = 2,
                    homomorphic_round: bool = False,
                    maps: str = "auto") -> tuple[EvalHints, she.SK]:
    """Build the tunnel chain down `rings` (sks[i] lives in rings[i]);
    e_rings[i] is the common subring of rings[i] and rings[i+1].

    maps selects the tower-descent E-linear maps (VERDICT r1 #6):
      "slots":   CRT-set-derived slot projections (linear.slot_projection
                 mode="select" — plaintext slots survive descent per
                 crtset.slot_restriction); requires e_rings[i] ==
                 rings[i+1] and the plaintext modulus a prime power
                 coprime to the ring indices.
      "project": the simple coefficient projection (b_0 -> 1, rest -> 0).
      "auto":    "slots" where constructible, else "project" per hop.

    With homomorphic_round=True (requires the PRF/plaintext modulus to be
    2^k and p_final=2), also builds the PTRound relinearization hints for
    the final secret key — the reference's full EvalHints."""
    from .ring import ring_context

    qs = sks[0].params.qs  # ciphertext modulus chain, not the PRF modulus
    p = sks[0].params.p
    tunnels = []
    for i in range(len(rings) - 1):
        key, sub = jax.random.split(key)
        r_ctx = ring_context(rings[i], qs)
        s_ctx = ring_context(rings[i + 1], qs)
        e_ctx = ring_context(e_rings[i], qs)
        f = None
        if maps in ("slots", "auto") and e_rings[i] == rings[i + 1]:
            try:
                f = lin.slot_projection(r_ctx, s_ctx, p, mode="select")
            except (ValueError, ZeroDivisionError):
                if maps == "slots":
                    raise
        if f is None:
            d = r_ctx.n // e_ctx.n
            ys = [Cyc.zero(s_ctx) for _ in range(d)]
            ys[0] = Cyc.scalar(s_ctx, 1)
            f = lin.linear_pow(e_ctx, r_ctx, s_ctx, ys)
        tunnels.append(she.tunnel_hint(f, sks[i + 1], sks[i], spec, sub))
    rounds = None
    if homomorphic_round:
        if p_final != 2:
            raise ValueError("homomorphic rounding targets Z_2")
        key, kr = jax.random.split(key)
        rounds = she.pt_round_hints(sks[-1], spec, kr)
    return EvalHints(tuple(tunnels), p_final, rounds), sks[-1]


def homom_prf_component(fam: PRFFamily, hints: EvalHints, ct_s: she.CT,
                        bits, i: int) -> she.CT:
    """Homomorphically evaluate component i of s * A_T(x) and walk it
    down the tunnel chain; finish with the TRUE homomorphic rounding
    chain (she.pt_round) when hints.rounds is present (PRF modulus 2^k;
    the tunnel chain has projected the value to a scalar), else with the
    plaintext modulus switch."""
    at = fam.a_t(bits)
    a_pt = np.array(
        [int(v) % ct_s.params.p for v in at[i].lift_ints(rep=Rep.DEC)],
        dtype=np.int64,
    )
    ct = she.mul_public(ct_s, a_pt)
    for th in hints.tunnels:
        ct = she.tunnel(th, ct)
    if hints.rounds is not None:
        return she.pt_round(ct, hints.rounds)
    if hints.p_final != ct.params.p:
        ct = she.mod_switch_pt(ct, hints.p_final)
    return ct


def homom_prf(fam: PRFFamily, hints: EvalHints, ct_s: she.CT,
              bits) -> tuple[she.CT, ...]:
    """Homomorphically evaluate the FULL ell-vector s * A_T(x) (every
    gadget-dimension component, VERDICT r1 #6), each walked down the
    tunnel chain and rounded.

    ct_s encrypts the PRF key s with plaintext modulus p = PRF modulus.
    Returns one ciphertext per component, in the chain's final ring."""
    ell = len(fam.a_t(bits))
    return tuple(
        homom_prf_component(fam, hints, ct_s, bits, i) for i in range(ell)
    )
