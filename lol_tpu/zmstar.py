"""The unit group (Z/mZ)^* — slot indexing and automorphisms.

Analog of `lol/Crypto/Lol/Types/ZmStar.hs` (SURVEY.md §3.2): enumeration
and indexing of the units mod m, which underlies CRT-slot indexing and
Galois automorphisms sigma_k : zeta -> zeta^k.
"""

from __future__ import annotations

import math
from functools import lru_cache

import numpy as np

from . import numtheory as nt
from .factored import fact


@lru_cache(maxsize=1024)
def units(m: int) -> tuple[int, ...]:
    """Units of Z/mZ in ascending order."""
    if m == 1:
        return (0,)
    return tuple(u for u in range(m) if math.gcd(u, m) == 1)


@lru_cache(maxsize=1024)
def unit_index(m: int) -> dict[int, int]:
    return {u: i for i, u in enumerate(units(m))}


def order(m: int) -> int:
    return fact(m).phi


def mul_table(m: int) -> np.ndarray:
    """(phi, phi) table of unit products (by index)."""
    us = units(m)
    idx = unit_index(m)
    return np.array(
        [[idx[a * b % m] for b in us] for a in us], dtype=np.int32
    )


@lru_cache(maxsize=1024)
def canonical_slot_units(m: int, q: int) -> np.ndarray:
    """Units in the *canonical CRT slot order* used by the transforms
    (ops/general.py _global_units)."""
    from .ops import general as gen

    return gen._global_units(gen.general_plan(m, q))


def automorphism_slot_perm(m: int, q: int, k: int) -> np.ndarray:
    """CRT-slot permutation of the Galois automorphism sigma_k
    (zeta -> zeta^k, gcd(k, m) = 1): slot evaluating at omega^u reads the
    old slot at omega^(u*k)."""
    if math.gcd(k, m) != 1:
        raise ValueError(f"automorphism: k={k} not a unit mod m={m}")
    us = canonical_slot_units(m, q)
    pos = {int(u): i for i, u in enumerate(us)}
    return np.array([pos[int(u) * k % m] for u in us], dtype=np.int64)
