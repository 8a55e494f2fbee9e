"""Randomness beacon interface (reference: NIST beacon client in
`rlwe-challenges .../Beacon.hs`).

`Beacon.bits(epoch, offset, nbits)` returns the selection bits for a
challenge.  `LocalBeacon` is the offline-deterministic stand-in (SHA-512
of the epoch number); a NIST-beacon-backed implementation plugs in by
implementing `record(epoch)`.
"""

from __future__ import annotations

import hashlib


class Beacon:
    def record(self, epoch: int) -> bytes:
        """The 64-byte beacon output for an epoch."""
        raise NotImplementedError

    def bits(self, epoch: int, offset: int, nbits: int) -> int:
        """nbits of the record starting at bit `offset` as an int."""
        rec = self.record(epoch)
        as_int = int.from_bytes(rec, "big")
        total = len(rec) * 8
        if offset + nbits > total:
            raise ValueError("beacon: offset+nbits beyond record")
        return (as_int >> (total - offset - nbits)) & ((1 << nbits) - 1)


class LocalBeacon(Beacon):
    """Deterministic offline beacon: SHA-512(epoch as decimal string)."""

    def record(self, epoch: int) -> bytes:
        return hashlib.sha512(str(int(epoch)).encode()).digest()
