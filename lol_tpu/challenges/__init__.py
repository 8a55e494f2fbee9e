"""L7 — the RLWE/RLWR challenges executable.

Analog of the reference's `rlwe-challenges` package (SURVEY.md §3.8):
three phases over a directory of protobuf files:

- **generate**: per challenge, sample N RLWE/RLWR instances (each with
  its own secret), write `.challenge` / `.instance` / `.secret` files.
- **suppress**: once the beacon value for the challenge's epoch is
  available, delete every secret *except* the one the beacon bits select
  (cut-and-choose: all-but-one secrets revealed, so at most one instance
  per challenge remains hard).
- **verify**: for every remaining revealed secret, recompute the error
  term and check its ||g e||^2 bound; validate the beacon selection.

Beacon: the reference uses the NIST randomness beacon over the network;
this sandbox has no egress, so the default `LocalBeacon` derives bits by
SHA-512 of the epoch (deterministic, documented, pluggable via the same
interface — swap in a NIST client where networked).
"""

from .driver import generate, suppress, verify, main  # noqa: F401
from .beacon import LocalBeacon  # noqa: F401
