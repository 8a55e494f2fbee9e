"""generate / suppress / verify phases + CLI (reference:
`rlwe-challenges/.../{Generate,Suppress,Verify,Main}.hs`)."""

from __future__ import annotations

import argparse
import sys
from dataclasses import dataclass
from pathlib import Path

import jax
import numpy as np

from .. import numtheory as nt
from .. import rlwe, sampling
from ..cyc import Cyc
from ..io import cyc_from_proto, cyc_to_proto, ints_from_proto, ints_to_proto
from ..proto import lol_pb2 as pb
from ..ring import ring_context
from .beacon import Beacon, LocalBeacon


@dataclass(frozen=True)
class ChallengeParams:
    """One line of the reference's params file."""

    challenge_id: int
    m: int
    q: int
    svar: float
    num_instances: int
    kind: str  # "disc" | "cont" | "rlwr"
    qprime: int = 0
    beacon_epoch: int = 0
    beacon_offset: int = 0


def _paths(root: Path, cid: int):
    d = root / f"chall-id{cid:04d}"
    return d


def generate(root: Path, params: list[ChallengeParams], seed: int = 0) -> None:
    """Sample instances + secrets and write proto files."""
    root = Path(root)
    key = jax.random.PRNGKey(seed)
    for cp in params:
        d = _paths(root, cp.challenge_id)
        d.mkdir(parents=True, exist_ok=True)
        ch = pb.Challenge(
            challenge_id=cp.challenge_id, m=cp.m, q=cp.q, svar=cp.svar,
            num_instances=cp.num_instances, kind=cp.kind, qprime=cp.qprime,
            beacon_epoch=cp.beacon_epoch, beacon_offset=cp.beacon_offset,
        )
        (d / "challenge.proto").write_bytes(ch.SerializeToString())
        ctx = ring_context(cp.m, (cp.q,))
        for iid in range(cp.num_instances):
            key, ks, kw = jax.random.split(key, 3)
            s_ints = np.asarray(
                sampling.gaussian_dec_ints(ctx, ks, cp.svar), dtype=np.int64
            )
            s = Cyc.from_ints(ctx, s_ints)
            sec = pb.Secret(
                challenge_id=cp.challenge_id, instance_id=iid, m=cp.m,
                s=ints_to_proto(cp.m, s_ints),
            )
            (d / f"instance-{iid:03d}.secret").write_bytes(sec.SerializeToString())
            if cp.kind == "disc":
                samp = rlwe.sample_discrete(ctx, s, cp.svar, kw)
                # derived tail bound on ||g e||^2 (Laurent-Massart, e^-40)
                bound = rlwe.gaussian_quad_bound(ctx, cp.svar, gram="g")
                inst = pb.InstanceDisc(
                    challenge_id=cp.challenge_id, instance_id=iid,
                    a=cyc_to_proto(samp.a.to_crt()),
                    b=cyc_to_proto(samp.b.to_crt()),
                    bound=bound,
                )
                (d / f"instance-{iid:03d}.instance").write_bytes(
                    inst.SerializeToString()
                )
            elif cp.kind == "cont":
                a, b = rlwe.sample_continuous(ctx, s, cp.svar, kw)
                inst = pb.InstanceCont(
                    challenge_id=cp.challenge_id, instance_id=iid,
                    a=cyc_to_proto(a.to_crt()),
                    b=pb.Kq(m=cp.m, q=float(cp.q),
                            coeffs=[float(v) for v in np.asarray(b)]),
                    # sum-of-squares bound on the continuous error (G = I;
                    # no rounding slack — e is exactly the f64 residual)
                    bound=float(rlwe.gaussian_quad_bound(
                        ctx, cp.svar, gram="id", rounded=False)),
                )
                (d / f"instance-{iid:03d}.instance").write_bytes(
                    inst.SerializeToString()
                )
            elif cp.kind == "rlwr":
                ctx2 = ring_context(cp.m, (cp.qprime,))
                samp = rlwe.sample_rlwr(ctx, ctx2, s, kw)
                inst = pb.InstanceRLWR(
                    challenge_id=cp.challenge_id, instance_id=iid,
                    a=cyc_to_proto(samp.a.to_crt()),
                    b=cyc_to_proto(samp.b),
                )
                (d / f"instance-{iid:03d}.instance").write_bytes(
                    inst.SerializeToString()
                )
            else:
                raise ValueError(f"unknown kind {cp.kind}")


def suppress(root: Path, beacon: Beacon | None = None) -> None:
    """Delete all but the beacon-chosen secret of each challenge."""
    beacon = beacon or LocalBeacon()
    root = Path(root)
    for d in sorted(root.glob("chall-id*")):
        ch = pb.Challenge.FromString((d / "challenge.proto").read_bytes())
        nbits = max(1, (int(ch.num_instances) - 1).bit_length())
        keep = beacon.bits(ch.beacon_epoch, ch.beacon_offset, nbits) % ch.num_instances
        for f in sorted(d.glob("instance-*.secret")):
            iid = int(f.stem.split("-")[1])
            if iid == keep:
                f.unlink()  # the KEPT-HARD instance: its secret is destroyed
        # remaining secrets stay revealed for verification


def verify(root: Path, beacon: Beacon | None = None) -> bool:
    """Check every revealed instance's error bound + beacon consistency."""
    beacon = beacon or LocalBeacon()
    root = Path(root)
    ok = True
    for d in sorted(root.glob("chall-id*")):
        ch = pb.Challenge.FromString((d / "challenge.proto").read_bytes())
        nbits = max(1, (int(ch.num_instances) - 1).bit_length())
        keep = beacon.bits(ch.beacon_epoch, ch.beacon_offset, nbits) % ch.num_instances
        ctx = ring_context(int(ch.m), (int(ch.q),))
        for f in sorted(d.glob("instance-*.secret")):
            iid = int(f.stem.split("-")[1])
            if iid == keep:
                print(f"{d.name}: secret for held-out instance {iid} present "
                      "(suppress not run?)", file=sys.stderr)
                ok = False
                continue
            sec = pb.Secret.FromString(f.read_bytes())
            s = Cyc.from_ints(ctx, ints_from_proto(sec.s))
            inst_f = d / f"instance-{iid:03d}.instance"
            if ch.kind == "disc":
                inst = pb.InstanceDisc.FromString(inst_f.read_bytes())
                samp = rlwe.RLWESample(cyc_from_proto(inst.a), cyc_from_proto(inst.b))
                if not rlwe.valid_instance(s, samp, bound=int(inst.bound)):
                    print(f"{d.name} inst {iid}: error bound violated",
                          file=sys.stderr)
                    ok = False
            elif ch.kind == "cont":
                inst = pb.InstanceCont.FromString(inst_f.read_bytes())
                a = cyc_from_proto(inst.a)
                b = np.array(list(inst.b.coeffs), dtype=np.float64)
                as_dec = (a * s).to_dec().lift_ints()
                e = b - np.array([float(int(v)) for v in as_dec],
                                 dtype=np.float64)
                if float(np.sum(e * e)) > float(inst.bound):
                    print(f"{d.name} inst {iid}: continuous bound violated",
                          file=sys.stderr)
                    ok = False
            elif ch.kind == "rlwr":
                inst = pb.InstanceRLWR.FromString(inst_f.read_bytes())
                a = cyc_from_proto(inst.a)
                ctx2 = ring_context(int(ch.m), (int(ch.qprime),))
                want = rlwe.sample_rlwr_recompute(ctx, ctx2, a, s)
                got = cyc_from_proto(inst.b)
                if not bool(np.array_equal(np.asarray(want.data), np.asarray(got.data))):
                    print(f"{d.name} inst {iid}: RLWR rounding mismatch",
                          file=sys.stderr)
                    ok = False
    return ok


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="rlwe-challenges")
    sub = ap.add_subparsers(dest="cmd", required=True)
    g = sub.add_parser("generate")
    g.add_argument("root")
    g.add_argument("--params", required=True,
                   help="params file: one challenge per line: "
                        "id m q svar num kind [qprime] [epoch] [offset]")
    g.add_argument("--seed", type=int, default=0)
    s = sub.add_parser("suppress")
    s.add_argument("root")
    s.add_argument("--beacon-records", default=None,
                   help="directory of pre-fetched NIST beacon records "
                        "(<epoch>.xml v1 / <epoch>.json v2); default: "
                        "offline LocalBeacon")
    v = sub.add_parser("verify")
    v.add_argument("root")
    v.add_argument("--beacon-records", default=None)
    args = ap.parse_args(argv)

    def _beacon():
        from .beacon import NistRecordBeacon

        rec = getattr(args, "beacon_records", None)
        return NistRecordBeacon(rec) if rec else None
    if args.cmd == "generate":
        params = []
        for line in Path(args.params).read_text().splitlines():
            line = line.split("#")[0].strip()
            if not line:
                continue
            parts = line.split()
            params.append(ChallengeParams(
                challenge_id=int(parts[0]), m=int(parts[1]), q=int(parts[2]),
                svar=float(parts[3]), num_instances=int(parts[4]),
                kind=parts[5],
                qprime=int(parts[6]) if len(parts) > 6 else 0,
                beacon_epoch=int(parts[7]) if len(parts) > 7 else 0,
                beacon_offset=int(parts[8]) if len(parts) > 8 else 0,
            ))
        generate(Path(args.root), params, seed=args.seed)
        print(f"generated {len(params)} challenges under {args.root}")
        return 0
    if args.cmd == "suppress":
        suppress(Path(args.root), beacon=_beacon())
        print("suppressed")
        return 0
    if args.cmd == "verify":
        ok = verify(Path(args.root), beacon=_beacon())
        print("verify:", "OK" if ok else "FAILED")
        return 0 if ok else 1
    return 2


if __name__ == "__main__":
    sys.exit(main())
