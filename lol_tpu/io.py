"""L5 — serialization (`Protoable` analog).

Reference: `lol/Crypto/Lol/Types/Proto.hs` + generated `Crypto/Proto/*`
(SURVEY.md §3.2): to/from protobuf for ring elements (R, Rq, Kq), secret
keys, ciphertexts, and linear maps.  Schema: lol_tpu/proto/lol.proto
(bindings checked in; regenerate with `protoc --python_out=. lol.proto`).

This doubles as the checkpoint/resume story (SURVEY §6): keys, hints and
ciphertexts round-trip losslessly, and cross-backend test vectors are
exchanged in this format.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .cyc import Cyc, Rep
from .proto import lol_pb2 as pb
from .ring import ring_context


# --- Rq (mod-q ring elements) ---------------------------------------------


def cyc_to_proto(c: Cyc) -> pb.Rq:
    data = np.asarray(c.data)
    if data.ndim != 2:
        raise ValueError("cyc_to_proto: single elements only (nrns, n)")
    return pb.Rq(
        m=c.ctx.m,
        qs=list(c.ctx.basis.qs),
        rep=c.rep.value,
        coeffs=data.astype("<u4").tobytes(),
    )


def cyc_from_proto(msg: pb.Rq) -> Cyc:
    ctx = ring_context(int(msg.m), tuple(int(q) for q in msg.qs))
    arr = np.frombuffer(msg.coeffs, dtype="<u4").reshape(ctx.nrns, ctx.n)
    return Cyc(ctx, Rep(msg.rep), jnp.asarray(arr))


# --- R (integer ring elements) --------------------------------------------


def ints_to_proto(m: int, coeffs, rep: str = "dec") -> pb.R:
    return pb.R(m=m, rep=rep, coeffs=[int(v) for v in np.asarray(coeffs).reshape(-1)])


def ints_from_proto(msg: pb.R) -> np.ndarray:
    return np.array([int(v) for v in msg.coeffs], dtype=np.int64)


# --- SHE objects ----------------------------------------------------------


def sk_to_proto(sk) -> pb.SecretKey:
    return pb.SecretKey(
        m=sk.params.m,
        p=sk.params.p,
        qs=list(sk.params.qs),
        var=sk.var,
        s=ints_to_proto(sk.params.m, sk.s_ints),
    )


def sk_from_proto(msg: pb.SecretKey):
    from . import she

    params = she.SHEParams(
        m=int(msg.m), p=int(msg.p), qs=tuple(int(q) for q in msg.qs),
        var=float(msg.var),
    )
    return she.SK(params, ints_from_proto(msg.s), float(msg.var))


def ct_to_proto(ct) -> pb.SHECiphertext:
    return pb.SHECiphertext(
        m=ct.ctx.m,
        qs=list(ct.ctx.basis.qs),
        p=ct.params.p,
        f=ct.f,
        cs=[cyc_to_proto(c) for c in ct.cs],
        encoding=ct.encoding,
    )


def ct_from_proto(msg: pb.SHECiphertext):
    from . import she

    params = she.SHEParams(
        m=int(msg.m), p=int(msg.p), qs=tuple(int(q) for q in msg.qs)
    )
    cs = tuple(cyc_from_proto(c) for c in msg.cs)
    return she.CT(params, params.ctx, cs, f=int(msg.f),
                  encoding=msg.encoding or "lsd")


def linear_to_proto(lin) -> pb.LinearRq:
    return pb.LinearRq(
        e=lin.e_ctx.m,
        r=lin.r_ctx.m,
        s=lin.s_ctx.m,
        ys=[cyc_to_proto(y) for y in lin.ys],
    )


def linear_from_proto(msg: pb.LinearRq):
    from . import linear

    ys = [cyc_from_proto(y) for y in msg.ys]
    qs = ys[0].ctx.basis.qs
    return linear.Linear(
        ring_context(int(msg.e), qs),
        ring_context(int(msg.r), qs),
        ring_context(int(msg.s), qs),
        tuple(ys),
    )


# --- key-switch and tunnel hints (Lol Protoable KSHint / TunnelHint) -------


def _gad_to_str(spec) -> str:
    from . import gadget as gd

    if isinstance(spec, gd.TrivGad):
        return "triv"
    if isinstance(spec, gd.BaseBGad):
        return f"base:{spec.b}"
    if isinstance(spec, gd.RnsGad):
        return "rns"
    raise ValueError(f"unknown gadget spec {spec!r}")


def _gad_from_str(s: str):
    from . import gadget as gd

    if s == "triv":
        return gd.TrivGad()
    if s == "rns":
        return gd.RnsGad()
    if s.startswith("base:"):
        return gd.BaseBGad(int(s.split(":", 1)[1]))
    raise ValueError(f"unknown gadget string {s!r}")


def ks_hint_to_proto(h) -> pb.KSHint:
    return pb.KSHint(
        m=h.ctx.m,
        qs=list(h.ctx.basis.qs),
        p=h.params.p,
        var=h.params.var,
        gad=_gad_to_str(h.spec),
        h0=[cyc_to_proto(c) for c in h.h0],
        h1=[cyc_to_proto(c) for c in h.h1],
    )


def ks_hint_from_proto(msg: pb.KSHint):
    from . import she

    params = she.SHEParams(
        m=int(msg.m), p=int(msg.p), qs=tuple(int(q) for q in msg.qs),
        var=float(msg.var),
    )
    return she.KSHint(
        params, params.ctx, _gad_from_str(msg.gad),
        tuple(cyc_from_proto(c) for c in msg.h0),
        tuple(cyc_from_proto(c) for c in msg.h1),
    )


def ks_hint_ext_to_proto(h) -> pb.KSHintExt:
    base_qs = h.params.qs
    ext_qs = h.ctx_ext.basis.qs
    return pb.KSHintExt(
        m=h.params.m,
        qs=list(base_qs),
        special_qs=list(ext_qs[len(base_qs):]),
        p=h.params.p,
        var=h.params.var,
        gad=_gad_to_str(h.spec),
        h0=[cyc_to_proto(c) for c in h.h0],
        h1=[cyc_to_proto(c) for c in h.h1],
    )


def ks_hint_ext_from_proto(msg: pb.KSHintExt):
    from . import she

    base_qs = tuple(int(q) for q in msg.qs)
    special = tuple(int(q) for q in msg.special_qs)
    params = she.SHEParams(
        m=int(msg.m), p=int(msg.p), qs=base_qs, var=float(msg.var)
    )
    return she.KSHintExt(
        params, ring_context(int(msg.m), base_qs + special), len(special),
        _gad_from_str(msg.gad),
        tuple(cyc_from_proto(c) for c in msg.h0),
        tuple(cyc_from_proto(c) for c in msg.h1),
    )


def tunnel_hint_to_proto(th) -> pb.TunnelHint:
    return pb.TunnelHint(
        lin=linear_to_proto(th.lin),
        gad=_gad_to_str(th.spec),
        hints=[ks_hint_to_proto(h) for h in th.hints],
    )


def tunnel_hint_from_proto(msg: pb.TunnelHint):
    from . import she

    return she.TunnelHint(
        linear_from_proto(msg.lin),
        _gad_from_str(msg.gad),
        tuple(ks_hint_from_proto(h) for h in msg.hints),
    )


# --- hint BUNDLES (the aggregates a serving deployment checkpoints) --------
# Reference: Lol's EvalHints is itself Protoable (SURVEY §3.6 / §6
# checkpoint row) — the tunnel chain + rounding hints are generated once
# per key and reloaded by every serving process.


def pt_round_hints_to_proto(rh) -> pb.PTRoundHints:
    return pb.PTRoundHints(hints=[ks_hint_to_proto(h) for h in rh.hints])


def pt_round_hints_from_proto(msg: pb.PTRoundHints):
    from . import she

    return she.PTRoundHints(
        tuple(ks_hint_from_proto(h) for h in msg.hints)
    )


def eval_hints_to_proto(eh) -> pb.EvalHints:
    msg = pb.EvalHints(
        tunnels=[tunnel_hint_to_proto(t) for t in eh.tunnels],
        p_final=eh.p_final,
    )
    if eh.rounds is not None:
        msg.rounds.CopyFrom(pt_round_hints_to_proto(eh.rounds))
    return msg


def eval_hints_from_proto(msg: pb.EvalHints):
    from . import prf

    return prf.EvalHints(
        tunnels=tuple(tunnel_hint_from_proto(t) for t in msg.tunnels),
        p_final=int(msg.p_final),
        rounds=(pt_round_hints_from_proto(msg.rounds)
                if msg.HasField("rounds") else None),
    )
