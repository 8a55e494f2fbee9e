"""Batched, device-resident BGV pipeline — the TPU "serving path".

The object-level API (she.py) manipulates single ciphertexts with host
round-trips for lifts; production throughput needs the whole
mul -> relinearize -> rescale step fused under one jit over large
batches.  This module provides that: ciphertext components live as
coefficient-major (nrns, n, B) uint32 arrays (the Pallas NTT's native
layout — batch along lanes), hints are baked in as compile-time
constants, and one `step()` performs

    ct_mul (CRT Hadamards) -> RNS-gadget key switch -> exact BGV rescale

entirely on device.  Bit-exact vs the she.py path (same arithmetic, same
decomposition and rescale formulas) — tested column-by-column.

This is the benchmark pipeline for BASELINE's "BGV ct-mult + key-switch
ops/sec" metric and the multi-chip sharding target (batch axis = 'data',
residue axis = 'rns').
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import numtheory as nt
from . import she, zq
from .gadget import RnsGad
from .ops.pallas import ntt_kernel as pk
from .ring import ring_context


@dataclass(frozen=True)
class BatchedBGV:
    """Compiled batched pipeline for one SHEParams (RnsGad keyswitch).

    use_pallas: route NTTs through the fused Pallas kernels (requires a
    TPU backend and batch a multiple of 128 lanes); None = auto-detect.
    The XLA fallback is bit-identical (same staged arithmetic)."""

    params: she.SHEParams
    use_pallas: bool | None = None

    def _pallas_ok(self, B: int) -> bool:
        if self.use_pallas is not None:
            return self.use_pallas
        return jax.default_backend() == "tpu" and B % 128 == 0

    @property
    def ctx(self):
        return self.params.ctx

    @property
    def qs(self):
        return self.params.qs

    def plans(self):
        return self.ctx.ntt_plans()

    # --- layout helpers ---------------------------------------------------
    def pack(self, cts: list[she.CT]) -> tuple[jnp.ndarray, jnp.ndarray]:
        """List of degree-1 cts (CRT rep) -> two (nrns, n, B) arrays."""
        comps = []
        for k in range(2):
            cols = [np.asarray(ct.cs[k].to_crt().data) for ct in cts]  # (nrns, n)
            comps.append(jnp.asarray(np.stack(cols, axis=-1)))
        return tuple(comps)

    def unpack(self, arrs, f: int = 1) -> list[she.CT]:
        """(nrns, n, B) component arrays -> list of cts (CRT rep)."""
        from .cyc import Cyc, Rep

        B = arrs[0].shape[-1]
        out = []
        for b in range(B):
            cs = tuple(
                Cyc(self.ctx, Rep.CRT, a[..., b]) for a in arrs
            )
            out.append(she.CT(self.params, self.ctx, cs, f=f))
        return out

    # --- per-channel transforms --------------------------------------------
    def _ntt(self, x, inverse=False, plans=None):
        """(nrns, n, B) per-channel negacyclic NTT (Pallas or XLA path)."""
        from .ops import ntt as _ntt_mod

        plans = plans if plans is not None else self.plans()
        B = x.shape[-1]
        if self._pallas_ok(B):
            outs = [
                pk.ntt_cm(x[i], plans[i], inverse=inverse)
                for i in range(len(plans))
            ]
        else:
            fn = (
                _ntt_mod.ntt_inverse_stages if inverse else _ntt_mod.ntt_forward_stages
            )
            outs = [
                jnp.moveaxis(fn(jnp.moveaxis(x[i], 0, -1), plans[i]), -1, 0)
                for i in range(len(plans))
            ]
        return jnp.stack(outs)

    # --- batched encryption ------------------------------------------------
    def build_encrypt(self, sk: she.SK):
        """jit-compiled (msgs, key) -> (c0, c1): LSD-encrypt a batch.

        msgs: (n, B) int32 decoding-basis coefficients mod p (column-major
        like everything else here); key: jax PRNG key.  Same scheme as
        she.encrypt (c1 uniform in CRT, c0 = NTT(m + p e) - c1 * s)."""
        qs = self.qs
        p = self.params.p
        n = self.ctx.n
        var = self.params.var
        s_crt = jnp.asarray(
            np.asarray(
                she.Cyc.from_ints(self.ctx, sk.s_ints).to_crt().data
            )
        )[..., None]  # (nrns, n, 1)

        def mulmod_ch(a, b):
            return jnp.stack(
                [zq.mul_mod(a[i], b[i], q) for i, q in enumerate(qs)]
            )

        def submod_ch(a, b):
            return jnp.stack(
                [zq.sub_mod(a[i], b[i], q) for i, q in enumerate(qs)]
            )

        @jax.jit
        def enc(msgs, key):
            B = msgs.shape[-1]
            k_e, *k_u = jax.random.split(key, 1 + len(qs))
            e = jnp.round(
                jax.random.normal(k_e, (n, B), dtype=jnp.float32)
                * jnp.sqrt(jnp.float32(var))
            ).astype(jnp.int32)
            me = msgs.astype(jnp.int32) + p * e
            me_res = jnp.stack(
                [jnp.mod(me, q).astype(jnp.uint32) for q in qs]
            )
            me_crt = self._ntt(me_res)
            c1 = jnp.stack(
                [
                    jax.random.randint(k_u[i], (n, B), 0, q, dtype=jnp.uint32)
                    for i, q in enumerate(qs)
                ]
            )
            c0 = submod_ch(me_crt, mulmod_ch(c1, jnp.broadcast_to(s_crt, c1.shape)))
            return c0, c1

        return enc

    # --- the fused step ----------------------------------------------------
    def build_step(self, hint: she.KSHint):
        """jit-compiled (c0,c1,d0,d1) -> (e0,e1) over the dropped-prime
        chain: ct_mul + keySwitchQuadCirc + modSwitch."""
        if not isinstance(hint.spec, RnsGad):
            raise ValueError("batched pipeline uses the RNS gadget")
        qs = self.qs
        nrns = len(qs)
        p = self.params.p
        # hint components as (ell=nrns, nrns, n, 1) constants
        h0 = jnp.asarray(
            np.stack([np.asarray(h.to_crt().data) for h in hint.h0])
        )[..., None]
        h1 = jnp.asarray(
            np.stack([np.asarray(h.to_crt().data) for h in hint.h1])
        )[..., None]
        plans = self.plans()

        def mulmod_ch(a, b):
            return jnp.stack(
                [zq.mul_mod(a[i], b[i], q) for i, q in enumerate(qs)]
            )

        def addmod_ch(a, b):
            return jnp.stack(
                [zq.add_mod(a[i], b[i], q) for i, q in enumerate(qs)]
            )

        def decompose_cm(x):
            """RNS-gadget digits of (nrns, n, B) coeff-domain values:
            digit i = centered [x]_{q_i} in every channel: (nrns, nrns, n, B)."""
            digs = []
            for i, qi in enumerate(qs):
                xi = x[i]
                is_high = xi >= jnp.uint32((qi + 1) // 2)
                chans = []
                for j, qj in enumerate(qs):
                    if i == j:
                        chans.append(xi)
                        continue
                    r = zq.reduce_mod(xi, qj) if qi > qj else xi
                    r = jnp.where(
                        is_high, zq.sub_mod(r, jnp.uint32(qi % qj), qj), r
                    )
                    chans.append(r)
                digs.append(jnp.stack(chans))
            return jnp.stack(digs)

        def bgv_rescale_cm(x):
            """(nrns, n, B) coeff-domain -> (nrns-1, n, B): exact BGV
            drop-last rescale with the p-multiple correction."""
            ql = qs[-1]
            pinv_l = nt.modinv(p % ql, ql)
            last = x[-1]
            v = zq.mul_mod(last, jnp.uint32(pinv_l), ql)
            is_high = v >= jnp.uint32((ql + 1) // 2)
            outs = []
            for i, qi in enumerate(qs[:-1]):
                inv = nt.modinv(ql % qi, qi)
                vi = zq.reduce_mod(v, qi)
                vi = jnp.where(
                    is_high, zq.sub_mod(vi, jnp.uint32(ql % qi), qi), vi
                )
                delta = zq.mul_mod(vi, jnp.uint32(p % qi), qi)
                d = zq.sub_mod(x[i], delta, qi)
                outs.append(zq.mul_mod(d, jnp.uint32(inv), qi))
            return jnp.stack(outs)

        @jax.jit
        def step(c0, c1, d0, d1):
            # ct_mul: (c0 + c1 s)(d0 + d1 s): e0 = c0 d0, e1 = c0 d1 + c1 d0,
            # e2 = c1 d1 — all CRT Hadamards
            e0 = mulmod_ch(c0, d0)
            e1 = addmod_ch(mulmod_ch(c0, d1), mulmod_ch(c1, d0))
            e2 = mulmod_ch(c1, d1)
            # key switch e2: coefficient-domain digits, NTT back, inner prod
            e2c = self._ntt(e2, inverse=True)
            digits = decompose_cm(e2c)
            for i in range(nrns):
                di = self._ntt(digits[i])
                e0 = addmod_ch(e0, mulmod_ch(di, h0[i]))
                e1 = addmod_ch(e1, mulmod_ch(di, h1[i]))
            # rescale both components (coeff domain), NTT forward on the
            # shortened chain
            out = []
            for comp in (e0, e1):
                cc = self._ntt(comp, inverse=True)
                rc = bgv_rescale_cm(cc)
                out.append(rc)
            plans2 = ring_context(self.params.m, qs[:-1]).ntt_plans()
            out = [
                jnp.stack(
                    [
                        self._ntt(c[i][None], plans=[plans2[i]])[0]
                        for i in range(nrns - 1)
                    ]
                )
                for c in out
            ]
            return out[0], out[1]

        return step
