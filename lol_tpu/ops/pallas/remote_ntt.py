"""Ring-axis-sharded NTT with in-kernel Pallas all-to-alls (remote DMA).

SURVEY.md §6 "long-context analog" / §3.9 parallelism inventory: for ring
degrees beyond one chip, the coefficient axis is sharded over a mesh axis
of size D; the radix-2 network factors (see ntt_kernel.py) into
  phase A: the first log2(D) stages — butterflies along the
           *within-class* index c of the view j = c*tS + rho,
  phase B: the remaining stages — local to contiguous tS-row blocks.
With the natural contiguous sharding, device d initially owns exactly
within-class index c = d of every class rho, so the dataflow is

  a2a#1 (class-shard) -> phase A local -> a2a#2 (block-shard) -> phase B

— two all-to-alls, the classic distributed-FFT exchange pattern; the
inverse transform runs the mirror (phase B' -> a2a -> phase A' -> a2a ->
1/n scale; the chunk-transpose a2a is an involution).  The exchanges are
hand-rolled Pallas collectives using `make_async_remote_copy` over ICI
(SNIPPETS.md pattern) so they can later overlap with butterfly compute;
parallel/sharding.py has the equivalent XLA-collective version.

Traffic: the all-to-all sends each (C, batch...) chunk DIRECTLY to its
addressee (ICI routes a remote DMA through the torus), so each device
transmits (D-1)/D of its local buffer once — 4*(D-1)*C*prod(batch) bytes
per device per exchange, the information-theoretic minimum.  (The round-1
version rotated the whole buffer D-1 times: D x more bytes.)

Collective ids: every pallas collective in one jitted program needs a
program-unique id consistent across devices; they are allocated from the
_COLLECTIVE_IDS registry below (insertion order), not magic constants.

Contract: D^2 | n; input (..., n) sharded contiguously over the last
axis; output identically sharded; bit-exact vs all other paths.

Tested in interpreter mode on the 8-virtual-device CPU mesh; the same
code runs compiled on real multi-chip slices.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ... import zq
from ..ntt import NTTPlan
from .ntt_kernel import _block_twiddles, _ntt_net_fwd, _ntt_net_inv

# Program-unique collective ids, one per a2a call site (both directions
# reuse the same two sites: the exchanges are sequenced by data flow).
_COLLECTIVE_IDS = {
    name: i for i, name in enumerate(
        ["a2a_class", "a2a_block", "a2a_fused", "a2a_fused_inv"]
    )
}


def _a2a_kernel(x_ref, o_ref, send_sems, recv_sems, local_sem, *, D: int,
                axis: str):
    """Chunked all-to-all: my chunk r goes straight into peer r's slot d
    (out[e] on device d = x_e[d]).  One remote DMA per peer, distinct
    semaphore pair per hop-offset so the uniform schedule pairs each send
    with the matching receive from the opposite offset."""
    d = jax.lax.axis_index(axis)
    # own chunk: local DMA x[d] -> out[d]
    own = pltpu.make_async_copy(
        x_ref.at[pl.ds(d, 1)], o_ref.at[pl.ds(d, 1)], local_sem
    )
    own.start()
    rdmas = []
    for k in range(1, D):
        r = jax.lax.rem(d + k, D)
        rdma = pltpu.make_async_remote_copy(
            src_ref=x_ref.at[pl.ds(r, 1)],   # my chunk addressed to r
            dst_ref=o_ref.at[pl.ds(d, 1)],   # lands in r's slot <my id>
            send_sem=send_sems.at[k - 1],
            recv_sem=recv_sems.at[k - 1],
            device_id=r,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        rdma.start()
        rdmas.append(rdma)
    own.wait()
    for rdma in rdmas:
        rdma.wait()


def _all_to_all(v, D: int, axis: str, interpret: bool, site: str):
    """(D, C, batch...) per-device -> (D, C, batch...): chunk transpose
    out[e] = peer e's chunk addressed to us.  Involution."""
    return pl.pallas_call(
        partial(_a2a_kernel, D=D, axis=axis),
        out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA((max(D - 1, 1),)),
            pltpu.SemaphoreType.DMA((max(D - 1, 1),)),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=_COLLECTIVE_IDS[site]
        ),
        interpret=interpret,
    )(v)


def _fused_a2a_phaseB_kernel(x_ref, tab_ref, tabs_ref, o_ref, land_ref,
                             vbuf, obuf, ack_src, ack_dst, send_sems,
                             recv_sems, local_sems, slab_sem, io_sem,
                             ack_send_sems, ack_recv_sems, *, D: int, C: int,
                             NF: int, W: int, q: int, tS: int, axis: str,
                             kslot: int):
    """a2a #2 fused with the phase-B butterfly network, overlapped, with
    a CAPPED landing zone (VERDICT r2 #10 + r3 #10; ADVICE r3): the
    landing zone holds `kslot` batch slabs (slab t lands in slot
    t % kslot), and slots are recycled through a reverse-ack protocol —
    after consuming slab t, a device sends a tiny uniform ack-a2a round
    for that slot, and no device issues slab t+kslot's chunk DMAs until
    the acks for the slot's previous tenancy have arrived from every
    peer.  Outstanding DMA depth is therefore <= kslot*D data copies
    (+ D-1 in-flight acks) and landing memory kslot*(D, C, W) — both
    independent of the batch F.  (The unrolled program still grows as
    O(NF*D) instructions; at the benched shapes NF <= 8, D <= 8.)
    Expected hiding is unchanged: while slab t computes, slabs
    t+1..t+kslot-1 are in flight.

    x_ref:   (D, C, F) my phase-A output, chunk r addressed to peer r
    land:    (D, C, kslot*W) landing zone (extra output, ANY/HBM)
    o_ref:   (tS, F) phase-B result (row r = e*C + c of block d)
    vbuf:    (D, C, W) VMEM compute buffer for one slab
    obuf:    (tS, W) VMEM result staging
    ack_src/ack_dst: dummy VMEM tiles whose transfer IS the ack signal
    """
    d = jax.lax.axis_index(axis)

    def data_descs(t):
        """The slab-t chunk copies (own + D-1 remote), slot-indexed sems.
        Uniform schedule: .wait() on a descriptor waits my send AND the
        mirrored peer's arrival."""
        slot = t % kslot
        src_sl = pl.ds(t * W, W)
        dst_sl = pl.ds(slot * W, W)
        own = pltpu.make_async_copy(
            x_ref.at[pl.ds(d, 1), :, src_sl],
            land_ref.at[pl.ds(d, 1), :, dst_sl],
            local_sems.at[slot],
        )
        remotes = []
        for k in range(1, D):
            r = jax.lax.rem(d + k, D)
            remotes.append(pltpu.make_async_remote_copy(
                src_ref=x_ref.at[pl.ds(r, 1), :, src_sl],
                dst_ref=land_ref.at[pl.ds(d, 1), :, dst_sl],
                send_sem=send_sems.at[slot, k - 1],
                recv_sem=recv_sems.at[slot, k - 1],
                device_id=r,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            ))
        return own, remotes

    def ack_descs(slot):
        """The slot's ack round: a tiny copy to every peer; arrival of
        the mirrored incoming ack == that peer consumed its slab."""
        descs = []
        for k in range(1, D):
            r = jax.lax.rem(d + k, D)
            descs.append(pltpu.make_async_remote_copy(
                src_ref=ack_src,
                dst_ref=ack_dst,
                send_sem=ack_send_sems.at[slot, k - 1],
                recv_sem=ack_recv_sems.at[slot, k - 1],
                device_id=r,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            ))
        return descs

    def issue(t):
        own, remotes = data_descs(t)
        own.start()
        for rdma in remotes:
            rdma.start()

    # prologue: fill the kslot-deep pipeline
    for t in range(min(kslot, NF)):
        issue(t)

    # widen the (tS, 128) twiddle tile to the slab width (see ntt_kernel)
    lanes = W
    tab, tabs = (
        jnp.concatenate([r[...]] * (lanes // r.shape[-1]), axis=-1)
        if lanes > r.shape[-1] else r[...]
        for r in (tab_ref, tabs_ref)
    )

    def read_wb(lo, m):
        return tab[lo : lo + m], tabs[lo : lo + m]

    for t in range(NF):
        slot = t % kslot
        own, remotes = data_descs(t)
        own.wait()
        for rdma in remotes:
            rdma.wait()
        # HBM -> VMEM, compute, VMEM -> HBM
        dst_sl = pl.ds(slot * W, W)
        cp_in = pltpu.make_async_copy(
            land_ref.at[:, :, dst_sl], vbuf, slab_sem
        )
        cp_in.start()
        cp_in.wait()
        y = _ntt_net_fwd(vbuf[...].reshape(tS, W), q, tS, read_wb)
        obuf[...] = y
        cp_out = pltpu.make_async_copy(
            obuf, o_ref.at[:, pl.ds(t * W, W)], io_sem
        )
        cp_out.start()
        cp_out.wait()
        # slot is free on this device: tell every peer
        for ack in ack_descs(slot):
            ack.start()
        nxt = t + kslot
        if nxt < NF:
            # recycle the slot only after every peer's ack arrived
            for ack in ack_descs(slot):
                ack.wait()
            issue(nxt)
    # drain the final rounds' acks (started but never waited above)
    for t in range(max(NF - kslot, 0), NF):
        for ack in ack_descs(t % kslot):
            ack.wait()


def _fused_a2a_phaseB(v, tab, tabs, D: int, C: int, W: int, q: int,
                      axis: str, interpret: bool, kslot: int = 2):
    """(D, C, F) phase-A output -> (tS, F) phase-B result with the
    overlapped fused kernel.  F must be a multiple of W (>= 128);
    kslot = landing-zone depth in slabs (2 = double-buffered)."""
    F = v.shape[-1]
    tS = D * C
    NF = F // W
    kslot = min(kslot, NF)
    out, _land = pl.pallas_call(
        partial(_fused_a2a_phaseB_kernel, D=D, C=C, NF=NF, W=W, q=q, tS=tS,
                axis=axis, kslot=kslot),
        out_shape=(
            jax.ShapeDtypeStruct((tS, F), v.dtype),
            jax.ShapeDtypeStruct((D, C, kslot * W), v.dtype),  # landing zone
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((D, C, W), jnp.uint32),
            pltpu.VMEM((tS, W), jnp.uint32),
            pltpu.VMEM((8, 128), jnp.uint32),  # ack payload (dummy)
            pltpu.VMEM((8, 128), jnp.uint32),  # ack landing (dummy)
            pltpu.SemaphoreType.DMA((kslot, max(D - 1, 1))),
            pltpu.SemaphoreType.DMA((kslot, max(D - 1, 1))),
            pltpu.SemaphoreType.DMA((kslot,)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((kslot, max(D - 1, 1))),
            pltpu.SemaphoreType.DMA((kslot, max(D - 1, 1))),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=_COLLECTIVE_IDS["a2a_fused"]
        ),
        interpret=interpret,
    )(v, tab, tabs)
    return out


def _fused_phaseBinv_a2a_kernel(x_ref, tab_ref, tabs_ref, land_ref, sbuf_ref,
                                vbuf, obuf, send_sems, recv_sems, local_sems,
                                own_sems, in_sems, stage_sems, *, D: int,
                                C: int, NF: int, W: int, q: int, tS: int,
                                axis: str, depth: int):
    """Inverse mirror of the fused overlap (send-side): the local
    size-tS GS phase-B' network runs slab-by-slab, and each slab's D
    chunks are DMA'd to their addressees AS SOON AS that slab is
    computed — later slabs' butterflies overlap earlier slabs' ICI
    traffic.  Chunks are staged per-slab in HBM (sbuf, an extra output)
    so no send source is ever reused and no ack protocol is needed.

    Bound (ADVICE r3 / VERDICT r4 next #9): the landing zone here is
    the final a2a output — full (D, C, F), not recycled — so memory is
    fixed, but an unbounded drain would let outstanding sends grow to
    NF*(D-1).  Sends are therefore SLIDING-WINDOW drained: after slab
    t's copies issue, slab t-depth+1's copies (own + all peers, send
    AND recv semaphores) are waited, so at most `depth` slabs =
    depth*(D-1) data DMAs (+ depth own-copies) are in flight at any
    point, independent of batch.  Deadlock-free: every device issues
    slab k's sends at its iteration k before any device waits slab k,
    and waits target only slabs <= t-depth+1 < t.  (The unrolled
    program is still O(NF*D) instructions; benched shapes NF <= 8,
    D <= 8.)

    x_ref:  (tS, F) my local rows (GS/brv order, phase-B' input)
    sbuf:   (D, C, F) per-slab HBM staging of phase-B' output (chunked)
    land:   (D, C, F) landing zone = a2a_block(phase B'(x)) — handed to
            the (tiny) phase-A network + 1/n scale outside the kernel
    """
    d = jax.lax.axis_index(axis)
    lanes = W
    tab, tabs = (
        jnp.concatenate([r[...]] * (lanes // r.shape[-1]), axis=-1)
        if lanes > r.shape[-1] else r[...]
        for r in (tab_ref, tabs_ref)
    )

    def read_wb(lo, m):
        return tab[lo : lo + m], tabs[lo : lo + m]

    def own_copy(t):
        sl = pl.ds(t * W, W)
        return pltpu.make_async_copy(
            sbuf_ref.at[pl.ds(d, 1), :, sl],
            land_ref.at[pl.ds(d, 1), :, sl],
            own_sems.at[t],
        )

    def remote_copies(t):
        sl = pl.ds(t * W, W)
        out = []
        for k in range(1, D):
            r = jax.lax.rem(d + k, D)
            out.append(pltpu.make_async_remote_copy(
                src_ref=sbuf_ref.at[pl.ds(r, 1), :, sl],
                dst_ref=land_ref.at[pl.ds(d, 1), :, sl],
                send_sem=send_sems.at[t, k - 1],
                recv_sem=recv_sems.at[t, k - 1],
                device_id=r,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            ))
        return out

    def drain(t):
        own_copy(t).wait()
        for cp in remote_copies(t):
            cp.wait()

    for t in range(NF):
        sl = pl.ds(t * W, W)
        # HBM -> VMEM, compute phase B' on this slab, stage to HBM
        cp_in = pltpu.make_async_copy(x_ref.at[:, sl], vbuf, in_sems.at[t])
        cp_in.start()
        cp_in.wait()
        y = _ntt_net_inv(vbuf[...], q, tS, read_wb)
        obuf[...] = y.reshape(D, C, W)  # row r = e*C + c -> chunk e
        cp_st = pltpu.make_async_copy(
            obuf, sbuf_ref.at[:, :, sl], stage_sems.at[t]
        )
        cp_st.start()
        cp_st.wait()
        # immediately ship this slab's chunks (chunk r -> device r)
        own_copy(t).start()
        for cp in remote_copies(t):
            cp.start()
        if t - depth + 1 >= 0:  # sliding-window drain (bound note above)
            drain(t - depth + 1)
    # drain the last depth-1 slabs' copies
    for t in range(max(NF - depth + 1, 0), NF):
        drain(t)
    del local_sems  # reserved (kept for parity with the forward kernel)


def _fused_phaseBinv_a2a(x, tab, tabs, D: int, C: int, W: int, q: int,
                         axis: str, interpret: bool, depth: int = 2):
    """(tS, F) local rows -> (D, C, F) landing zone with the send-side
    overlapped fused kernel.  F must be a multiple of W (>= 128).
    depth: sliding send window in slabs (bounds in-flight DMAs to
    depth*(D-1) data copies; 2 = double-buffered, mirroring the forward
    kernel's kslot)."""
    F = x.shape[-1]
    tS = D * C
    NF = F // W
    depth = max(1, min(depth, NF))
    land, _stage = pl.pallas_call(
        partial(_fused_phaseBinv_a2a_kernel, D=D, C=C, NF=NF, W=W, q=q,
                tS=tS, axis=axis, depth=depth),
        out_shape=(
            jax.ShapeDtypeStruct((D, C, F), x.dtype),  # landing zone
            jax.ShapeDtypeStruct((D, C, F), x.dtype),  # per-slab staging
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((tS, W), jnp.uint32),
            pltpu.VMEM((D, C, W), jnp.uint32),
            pltpu.SemaphoreType.DMA((NF, max(D - 1, 1))),
            pltpu.SemaphoreType.DMA((NF, max(D - 1, 1))),
            pltpu.SemaphoreType.DMA((NF,)),
            pltpu.SemaphoreType.DMA((NF,)),
            pltpu.SemaphoreType.DMA((NF,)),
            pltpu.SemaphoreType.DMA((NF,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            collective_id=_COLLECTIVE_IDS["a2a_fused_inv"],
        ),
        interpret=interpret,
    )(x, tab, tabs)
    return land


def _plan_tables(plan: NTTPlan, D: int, inverse: bool):
    n, q = plan.n, plan.q
    tS = n // D
    S = D.bit_length() - 1
    src, src_sh = (
        (plan.ipsi_rev, plan.ipsi_rev_sh) if inverse
        else (plan.psi_rev, plan.psi_rev_sh)
    )
    wA = jnp.asarray(src[: max(D, 1)])
    wAs = jnp.asarray(src_sh[: max(D, 1)])
    TB = _block_twiddles(plan, inverse, S=S, tS=tS)
    TBs = np.array(
        [[zq.shoup(int(w), q) for w in row] for row in TB], dtype=np.uint32
    )
    return wA, wAs, jnp.asarray(TB), jnp.asarray(TBs)


def _ring_sharded(mesh, x, plan: NTTPlan, axis: str, interpret: bool,
                  inverse: bool, overlap: bool = False):
    from jax.sharding import PartitionSpec

    n, q = plan.n, plan.q
    D = mesh.shape[axis]
    if n % D or D & (D - 1):
        raise ValueError("ring sharding needs a power-of-2 divisor of n")
    tS = n // D
    C = tS // D
    if tS % D:
        raise ValueError("need D^2 | n for the (D, C) chunking")

    wA, wAs, TBj, TBsj = _plan_tables(plan, D, inverse)

    def read_wa(lo, m):
        return wA[lo : lo + m, None], wAs[lo : lo + m, None]

    def shard_fn(x_local):
        batch = x_local.shape[:-1]
        d = jax.lax.axis_index(axis)
        tab = jnp.take(TBj, d, axis=0)
        tab_sh = jnp.take(TBsj, d, axis=0)

        def read_wb(lo, m):
            return tab[lo : lo + m, None], tab_sh[lo : lo + m, None]

        if not inverse:
            # a2a #1: class-shard.  reshape (D, C): chunk i = class slab i;
            # after the exchange slot e = (c=e, our slab).
            v = jnp.moveaxis(
                x_local.reshape(*batch, D, C), (-2, -1), (0, 1)
            )  # (D, C, batch...)
            v = _all_to_all(v, D, axis, interpret, "a2a_class")
            # phase A: DIT stages along the c axis (axis 0)
            shp = v.shape
            v = _ntt_net_fwd(v.reshape(D, -1), q, D, read_wa).reshape(shp)
            F = int(np.prod(batch)) if batch else 1
            from .ntt_kernel import WINDOW

            if overlap and F % 128 == 0 and tS <= WINDOW:
                # fused a2a #2 + phase B: butterflies start on batch
                # slabs as their chunks land (VERDICT r2 #10).  tS must
                # fit the in-kernel value window (ntt_kernel's Mosaic
                # scoped-VMEM bound); larger tS falls through to the
                # two-call path (a second-level split inside the fused
                # kernel is future work).  Prefer >= 2 slabs so the
                # pipeline actually overlaps.
                cands = [w for w in (512, 256, 128) if F % w == 0]
                W = next((w for w in cands if F // w >= 2), cands[0])
                tab2 = jnp.broadcast_to(tab[:, None], (tS, 128))
                tabs2 = jnp.broadcast_to(tab_sh[:, None], (tS, 128))
                y = _fused_a2a_phaseB(
                    v.reshape(D, C, F), tab2, tabs2, D, C, W, q, axis,
                    interpret,
                )
                return jnp.moveaxis(y.reshape((tS,) + batch), 0, -1)
            # a2a #2: block-shard.  chunk e = (c=e, our slab) -> device e;
            # after: slot e' = (c=d, slab e') -> concat = block d.
            v = _all_to_all(v, D, axis, interpret, "a2a_block")
            xb = jnp.moveaxis(v, (0, 1), (-2, -1)).reshape(*batch, tS)
            # phase B: local size-tS network with block d's twiddle table
            flat = jnp.moveaxis(xb, -1, 0).reshape(tS, -1)
            y = _ntt_net_fwd(flat, q, tS, read_wb)
            return jnp.moveaxis(y.reshape((tS,) + batch), 0, -1)

        # inverse: mirror of the forward (GS stages high -> low), then 1/n
        flat = jnp.moveaxis(x_local, -1, 0).reshape(tS, -1)
        F = flat.shape[-1]
        from .ntt_kernel import WINDOW as _WIN

        if overlap and F % 128 == 0 and tS <= _WIN:
            # send-side overlap: each batch slab's chunks ship as soon
            # as its phase-B' butterflies finish (mirror of the forward
            # receive-side overlap; same bounds and fallback)
            cands = [w for w in (512, 256, 128) if F % w == 0]
            W = next((w for w in cands if F // w >= 2), cands[0])
            tab2 = jnp.broadcast_to(tab[:, None], (tS, 128))
            tabs2 = jnp.broadcast_to(tab_sh[:, None], (tS, 128))
            v = _fused_phaseBinv_a2a(flat, tab2, tabs2, D, C, W, q, axis,
                                     interpret)
            v = v.reshape((D, C) + batch)
        else:
            y = _ntt_net_inv(flat, q, tS, read_wb)
            xb = jnp.moveaxis(y.reshape((tS,) + batch), 0, -1)
            v = jnp.moveaxis(xb.reshape(*batch, D, C), (-2, -1), (0, 1))
            v = _all_to_all(v, D, axis, interpret, "a2a_block")
        shp = v.shape
        v = _ntt_net_inv(v.reshape(D, -1), q, D, read_wa).reshape(shp)
        v = zq.mul_mod_shoup(
            v, jnp.uint32(plan.n_inv), jnp.uint32(plan.n_inv_sh), q
        )
        v = _all_to_all(v, D, axis, interpret, "a2a_class")
        return jnp.moveaxis(v, (0, 1), (-2, -1)).reshape(*batch, tS)

    spec = PartitionSpec(*([None] * (x.ndim - 1)), axis)
    fn = jax.shard_map(
        shard_fn, mesh=mesh, in_specs=spec, out_specs=spec, check_vma=False
    )
    return fn(x)


def ntt_ring_sharded_pallas(mesh, x, plan: NTTPlan, axis: str = "ring",
                            interpret: bool = False, overlap: bool = False):
    """Forward negacyclic NTT of (..., n), last axis contiguously sharded
    over mesh axis `axis`, with Pallas-collective phase exchanges.

    overlap=True fuses the second all-to-all with the phase-B butterfly
    network (batch flattens to a multiple of 128 and tS = n/D fits the
    512-row in-kernel window): chunk DMAs stream into a TWO-SLAB
    landing zone recycled via a reverse-ack protocol (slab t+2's sends
    are gated on every peer acking slot consumption), and the size-tS
    network starts on each batch slab as soon as its D chunks arrive —
    hiding all exchange traffic but the first slab's behind butterfly
    compute, at <= 2*D outstanding data DMAs and 2-slab landing memory
    regardless of batch.  Outside those bounds the flag silently falls
    back to the two-call path.  Bit-exact vs overlap=False (same
    network, same tables)."""
    return _ring_sharded(mesh, x, plan, axis, interpret, inverse=False,
                         overlap=overlap)


def intt_ring_sharded_pallas(mesh, x, plan: NTTPlan, axis: str = "ring",
                             interpret: bool = False, overlap: bool = False):
    """Inverse transform (includes the 1/n scale): the exact mirror of the
    forward dataflow; round-trips bit-exactly with it (VERDICT r1 #9).

    overlap=True: send-side overlap — each batch slab's chunks are
    DMA'd to their addressees as soon as that slab's phase-B'
    butterflies finish, with a 2-slab sliding send window bounding
    in-flight DMAs to 2*(D-1) data copies regardless of batch (the
    forward direction's kslot discipline, send-side; same shape
    bounds/fallback as the forward overlap)."""
    return _ring_sharded(mesh, x, plan, axis, interpret, inverse=True,
                         overlap=overlap)
