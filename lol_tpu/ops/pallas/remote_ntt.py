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

— two all-to-alls, the classic distributed-FFT exchange pattern.  Here
they are hand-rolled Pallas collectives using `make_async_remote_copy`
over ICI (SNIPPETS.md pattern) so they can later overlap with butterfly
compute; parallel/sharding.py has the equivalent XLA-collective version.

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
from .ntt_kernel import _block_twiddles, _ntt_net_fwd


def _shift_kernel(x_ref, o_ref, send_sem, recv_sem, *, D: int, axis: str):
    """Send the whole local buffer to the right neighbor (d+1 mod D) —
    the proven ppermute pattern (SNIPPETS.md [1])."""
    d = jax.lax.axis_index(axis)
    right = jax.lax.rem(d + 1, D)
    rdma = pltpu.make_async_remote_copy(
        src_ref=x_ref,
        dst_ref=o_ref,
        send_sem=send_sem,
        recv_sem=recv_sem,
        device_id=right,
        device_id_type=pltpu.DeviceIdType.LOGICAL,
    )
    rdma.start()
    rdma.wait()


def _ring_shift(v, D: int, axis: str, interpret: bool, cid: int):
    """Every device receives its LEFT neighbor's buffer (left-rotation of
    device contents: after the call, device d holds old device d-1...
    equivalently repeated application brings device d+s's data to d)."""
    return pl.pallas_call(
        partial(_shift_kernel, D=D, axis=axis),
        out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=cid
        ),
        interpret=interpret,
    )(v)


def _all_to_all(x_local, D: int, axis: str, interpret: bool, cid: int):
    """(D, ...) per-device -> (D, ...): out slot e = peer e's chunk x_e[d].

    Ring algorithm: D-1 whole-buffer rotations; after s rotations device
    d holds device (d-s)'s buffer, from which it extracts the chunk that
    peer addressed to us (slot d... adjusted per step).  O(D) rounds of
    neighbor-only traffic — the ring-topology-optimal schedule shape."""
    d = jax.lax.axis_index(axis)
    out = jnp.zeros_like(x_local)
    out = jax.lax.dynamic_update_index_in_dim(
        out, jax.lax.dynamic_index_in_dim(x_local, d, 0, keepdims=False), d, 0
    )
    cur = x_local
    for s in range(1, D):
        cur = _ring_shift(cur, D, axis, interpret, cid + s)
        # after s shifts: cur = buffer of device (d - s) mod D
        src_dev = jax.lax.rem(d - s + D, D)
        chunk = jax.lax.dynamic_index_in_dim(cur, d, 0, keepdims=False)
        out = jax.lax.dynamic_update_index_in_dim(out, chunk, src_dev, 0)
    return out


def ntt_ring_sharded_pallas(mesh, x, plan: NTTPlan, axis: str = "ring",
                            interpret: bool = False):
    """Forward negacyclic NTT of (..., n), last axis contiguously sharded
    over mesh axis `axis`, with Pallas-collective phase exchanges."""
    from jax.sharding import PartitionSpec

    n, q = plan.n, plan.q
    D = mesh.shape[axis]
    if n % D or D & (D - 1):
        raise ValueError("ring sharding needs a power-of-2 divisor of n")
    tS = n // D
    S = D.bit_length() - 1
    C = tS // D
    if tS % D:
        raise ValueError("need D^2 | n for the (D, C) chunking")

    wA = jnp.asarray(plan.psi_rev[:max(D, 1)])
    wAs = jnp.asarray(plan.psi_rev_sh[:max(D, 1)])
    TB = _block_twiddles(plan, False, S=S, tS=tS)
    TBs = np.array(
        [[zq.shoup(int(w), q) for w in row] for row in TB], dtype=np.uint32
    )
    TBj, TBsj = jnp.asarray(TB), jnp.asarray(TBs)

    def shard_fn(x_local):
        # x_local: (batch..., tS) = flat coords j = d*tS + rho (c = d)
        batch = x_local.shape[:-1]
        d = jax.lax.axis_index(axis)

        # a2a #1: class-shard.  reshape (D, C): chunk i = class slab i;
        # after the exchange slot e = (c=e, our slab).
        v = jnp.moveaxis(
            x_local.reshape(*batch, D, C), (-2, -1), (0, 1)
        )  # (D, C, batch...)
        v = _all_to_all(v, D, axis, interpret, cid=8)

        # phase A: DIT stages along the c axis (axis 0)
        def read_w(lo, m):
            return wA[lo : lo + m, None], wAs[lo : lo + m, None]

        shp = v.shape
        v = _ntt_net_fwd(v.reshape(D, -1), q, D, read_w).reshape(shp)

        # a2a #2: block-shard.  chunk e = (c=e, our slab) -> device e;
        # after: slot e' = (c=d, slab e') -> concat = block d.
        v = _all_to_all(v, D, axis, interpret, cid=40)
        xb = jnp.moveaxis(v, (0, 1), (-2, -1)).reshape(*batch, tS)

        # phase B: local size-tS network with block d's twiddle table
        tab = jnp.take(TBj, d, axis=0)
        tab_sh = jnp.take(TBsj, d, axis=0)

        def read_wb(lo, m):
            return tab[lo : lo + m, None], tab_sh[lo : lo + m, None]

        flat = jnp.moveaxis(xb, -1, 0).reshape(tS, -1)
        out = _ntt_net_fwd(flat, q, tS, read_wb)
        return jnp.moveaxis(out.reshape((tS,) + batch), 0, -1)

    spec = PartitionSpec(*([None] * (x.ndim - 1)), axis)
    fn = jax.shard_map(
        shard_fn, mesh=mesh, in_specs=spec, out_specs=spec, check_vma=False
    )
    return fn(x)
