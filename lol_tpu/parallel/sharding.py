"""Multi-chip parallelism: device meshes and sharded ring/SHE pipelines.

The reference is a single-process library with NO distributed backend
(SURVEY.md §3.9: no MPI/NCCL anywhere); scaling is where this framework
innovates per BASELINE.json.  Parallelism axes:

- `data`: batched ciphertexts/polynomials — embarrassingly parallel
  (NamedSharding over the batch axis; no collectives in the steady
  state).
- `rns`: the residue channels — each RNS prime's entire NTT/Hadamard
  pipeline is independent; key-switch digit inner products contract the
  digit axis *locally* and only the (tiny) final accumulations cross
  channels (psum over `rns` when the digit axis is sharded).
- `ring` (large n): butterfly stages whose stride crosses the shard
  boundary become all-to-alls — see ops/pallas ring kernels (planned);
  below, `ntt_ring_sharded` implements the stride-split two-call NTT
  with jax collectives: stage set A runs on the strided view (local
  after an all-to-all regroup), stage set B is block-local.

Everything uses jax.sharding + shard_map with XLA collectives riding
ICI; multi-host meshes use the same code (mesh spans hosts).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import zq
from ..ops import ntt


def make_mesh(shape: dict[str, int], devices=None) -> Mesh:
    """Build a mesh with named axes, e.g. {'data': 4, 'rns': 2}."""
    devices = devices if devices is not None else jax.devices()
    names = tuple(shape.keys())
    dims = tuple(shape.values())
    n = int(np.prod(dims))
    if len(devices) < n:
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    return Mesh(np.array(devices[:n]).reshape(dims), axis_names=names)


# ---------------------------------------------------------------------------
# data/rns-sharded batched NTT (the steady-state workhorse)
# ---------------------------------------------------------------------------


def shard_batch_rns(mesh: Mesh, x, batch_axis: int = 1):
    """Place a (nrns, B, n) stack with rns over 'rns', batch over 'data'."""
    spec = [None] * x.ndim
    spec[0] = "rns"
    spec[batch_axis] = "data"
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))


def batched_ntt_sharded(mesh: Mesh, x, plans: list[ntt.NTTPlan],
                        inverse: bool = False):
    """(nrns, B, n) forward/inverse NTT, rns+data sharded.

    Per-residue transforms are compiled with static moduli; XLA keeps
    each residue's slice on the devices that own it (no collectives)."""
    fn = ntt.ntt_inverse_stages if inverse else ntt.ntt_forward_stages

    @jax.jit
    def run(x):
        outs = [fn(x[i], plans[i]) for i in range(len(plans))]
        return jnp.stack(outs)

    out = run(x)
    return jax.device_put(out, x.sharding) if hasattr(x, "sharding") else out


# ---------------------------------------------------------------------------
# ring-axis sharded NTT (large n: the 'sequence parallel' analog)
# ---------------------------------------------------------------------------


def ntt_ring_sharded(mesh: Mesh, x, plan: ntt.NTTPlan, axis: str = "ring"):
    """Negacyclic NTT with the coefficient axis sharded over `axis`.

    Uses the same structural split as the Pallas kernel (ops/pallas):
    for D = axis size, view (D, n/D): the first log2(D) stages only
    combine equal residues rho mod (n/D) — after resharding the view so
    each device holds one *stride class*, they are local; the remaining
    stages are local to contiguous blocks.  The single resharding between
    the two phases is the classic FFT all-to-all, expressed as a sharded
    transpose (XLA lowers it to all-to-all over ICI).

    x: (..., n) with the last axis sharded over `axis`.
    """
    n = plan.n
    D = mesh.shape[axis]
    if n % D != 0 or (D & (D - 1)):
        raise ValueError("ring sharding needs power-of-2 divisor of n")
    tS = n // D
    S = D.bit_length() - 1
    q = plan.q

    # phase A: stages 0..S-1 on the strided view (c, rho): butterfly along c
    # phase B: stages S..: local within contiguous tS-blocks
    @jax.jit
    def run(x):
        batch = x.shape[:-1]
        # view (D, tS): row c = within-class index, col rho = class
        xv = x.reshape(*batch, D, tS)
        # phase A butterflies along axis -2 (strided classes): local iff
        # the view is sharded over the *class* axis -1
        xa = jax.lax.with_sharding_constraint(
            xv, NamedSharding(mesh, P(*([None] * len(batch)), None, axis))
        )
        for s in range(S):
            m = 1 << s
            t = D >> (s + 1)
            w = jnp.asarray(plan.psi_rev[m : 2 * m])[:, None, None]
            wsh = jnp.asarray(plan.psi_rev_sh[m : 2 * m])[:, None, None]
            xs = xa.reshape(*batch, m, 2, t, tS)
            u = xs[..., 0, :, :]
            v = zq.mul_mod_shoup(xs[..., 1, :, :], w, wsh, q)
            xa = jnp.stack(
                [zq.add_mod(u, v, q), zq.sub_mod(u, v, q)], axis=-3
            ).reshape(*batch, D, tS)
            # re-pin the class-sharded layout each stage: without this the
            # phase-B (row-sharded) constraint propagates backward through
            # the stack/reshape and the SPMD partitioner falls into an
            # "involuntary full rematerialization" (VERDICT r1 #3); with it
            # the only resharding is the single phase-boundary all-to-all.
            xa = jax.lax.with_sharding_constraint(
                xa, NamedSharding(mesh, P(*([None] * len(batch)), None, axis))
            )
        # phase B: reshard so each device owns contiguous blocks (rows)
        xb = jax.lax.with_sharding_constraint(
            xa, NamedSharding(mesh, P(*([None] * len(batch)), axis, None))
        )
        # per-block tables: block b of tS rows, stages S..k-1
        from ..ops.pallas.ntt_kernel import _block_twiddles

        TB = _block_twiddles(plan, False, S=S, tS=tS)
        TBs = np.array(
            [[zq.shoup(int(wv), q) for wv in row] for row in TB], dtype=np.uint32
        )
        k = n.bit_length() - 1
        outs = xb
        # apply local network per block via vmap over the block axis
        def block_net(xloc, tab, tab_sh):
            y = xloc
            for sp in range(k - S):
                mp = 1 << sp
                t = tS >> (sp + 1)
                w = tab[mp : 2 * mp][:, None]
                wsh = tab_sh[mp : 2 * mp][:, None]
                ys = y.reshape(*y.shape[:-1], mp, 2, t)
                u = ys[..., 0, :]
                v = zq.mul_mod_shoup(ys[..., 1, :], w, wsh, q)
                y = jnp.stack(
                    [zq.add_mod(u, v, q), zq.sub_mod(u, v, q)], axis=-2
                ).reshape(*y.shape[:-1], tS)
            return y

        blocks = [
            block_net(outs[..., b, :], jnp.asarray(TB[b]), jnp.asarray(TBs[b]))
            for b in range(D)
        ]
        out = jnp.stack(blocks, axis=-2).reshape(*batch, n)
        return out

    return run(x)


# ---------------------------------------------------------------------------
# sharded SHE pipeline helpers
# ---------------------------------------------------------------------------


def batched_hadamard_sharded(mesh, a, b, qs: tuple[int, ...]):
    """(nrns, B, n) CRT-domain ciphertext products, rns+data sharded."""

    @jax.jit
    def run(a, b):
        outs = [zq.mul_mod(a[i], b[i], q) for i, q in enumerate(qs)]
        return jnp.stack(outs)

    return run(a, b)
