"""The MXU-butterfly design experiment (SURVEY §8 hard part 1).

Question: can the MXU's int8 matmul be conscripted for the 2-power
negacyclic NTT, beating the pure-VPU fused butterfly kernels?

Approach — exact four-step NTT as matmuls: with n = P * tS (P = tS = 64
at n = 4096), our own two-call kernel split already factors the DIT
network into (A) a size-P NTT along axis 0 of the (P, tS, B) reshape
and (B) per-block size-tS NTTs with per-block twiddle tables.  BOTH
phases are mod-q linear maps, so they are dense matrices:

    out[b, t] = sum_u M_B[b][t, u] * (sum_c M_A[b, c] * x[c, u])

Stage A is one (P x P) @ (P x tS*B) modular matmul; stage B is a
b-batched (tS x tS) @ (tS x B) modular matmul — exactly MXU shapes.
The matrices are extracted EXACTLY by feeding the identity through the
same numpy staged network the kernels mirror (they're just the DIT
prefix / per-block tables), so the result is bit-identical to the
reference NTT (asserted).

Modular matmul on the MXU (u32 mod q, q < 2^30): both operands split
into 4 centered int8 limbs; limb pairs of equal weight k = i+j are
CONCATENATED along the contraction axis so the MXU also performs the
within-class additions (7 classes instead of 16 pair matmuls);
de-centering is rank-1 (row sums of the static matrix limbs + column
sums of the raw data limbs); the class fold is the only VPU epilogue:
7 Barrett reductions + 6 Shoup multiplies + adds per output element
per stage.

Range proof (class with most pairs = 4, contraction b = 64):
|centered dot| <= 4*64*128*128 = 2^22; true class value after
de-centering <= 4*64*255^2 < 2^25 < 2^31 — int32-exact.

Also measured here:
  - the empirical VPU u32 ceiling (a VMEM-resident multiply-add chain
    Pallas kernel — no HBM traffic, no table reads), giving the
    denominator for the "fraction of integer speed-of-light" claim;
  - the fused VPU NTT for the same shapes (the incumbent).

Run on TPU:  python -m lol_tpu.bench.mxu_ntt [--n 4096] [--batch 8192]
The verdict lives in DESIGN.md ("MXU-butterfly experiment").
"""

from __future__ import annotations

import argparse
import os
import time
from dataclasses import dataclass
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from .. import numtheory as nt, zq
from ..ops import ntt
from ..ops.pallas import ntt_kernel as pk


# ---------------------------------------------------------------------------
# exact stage matrices (the DIT prefix / per-block networks as matrices)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class _MiniPlan:
    """Just enough plan surface for np_ntt_forward's stage loop."""

    n: int
    q: int
    psi_rev: np.ndarray


def stage_matrices(plan: ntt.NTTPlan, P: int):
    """(M_A (P, P), M_B (nblk, tS, tS)) exact u32 matrices with
    np_ntt_forward(x) == M_B[b] @ (M_A @ x.reshape(P, tS))[b].

    M_A: the first log2(P) DIT stages = the size-P NTT with twiddle
    prefix psi_rev[:P].  M_B[b]: the remaining stages inside block b =
    the size-tS DIT network over the per-block table (same layout the
    Pallas block kernel reads)."""
    n, q = plan.n, plan.q
    tS = n // P
    eye_p = np.eye(P, dtype=np.uint32)
    mp = _MiniPlan(P, q, plan.psi_rev[:P])
    M_A = ntt.np_ntt_forward(eye_p, mp).T.copy()  # rows act on columns
    S = P.bit_length() - 1
    TB = pk._block_twiddles(plan, inverse=False, S=S, tS=tS)  # (nblk, tS)
    eye_t = np.eye(tS, dtype=np.uint32)
    M_B = np.stack([
        ntt.np_ntt_forward(eye_t, _MiniPlan(tS, q, TB[b])).T.copy()
        for b in range(n // tS)
    ])
    return M_A, M_B


# ---------------------------------------------------------------------------
# exact batched modular matmul on the MXU (class-concatenated int8 limbs)
# ---------------------------------------------------------------------------


def _limbs(q: int) -> int:
    return ((q - 1).bit_length() + 7) // 8


def mxu_modmat_apply(M: np.ndarray, x, q: int, batched: bool):
    """Y = M @ x mod q on the MXU, exact.

    batched=False: M (a, b), x (b, N).  batched=True: M (G, a, b),
    x (G, b, N) with a shared batch (block) axis.  Returns u32."""
    nl = _limbs(q)
    Mu = np.asarray(M, dtype=np.uint32)
    M_limbs = [((Mu >> (8 * i)) & 0xFF).astype(np.int32) - 128 for i in range(nl)]
    M_c = [jnp.asarray(Li.astype(np.int8)) for Li in M_limbs]
    M_rowsum = [jnp.asarray(Li.sum(axis=-1, dtype=np.int32)) for Li in M_limbs]

    X_limbs = [((x >> (8 * j)) & 0xFF).astype(jnp.int32) for j in range(nl)]
    X_c = [(Lj - 128).astype(jnp.int8) for Lj in X_limbs]
    X_colsum = [Lj.sum(axis=-2) for Lj in X_limbs]  # raw limbs: absorb 128^2*b

    if batched:
        dn = (((2,), (1,)), ((0,), (0,)))  # (G,a,b) @ (G,b,N) -> (G,a,N)
        cat_ax_m, cat_ax_x = 2, 1
    else:
        dn = (((1,), (0,)), ((), ()))
        cat_ax_m, cat_ax_x = 1, 0

    acc = None
    for k in range(2 * nl - 1):
        pairs = [(i, k - i) for i in range(max(0, k - nl + 1), min(nl, k + 1))]
        A_cat = jnp.concatenate([M_c[i] for i, _ in pairs], axis=cat_ax_m)
        X_cat = jnp.concatenate([X_c[j] for _, j in pairs], axis=cat_ax_x)
        dot = jax.lax.dot_general(
            A_cat, X_cat, dn, preferred_element_type=jnp.int32
        )
        rows = sum(M_rowsum[i] for i, _ in pairs)  # (.., a)
        cols = sum(X_colsum[j] for _, j in pairs)  # (.., N)
        true = dot + 128 * cols[..., None, :] + (128 * rows)[..., :, None]
        term = zq.reduce_mod(true.astype(jnp.uint32), q)
        w = pow(2, 8 * k, q)
        if w != 1:
            term = zq.mul_mod(term, jnp.uint32(w), q)
        acc = term if acc is None else zq.add_mod(acc, term, q)
    return acc


def mxu_ntt(x, plan: ntt.NTTPlan, P: int = 64):
    """Full four-step negacyclic NTT via two MXU modular matmuls.

    x: (n, B) coefficient-major u32.  Bit-identical to np_ntt_forward /
    the fused kernels (same network, same CRT output order)."""
    n, B = x.shape
    tS = n // P
    M_A, M_B = stage_matrices(plan, P)
    q = plan.q
    a = mxu_modmat_apply(M_A, x.reshape(P, tS * B), q, batched=False)
    a3 = a.reshape(P, tS, B)
    out = mxu_modmat_apply(M_B, a3, q, batched=True)  # (P, tS, B); P = nblk
    return out.reshape(n, B)


# ---------------------------------------------------------------------------
# empirical VPU u32 ceiling (VMEM-resident multiply chain, no HBM)
# ---------------------------------------------------------------------------


def _chain_kernel(x_ref, o_ref, *, iters):
    x = x_ref[...]
    y = x
    for _ in range(iters):
        y = y * x + jnp.uint32(1)  # one u32 multiply + one add per iter
    o_ref[...] = y


def vpu_u32_ceiling(iters: int = 512, rows: int = 512, lanes: int = 512,
                    grid: int = 64):
    """Achieved u32 (mul+add) throughput of a pure-compute Pallas kernel:
    `grid` blocks of (rows, lanes) each chained `iters` times in VMEM.
    Returns (mults_per_sec, adds_per_sec == same)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # process-unique data (see run()'s cache-hazard note)
    x = jax.random.randint(
        jax.random.PRNGKey(_seed()), (grid * rows, lanes), 0, 1 << 30,
        dtype=jnp.uint32,
    )
    kern = partial(_chain_kernel, iters=iters)
    f = jax.jit(lambda v: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((grid * rows, lanes), jnp.uint32),
        grid=(grid,),
        in_specs=[pl.BlockSpec((rows, lanes), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rows, lanes), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(v))
    jax.block_until_ready(f(x))
    reps = 20
    t0 = time.time()
    for _ in range(reps):
        y = f(x)
    jax.block_until_ready(y)
    dt = (time.time() - t0) / reps
    total = grid * rows * lanes * iters
    return total / dt  # multiplies/sec (and the same count of adds)


# ---------------------------------------------------------------------------
# harness
# ---------------------------------------------------------------------------


def _seed() -> int:
    return (os.getpid() * 1_000_003 + int(time.time())) & 0x7FFFFFFF


def _time(fn, iters=20):
    jax.block_until_ready(fn())
    t0 = time.time()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def run(n: int = 4096, batch: int = 8192, P: int = 64):
    q = nt.ntt_primes(2 * n, 30, 1)[0]
    plan = ntt.ntt_plan(n, q)
    # process-unique inputs: the tunnel's remote execution service can
    # serve cross-process CACHED results for (executable, input) pairs
    # it has seen — a re-run with fixed-seed data would time memory
    # reads (see CLAUDE.md).  Correctness is still checked against the
    # oracle on the actual fetched values.
    rng = np.random.default_rng(_seed())
    x_np = rng.integers(0, q, (n, batch), dtype=np.uint64).astype(np.uint32)
    x = jnp.asarray(x_np)
    on_tpu = jax.default_backend() == "tpu"

    # correctness: four-step MXU == numpy oracle, bit-exact
    fs = jax.jit(lambda v: mxu_ntt(v, plan, P))
    got = np.asarray(fs(x[:, :256]))
    want = ntt.np_ntt_forward(x_np[:, :256].T, plan).T
    np.testing.assert_array_equal(got, want)
    print(f"# mxu four-step n={n} P={P}: bit-exact vs numpy oracle")

    t_mxu = _time(lambda: fs(x))
    print(f"mxu four-step NTT      {t_mxu * 1e3:8.3f} ms  "
          f"{batch / t_mxu:12.0f} residue-NTT/s")

    if on_tpu and batch % 128 == 0:
        t_vpu = _time(lambda: pk.ntt_cm(x, plan))
        print(f"fused VPU NTT (pallas) {t_vpu * 1e3:8.3f} ms  "
              f"{batch / t_vpu:12.0f} residue-NTT/s")
    fwd = ntt._jit_fwd(plan)
    xt = x.T
    t_xla = _time(lambda: fwd(xt))
    print(f"staged XLA NTT         {t_xla * 1e3:8.3f} ms  "
          f"{batch / t_xla:12.0f} residue-NTT/s")

    if on_tpu:
        mps = vpu_u32_ceiling()
        print(f"VPU u32 ceiling: {mps / 1e12:.2f} T(mul+add)/s "
              f"(VMEM-resident chain)")
        # the fused NTT does ~6 real multiplies + ~15 other vector ops
        # per butterfly; express achieved rate as a fraction of a
        # multiply-bound ideal at 6 muls/butterfly
        k = n.bit_length() - 1
        ideal = mps / (6 * (k * n // 2))
        print(f"multiply-bound ideal at 6 mul/bf: {ideal:12.0f} residue-NTT/s")
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--P", type=int, default=64)
    args = ap.parse_args()
    run(args.n, args.batch, args.P)


if __name__ == "__main__":
    main()
