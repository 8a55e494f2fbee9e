"""Fused negacyclic NTT as Pallas TPU kernels.

TPU-native equivalent of the reference's C++ CRT kernel (`lol-cpp
.../crt.cpp`, p=2 path; SURVEY.md §3.3/§3.9 item 3).

Design (TPU-first, tuned empirically on v5e):

- **Coefficient-major layout**: kernels operate on (n, B) data —
  coefficients along sublanes, a 128-wide batch slab along lanes.  Every
  butterfly splits leading axes only, so no butterfly ever crosses the
  128 lanes: zero lane shuffles (a row-major port of the classic SIMD NTT
  would shuffle lanes in its last 7 stages).
- **Bounded in-kernel values**: Mosaic allocates scoped-VMEM stack for
  every live stage temporary, so fusing k stages over an (n, B) value
  needs ~2k value-sized slots — at n=4096 that OOMs the 16MB scoped
  limit.  The fix is structural: the radix-2 DIT network factors into
    (A) the first S stages, which only combine indices j = c*tS + rho
        with equal rho — i.e. a size-2^S NTT along axis 0 of the free
        reshape (2^S, tS, B), gridded over rho-chunks;
    (B) the last log2(tS) stages, which stay within contiguous tS-row
        blocks — a size-tS NTT per block with per-block twiddle tables,
        gridded over blocks.
  Window tS <= 512 keeps every in-kernel value <= 512x128 (256KB), so
  each call's scoped stack stays ~5MB no matter how large n is.  Two HBM
  round-trips total (vs one per stage on the XLA path).
- Twiddles ride as compact (rows, 1) HBM columns with Shoup companions;
  each kernel lane-broadcasts the slice it reads, then group expansion
  is sublane-only (the two single-axis broadcasts are chained because
  Mosaic has no combined sublane+lane broadcast of loaded values).
- Arithmetic is the exact same `zq.mul_mod_shoup`/`add_mod`/`sub_mod`
  u32 code the XLA path uses, and the two-call split applies the *same*
  stage network, so results are bit-exact equal to the jnp/numpy paths.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ... import zq
from ..ntt import NTTPlan

DEFAULT_LANES = 128
TILE = 128  # native lane-tile width twiddle tables are shipped at
WINDOW = 512  # max rows of any in-kernel value; tS = min(n, WINDOW)


def _lane_rep(v: np.ndarray, lanes: int) -> np.ndarray:
    return np.broadcast_to(v[:, None], (v.shape[0], lanes)).copy()


def _split(n: int, window: int = WINDOW) -> tuple[int, int, int]:
    """-> (k, S, tS): k = log2 n; S cross-block stages; tS block rows."""
    k = n.bit_length() - 1
    tS = min(n, window)
    S = k - (tS.bit_length() - 1)
    return k, S, tS


def _block_twiddles(plan: NTTPlan, inverse: bool, S: int | None = None,
                    tS: int | None = None) -> np.ndarray:
    """(nblk, tS) per-block tables for the within-block stages.

    Block b's table has the standard DIT layout: rows [2^sp, 2^(sp+1))
    hold the local-stage-sp group twiddles, which for global stage
    s = S+sp and block b are src[2^s + b*2^sp + i'] (the global group
    index of row r in block b is b*2^sp + (r div 2t))."""
    n = plan.n
    k = n.bit_length() - 1
    if S is None or tS is None:
        _, S, tS = _split(n)
    src = plan.ipsi_rev if inverse else plan.psi_rev
    nblk = n // tS
    T = np.zeros((nblk, tS), dtype=np.uint32)
    for sp in range(k - S):
        mp = 1 << sp
        base = 1 << (S + sp)
        for b in range(nblk):
            T[b, mp : 2 * mp] = src[base + b * mp : base + (b + 1) * mp]
    return T


# --- stage networks over values (shapes static; axis 0 is transformed) -----


def _wb(w, m, u_shape):
    """Broadcast (m, lanes) or (m, 1) group twiddles over u's
    (m, t, ..., lanes)."""
    target = (m,) + tuple(1 for _ in u_shape[1:-1]) + (w.shape[-1],)
    return jnp.broadcast_to(w.reshape(target), u_shape)


def _bf_fwd_exact(u, v, ws, q):
    """DIT butterfly, fully-reduced form: inputs/outputs in [0, q)."""
    m = ws[0].shape[0]
    w, wsh = (_wb(a, m, u.shape) for a in ws)
    t = zq.mul_mod_shoup(v, w, wsh, q)
    return zq.add_mod(u, t, q), zq.sub_mod(u, t, q)


def _bf_fwd_lazy(u, v, ws, q):
    """DIT butterfly, Harvey lazy form: inputs/outputs in [0, 4q).

    u is folded once into [0, 2q); the lazy Shoup multiply accepts any
    u32 v and returns t in [0, 2q); outputs u''+t and u''+2q-t are both
    in [0, 4q) — the stage invariant, valid for q < 2^30.  Saves the
    three per-butterfly conditional corrections of the exact form."""
    wsl, wshsl = ws
    m = wsl.shape[0]
    w = _wb(wsl, m, u.shape)
    s1 = _wb(wshsl >> 16, m, u.shape)  # split on the (m, lanes) slice:
    s0 = _wb(wshsl & 0xFFFF, m, u.shape)  # per-table-entry, not per-butterfly
    q2 = jnp.uint32(2 * q)
    t = zq.mul_shoup_lazy(v, w, s1, s0, q)
    uu = jnp.where(u >= q2, u - q2, u)
    return uu + t, uu + (q2 - t)


def _bf_inv_exact(u, v, ws, q):
    """GS butterfly, fully-reduced form."""
    m = ws[0].shape[0]
    w, wsh = (_wb(a, m, u.shape) for a in ws)
    d = zq.mul_mod_shoup(zq.sub_mod(u, v, q), w, wsh, q)
    return zq.add_mod(u, v, q), d


def _bf_inv_lazy(u, v, ws, q):
    """GS butterfly, lazy form: inputs/outputs in [0, 2q)."""
    wsl, wshsl = ws
    m = wsl.shape[0]
    w = _wb(wsl, m, u.shape)
    s1 = _wb(wshsl >> 16, m, u.shape)
    s0 = _wb(wshsl & 0xFFFF, m, u.shape)
    q2 = jnp.uint32(2 * q)
    s = u + v  # < 4q
    s = jnp.where(s >= q2, s - q2, s)
    d = zq.mul_shoup_lazy(u + (q2 - v), w, s1, s0, q)  # arg < 4q, any u32 ok
    return s, d


def _fwd_stage2(x, q, nloc, s, read_w, bf=_bf_fwd_exact):
    """One radix-2 DIT stage."""
    m = 1 << s
    t = nloc >> (s + 1)
    rest = x.shape[1:]
    ws = read_w(m, m)
    xs = x.reshape(m, 2, t, *rest)
    nu, nv = bf(xs[:, 0], xs[:, 1], ws, q)
    return jnp.stack([nu, nv], axis=1).reshape(nloc, *rest)


def _fwd_stage_r(x, q, nloc, s, read_w, r, bf=_bf_fwd_exact):
    """r fused radix-2 DIT stages (radix 2^r): one reshape/stack relayout
    pass for r stages.  The 2^r slices stay in place across the inner
    stages — at inner stage j, slices pair across bit (r-1-j) of the
    slice index and the twiddle group is (outer, top-j bits of the slice
    index), so only pairing/twiddle indices change, never the data
    layout.  Same multiply count as r radix-2 stages."""
    m = 1 << s
    R = 1 << r
    t = nloc >> (s + r)
    rest = x.shape[1:]
    xs = x.reshape(m, R, t, *rest)
    parts = [xs[:, i] for i in range(R)]
    for j in range(r):
        wsj = [a.reshape(m, 1 << j, -1) for a in read_w(m << j, m << j)]
        step = 1 << (r - 1 - j)
        for i_u in range(R):
            if i_u & step:
                continue
            i_v = i_u | step
            g_inner = i_u >> (r - j)
            ws = [a[:, g_inner] for a in wsj]
            parts[i_u], parts[i_v] = bf(parts[i_u], parts[i_v], ws, q)
    return jnp.stack(parts, axis=1).reshape(nloc, *rest)


def _ntt_net_fwd(x, q, nloc, read_w, rlog=1, bf=_bf_fwd_exact):
    """DIT network along axis 0 (length nloc); trailing axes carried.
    rlog = log2 of the fused-stage radix (1 = plain radix-2)."""
    kloc = nloc.bit_length() - 1
    s = 0
    while s < kloc:
        r = min(rlog, kloc - s)
        if r == 1:
            x = _fwd_stage2(x, q, nloc, s, read_w, bf)
        else:
            x = _fwd_stage_r(x, q, nloc, s, read_w, r, bf)
        s += r
    return x


def _bf_inv_lazy_final(u, v, q, fs):
    """Global stage 0 of the GS inverse with the 1/n scale FOLDED in
    (lazy path): u' = (u+v)*ninv, v' = (u-v)*(w0*ninv), both via one
    lazy Shoup multiply each (any-u32 inputs: u+v and u+(2q-v) < 4q).
    Replaces stage-0's half-multiply + the separate full-array scale
    pass + its fold — net ~0.5 fewer multiplies per element.  fs =
    (ninv, ninv_hi, ninv_lo, w0s, w0s_hi, w0s_lo) scalar u32s, where
    w0s = ipsi_rev[1]*ninv mod q.  Outputs in [0, 2q)."""
    ninv, ninv_hi, ninv_lo, w0s, w0s_hi, w0s_lo = fs
    q2 = jnp.uint32(2 * q)
    s = zq.mul_shoup_lazy(u + v, ninv, ninv_hi, ninv_lo, q)
    d = zq.mul_shoup_lazy(u + (q2 - v), w0s, w0s_hi, w0s_lo, q)
    return s, d


def _inv_stage2(x, q, nloc, s, read_w, bf=_bf_inv_exact, final_scale=None):
    h = 1 << s
    rest = x.shape[1:]
    xs = x.reshape(h, 2, nloc >> (s + 1), *rest)
    if s == 0 and final_scale is not None:
        nu, nv = _bf_inv_lazy_final(xs[:, 0], xs[:, 1], q, final_scale)
    else:
        ws = read_w(h, h)
        nu, nv = bf(xs[:, 0], xs[:, 1], ws, q)
    return jnp.stack([nu, nv], axis=1).reshape(nloc, *rest)


def _inv_stage_r(x, q, nloc, s, read_w, r, bf=_bf_inv_exact,
                 final_scale=None):
    """r fused GS inverse stages covering global stages s+r-1 .. s (one
    relayout pass; mirror of _fwd_stage_r).  final_scale folds the 1/n
    scale into global stage 0's butterflies (only reachable at s == 0,
    inner j == 0)."""
    h = 1 << s
    R = 1 << r
    t = nloc >> (s + r)
    rest = x.shape[1:]
    xs = x.reshape(h, R, t, *rest)
    parts = [xs[:, i] for i in range(R)]
    for j in range(r - 1, -1, -1):
        fold = s == 0 and j == 0 and final_scale is not None
        wsj = None if fold else [
            a.reshape(h, 1 << j, -1) for a in read_w(h << j, h << j)
        ]
        step = 1 << (r - 1 - j)
        for i_u in range(R):
            if i_u & step:
                continue
            i_v = i_u | step
            if fold:
                parts[i_u], parts[i_v] = _bf_inv_lazy_final(
                    parts[i_u], parts[i_v], q, final_scale
                )
            else:
                g_inner = i_u >> (r - j)
                ws = [a[:, g_inner] for a in wsj]
                parts[i_u], parts[i_v] = bf(parts[i_u], parts[i_v], ws, q)
    return jnp.stack(parts, axis=1).reshape(nloc, *rest)


def _ntt_net_inv(x, q, nloc, read_w, rlog=1, bf=_bf_inv_exact,
                 final_scale=None):
    """GS inverse network along axis 0; stages high->low.  Without
    final_scale the 1/n scale is NOT applied (caller's _scale_reduce);
    with it (lazy path only) the scale rides stage 0's butterflies and
    outputs land in [0, 2q) — caller folds once to [0, q)."""
    kloc = nloc.bit_length() - 1
    s = kloc
    while s > 0:
        r = min(rlog, s)
        if r == 1:
            x = _inv_stage2(x, q, nloc, s - 1, read_w, bf, final_scale)
        else:
            x = _inv_stage_r(x, q, nloc, s - r, read_w, r, bf, final_scale)
        s -= r
    return x


# --- DIT-bitrev-input inverse network (r5, "route B") ----------------------
#
# The GS inverse measures ~30% slower than the forward at equal op count
# (bench/invgap.py: the 1/n scale is ~4%; the GS stages themselves are
# the gap, and the GS fused-radix form degrades past radix 8 where the
# CT form keeps gaining to radix 32).  Route B restructures the inverse
# around CT butterflies: stored spectrum X_i = z_{rev(i)} and
# x_j = n^-1 psi^-j * DFT_{omega^-1}(z)_j  (omega = psi^2, V symmetric),
# evaluated four-step over n = P*tS (storage row i = b*tS + r, natural
# k = rev_tS(r)*P + rev_P(b)):
#   block:  per block, DIT-bitrev-input DFT_tS at root omega^-P along r
#   twist:  row rho of block b  *= omega^-(rho * rev_P(b))
#   cross:  per rho, DIT-bitrev-input DFT_P at root omega^-tS along b
#   scale:  output row j = c*tS + rho  *= n^-1 psi^-j
# Same total multiply count as GS+scale (both inner first stages have
# all-1 twiddles, paying for twist+scale), CT-shaped stages throughout.
# Verified bit-exact vs np_ntt_inverse (same linear map, exact mod-q).


def _wb_f(w, u_shape):
    """Align a (nb, h, lanes) full-table slice with u's
    (nb, h, *mid, lanes) — middle-axis broadcast only (the leading-axis
    broadcast of a compact table measured 3x slower AND failed the
    remote compile at window 512; full tables sliced exactly like the
    data avoid it)."""
    mid = len(u_shape) - 3
    if not mid:
        return w
    w = w.reshape(w.shape[0], w.shape[1], *(1 for _ in range(mid)),
                  w.shape[-1])
    return jnp.broadcast_to(w, u_shape)


def _bf_ct_exact_f(u, v, ws, q):
    """CT butterfly, full-table twiddles, fully-reduced form."""
    w, wsh = (_wb_f(a, u.shape) for a in ws)
    t = zq.mul_mod_shoup(v, w, wsh, q)
    return zq.add_mod(u, t, q), zq.sub_mod(u, t, q)


def _bf_ct_lazy_f(u, v, ws, q):
    """CT butterfly, full-table twiddles, Harvey lazy form: inputs and
    outputs in [0, 4q) (same invariant as _bf_fwd_lazy)."""
    wsl, wshsl = ws
    w = _wb_f(wsl, u.shape)
    s1 = _wb_f(wshsl >> 16, u.shape)
    s0 = _wb_f(wshsl & 0xFFFF, u.shape)
    q2 = jnp.uint32(2 * q)
    t = zq.mul_shoup_lazy(v, w, s1, s0, q)
    uu = jnp.where(u >= q2, u - q2, u)
    return uu + t, uu + (q2 - t)


def _invb_stage2(x, q, nloc, s, read_full, bf):
    """One DIT-bitrev-input stage: half-size h = 2^s, contiguous groups
    of 2h; stage s's FULL (nloc, lanes) table is sliced (nb, 2, h)[:, 1]
    exactly like the data, so twiddles arrive pre-aligned with v."""
    h = 1 << s
    nb = nloc >> (s + 1)
    rest = x.shape[1:]
    ws = tuple(
        a.reshape(nb, 2, h, a.shape[-1])[:, 1] for a in read_full(s)
    )
    xs = x.reshape(nb, 2, h, *rest)
    nu, nv = bf(xs[:, 0], xs[:, 1], ws, q)
    return jnp.stack([nu, nv], axis=1).reshape(nloc, *rest)


def _invb_stage_r(x, q, nloc, s, read_full, r, bf):
    """r fused DIT-bitrev-input stages covering global stages s..s+r-1:
    groups of 2^(s+r) rows split as (nb, R=2^r, h=2^s); inner stage j
    pairs slices across bit j (LSB first).  Stage s+j's full table,
    reshaped (nb, R, h), is sliced at the v-part index — identical
    stride pattern to the data slices."""
    h = 1 << s
    R = 1 << r
    nb = nloc >> (s + r)
    rest = x.shape[1:]
    xs = x.reshape(nb, R, h, *rest)
    parts = [xs[:, i] for i in range(R)]
    for j in range(r):
        step = 1 << j
        tab = tuple(
            a.reshape(nb, R, h, a.shape[-1]) for a in read_full(s + j)
        )
        for i_u in range(R):
            if i_u & step:
                continue
            i_v = i_u | step
            ws = tuple(a[:, i_v] for a in tab)
            parts[i_u], parts[i_v] = bf(parts[i_u], parts[i_v], ws, q)
    return jnp.stack(parts, axis=1).reshape(nloc, *rest)


def _ntt_net_invb(x, q, nloc, read_full, rlog=1, bf=_bf_ct_lazy_f):
    """DIT-bitrev-input network along axis 0 (stages low->high)."""
    kloc = nloc.bit_length() - 1
    s = 0
    while s < kloc:
        r = min(rlog, kloc - s)
        if r == 1:
            x = _invb_stage2(x, q, nloc, s, read_full, bf)
        else:
            x = _invb_stage_r(x, q, nloc, s, read_full, r, bf)
        s += r
    return x


# --- kernels ---------------------------------------------------------------


def _table_mul(x, t, ts, q, lazy, final):
    """Elementwise multiply by a materialized table (twist/scale legs of
    the route-B inverse).  Lazy path emits [0, 2q); final=True folds to
    [0, q) (the pipeline's fully-reduced output contract)."""
    if not lazy:
        return zq.mul_mod_shoup(x, t, ts, q)
    x = zq.mul_shoup_lazy(x, t, ts >> 16, ts & 0xFFFF, q)
    if final:
        x = jnp.where(x >= jnp.uint32(q), x - jnp.uint32(q), x)
    return x


def _widen(r, lanes):
    """Concat-widen a (rows, W) slice to (rows, lanes) (see _kernel_cross:
    no lane broadcast of loaded values)."""
    if lanes > r.shape[-1]:
        return jnp.concatenate([r] * (lanes // r.shape[-1]), axis=-1)
    return r


def _read_full_packed(w_ref, wsh_ref, nloc, lanes):
    """Per-stage reader over packed (kloc*nloc, W) full tables; each
    stage's slice is widened on use so only the live stage's table
    occupies scoped VMEM."""

    def read_full(j):
        return (
            _widen(w_ref[j * nloc : (j + 1) * nloc], lanes),
            _widen(wsh_ref[j * nloc : (j + 1) * nloc], lanes),
        )

    return read_full


def _kernel_block_invb(x_ref, w_ref, wsh_ref, t_ref, tsh_ref, o_ref, *, q,
                       tS, rlog, lazy, final):
    """Route-B inverse, block call: per-block DIT-bitrev-input DFT_tS
    (block (1, tS, lanes), packed full stage tables shared by every
    block), then the per-block twist multiply (or, at S == 0, the final
    n^-1 psi^-j scale — same operand slot, final=True)."""
    x = x_ref[0]
    lanes = x.shape[-1]
    read_full = _read_full_packed(w_ref[...], wsh_ref[...], tS, lanes)
    x = _ntt_net_invb(x, q, tS, read_full, rlog,
                      _bf_ct_lazy_f if lazy else _bf_ct_exact_f)
    t_full = _widen(t_ref[0], lanes)
    tsh_full = _widen(tsh_ref[0], lanes)
    o_ref[0] = _table_mul(x, t_full, tsh_full, q, lazy, final)


def _kernel_cross_invb(x_ref, w_ref, wsh_ref, t_ref, tsh_ref, o_ref, *, q,
                       P, rlog, lazy, do_scale):
    """Route-B inverse, cross call: DIT-bitrev-input DFT_P along axis 0
    of the (P, G, lanes) block, then the n^-1 psi^-j output scale and
    the full reduction (always the pipeline's last call).  do_scale=False
    is the timing-only noscale knob (fold only)."""
    x = x_ref[...]
    lanes = x.shape[-1]
    read_full = _read_full_packed(w_ref[...], wsh_ref[...], P, lanes)
    x = _ntt_net_invb(x, q, P, read_full, rlog,
                      _bf_ct_lazy_f if lazy else _bf_ct_exact_f)
    if do_scale:
        x = _table_mul(x, _widen(t_ref[...], lanes),
                       _widen(tsh_ref[...], lanes), q, lazy, final=True)
    elif lazy:
        qq = jnp.uint32(q)
        x = jnp.where(x >= jnp.uint32(2 * q), x - jnp.uint32(2 * q), x)
        x = jnp.where(x >= qq, x - qq, x)
    o_ref[...] = x


def _pow_seq(base: int, count: int, q: int, start: int = 1) -> np.ndarray:
    """[start, start*base, start*base^2, ...] mod q as u32."""
    out = np.empty(count, dtype=np.uint32)
    v = start % q
    for i in range(count):
        out[i] = v
        v = v * base % q
    return out


def _stage_table_bitrev(root_inv: int, nloc: int, q: int) -> np.ndarray:
    """FULL per-stage DIT-bitrev-input twiddles, packed (kloc*nloc,):
    stage j's nloc rows hold (root_inv^(nloc/2h_j))^(row mod h_j) with
    h_j = 2^j — i.e. the stage's twiddle as a per-row table, so kernels
    slice it exactly like the data ((nb, R, h)[:, i_v]) with no
    leading-axis broadcast (which Mosaic lowers ~3x slower and rejects
    outright at window 512).  u-rows carry unused (well-defined) values.
    Stage 0 is all-ones — the negacyclic phase lives in twist+scale."""
    kloc = nloc.bit_length() - 1
    T = np.empty((max(kloc, 1), nloc), dtype=np.uint32)
    T[0] = 1
    for j in range(kloc):
        h = 1 << j
        T[j] = np.tile(_pow_seq(pow(root_inv, nloc // (2 * h), q), h, q),
                       nloc // h)
    return np.ascontiguousarray(T.reshape(-1))


def _invb_tables(plan: NTTPlan, S: int, tS: int):
    """Route-B table set: (block stage table, cross stage table | None,
    per-block twist (nblk, tS) | None, output scale (P, tS))."""
    from ..ntt import _bit_reverse_perm

    n, q = plan.n, plan.q
    P = n // tS
    ipsi = pow(int(plan.psi), -1, q)
    iomega = ipsi * ipsi % q
    t_blk = _stage_table_bitrev(pow(iomega, P, q), tS, q)
    t_cross = _stage_table_bitrev(pow(iomega, tS, q), P, q) if P > 1 else None
    twist = None
    if P > 1:
        revP = _bit_reverse_perm(P)
        twist = np.stack([
            _pow_seq(pow(iomega, int(k1), q), tS, q) for k1 in revP
        ])
    scale = _pow_seq(ipsi, n, q, start=plan.n_inv).reshape(P, tS)
    return t_blk, t_cross, twist, scale


def _scale_reduce(x, q, n_inv, n_inv_sh, lazy):
    """Apply the 1/n scale; lazy path folds [0,2q) -> [0,q) afterwards."""
    if not lazy:
        return zq.mul_mod_shoup(x, jnp.uint32(n_inv), jnp.uint32(n_inv_sh), q)
    x = zq.mul_shoup_lazy(
        x, jnp.uint32(n_inv), jnp.uint32(n_inv_sh >> 16),
        jnp.uint32(n_inv_sh & 0xFFFF), q,
    )
    return jnp.where(x >= jnp.uint32(q), x - jnp.uint32(q), x)


def _redigit(x, q_src, q):
    """RNS-gadget digit re-expansion: x holds residues in [0, q_src);
    emit the centered representative's residue mod q (bit-identical to
    she_batched.decompose_cm's per-channel arithmetic)."""
    if q_src == q:
        return x
    r = zq.reduce_mod(x, q) if q_src > q else x
    hi = x >= jnp.uint32((q_src + 1) // 2)
    return jnp.where(hi, zq.sub_mod(r, jnp.uint32(q_src % q), q), r)


def _fs_scalars(q, n_inv, n_inv_sh, w0s, w0s_sh):
    """jnp scalar pack for _bf_inv_lazy_final from builder-host ints."""
    return (
        jnp.uint32(n_inv), jnp.uint32(n_inv_sh >> 16),
        jnp.uint32(n_inv_sh & 0xFFFF),
        jnp.uint32(w0s), jnp.uint32(w0s_sh >> 16),
        jnp.uint32(w0s_sh & 0xFFFF),
    )


def _kernel_cross(x_ref, w_ref, wsh_ref, o_ref, *, q, P, inverse, n_inv,
                  n_inv_sh, rlog=1, lazy=False, pre_q=None, fold_w0=None):
    """Cross-block stages: block (P, G, lanes), NTT along axis 0.  The
    first S global stages use group indices < P, so the twiddle tables
    are just the plain DIT prefix psi_rev[:P].

    Twiddles arrive one native tile wide ((P, 128), not (P, lanes) —
    1/4 the table bytes at the 512-lane tile) and are widened here.

    pre_q: if set, the input holds residues mod pre_q and the kernel
    first applies the RNS-gadget digit re-expansion into this kernel's
    channel (centered [x]_{pre_q} mod q) — fusing she_batched's
    decompose into the digit NTT's first pass over the data.

    Lazy range discipline: the forward cross call is never last, so it
    may emit [0, 4q) values (the block kernel's u-fold and multiply
    accept them); the inverse cross call is always last, so it scales
    and fully reduces."""
    x = x_ref[...]
    if pre_q is not None:
        x = _redigit(x, pre_q, q)
    lanes = x.shape[-1]
    # tables arrive one native tile (128 lanes) wide; widen to the
    # kernel's lane tile by static concatenation (a (rows, 1) operand
    # block crashes this XLA version's lowering at lanes > 128, and a
    # broadcast here would re-fold with _wb's sublane broadcast into the
    # combined form Mosaic rejects)
    w_full, wsh_full = (
        jnp.concatenate([r[...]] * (lanes // r.shape[-1]), axis=-1)
        if lanes > r.shape[-1] else r[...]
        for r in (w_ref, wsh_ref)
    )

    def read_w(lo, m):
        return w_full[lo : lo + m], wsh_full[lo : lo + m]

    if inverse:
        fold = lazy and n_inv is not None and fold_w0 is not None
        fs = _fs_scalars(q, n_inv, n_inv_sh, *fold_w0) if fold else None
        x = _ntt_net_inv(x, q, P, read_w, rlog,
                         _bf_inv_lazy if lazy else _bf_inv_exact,
                         final_scale=fs)
        if fold:  # scale rode stage 0; fold [0, 2q) -> [0, q)
            x = jnp.where(x >= jnp.uint32(q), x - jnp.uint32(q), x)
        elif n_inv is not None:
            x = _scale_reduce(x, q, n_inv, n_inv_sh, lazy)
        elif lazy:  # timing-only noscale knob: final fold, no multiply
            x = jnp.where(x >= jnp.uint32(q), x - jnp.uint32(q), x)
    else:
        x = _ntt_net_fwd(x, q, P, read_w, rlog,
                         _bf_fwd_lazy if lazy else _bf_fwd_exact)
    o_ref[...] = x


def _kernel_block(x_ref, w_ref, wsh_ref, o_ref, *, q, tS, inverse, n_inv,
                  n_inv_sh, rlog=1, lazy=False, pre_q=None, fold_w0=None):
    """Within-block stages: block (1, tS, lanes), NTT along axis 1 with
    this block's private twiddle table.

    Lazy range discipline: the forward block call is always last ->
    fold [0, 4q) to [0, q) on the way out; the inverse block call is
    last only when it owns the 1/n scale (S == 0), else it hands
    [0, 2q) values to the cross call."""
    x = x_ref[0]
    if pre_q is not None:  # S == 0 forward path: digit prologue here
        x = _redigit(x, pre_q, q)
    lanes = x.shape[-1]
    # widen this block's one-tile (tS, 128) table to the kernel's lane
    # tile by static concatenation (see _kernel_cross)
    w_full, wsh_full = (
        jnp.concatenate([r[0]] * (lanes // r.shape[-1]), axis=-1)
        if lanes > r.shape[-1] else r[0]
        for r in (w_ref, wsh_ref)
    )

    def read_w(lo, m):
        return w_full[lo : lo + m], wsh_full[lo : lo + m]

    if inverse:
        fold = lazy and n_inv is not None and fold_w0 is not None
        fs = _fs_scalars(q, n_inv, n_inv_sh, *fold_w0) if fold else None
        x = _ntt_net_inv(x, q, tS, read_w, rlog,
                         _bf_inv_lazy if lazy else _bf_inv_exact,
                         final_scale=fs)
        if fold:
            x = jnp.where(x >= jnp.uint32(q), x - jnp.uint32(q), x)
        elif n_inv is not None:
            x = _scale_reduce(x, q, n_inv, n_inv_sh, lazy)
    else:
        x = _ntt_net_fwd(x, q, tS, read_w, rlog,
                         _bf_fwd_lazy if lazy else _bf_fwd_exact)
        if lazy:
            q2, qq = jnp.uint32(2 * q), jnp.uint32(q)
            x = jnp.where(x >= q2, x - q2, x)
            x = jnp.where(x >= qq, x - qq, x)
    o_ref[0] = x


# --- builder ---------------------------------------------------------------


@lru_cache(maxsize=512)
def _build(plan: NTTPlan, inverse: bool, lanes: int, interpret: bool,
           rlog: int = 1, lazy: bool = True, pre_q: int | None = None,
           full_tables: bool = False, window: int = WINDOW,
           scale: bool = True, alg: str = "gs"):
    """Jitted (n, B) -> (n, B) column-major negacyclic NTT.

    pre_q: fuse the RNS-gadget digit re-expansion from modulus pre_q
    into the first forward kernel (see _redigit).
    full_tables: ship lanes-wide twiddle operands (the pre-tile-widening
    behavior) — kept as a measurement knob for A/B'ing table traffic.
    window: override the block-rows bound tS (measurement knob for the
    small-batch split sweep; default WINDOW = 512).
    scale=False (TIMING-ONLY measurement knob, bench/invgap.py): skip
    the inverse's 1/n multiply — outputs are WRONG (off by n mod q);
    isolates the scale pass's share of the inverse's cost."""
    n, q = plan.n, plan.q
    k, S, tS = _split(n, window)
    nblk = n // tS
    P = 1 << S
    # G rows of each block per cross-call grid cell.  window // P keeps
    # P*G ~ window (bounded VMEM values), but Mosaic's block constraint
    # needs the (P, G, lanes) block's middle dim >= 8 — floor G there
    # (r5: makes the 256-row window feasible at n = 2^14, where
    # window // P = 4; the floored block is still only P*8*lanes*4B
    # = 1MB at n=2^14/512 lanes)
    G = max(min(8, tS), window // P)
    # twiddle tables ship at one native tile — or narrower, matching the
    # data, when the caller runs a sub-tile lane count (ADVICE r2)
    W = lanes if full_tables else min(TILE, lanes)

    if inverse and alg == "dit":
        # Route-B inverse (see _ntt_net_invb): CT-shaped stages + twist
        # + per-row output scale.  Stage tables are FULL per-row tables
        # (kloc*nloc rows per call — a few hundred at the shipping
        # windows), sliced in-kernel exactly like the data.
        t_blk, t_cross, twist, sc = _invb_tables(plan, S, tS)
        kb = max(tS.bit_length() - 1, 1)
        t_blk_sh = zq.shoup_np(t_blk, q)
        if S == 0:
            # single call: the post-table slot carries the final scale
            post_np = sc if scale else np.ones((1, tS), np.uint32)
        else:
            post_np = twist
        post_sh_np = zq.shoup_np(post_np, q)
        if t_cross is not None:
            t_cross_sh = zq.shoup_np(t_cross, q)
            sc_sh = zq.shoup_np(sc, q)

        def block_call_b(x3, wS, wSs, tw, tws):  # (nblk, tS, B)
            B = x3.shape[-1]
            kern = partial(_kernel_block_invb, q=q, tS=tS, rlog=rlog,
                           lazy=lazy, final=S == 0)
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((nblk, tS, B), jnp.uint32),
                grid=(nblk, B // lanes),
                in_specs=[
                    pl.BlockSpec((1, tS, lanes), lambda b, j: (b, 0, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((kb * tS, W), lambda b, j: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((kb * tS, W), lambda b, j: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, tS, W), lambda b, j: (b, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, tS, W), lambda b, j: (b, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, tS, lanes), lambda b, j: (b, 0, j),
                                       memory_space=pltpu.VMEM),
                interpret=interpret,
                cost_estimate=pl.CostEstimate(
                    flops=30 * n * (k - S) * lanes, bytes_accessed=8 * n * B,
                    transcendentals=0,
                ),
            )(x3, wS, wSs, tw, tws)

        def cross_call_b(x3, wS, wSs, scj, scjs):  # (P, tS, B)
            B = x3.shape[-1]
            kern = partial(_kernel_cross_invb, q=q, P=P, rlog=rlog,
                           lazy=lazy, do_scale=scale)
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((P, tS, B), jnp.uint32),
                grid=(tS // G, B // lanes),
                in_specs=[
                    pl.BlockSpec((P, G, lanes), lambda i, j: (0, i, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((S * P, W), lambda i, j: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((S * P, W), lambda i, j: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((P, G, W), lambda i, j: (0, i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((P, G, W), lambda i, j: (0, i, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((P, G, lanes), lambda i, j: (0, i, j),
                                       memory_space=pltpu.VMEM),
                interpret=interpret,
                cost_estimate=pl.CostEstimate(
                    flops=30 * n * S * lanes, bytes_accessed=8 * n * B,
                    transcendentals=0,
                ),
            )(x3, wS, wSs, scj, scjs)

        @jax.jit
        def run_b(x):  # (n, B)
            B = x.shape[1]
            wB = jnp.broadcast_to(jnp.asarray(t_blk)[:, None], (kb * tS, W))
            wBs = jnp.broadcast_to(
                jnp.asarray(t_blk_sh)[:, None], (kb * tS, W)
            )
            tw = jnp.broadcast_to(
                jnp.asarray(post_np)[:, :, None], (nblk, tS, W)
            )
            tws = jnp.broadcast_to(
                jnp.asarray(post_sh_np)[:, :, None], (nblk, tS, W)
            )
            x = block_call_b(x.reshape(nblk, tS, B), wB, wBs, tw, tws)
            if S > 0:
                wC = jnp.broadcast_to(
                    jnp.asarray(t_cross)[:, None], (S * P, W)
                )
                wCs = jnp.broadcast_to(
                    jnp.asarray(t_cross_sh)[:, None], (S * P, W)
                )
                scj = jnp.broadcast_to(
                    jnp.asarray(sc)[:, :, None], (P, tS, W)
                )
                scjs = jnp.broadcast_to(
                    jnp.asarray(sc_sh)[:, :, None], (P, tS, W)
                )
                x = cross_call_b(x.reshape(P, tS, B), wC, wCs, scj, scjs)
            return x.reshape(n, B)

        return run_b

    src, src_sh = (
        (plan.ipsi_rev, plan.ipsi_rev_sh) if inverse else (plan.psi_rev, plan.psi_rev_sh)
    )
    # Twiddle tables stay COMPACT all the way into the kernels: (P, 1)
    # and (nblk, tS, 1) columns in HBM, lane-broadcast per slice INSIDE
    # the kernel (read_w).  Compact numpy closure constants keep the HLO
    # at ~64KB of literals per plan (a materialized (nblk, tS, lanes)
    # replication once made the fused n=2^14 step carry ~0.5GB of inline
    # constants and blow the remote-compile service's HTTP 413 limit),
    # and compact kernel OPERANDS avoid both the per-call XLA broadcast
    # (64MB of HBM writes per plan per call at n=2^14) and the kernel
    # re-reading lanes-wide tables per grid cell (~64MB per call — a
    # third of the block call's traffic at B=1024).  jnp conversion
    # happens inside run() (per trace) to dodge the lru-cache
    # escaped-tracer hazard when the builder first fires inside an outer
    # jit trace (she_batched's fused step).
    wA_np = np.ascontiguousarray(src[:P])
    wAs_np = np.ascontiguousarray(src_sh[:P])
    # GS lazy path: fold the 1/n scale into stage 0's butterflies
    # (u-leg *ninv, v-leg twiddle pre-scaled) — drops the separate
    # full-array scale pass (_bf_inv_lazy_final)
    fold_w0 = None
    if inverse and lazy and scale:
        w0s = int(src[1]) * plan.n_inv % q
        fold_w0 = (w0s, zq.shoup(w0s, q))
    TB = _block_twiddles(plan, inverse, S, tS)
    TBs_np = np.array(
        [[zq.shoup(int(w), q) for w in row] for row in TB], dtype=np.uint32
    )
    TB_np = np.ascontiguousarray(TB)

    scale_in_block = S == 0  # no cross call: fuse 1/n into the block call

    def cross_call(x3, wA, wAs):  # (P, tS, B)
        B = x3.shape[-1]
        kern = partial(
            _kernel_cross, q=q, P=P, inverse=inverse,
            n_inv=plan.n_inv if scale else None,
            n_inv_sh=plan.n_inv_sh if scale else None, rlog=rlog, lazy=lazy,
            pre_q=pre_q, fold_w0=fold_w0,
        )
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((P, tS, B), jnp.uint32),
            grid=(tS // G, B // lanes),
            in_specs=[
                pl.BlockSpec((P, G, lanes), lambda i, j: (0, i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((P, W), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((P, W), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((P, G, lanes), lambda i, j: (0, i, j),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=30 * n * S * lanes, bytes_accessed=8 * n * B,
                transcendentals=0,
            ),
        )(x3, wA, wAs)

    def block_call(x3, wB, wBs):  # (nblk, tS, B)
        B = x3.shape[-1]
        kern = partial(
            _kernel_block, q=q, tS=tS, inverse=inverse,
            n_inv=plan.n_inv if (scale_in_block and scale) else None,
            n_inv_sh=plan.n_inv_sh if (scale_in_block and scale) else None,
            rlog=rlog,
            lazy=lazy, pre_q=pre_q if scale_in_block else None,
            fold_w0=fold_w0,
        )
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((nblk, tS, B), jnp.uint32),
            grid=(nblk, B // lanes),
            in_specs=[
                pl.BlockSpec((1, tS, lanes), lambda b, j: (b, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tS, W), lambda b, j: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tS, W), lambda b, j: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, tS, lanes), lambda b, j: (b, 0, j),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=30 * n * (k - S) * lanes, bytes_accessed=8 * n * B,
                transcendentals=0,
            ),
        )(x3, wB, wBs)

    @jax.jit
    def run(x):  # (n, B)
        B = x.shape[1]
        # one native tile of lane replication (a 1-lane operand block
        # crashes the lowering at lanes > 128); the kernels widen to the
        # full lane tile by concatenation
        wA = jnp.broadcast_to(jnp.asarray(wA_np)[:, None], (P, W))
        wAs = jnp.broadcast_to(jnp.asarray(wAs_np)[:, None], (P, W))
        wB = jnp.broadcast_to(
            jnp.asarray(TB_np)[:, :, None], (nblk, tS, W)
        )
        wBs = jnp.broadcast_to(
            jnp.asarray(TBs_np)[:, :, None], (nblk, tS, W)
        )
        if not inverse:
            if S > 0:
                x = cross_call(x.reshape(P, tS, B), wA, wAs)
            x = block_call(x.reshape(nblk, tS, B), wB, wBs)
        else:
            x = block_call(x.reshape(nblk, tS, B), wB, wBs)
            if S > 0:
                x = cross_call(x.reshape(P, tS, B), wA, wAs)
        return x.reshape(n, B)

    return run


def ntt_cm(x, plan: NTTPlan, inverse: bool = False, lanes: int | None = None,
           interpret: bool = False, radix: int | None = None,
           lazy: bool = True, pre_digit_q: int | None = None,
           full_tables: bool = False, window: int | None = None,
           scale: bool = True, alg: str | None = None):
    """Negacyclic NTT over axis 0 of a column-major (n, B) u32 array.

    B must be a multiple of `lanes`.  Defaults tuned on v5e: widest
    lane tile in {512, 256, 128} dividing B (fewer grid steps, ~1.5x
    over 128).  Window defaults come from the r5 interleaved sweeps
    (DESIGN §10): the GS INVERSE prefers the smallest compilable split
    at every ring (smaller windows shrink each fused stage's live
    temporaries and multiply grid parallelism; the remote compiler
    rejects cross calls past P = 128) — 32 rows at n<=2048 (+61% over
    512 at n=2048), 64 at n<=8192 (+28-46% at 4096, +32% at 8192),
    n/128 above (+6-23% at n=2^14) — with fused-stage radix 8 (the GS
    form degrades at r16 even at window 64: 1.11M vs 1.52M).  The
    FORWARD prefers 64 rows WITH radix 32 for 2048<=n<=4096 (n=2048
    4.83M vs r16's 4.56M; n=4096 2.51M vs 2.22M — the r3-era
    "radix-32 blows scoped VMEM" was window-512-specific) and 512
    rows / radix 16 outside.  n=8192 standalone ALSO prefers 64/r32
    (653k vs 626k at B=1024) but with the pre_digit_q prologue fused
    the r32 stack goes over the 16MB scoped-VMEM limit (the remote
    helper reports it as an opaque HTTP 500; forcing 128/r32 digits at
    n=2^14 shows the real error: "scoped allocation 18.00M > 16.00M"),
    so the default stays 512/16 there — pass the knobs explicitly for
    standalone use.  At 2^14, 128/r32 ties 512/r16; radix 64 and
    window 32 lose big everywhere.

    alg: inverse route — "gs" (default, Gentleman-Sande) or "dit"
    (route B, DESIGN §14: DIT-bitrev-input + twist + per-row scale).
    Route B is a kept MEASURED NEGATIVE: with full per-stage tables it
    compiles and runs everywhere the GS route does, but its extra
    table traffic outweighs the CT-radix gains (n=4096: 1.41M vs GS
    1.52M; n=2^14: 226k vs 244k) — kept A/B-able for future layouts."""
    n, B = x.shape
    if n != plan.n:
        raise ValueError(f"ntt_cm: x has n={n}, plan has n={plan.n}")
    if lanes is None:
        lanes = next((L for L in (512, 256, 128) if B % L == 0), DEFAULT_LANES)
    if B % lanes != 0:
        raise ValueError(f"ntt_cm: batch {B} not a multiple of lanes={lanes}")
    if n == 1:
        return x
    if window is None:
        if inverse and (alg or "gs") == "gs":
            window = (WINDOW if n <= 256 else
                      32 if n <= 2048 else
                      64 if n <= 8192 else n // 128)
        else:
            # forward table; the route-B inverse is forward-shaped
            window = 64 if 2048 <= n <= 4096 else WINDOW
    if radix is None:
        if inverse and (alg or "gs") == "gs":
            radix = 8
        else:
            radix = 32 if 2048 <= n <= 4096 else 16
    rlog = radix.bit_length() - 1
    if radix != 1 << rlog or rlog < 1:
        raise ValueError(f"ntt_cm: radix {radix} must be a power of 2 >= 2")
    if pre_digit_q is not None and inverse:
        raise ValueError("ntt_cm: pre_digit_q is a forward-only prologue")
    if not scale and not inverse:
        raise ValueError("ntt_cm: scale=False is an inverse-only knob")
    if alg is None:
        alg = "gs"
    if alg not in ("gs", "dit"):
        raise ValueError(f"ntt_cm: unknown alg {alg!r}")
    if alg == "dit" and not inverse:
        raise ValueError("ntt_cm: alg='dit' is an inverse-only route")
    return _build(plan, inverse, lanes, interpret, rlog, lazy,
                  pre_q=pre_digit_q, full_tables=full_tables,
                  window=window, scale=scale, alg=alg)(x)


def ntt_batched(x, plan: NTTPlan, inverse: bool = False, interpret: bool = False):
    """Row-major (..., n) convenience wrapper: transpose, kernel, transpose.

    The transposes cost two extra HBM passes; hot paths should keep data
    coefficient-major and call `ntt_cm` directly."""
    batch = x.shape[:-1]
    n = x.shape[-1]
    flat = x.reshape(-1, n)
    B = flat.shape[0]
    pad = (-B) % DEFAULT_LANES
    if pad:
        flat = jnp.pad(flat, ((0, pad), (0, 0)))
    out = ntt_cm(flat.T, plan, inverse=inverse, interpret=interpret).T
    if pad:
        out = out[:B]
    return out.reshape(*batch, n)
