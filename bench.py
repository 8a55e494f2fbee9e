"""North-star benchmark — prints ONE JSON line.

Primary metric (BASELINE.md): negacyclic NTTs/sec at n=4096 over a 60-bit
RNS modulus (2 x 30-bit NTT primes); baseline 1,000,000 NTT/s/chip (v5p).

Reproducibility (VERDICT r2 #1): the NTT leg runs k>=5 timed windows per
batch size, sweeps B in {4096, 8192, 16384, 32768}, and reports the best
batch's MEDIAN with the min/max spread across its windows — a single
short window on a shared tunneled chip was too noisy to be a number of
record.

The same line carries the other BASELINE headlines as extra keys:
  bgv_ct_ops_per_sec      BGV ct-mult + key-switch + rescale at n=2^14
  bgv_n4096_ops_per_sec   same pipeline at n=4096 (the README claim)
  tunnel_ops_per_sec      fused ring tunneling m=32768 -> 16384

Round-5 additions (VERDICT r4: driver-capture every perf claim): the
NTT sweep runs INTERLEAVED round-robin windows across all batch sizes
so every leg measures an active chip; intt_value captures the GS
inverse at the headline shape; mod_switch/ks_linear/step_ext (+ the
base-vs-ext noise-bits delta) ride the n=4096 BGV leg; the hoisted-
rotation A/B and the serving-scale rounding chain get their own legs.

Off-TPU (dev smoke) every leg drops to a tiny ring so the script stays
fast; the driver's TPU run measures the real thing.
"""

import json
import os
import statistics
import sys
import time

import numpy as np

_T0 = time.time()
# process-unique PRNG seed (see bench_ntt's cache-hazard note)
_SEED = (os.getpid() * 1_000_003 + int(_T0)) & 0x7FFFFFFF


def _mark(msg):
    """Progress timestamps on stderr (the JSON line on stdout stays clean);
    makes a driver-side timeout diagnosable."""
    print(f"[bench +{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def bench_ntt():
    import jax
    import jax.numpy as jnp

    from lol_tpu import numtheory as nt
    from lol_tpu.ops import ntt
    from lol_tpu.ops.pallas import ntt_kernel as pk

    n = 4096
    qs = nt.ntt_primes(2 * n, 30, 2)  # 2 x 30-bit primes ~ one 60-bit modulus
    plans = [ntt.ntt_plan(n, q) for q in qs]
    device = jax.devices()[0]
    on_tpu = device.platform == "tpu"
    # dispatch chain depth (round-4 methodology, DESIGN.md §10): each
    # device execution runs CHAIN dependent 60-bit NTT steps, matching
    # how production serving executes (she_batched's step is one large
    # execution).  Honest record (VERDICT r4 weak #1/#2): in the r4
    # driver capture the chained medians were NEUTRAL vs single-step at
    # every batch (32768: 1.928M vs 1.932M; 4096: 1.287M vs 1.300M) —
    # the large chained gains in builder-run A/Bs (DESIGN §10) came
    # from chip-activity state, not chaining itself.  Chaining is kept
    # for its serving realism; the single-step sweep is still recorded
    # for r1-r3 comparability.
    CHAIN = 4

    def step(arrs, inverse=False):
        # interpret mode off-TPU so the dev smoke runs on plain CPU
        return [pk.ntt_cm(a, p, inverse=inverse, interpret=not on_tpu)
                for a, p in zip(arrs, plans)]

    @jax.jit
    def step_chain(arrs):
        for _ in range(CHAIN):
            arrs = step(arrs)
        return arrs

    @jax.jit
    def istep_chain(arrs):
        for _ in range(CHAIN):
            arrs = step(arrs, inverse=True)
        return arrs

    # fresh seed per process: the tunnel's remote execution service can
    # serve CACHED results for dispatch chains it has seen before (same
    # executable + same inputs), which silently turns re-runs into
    # memory reads — measured as an impossible ~400M NTT/s.  A
    # process-unique seed makes every chain novel; the correctness
    # guard below still checks the actual fetched values.
    seed = _SEED

    windows = 5 if on_tpu else 2
    # 40 iters/window: a timing window carries ~30-75 ms of fixed
    # tunnel-dispatch/sync overhead, which at 20 iters biased the rate
    # ~12% low (the r2 1.49M-vs-1.78M discrepancy); 40 iters amortize it
    iters = 40 if on_tpu else 2
    batches = (32768, 16384, 8192, 4096) if on_tpu else (256,)

    def make_leg(name, B, chain, inverse=False):
        """Prepared timing leg: device inputs, correctness guard (which
        doubles as the materialization barrier — without a device-to-
        host fetch the tunnel defers whole chains and timing measures
        nothing), warmup, then run_window() per round."""
        if inverse:
            fn = istep_chain
        else:
            fn = (lambda a: step(a)) if chain == 1 else step_chain
        keys = jax.random.split(
            jax.random.PRNGKey(seed + chain + (7 if inverse else 0) + B),
            len(qs),
        )
        xs = [
            jax.random.randint(k, (n, B), 0, q, dtype=jnp.uint32)
            for k, q in zip(keys, qs)
        ]
        ys = fn(xs)
        [y.block_until_ready() for y in ys]
        want = np.asarray(xs[0][:, :1]).T
        np_step = ntt.np_ntt_inverse if inverse else ntt.np_ntt_forward
        for _ in range(chain):
            want = np_step(want, plans[0])
        got = np.asarray(ys[0][:, :1]).T
        np.testing.assert_array_equal(got, want)
        for _ in range(2 if on_tpu else 1):  # settle post-compile dispatch
            ys = fn(ys)
        [y.block_until_ready() for y in ys]
        leg = {"name": name, "B": B, "chain": chain, "fn": fn, "ys": ys,
               "iters": max(iters // chain, 2), "rates": []}
        return leg

    def run_window(leg):
        fn, ys = leg["fn"], leg["ys"]
        t0 = time.time()
        for _ in range(leg["iters"]):
            # chain continues ACROSS windows: no two dispatches in the
            # run are ever identical (cache-hazard defense)
            ys = fn(ys)
        [y.block_until_ready() for y in ys]
        leg["ys"] = ys
        leg["rates"].append(
            leg["B"] * leg["iters"] * leg["chain"] / (time.time() - t0)
        )

    if on_tpu:
        # ~8 s sustained ramp so round 0 starts on an ACTIVE chip
        _mark("ntt ramp (sustained large-batch work)")
        keys = jax.random.split(jax.random.PRNGKey(seed ^ 0xA5), len(qs))
        ys = [
            jax.random.randint(k, (n, batches[0]), 0, q, dtype=jnp.uint32)
            for k, q in zip(keys, qs)
        ]
        _ = np.asarray(ys[0][:1, :1])  # materialization barrier
        t0 = time.time()
        while time.time() - t0 < 8.0:
            for _ in range(4):
                ys = step_chain(ys)
            [y.block_until_ready() for y in ys]

    # Build all legs, then time them INTERLEAVED round-robin (VERDICT r4
    # weak #1 / next #2): the chip's activity state has a multi-minute
    # decay, and the r4 descending-order sweep decayed before the last
    # leg — its captured B=4096 number was the idle-state 1.29M, not the
    # active-state 1.56-1.93M.  With every round cycling large->small
    # batches back to back (smallb.py's SMALLB_INTERLEAVE discipline,
    # promoted here), each small-batch window runs right after sustained
    # large-batch work — every leg measures an active chip, and shared-
    # chip drift hits all legs equally.  The GS inverse leg (VERDICT r4
    # next #1: intt at the headline shape) rides the same rotation.
    legs = []
    for B in batches:
        _mark(f"ntt prep B={B}")
        legs.append(make_leg(f"c{B}", B, CHAIN))
        legs.append(make_leg(f"s{B}", B, 1))
    _mark(f"ntt prep inverse B={batches[0]}")
    inv_leg = make_leg("inv", batches[0], CHAIN, inverse=True)
    legs.insert(2, inv_leg)  # right after the largest batch's pair
    for w in range(windows):
        for leg in legs:
            run_window(leg)
        _mark(f"ntt round {w + 1}/{windows} done")
    per_b = {leg["B"]: leg["rates"] for leg in legs if leg["name"][0] == "s"}
    per_bc = {leg["B"]: leg["rates"] for leg in legs if leg["name"][0] == "c"}
    for B in batches:
        _mark(f"ntt B={B}: chained median "
              f"{statistics.median(per_bc[B]):.0f}/s, single-step "
              f"{statistics.median(per_b[B]):.0f}/s")
    _mark(f"intt B={inv_leg['B']}: chained median "
          f"{statistics.median(inv_leg['rates']):.0f}/s")
    best_b = max(per_bc, key=lambda b: statistics.median(per_bc[b]))
    rates = per_bc[best_b]
    return n, {
        "value": statistics.median(rates),
        "min": min(rates),
        "max": max(rates),
        "batch": best_b,
        "windows": windows,
        "iters": iters,  # single-step windows; chained windows run
        "chain_iters": max(iters // CHAIN, 2),  # iters of CHAIN steps each
        "dispatch_chain": CHAIN,
        "interleaved": True,  # round-robin windows (see comment above)
        "medians_by_batch": {
            str(b): round(statistics.median(r)) for b, r in per_b.items()
        },
        "chain_medians_by_batch": {
            str(b): round(statistics.median(r)) for b, r in per_bc.items()
        },
        "intt_value": round(statistics.median(inv_leg["rates"])),
        "intt_min": round(min(inv_leg["rates"])),
        "intt_max": round(max(inv_leg["rates"])),
        "intt_batch": inv_leg["B"],
    }, device


def _she_setup(m, nrns, p=257):
    import jax

    from lol_tpu import numtheory as nt, she
    from lol_tpu.she_batched import BatchedBGV

    qs = tuple(nt.ntt_primes(m, 30, nrns))
    params = she.SHEParams(m=m, p=p, qs=qs, var=2.0)
    ks, kh = jax.random.split(jax.random.PRNGKey(0))
    _mark(f"she_setup m={m}: gen_sk")
    sk = she.gen_sk(params, ks)
    _mark("she_setup: gen_ks_quad_hint (device)")
    bb = BatchedBGV(params)
    hint = bb.gen_ks_quad_hint(sk, kh)
    _mark("she_setup: done")
    return bb, sk, hint


def bench_bgv(m, nrns, batch, iters, p=257, extras=False):
    """BGV ct-mult + RNS-gadget keyswitch + exact rescale, ops/sec, with a
    decrypt-correctness guard on column 0.  Works for 2-power AND
    composite m (the general-m fused pipeline).

    extras=True additionally measures the round-4 serving ops on the
    same inputs (VERDICT r4 next #1 — driver-capture every claim):
    standalone mod_switch, linear keyswitch, the extended-modulus
    (hybrid) relinearization step, and the base-vs-ext noise-bits
    delta (the P-division of keyswitch noise, measured on device)."""
    import jax
    import jax.numpy as jnp

    from lol_tpu import numtheory as nt, she

    bb, sk, hint = _she_setup(m, nrns, p=p)
    params = bb.params
    n = params.ctx.n
    enc = bb.build_encrypt(sk)
    step = bb.build_step(hint)
    # messages generated on device; only guard columns cross the tunnel
    k1, k2 = jax.random.split(jax.random.PRNGKey(_SEED ^ 7))
    m1 = jax.random.randint(k1, (n, batch), 0, params.p, dtype=jnp.int32)
    m2 = jax.random.randint(k2, (n, batch), 0, params.p, dtype=jnp.int32)
    _mark("bgv: compile/run encrypt")
    c0, c1 = enc(m1, jax.random.PRNGKey(2))
    d0, d1 = enc(m2, jax.random.PRNGKey(3))
    _mark("bgv: compile/run step")
    e0, e1 = step(c0, c1, d0, d1)
    jax.block_until_ready((e0, e1))
    _mark("bgv: decrypt guard")

    # guard: batched decrypt of column 0 == exact plaintext ring product
    params2 = she.SHEParams(m=m, p=params.p, qs=params.qs[:-1], var=params.var)
    from lol_tpu.she_batched import BatchedBGV

    bb2 = BatchedBGV(params2, use_pallas=bb.use_pallas)
    sk2 = she.SK(params2, sk.s_ints, sk.var)
    f2 = nt.modinv(params.qs[-1] % params.p, params.p)
    dec = bb2.build_decrypt(sk2, f=f2)
    got = np.asarray(dec(e0, e1)[:, :1])[:, 0]
    want = she.pt_mul(params, np.asarray(m1[:, 0]), np.asarray(m2[:, 0]))
    np.testing.assert_array_equal(got, want)

    _mark("bgv: timing loop")
    t0 = time.time()
    for _ in range(iters):
        e0, e1 = step(c0, c1, d0, d1)
    jax.block_until_ready((e0, e1))
    _mark("bgv: done")
    rate = batch * iters / (time.time() - t0)
    if not extras:
        return n, rate

    def timed(fn, fn_args, its):
        o = fn(*fn_args)
        jax.block_until_ready(o)
        t = time.time()
        for _ in range(its):
            o = fn(*fn_args)
        jax.block_until_ready(o)
        return batch * its / (time.time() - t)

    its = max(iters // 2, 2)
    ex = {}
    _mark("bgv extras: mod_switch")
    ex["mod_switch_ops_per_sec"] = round(
        timed(bb.build_mod_switch(), (c0, c1), its)
    )
    _mark("bgv extras: linear keyswitch")
    sk_new = she.gen_sk(params, jax.random.PRNGKey(4))
    lh = bb.gen_ks_linear_hint(sk_new, sk, jax.random.PRNGKey(5))
    ex["ks_linear_ops_per_sec"] = round(
        timed(bb.build_key_switch_linear(lh), (c0, c1), its)
    )
    _mark("bgv extras: ext-modulus step")
    specials = tuple(nt.ntt_primes(m, 30, nrns + 2))[nrns:]
    hx = bb.gen_ks_quad_hint_ext(sk, specials, jax.random.PRNGKey(6))
    step_ext = bb.build_step_ext(hx)
    ex["step_ext_ops_per_sec"] = round(timed(step_ext, (c0, c1, d0, d1), its))
    ex["step_ext_specials"] = len(specials)
    _mark("bgv extras: noise-bits delta")
    nb = bb2.build_noise_bits(sk2)
    base_bits = float(np.mean(np.asarray(nb(e0, e1))))
    x0, x1 = step_ext(c0, c1, d0, d1)
    ext_bits = float(np.mean(np.asarray(nb(x0, x1))))
    ex["step_noise_bits"] = round(base_bits, 2)
    ex["step_ext_noise_bits"] = round(ext_bits, 2)
    ex["step_ext_noise_bits_delta"] = round(base_bits - ext_bits, 2)
    _mark("bgv extras: done")
    return n, rate, ex


def bench_galois(m, nrns, batch, iters, ks=(3, 5, 9), p=257):
    """Hoisted rotation batch vs separate rotations (VERDICT r4 next #1:
    the '1.69x' claim, driver-captured).  A/B is interleaved window by
    window so shared-chip drift hits both arms equally (DESIGN §10);
    returns (rot/s hoisted, rot/s separate, speedup)."""
    import jax
    import jax.numpy as jnp

    from lol_tpu import numtheory as nt, she
    from lol_tpu.she_batched import BatchedBGV

    qs = tuple(nt.ntt_primes(m, 30, nrns))
    params = she.SHEParams(m=m, p=p, qs=qs, var=2.0)
    _mark(f"galois m={m}: gen_sk + hints")
    sk = she.gen_sk(params, jax.random.PRNGKey(0))
    bb = BatchedBGV(params)
    ghints = {
        k: bb.gen_galois_hint(k, sk, jax.random.fold_in(jax.random.PRNGKey(1), k))
        for k in ks
    }
    gals = bb.build_galois_many(ghints)
    singles = {k: bb.build_galois(ghints[k], k) for k in ks}
    n = params.ctx.n
    keys = jax.random.split(jax.random.PRNGKey(_SEED ^ 9), 2 * nrns)
    c0, c1 = (
        jnp.stack([
            jax.random.randint(kk, (n, batch), 0, q, dtype=jnp.uint32)
            for kk, q in zip(keys[j * nrns:(j + 1) * nrns], qs)
        ])
        for j in range(2)
    )
    _mark("galois: compile/guard")
    outs = gals(c0, c1)
    jax.block_until_ready(outs)
    # guard doubles as materialization barrier: for 2-power m the
    # hoisted outputs are bit-identical to per-k build_galois
    for k in ks:
        a0, a1 = singles[k](c0, c1)
        np.testing.assert_array_equal(
            np.asarray(outs[k][0][:, :, :1]), np.asarray(a0[:, :, :1])
        )
        np.testing.assert_array_equal(
            np.asarray(outs[k][1][:, :, :1]), np.asarray(a1[:, :, :1])
        )
    _mark("galois: interleaved A/B windows")
    tA, tB = [], []
    for _ in range(5):
        t0 = time.time()
        for _ in range(iters):
            outs = gals(c0, c1)
        jax.block_until_ready(outs)
        tA.append(time.time() - t0)
        t0 = time.time()
        for _ in range(iters):
            outs2 = [singles[k](c0, c1) for k in ks]
        jax.block_until_ready(outs2)
        tB.append(time.time() - t0)
    _mark("galois: done")
    rot = len(ks) * batch * iters
    tA_med, tB_med = statistics.median(tA), statistics.median(tB)
    return rot / tA_med, rot / tB_med, tB_med / tA_med


def bench_pt_round(m, p_round, batch, iters):
    """The serving-scale homomorphic rounding chain (VERDICT r4 next #7):
    serving.build_pt_round Z_{p_round} -> Z_pr over a real ring, whole
    batches per device execution; correctness-guarded on 3 columns."""
    import jax
    import jax.numpy as jnp
    from dataclasses import replace

    from lol_tpu import numtheory as nt, serving, she
    from lol_tpu.she_batched import BatchedBGV

    M = she.pt_round_mults(p_round)
    qs = tuple(nt.ntt_primes(m, 30, M + 2))
    params = she.SHEParams(m=m, p=p_round, qs=qs, var=2.0)
    _mark(f"pt_round m={m} p={p_round}: gen_sk + {M} device hints")
    sk = she.gen_sk(params, jax.random.PRNGKey(0))
    # device keygen per chain prefix (the object pt_round_hints crawls
    # through eager tunnel ops at this scale)
    hints = []
    L0 = len(qs)
    for i in range(M):
        params_i = replace(params, qs=qs[: L0 - i])
        bb_i = BatchedBGV(params_i)
        hints.append(
            bb_i.gen_ks_quad_hint(
                she.SK(params_i, sk.s_ints, sk.var),
                jax.random.fold_in(jax.random.PRNGKey(1), i),
            )
        )
    rh = she.PTRoundHints(tuple(hints))
    bb = BatchedBGV(params)
    _mark("pt_round: build chain")
    run, bb_out, f_out = serving.build_pt_round(bb, rh)
    n = params.ctx.n
    # scalar plaintexts (constant polynomials), as the chain requires
    vals = jax.random.randint(
        jax.random.PRNGKey(_SEED ^ 11), (batch,), 0, p_round, dtype=jnp.int32
    )
    msgs = jnp.zeros((n, batch), dtype=jnp.int32).at[0].set(vals)
    c0, c1 = bb.build_encrypt(sk)(msgs, jax.random.PRNGKey(2))
    _mark("pt_round: compile/run chain")
    y0, y1 = run(c0, c1)
    jax.block_until_ready((y0, y1))
    _mark("pt_round: decrypt guard")
    pr = bb_out.params.p
    sk_out = she.SK(bb_out.params, sk.s_ints, sk.var)
    dec = bb_out.build_decrypt(sk_out, f=f_out)
    got = np.asarray(dec(y0, y1)[:, :3])
    v3 = np.asarray(vals[:3])
    want = ((2 * v3 * pr + p_round) // (2 * p_round)) % pr
    np.testing.assert_array_equal(got[0], want)
    assert not got[1:].any()
    _mark("pt_round: timing loop")
    t0 = time.time()
    for _ in range(iters):
        y0, y1 = run(c0, c1)
    jax.block_until_ready((y0, y1))
    _mark("pt_round: done")
    return batch * iters / (time.time() - t0)


def bench_tunnel(m_r, m_s, nrns, batch, iters, p=257):
    """Fused device ring tunneling R -> S (E = S tower descent), ops/sec.
    Works for 2-power AND composite towers (general-m device keygen)."""
    import jax
    import jax.numpy as jnp

    from lol_tpu import gadget as gd, linear as lin, numtheory as nt, she
    from lol_tpu.cyc import Cyc
    from lol_tpu.ring import ring_context
    from lol_tpu.she_batched import BatchedBGV

    qs = tuple(nt.ntt_primes(m_r, 30, nrns))
    pr = she.SHEParams(m=m_r, p=p, qs=qs, var=2.0)
    ps = she.SHEParams(m=m_s, p=p, qs=qs, var=2.0)
    kr, ks_, kh = jax.random.split(jax.random.PRNGKey(5), 3)
    _mark(f"tunnel m={m_r}->{m_s}: gen_sks")
    sk_r = she.gen_sk(pr, kr)
    sk_s = she.gen_sk(ps, ks_)
    E = ring_context(m_s, qs)
    S = ring_context(m_s, qs)
    R = ring_context(m_r, qs)
    d = R.n // E.n
    ys = [Cyc.zero(S) for _ in range(d)]
    ys[0] = Cyc.scalar(S, 1)  # canonical tower-descent projection
    f = lin.linear_pow(E, R, S, ys)
    bb = BatchedBGV(pr)
    _mark("tunnel: gen_tunnel_hint (device)")
    th = bb.gen_tunnel_hint(f, sk_s, sk_r, kh)
    tun = bb.build_tunnel(th)
    enc = bb.build_encrypt(sk_r)
    msgs = jax.random.randint(
        jax.random.PRNGKey(_SEED ^ 8), (R.n, batch), 0, pr.p, dtype=jnp.int32
    )
    _mark("tunnel: compile/run")
    c0, c1 = enc(msgs, jax.random.PRNGKey(6))
    e0, e1 = tun(c0, c1)
    jax.block_until_ready((e0, e1))
    _mark("tunnel: timing loop")
    t0 = time.time()
    for _ in range(iters):
        e0, e1 = tun(c0, c1)
    jax.block_until_ready((e0, e1))
    _mark("tunnel: done")
    return batch * iters / (time.time() - t0)


def _retry(fn, *args, attempts=2, **kw):
    """Retry a bench leg once on transient tunnel/remote-compile flakes
    (e.g. 'response body closed before all bytes were read') — the
    driver's round-end capture is one-shot, so a single infra hiccup
    should not zero a whole row.  Correctness-guard AssertionErrors are
    deterministic and NOT retried.  The retry re-salts the process seed
    so the re-run never re-dispatches a chain the (possibly
    reconnected) remote session has already seen — the cross-process
    result cache would otherwise serve phantom rates."""
    global _SEED
    for a in range(attempts):
        try:
            return fn(*args, **kw)
        except AssertionError:
            raise  # a real bit-exactness regression, not an infra flake
        except Exception as e:  # noqa: BLE001 — transient infra errors
            if a + 1 == attempts:
                raise
            msg = (str(e).splitlines() or [repr(e)])[0][:120]
            _mark(f"leg failed ({msg}); retrying")
            _SEED = (_SEED * 0x9E3779B1 + a + 1) & 0x7FFFFFFF
            time.sleep(10)


def main():
    import jax

    _mark("ntt leg")
    n_ntt, ntt_stats, device = _retry(bench_ntt)
    _mark(f"ntt leg done: {ntt_stats['value']:.0f}/s at B={ntt_stats['batch']}")
    on_tpu = device.platform == "tpu"
    # config 5 scale on TPU; tiny smoke ring off-TPU (dev machines)
    m_she = 32768 if on_tpu else 256
    batch = 1024 if on_tpu else 128  # 1024: +5% over 512 (grid amortization)
    iters = 30 if on_tpu else 2  # ~1s windows amortize the sync overhead
    n_bgv, bgv_rate = _retry(bench_bgv, m_she, nrns=3, batch=batch,
                             iters=iters)
    # the n=4096 pipeline (README's "~78k" claim), driver-verifiable;
    # extras: mod_switch / linear KS / ext-modulus step + noise delta
    m_4k = 8192 if on_tpu else 128
    _, bgv4k_rate, bgv_extras = _retry(
        bench_bgv, m_4k, nrns=3, batch=batch, iters=iters, extras=True
    )
    # config-3 composite-m pipeline (m = 2^a * 3^b): the 2-axis rides the
    # same Pallas kernels on a free reshape, the 3^2 axis a dense matvec
    m_gen = 18432 if on_tpu else 72  # 2^11 * 3^2, phi = 6144
    n_gen, bgv_gen_rate = _retry(bench_bgv, m_gen, nrns=3, batch=batch,
                                 iters=iters, p=7)
    tunnel_rate = _retry(
        bench_tunnel, m_she, m_she // 2, nrns=3, batch=batch, iters=iters
    )
    # general-m tower tunneling with DEVICE-generated hints (r3 #1):
    # m = 2^11*3^2 -> 2^10*3^2 at config-3 scale
    m_gt = (18432, 9216) if on_tpu else (72, 36)
    tunnel_gen_rate = _retry(
        bench_tunnel, m_gt[0], m_gt[1], nrns=3, batch=batch, iters=iters, p=7
    )
    # hoisted rotations A/B (the previously-unmeasured "1.69x") at the
    # config-5 ring, and the serving-scale rounding chain (Z_8 -> Z_2
    # over an m=32768-class ring), both driver-captured
    m_gal = 32768 if on_tpu else 64
    gal_hoist, gal_sep, gal_speedup = _retry(
        bench_galois, m_gal, nrns=3, batch=1024 if on_tpu else 8,
        iters=10 if on_tpu else 2
    )
    m_pr = 32768 if on_tpu else 32
    pt_round_rate = _retry(
        bench_pt_round, m_pr, p_round=8, batch=1024 if on_tpu else 8,
        iters=10 if on_tpu else 2
    )
    baseline = 1_000_000.0
    print(
        json.dumps(
            {
                "metric": f"negacyclic NTTs/sec, n={n_ntt}, 60-bit RNS (2x30-bit), {device.device_kind}",
                "value": round(ntt_stats["value"]),
                "unit": "NTT/s",
                "vs_baseline": round(ntt_stats["value"] / baseline, 4),
                "ntt_min": round(ntt_stats["min"]),
                "ntt_max": round(ntt_stats["max"]),
                "ntt_batch": ntt_stats["batch"],
                "ntt_windows": ntt_stats["windows"],
                "ntt_dispatch_chain": ntt_stats["dispatch_chain"],
                "ntt_medians_by_batch": ntt_stats["medians_by_batch"],
                "ntt_chain_medians_by_batch": ntt_stats["chain_medians_by_batch"],
                "ntt_interleaved_windows": ntt_stats["interleaved"],
                "intt_value": ntt_stats["intt_value"],
                "intt_min": ntt_stats["intt_min"],
                "intt_max": ntt_stats["intt_max"],
                "intt_batch": ntt_stats["intt_batch"],
                "bgv_ct_ops_per_sec": round(bgv_rate),
                "bgv_n": n_bgv,
                "bgv_rns": 3,
                "bgv_n4096_ops_per_sec": round(bgv4k_rate),
                "bgv_general_m_ops_per_sec": round(bgv_gen_rate),
                "bgv_general_m": m_gen,
                "bgv_general_n": n_gen,
                "tunnel_ops_per_sec": round(tunnel_rate),
                "tunnel_rings": f"m={m_she}->m={m_she // 2}",
                "tunnel_general_m_ops_per_sec": round(tunnel_gen_rate),
                "tunnel_general_m_rings": f"m={m_gt[0]}->m={m_gt[1]}",
                **bgv_extras,  # mod_switch/ks_linear/step_ext + noise delta
                "galois_hoisted_rot_per_sec": round(gal_hoist),
                "galois_separate_rot_per_sec": round(gal_sep),
                "galois_hoisted_speedup": round(gal_speedup, 3),
                "galois_rotations": 3,
                "galois_m": m_gal,
                "pt_round_ops_per_sec": round(pt_round_rate),
                "pt_round_p": 8,
                "pt_round_m": m_pr,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
