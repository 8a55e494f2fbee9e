"""Small-batch NTT sweep (VERDICT r3 #5): attack the B=4096 haircut.

BENCH_r03: 1.24M NTT/s at B=4096 vs 1.93M at B=32768 — the headline
needs a 32k batch to amortize the two-call kernel split's fixed costs.
This harness A/Bs the knobs the builder exposes at n=4096, B=4096 on
the real chip: lane tile x window split tS (incl. the single-call
S=0 shape) x fused-stage radix.  Correctness-guarded per combo; same
cache-hazard defenses as bench.py (process-unique seeds, chained
dispatches, multi-window medians).

Usage: python -m lol_tpu.bench.smallb [B]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from .. import numtheory as nt
    from ..ops import ntt
    from ..ops.pallas import ntt_kernel as pk

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    n = int(os.environ.get("SMALLB_N", "4096"))
    seed = (os.getpid() * 1_000_003 + int(time.time())) & 0x7FFFFFFF
    qs = nt.ntt_primes(2 * n, 30, 2)
    plans = [ntt.ntt_plan(n, q) for q in qs]
    on_tpu = jax.devices()[0].platform == "tpu"

    # SMALLB_INVERSE=1: sweep the GS INVERSE instead (VERDICT r4 next
    # #3: the inverse runs at ~55% of the forward rate and sits inside
    # every step/tunnel/rescale — is a knob combo leaving rate on the
    # table?).  Shipping inverse config is radix 8 at window 512 (r16
    # blows scoped VMEM at tS=512; a smaller window shrinks every live
    # stage temporary, so r16 may fit there).
    inverse = os.environ.get("SMALLB_INVERSE", "0") == "1"
    if os.environ.get("SMALLB_COMBOS"):
        # "lanes,window,radix[,alg]" — alg ("gs"/"dit") only for inverse
        def _tok(t):
            return None if t == "None" else (int(t) if t.isdigit() else t)

        combos = [
            tuple(_tok(t) for t in c.split(","))
            for c in os.environ["SMALLB_COMBOS"].split(";")
        ]
    elif inverse:
        combos = [
            # (lanes, window, radix) — None = tuned default (8 inv)
            (512, 512, None),   # the shipping inverse config (baseline)
            (512, 512, 16),
            (512, 256, 16),
            (512, 256, 8),
            (512, 128, 16),
            (256, 512, 16),
            (512, 512, 4),
            (512, 1024, 8),
        ]
    else:
        combos = [
            # (lanes, window, radix) — None radix = tuned default (16 fwd)
            (512, 512, None),   # the shipping config (baseline)
            (256, 512, None),
            (128, 512, None),
            (512, 1024, None),
            (256, 1024, None),
            (512, 2048, None),
            (256, 2048, None),
            (128, 4096, None),  # single-call S=0 shape
            (256, 4096, None),
            (512, 512, 32),
            (512, 1024, 32),
        ]
    interleave = os.environ.get("SMALLB_INTERLEAVE", "0") == "1"

    keys = jax.random.split(jax.random.PRNGKey(seed), len(qs))
    xs0 = [
        jax.random.randint(k, (n, B), 0, q, dtype=jnp.uint32)
        for k, q in zip(keys, qs)
    ]
    np_step = ntt.np_ntt_inverse if inverse else ntt.np_ntt_forward
    want = np_step(np.asarray(xs0[0][:, :1]).T, plans[0])

    iters = 40 if on_tpu else 2
    results = {}
    live = []  # (tag, step, state) for the interleaved phase

    for combo in combos:
        lanes, window, radix = combo[:3]
        alg = combo[3] if len(combo) > 3 else None
        if B % lanes:
            continue
        tag = f"lanes={lanes},window={window},radix={radix or 'dflt'}"
        if alg:
            tag += f",alg={alg}"
        t0 = time.time()
        try:
            def step(arrs, lanes=lanes, window=window, radix=radix, alg=alg):
                return [
                    pk.ntt_cm(a, p, inverse=inverse, lanes=lanes,
                              window=window, radix=radix, alg=alg,
                              interpret=not on_tpu)
                    for a, p in zip(arrs, plans)
                ]

            ys = step(xs0)
            jax.block_until_ready(ys)
            got = np.asarray(ys[0][:, :1]).T
            np.testing.assert_array_equal(got, want)
            compile_s = time.time() - t0
            for _ in range(5):
                ys = step(ys)
            jax.block_until_ready(ys)
            if interleave:
                print(f"{tag}: compiled ({compile_s:.0f}s)", file=sys.stderr,
                      flush=True)
                live.append([tag, step, ys, []])
                continue
            rates = []
            for _ in range(3):
                t1 = time.time()
                for _ in range(iters):
                    ys = step(ys)
                jax.block_until_ready(ys)
                rates.append(B * iters / (time.time() - t1))
            med = statistics.median(rates)
            results[tag] = med
            print(f"{tag}: {med:,.0f} NTT/s (compile {compile_s:.0f}s, "
                  f"spread {min(rates):,.0f}-{max(rates):,.0f})",
                  file=sys.stderr, flush=True)
        except Exception as e:  # noqa: BLE001 — record infeasible combos
            results[tag] = None
            msg = str(e).split("\n")[0][:160]
            print(f"{tag}: FAILED ({msg})", file=sys.stderr, flush=True)

    # interleaved phase: round-robin timed windows so shared-chip noise
    # hits every combo equally (the sequential sweep drifted 2x between
    # its first and last combos)
    for w in range(5 if interleave else 0):
        for rec in live:
            tag, step, ys, rates = rec
            t1 = time.time()
            for _ in range(iters):
                ys = step(ys)
            jax.block_until_ready(ys)
            rates.append(B * iters / (time.time() - t1))
            rec[2] = ys
        print(f"-- round {w} done", file=sys.stderr, flush=True)
    for tag, _step, _ys, rates in live:
        med = statistics.median(rates)
        results[tag] = med
        print(f"{tag}: {med:,.0f} NTT/s "
              f"(spread {min(rates):,.0f}-{max(rates):,.0f})",
              file=sys.stderr, flush=True)

    ok = [(v, k) for k, v in results.items() if v is not None]
    if ok:
        best = max(ok)
        print(f"\nbest at B={B}: {best[1]} -> {best[0]:,.0f} NTT/s",
              file=sys.stderr)
    else:
        print(f"\nno combo succeeded at B={B}", file=sys.stderr)
    import json

    print(json.dumps({"B": B, "n": n, "results": results}))


if __name__ == "__main__":
    main()
