"""Where does the inverse NTT's time go? (r5, VERDICT r4 weak #4)

At the tuned defaults the GS inverse measures ~70% of the forward rate,
but per-butterfly op accounting predicts ~85-88% (the only structural
extras are the 1/n scale multiply and one fold).  This harness times,
interleaved round-robin on one chip (DESIGN §10 discipline):

  fwd          the forward kernel (baseline)
  inv          the shipping inverse
  inv_noscale  the inverse with the 1/n multiply skipped (scale=False —
               WRONG results, timing only; isolates the scale pass)
  inv_exact    the inverse on the fully-reduced butterfly path
               (lazy=False; isolates the lazy-form benefit)

Usage: python -m lol_tpu.bench.invgap [B] [n]
"""

from __future__ import annotations

import json
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

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    seed = (os.getpid() * 1_000_003 + int(time.time())) & 0x7FFFFFFF
    qs = nt.ntt_primes(2 * n, 30, 2)
    plans = [ntt.ntt_plan(n, q) for q in qs]
    on_tpu = jax.devices()[0].platform == "tpu"
    iters = 40 if on_tpu else 2

    variants = {
        "fwd": dict(inverse=False),
        "inv": dict(inverse=True),
        "inv_noscale": dict(inverse=True, scale=False),
        "inv_exact": dict(inverse=True, lazy=False),
    }

    keys = jax.random.split(jax.random.PRNGKey(seed), len(qs))
    xs0 = [
        jax.random.randint(k, (n, B), 0, q, dtype=jnp.uint32)
        for k, q in zip(keys, qs)
    ]

    live = []
    for tag, kw in variants.items():
        t0 = time.time()

        def step(arrs, kw=kw):
            return [
                pk.ntt_cm(a, p, interpret=not on_tpu, **kw)
                for a, p in zip(arrs, plans)
            ]

        ys = step(xs0)
        jax.block_until_ready(ys)
        if kw.get("scale", True):  # guard (and materialization barrier)
            np_step = ntt.np_ntt_inverse if kw["inverse"] else ntt.np_ntt_forward
            np.testing.assert_array_equal(
                np.asarray(ys[0][:, :1]).T,
                np_step(np.asarray(xs0[0][:, :1]).T, plans[0]),
            )
        else:
            _ = np.asarray(ys[0][:1, :1])
        print(f"{tag}: compiled ({time.time() - t0:.0f}s)", file=sys.stderr,
              flush=True)
        for _ in range(3):
            ys = step(ys)
        jax.block_until_ready(ys)
        live.append([tag, step, ys, []])

    for w in range(5):
        for rec in live:
            tag, step, ys, rates = rec
            t1 = time.time()
            for _ in range(iters):
                ys = step(ys)
            jax.block_until_ready(ys)
            rates.append(B * iters / (time.time() - t1))
            rec[2] = ys
        print(f"-- round {w} done", file=sys.stderr, flush=True)

    results = {}
    for tag, _s, _y, rates in live:
        med = statistics.median(rates)
        results[tag] = round(med)
        print(f"{tag}: {med:,.0f} NTT/s "
              f"(spread {min(rates):,.0f}-{max(rates):,.0f})",
              file=sys.stderr, flush=True)
    f = results["fwd"]
    print(
        f"inv/fwd {results['inv'] / f:.3f}, noscale/fwd "
        f"{results['inv_noscale'] / f:.3f}, exact/fwd "
        f"{results['inv_exact'] / f:.3f}",
        file=sys.stderr,
    )
    print(json.dumps({"B": B, "n": n, "results": results}))


if __name__ == "__main__":
    main()
