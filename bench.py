"""North-star benchmark: negacyclic NTTs/sec at n=4096 over a 60-bit RNS
modulus (2 x 30-bit NTT primes), on whatever accelerator jax gives us.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline = 1,000,000 NTTs/sec/chip (BASELINE.md north-star target, v5p).
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from lol_tpu import numtheory as nt
    from lol_tpu.ops import ntt
    from lol_tpu.ops.pallas import ntt_kernel as pk

    n = 4096
    qs = nt.ntt_primes(2 * n, 30, 2)  # 2 x 30-bit primes ~ one 60-bit modulus
    plans = [ntt.ntt_plan(n, q) for q in qs]
    B = 16384  # measured on v5e: 1.71M NTT/s vs 1.47M at B=8192 (grid amortization)
    rng = np.random.default_rng(0)
    xs = [
        jnp.asarray(rng.integers(0, q, (n, B), dtype=np.uint64).astype(np.uint32))
        for q in qs
    ]

    device = jax.devices()[0]
    on_tpu = device.platform == "tpu"

    def step(arrs):
        return [pk.ntt_cm(a, p) for a, p in zip(arrs, plans)]

    # correctness guard: one column vs the numpy oracle
    ys = step(xs)
    [y.block_until_ready() for y in ys]
    want = ntt.np_ntt_forward(np.asarray(xs[0]).T[:1], plans[0])
    got = np.asarray(ys[0])[:, :1].T
    np.testing.assert_array_equal(got, want)

    # warmup: let dispatch/thermal settle after the long compile
    ys = xs
    for _ in range(10 if on_tpu else 1):
        ys = step(ys)
    [y.block_until_ready() for y in ys]

    iters = 40 if on_tpu else 2
    t0 = time.time()
    for _ in range(iters):
        ys = step(ys)
    [y.block_until_ready() for y in ys]
    dt = time.time() - t0

    ntts_per_sec = B * iters / dt  # one 60-bit NTT = both residue transforms
    baseline = 1_000_000.0
    print(
        json.dumps(
            {
                "metric": f"negacyclic NTTs/sec, n={n}, 60-bit RNS (2x30-bit), {device.device_kind}",
                "value": round(ntts_per_sec),
                "unit": "NTT/s",
                "vs_baseline": round(ntts_per_sec / baseline, 4),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
