"""BGV pipeline benchmark: ct-mult + key-switch + rescale ops/sec.

The second BASELINE.json headline metric.  Run:
    python -m lol_tpu.bench.she_bench [--m 8192] [--rns 3] [--batch 2048]
Prints one JSON line like bench.py.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np



def _seed() -> int:
    """Process-unique data seed: the tunnel's remote execution service
    can serve cross-process CACHED results for (executable, input) pairs
    it has seen, so fixed-seed timing loops can measure memory reads
    (CLAUDE.md gotcha)."""
    import os as _os
    import time as _time

    return (_os.getpid() * 1_000_003 + int(_time.time())) & 0x7FFFFFFF


def run(m: int = 8192, nrns: int = 3, batch: int = 2048, p: int = 257,
        iters: int = 20):
    import jax
    import jax.numpy as jnp

    from .. import gadget as gd, numtheory as nt, she
    from ..she_batched import BatchedBGV

    qs = tuple(nt.ntt_primes(m, 30, nrns))
    params = she.SHEParams(m=m, p=p, qs=qs, var=2.0)
    key = jax.random.PRNGKey(_seed())
    ks, kh = jax.random.split(key)
    sk = she.gen_sk(params, ks)
    bb = BatchedBGV(params)
    hint = bb.gen_ks_quad_hint(sk, kh)  # one-call device keygen
    step = bb.build_step(hint)

    n = params.ctx.n
    # uniform component stacks generated on device (host uploads of
    # (nrns, n, batch) arrays through a tunneled TPU dominate wall time)
    arrs = [
        jnp.stack([
            jax.random.randint(k, (n, batch), 0, q, dtype=jnp.uint32)
            for k, q in zip(jax.random.split(jax.random.PRNGKey(_seed() ^ (9 + i)), nrns), qs)
        ])
        for i in range(4)
    ]
    out = step(*arrs)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = step(*arrs)
    jax.block_until_ready(out)
    dt = time.time() - t0
    rate = batch * iters / dt

    def timed(fn, fn_args, its):
        o = fn(*fn_args)
        jax.block_until_ready(o)
        t = time.time()
        for _ in range(its):
            o = fn(*fn_args)
        jax.block_until_ready(o)
        return batch * its / (time.time() - t)

    # round-4 serving ops on the same inputs
    kl, kx = jax.random.split(jax.random.PRNGKey(_seed() ^ 77))
    ms_rate = timed(bb.build_mod_switch(), arrs[:2], max(iters // 2, 2))
    sk2 = she.gen_sk(params, jax.random.PRNGKey(_seed() ^ 78))
    lhint = bb.gen_ks_linear_hint(sk2, sk, kl)
    ksl_rate = timed(
        bb.build_key_switch_linear(lhint), arrs[:2], max(iters // 2, 2)
    )
    specials = tuple(nt.ntt_primes(m, 30, nrns + 2))[nrns:]
    hx = bb.gen_ks_quad_hint_ext(sk, specials, kx)
    ext_rate = timed(bb.build_step_ext(hx), arrs, max(iters // 2, 2))

    dev = jax.devices()[0].device_kind
    print(json.dumps({
        "metric": f"BGV ct-mult+keyswitch+rescale ops/sec, n={n}, {nrns}x30-bit RNS, {dev}",
        "value": round(rate),
        "unit": "ct-op/s",
        "vs_baseline": None,
        "mod_switch_ops_per_sec": round(ms_rate),
        "ks_linear_ops_per_sec": round(ksl_rate),
        "step_ext_ops_per_sec": round(ext_rate),
        "step_ext_specials": len(specials),
    }))
    return rate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=8192)
    ap.add_argument("--rns", type=int, default=3)
    ap.add_argument("--batch", type=int, default=2048)
    args = ap.parse_args()
    run(args.m, args.rns, args.batch)


if __name__ == "__main__":
    main()
