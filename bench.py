"""North-star benchmark — prints ONE JSON line.

Primary metric (BASELINE.md): negacyclic NTTs/sec at n=4096 over a 60-bit
RNS modulus (2 x 30-bit NTT primes); baseline 1,000,000 NTT/s/chip (v5p).

The same line also carries the second BASELINE headline (BGV ct-mult +
key-switch + rescale ops/sec at config 5's stated scale n = 2^14 = phi(32768)
with 3 RNS primes) and the fused ring-tunneling rate at the same scale,
as extra keys: bgv_ct_ops_per_sec / tunnel_ops_per_sec.

Off-TPU (dev smoke) the SHE legs drop to a tiny ring so the script stays
fast; the driver's TPU run measures the real thing.
"""

import json
import sys
import time

import numpy as np


def bench_ntt():
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
    return n, B * iters / dt, device  # one 60-bit NTT = both residue transforms


def _she_setup(m, nrns, p=257):
    import jax

    from lol_tpu import gadget as gd, numtheory as nt, she
    from lol_tpu.she_batched import BatchedBGV

    qs = tuple(nt.ntt_primes(m, 30, nrns))
    params = she.SHEParams(m=m, p=p, qs=qs, var=2.0)
    ks, kh = jax.random.split(jax.random.PRNGKey(0))
    sk = she.gen_sk(params, ks)
    hint = she.ks_quad_circ_hint(sk, gd.RnsGad(), kh)
    return BatchedBGV(params), sk, hint


def bench_bgv(m, nrns, batch, iters):
    """BGV ct-mult + RNS-gadget keyswitch + exact rescale, ops/sec, with a
    decrypt-correctness guard on column 0."""
    import jax
    import jax.numpy as jnp

    from lol_tpu import numtheory as nt, she

    bb, sk, hint = _she_setup(m, nrns)
    params = bb.params
    n = params.ctx.n
    enc = bb.build_encrypt(sk)
    step = bb.build_step(hint)
    rng = np.random.default_rng(1)
    m1 = rng.integers(0, params.p, (n, batch)).astype(np.int32)
    m2 = rng.integers(0, params.p, (n, batch)).astype(np.int32)
    c0, c1 = enc(jnp.asarray(m1), jax.random.PRNGKey(2))
    d0, d1 = enc(jnp.asarray(m2), jax.random.PRNGKey(3))
    e0, e1 = step(c0, c1, d0, d1)
    jax.block_until_ready((e0, e1))

    # guard: batched decrypt of column 0 == exact plaintext ring product
    params2 = she.SHEParams(m=m, p=params.p, qs=params.qs[:-1], var=params.var)
    from lol_tpu.she_batched import BatchedBGV

    bb2 = BatchedBGV(params2, use_pallas=bb.use_pallas)
    sk2 = she.SK(params2, sk.s_ints, sk.var)
    f2 = nt.modinv(params.qs[-1] % params.p, params.p)
    dec = bb2.build_decrypt(sk2, f=f2)
    got = np.asarray(dec(e0, e1))[:, 0]
    want = _pt_mul_exact(params, m1[:, 0], m2[:, 0])
    np.testing.assert_array_equal(got, want)

    t0 = time.time()
    for _ in range(iters):
        e0, e1 = step(c0, c1, d0, d1)
    jax.block_until_ready((e0, e1))
    return n, batch * iters / (time.time() - t0)


def _pt_mul_exact(params, a, b):
    """Exact plaintext negacyclic product via an auxiliary RNS ring."""
    from lol_tpu import numtheory as nt
    from lol_tpu.cyc import Cyc, Rep
    from lol_tpu.ring import ring_context

    aux = ring_context(params.m, tuple(nt.ntt_primes(params.m, 29, 3)))
    prod = (
        Cyc.from_ints(aux, a, rep=Rep.DEC) * Cyc.from_ints(aux, b, rep=Rep.DEC)
    ).lift_ints(rep=Rep.DEC)
    return (prod % params.p).astype(np.int64)


def bench_tunnel(m_r, m_s, nrns, batch, iters):
    """Fused device ring tunneling R -> S (E = S tower descent), ops/sec."""
    import jax
    import jax.numpy as jnp

    from lol_tpu import gadget as gd, linear as lin, numtheory as nt, she
    from lol_tpu.cyc import Cyc
    from lol_tpu.ring import ring_context
    from lol_tpu.she_batched import BatchedBGV

    qs = tuple(nt.ntt_primes(m_r, 30, nrns))
    pr = she.SHEParams(m=m_r, p=257, qs=qs, var=2.0)
    ps = she.SHEParams(m=m_s, p=257, qs=qs, var=2.0)
    kr, ks_, kh = jax.random.split(jax.random.PRNGKey(5), 3)
    sk_r = she.gen_sk(pr, kr)
    sk_s = she.gen_sk(ps, ks_)
    E = ring_context(m_s, qs)
    S = ring_context(m_s, qs)
    R = ring_context(m_r, qs)
    d = R.n // E.n
    ys = [Cyc.zero(S) for _ in range(d)]
    ys[0] = Cyc.scalar(S, 1)  # canonical tower-descent projection
    f = lin.linear_pow(E, R, S, ys)
    th = she.tunnel_hint(f, sk_s, sk_r, gd.RnsGad(), kh)
    bb = BatchedBGV(pr)
    tun = bb.build_tunnel(th)
    enc = bb.build_encrypt(sk_r)
    rng = np.random.default_rng(2)
    msgs = rng.integers(0, pr.p, (R.n, batch)).astype(np.int32)
    c0, c1 = enc(jnp.asarray(msgs), jax.random.PRNGKey(6))
    e0, e1 = tun(c0, c1)
    jax.block_until_ready((e0, e1))
    t0 = time.time()
    for _ in range(iters):
        e0, e1 = tun(c0, c1)
    jax.block_until_ready((e0, e1))
    return batch * iters / (time.time() - t0)


def main():
    import jax

    n_ntt, ntts_per_sec, device = bench_ntt()
    on_tpu = device.platform == "tpu"
    # config 5 scale on TPU; tiny smoke ring off-TPU (dev machines)
    m_she = 32768 if on_tpu else 256
    batch = 1024 if on_tpu else 128  # 1024: +5% over 512 (grid amortization)
    iters = 10 if on_tpu else 2
    n_bgv, bgv_rate = bench_bgv(m_she, nrns=3, batch=batch, iters=iters)
    tunnel_rate = bench_tunnel(
        m_she, m_she // 2, nrns=3, batch=batch, iters=iters
    )
    baseline = 1_000_000.0
    print(
        json.dumps(
            {
                "metric": f"negacyclic NTTs/sec, n={n_ntt}, 60-bit RNS (2x30-bit), {device.device_kind}",
                "value": round(ntts_per_sec),
                "unit": "NTT/s",
                "vs_baseline": round(ntts_per_sec / baseline, 4),
                "bgv_ct_ops_per_sec": round(bgv_rate),
                "bgv_n": n_bgv,
                "bgv_rns": 3,
                "tunnel_ops_per_sec": round(tunnel_rate),
                "tunnel_rings": f"m={m_she}->m={m_she // 2}",
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
