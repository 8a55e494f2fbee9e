"""Sharded pipelines on the 8-device virtual CPU mesh (SURVEY §5 multi-
device simulation)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lol_tpu import numtheory as nt
from lol_tpu.ops import ntt
from lol_tpu.parallel import sharding as sh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

N = 256
QS = tuple(nt.ntt_primes(2 * N, 30, 4))


def test_batched_ntt_rns_data_sharded(rng):
    mesh = sh.make_mesh({"data": 2, "rns": 4})
    plans = [ntt.ntt_plan(N, q) for q in QS]
    x = np.stack(
        [rng.integers(0, q, (8, N), dtype=np.uint64).astype(np.uint32) for q in QS]
    )
    xs = sh.shard_batch_rns(mesh, jnp.asarray(x))
    out = sh.batched_ntt_sharded(mesh, xs, plans)
    for i in range(len(QS)):
        np.testing.assert_array_equal(
            np.asarray(out)[i], ntt.np_ntt_forward(x[i], plans[i])
        )
    back = sh.batched_ntt_sharded(mesh, out, plans, inverse=True)
    np.testing.assert_array_equal(np.asarray(back), x)


def test_ntt_ring_sharded_matches_oracle(rng):
    mesh = sh.make_mesh({"ring": 8})
    q = QS[0]
    plan = ntt.ntt_plan(N, q)
    x = rng.integers(0, q, (4, N), dtype=np.uint64).astype(np.uint32)
    xj = jax.device_put(
        jnp.asarray(x),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(None, "ring")),
    )
    got = sh.ntt_ring_sharded(mesh, xj, plan)
    np.testing.assert_array_equal(np.asarray(got), ntt.np_ntt_forward(x, plan))


def test_hadamard_sharded(rng):
    mesh = sh.make_mesh({"data": 4, "rns": 2})
    qs = QS[:2]
    a = np.stack(
        [rng.integers(0, q, (8, N), dtype=np.uint64).astype(np.uint32) for q in qs]
    )
    b = np.stack(
        [rng.integers(0, q, (8, N), dtype=np.uint64).astype(np.uint32) for q in qs]
    )
    out = sh.batched_hadamard_sharded(
        mesh, sh.shard_batch_rns(mesh, jnp.asarray(a)),
        sh.shard_batch_rns(mesh, jnp.asarray(b)), qs
    )
    for i, q in enumerate(qs):
        np.testing.assert_array_equal(
            np.asarray(out)[i], (a[i].astype(np.uint64) * b[i] % q).astype(np.uint32)
        )


def test_remote_ntt_pallas_a2a_matches_oracle(rng):
    """Pallas remote-DMA all-to-all NTT (interpret mode) vs numpy oracle."""
    from lol_tpu.ops.pallas import remote_ntt as rn

    mesh = sh.make_mesh({"ring": 4})
    q = QS[0]
    plan = ntt.ntt_plan(N, q)  # N = 256, D = 4: D^2 | N
    x = rng.integers(0, q, (2, N), dtype=np.uint64).astype(np.uint32)
    xj = jax.device_put(
        jnp.asarray(x),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(None, "ring")),
    )
    got = rn.ntt_ring_sharded_pallas(mesh, xj, plan, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), ntt.np_ntt_forward(x, plan))


def test_remote_ntt_pallas_8dev(rng):
    from lol_tpu.ops.pallas import remote_ntt as rn

    mesh = sh.make_mesh({"ring": 8})
    q = QS[1]
    n = 512  # 8^2 | 512
    plan = ntt.ntt_plan(n, q)
    x = rng.integers(0, q, (3, n), dtype=np.uint64).astype(np.uint32)
    xj = jax.device_put(
        jnp.asarray(x),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(None, "ring")),
    )
    got = rn.ntt_ring_sharded_pallas(mesh, xj, plan, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), ntt.np_ntt_forward(x, plan))


def test_remote_ntt_overlap_matches_unfused(rng):
    """Overlapped fused a2a+phase-B kernel (VERDICT r2 #10) == the
    two-call path, bit-exact, and == the numpy oracle.  Batch flattens
    to 256 (two 128-lane slabs), so the slab loop and up-front DMA
    issue both execute in interpret mode."""
    from lol_tpu.ops.pallas import remote_ntt as rn

    mesh = sh.make_mesh({"ring": 4})
    q = QS[0]
    plan = ntt.ntt_plan(N, q)
    x = rng.integers(0, q, (2, 128, N), dtype=np.uint64).astype(np.uint32)
    xj = jax.device_put(
        jnp.asarray(x),
        jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(None, None, "ring")
        ),
    )
    got = rn.ntt_ring_sharded_pallas(mesh, xj, plan, interpret=True,
                                     overlap=True)
    want = rn.ntt_ring_sharded_pallas(mesh, xj, plan, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    np.testing.assert_array_equal(
        np.asarray(got), ntt.np_ntt_forward(x.reshape(-1, N), plan).reshape(x.shape)
    )
    # inverse (send-side) overlap: round-trips the forward bit-exactly
    back = rn.intt_ring_sharded_pallas(mesh, got, plan, interpret=True,
                                       overlap=True)
    np.testing.assert_array_equal(np.asarray(back), x)

    # 3 slabs > kslot=2: the capped landing zone actually RECYCLES a
    # slot through the reverse-ack protocol (VERDICT r3 #10) — the
    # prologue fills both slots, slab 2 reuses slot 0 after the ack
    # round, and the drain waits the final acks.  The inverse (back3)
    # likewise exceeds its 2-slab sliding send window, so slab 0's
    # copies drain MID-LOOP before slab 2 issues (VERDICT r4 next #9:
    # bounded send depth)
    x3 = rng.integers(0, q, (3, 128, N), dtype=np.uint64).astype(np.uint32)
    xj3 = jax.device_put(
        jnp.asarray(x3),
        jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(None, None, "ring")
        ),
    )
    got3 = rn.ntt_ring_sharded_pallas(mesh, xj3, plan, interpret=True,
                                      overlap=True)
    np.testing.assert_array_equal(
        np.asarray(got3),
        ntt.np_ntt_forward(x3.reshape(-1, N), plan).reshape(x3.shape),
    )
    back3 = rn.intt_ring_sharded_pallas(mesh, got3, plan, interpret=True,
                                        overlap=True)
    np.testing.assert_array_equal(np.asarray(back3), x3)


def test_sharded_bgv_step_32k(rng):
    """Config 5's sharded demo: m=32768 batched step + fused tunnel with
    (rns=2, data=4) sharding, mesh-aware digit all-gather (no involuntary
    remat path), bit-exact vs the unsharded run."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from lol_tpu import gadget as gd, linear as lin, she
    from lol_tpu.cyc import Cyc
    from lol_tpu.ring import ring_context
    from lol_tpu.she_batched import BatchedBGV

    m, nrns, B = 32768, 2, 8
    qs = tuple(nt.ntt_primes(m, 30, nrns))
    params = she.SHEParams(m=m, p=257, qs=qs, var=2.0)
    sk = she.gen_sk(params, jax.random.PRNGKey(60))
    hint = she.ks_quad_circ_hint(sk, gd.RnsGad(), jax.random.PRNGKey(61))
    bb = BatchedBGV(params, use_pallas=False)
    enc = bb.build_encrypt(sk)
    n = params.ctx.n
    m1 = rng.integers(0, params.p, (n, B)).astype(np.int32)
    m2 = rng.integers(0, params.p, (n, B)).astype(np.int32)
    c0, c1 = enc(jnp.asarray(m1), jax.random.PRNGKey(62))
    d0, d1 = enc(jnp.asarray(m2), jax.random.PRNGKey(63))

    mesh = sh.make_mesh({"rns": 2, "data": 4})
    spec = NamedSharding(mesh, P("rns", None, "data"))
    c0s, c1s, d0s, d1s = (jax.device_put(x, spec) for x in (c0, c1, d0, d1))
    e0s, e1s = bb.build_step(hint, mesh=mesh)(c0s, c1s, d0s, d1s)
    e0, e1 = bb.build_step(hint)(c0, c1, d0, d1)
    np.testing.assert_array_equal(np.asarray(e0s), np.asarray(e0))
    np.testing.assert_array_equal(np.asarray(e1s), np.asarray(e1))

    # sharded fused tunnel m=32768 -> 16384 on the shortened chain:
    # nrns-1 = 1 channel can't shard over rns=2, so reshard data-only
    ms = m // 2
    qs2 = qs[:-1]
    E = S = ring_context(ms, qs2)
    R = ring_context(m, qs2)
    params2 = she.SHEParams(m=m, p=params.p, qs=qs2, var=params.var)
    sk2 = she.SK(params2, sk.s_ints, sk.var)
    ps = she.SHEParams(m=ms, p=params.p, qs=qs2, var=params.var)
    sk_s = she.gen_sk(ps, jax.random.PRNGKey(64))
    d = R.n // E.n
    ys = [Cyc.zero(S) for _ in range(d)]
    ys[0] = Cyc.scalar(S, 1)
    th = she.tunnel_hint(lin.linear_pow(E, R, S, ys), sk_s, sk2, gd.RnsGad(),
                         jax.random.PRNGKey(65))
    bb2 = BatchedBGV(params2, use_pallas=False)
    data_spec = NamedSharding(mesh, P(None, None, "data"))
    e0d, e1d = (jax.device_put(np.asarray(x), data_spec) for x in (e0, e1))
    t0s, t1s = bb2.build_tunnel(th, mesh=mesh)(e0d, e1d)
    t0, t1 = bb2.build_tunnel(th)(jnp.asarray(np.asarray(e0)),
                                  jnp.asarray(np.asarray(e1)))
    np.testing.assert_array_equal(np.asarray(t0s), np.asarray(t0))
    np.testing.assert_array_equal(np.asarray(t1s), np.asarray(t1))


def test_remote_ntt_pallas_inverse_roundtrip(rng):
    """Inverse ring-sharded transform: fwd -> inv == id, and inv matches
    the numpy oracle (VERDICT r1 #9)."""
    from lol_tpu.ops.pallas import remote_ntt as rn

    mesh = sh.make_mesh({"ring": 4})
    q = QS[0]
    plan = ntt.ntt_plan(N, q)
    x = rng.integers(0, q, (2, N), dtype=np.uint64).astype(np.uint32)
    spec = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(None, "ring")
    )
    xj = jax.device_put(jnp.asarray(x), spec)
    fwd = rn.ntt_ring_sharded_pallas(mesh, xj, plan, interpret=True)
    back = rn.intt_ring_sharded_pallas(
        mesh, jax.device_put(fwd, spec), plan, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(back), x)
    # inverse alone vs oracle
    got = rn.intt_ring_sharded_pallas(mesh, xj, plan, interpret=True)
    np.testing.assert_array_equal(got, ntt.np_ntt_inverse(x, plan))


def test_sharded_galois_many_and_ks_linear_ext(rng):
    """The round-4 serving builders under the (rns x data) mesh: hoisted
    rotation batch (build_galois_many) and extended-modulus linear
    re-encryption (build_key_switch_linear_ext), each bit-exact vs its
    unsharded run (VERDICT r4 missing #3 — every serving builder gets a
    sharded correctness leg)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from lol_tpu import gadget as gd, she
    from lol_tpu.she_batched import BatchedBGV

    m, nrns, B = 256, 2, 8
    all_qs = tuple(nt.ntt_primes(m, 30, nrns + 2))
    qs = all_qs[:nrns]
    params = she.SHEParams(m=m, p=257, qs=qs, var=2.0)
    sk = she.gen_sk(params, jax.random.PRNGKey(90))
    bb = BatchedBGV(params, use_pallas=False)
    n = params.ctx.n
    msgs = rng.integers(0, params.p, (n, B)).astype(np.int32)
    c0, c1 = bb.build_encrypt(sk)(jnp.asarray(msgs), jax.random.PRNGKey(91))

    mesh = sh.make_mesh({"rns": 2, "data": 4})
    spec = NamedSharding(mesh, P("rns", None, "data"))
    c0s, c1s = (jax.device_put(x, spec) for x in (c0, c1))

    # hoisted rotations: one shared decompose, three sigma_k outputs
    ks = (3, 5, 7)
    ghints = {k: bb.gen_galois_hint(k, sk, jax.random.fold_in(
        jax.random.PRNGKey(92), k)) for k in ks}
    outs_s = bb.build_galois_many(ghints, mesh=mesh)(c0s, c1s)
    outs = bb.build_galois_many(ghints)(c0, c1)
    for k in ks:
        np.testing.assert_array_equal(np.asarray(outs_s[k][0]),
                                      np.asarray(outs[k][0]))
        np.testing.assert_array_equal(np.asarray(outs_s[k][1]),
                                      np.asarray(outs[k][1]))

    # extended-modulus linear re-encryption: digits over Q*P + P-drop
    sk_new = she.gen_sk(params, jax.random.PRNGKey(93))
    lhx = bb.gen_ks_linear_hint_ext(sk_new, sk, all_qs[nrns:],
                                    jax.random.PRNGKey(94))
    l0s, l1s = bb.build_key_switch_linear_ext(lhx, mesh=mesh)(c0s, c1s)
    l0, l1 = bb.build_key_switch_linear_ext(lhx)(c0, c1)
    np.testing.assert_array_equal(np.asarray(l0s), np.asarray(l0))
    np.testing.assert_array_equal(np.asarray(l1s), np.asarray(l1))
    # and the re-encrypted batch still decrypts under the new key
    got = np.asarray(bb.build_decrypt(sk_new)(l0, l1))
    np.testing.assert_array_equal(got, msgs)


def test_sharded_serving_rounding_chain(rng):
    """The full serving orchestration under a mesh (r5): every stage of
    serving.build_pt_round compiles mesh-aware and the data-sharded
    batch round-trips bit-exactly vs the unsharded chain.  Batch
    ('data') sharding is the chain's serving axis — the modulus chain
    shrinks stage by stage, so an 'rns' axis only divides the early
    prefixes (documented in build_pt_round)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from lol_tpu import gadget as gd, serving, she
    from lol_tpu.she_batched import BatchedBGV

    p = 8
    qs = tuple(nt.ntt_primes(64, 30, she.pt_round_mults(p) + 2))
    params = she.SHEParams(m=32, p=p, qs=qs, var=2.0)
    sk = she.gen_sk(params, jax.random.PRNGKey(96))
    rh = she.pt_round_hints(sk, gd.RnsGad(), jax.random.PRNGKey(97))
    bb = BatchedBGV(params)
    n, B = params.ctx.n, 8
    vals = rng.integers(0, p, B)
    msgs = np.zeros((n, B), dtype=np.int32)
    msgs[0] = vals
    c0, c1 = bb.build_encrypt(sk)(jnp.asarray(msgs), jax.random.PRNGKey(98))

    mesh = sh.make_mesh({"rns": 1, "data": 8})
    spec = NamedSharding(mesh, P("rns", None, "data"))
    c0s, c1s = (jax.device_put(x, spec) for x in (c0, c1))
    run_s, bb_out, f_out = serving.build_pt_round(bb, rh, mesh=mesh)
    y0s, y1s = run_s(c0s, c1s)
    run, bb_out2, f_out2 = serving.build_pt_round(bb, rh)
    y0, y1 = run(c0, c1)
    assert bb_out.params.qs == bb_out2.params.qs and f_out == f_out2
    np.testing.assert_array_equal(np.asarray(y0s), np.asarray(y0))
    np.testing.assert_array_equal(np.asarray(y1s), np.asarray(y1))
    # and the sharded output decrypts to the rounded digits
    sk_out = she.SK(bb_out.params, sk.s_ints, sk.var)
    got = np.asarray(bb_out.build_decrypt(sk_out, f=f_out)(y0s, y1s))
    want = ((2 * vals * 2 + p) // (2 * p)) % 2
    np.testing.assert_array_equal(got[0], want)
    assert not got[1:].any()
