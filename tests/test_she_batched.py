"""Batched BGV pipeline vs the object-level path — column-wise bit-exact."""

import numpy as np
import pytest
import jax

from lol_tpu import gadget as gd
from lol_tpu import numtheory as nt
from lol_tpu import she
from lol_tpu.cyc import Rep
from lol_tpu.she_batched import BatchedBGV

M = 64
QS = tuple(nt.ntt_primes(M, 30, 3))
PARAMS = she.SHEParams(m=M, p=257, qs=QS, var=2.0)


def test_batched_step_matches_object_path(rng):
    key = jax.random.PRNGKey(0)
    ks, kh, *kes = jax.random.split(key, 2 + 8)
    sk = she.gen_sk(PARAMS, ks)
    hint = she.ks_quad_circ_hint(sk, gd.RnsGad(), kh)
    B = 4
    cts_a, cts_b, msgs = [], [], []
    for b in range(B):
        m1, m2 = she.pt_random(PARAMS, rng), she.pt_random(PARAMS, rng)
        cts_a.append(she.encrypt(sk, m1, kes[2 * b]))
        cts_b.append(she.encrypt(sk, m2, kes[2 * b + 1]))
        msgs.append((m1, m2))

    bb = BatchedBGV(PARAMS)
    c0, c1 = bb.pack(cts_a)
    d0, d1 = bb.pack(cts_b)
    step = bb.build_step(hint)
    e0, e1 = step(c0, c1, d0, d1)

    params2 = she.SHEParams(m=M, p=PARAMS.p, qs=QS[:-1], var=PARAMS.var)
    bb2 = BatchedBGV(params2)
    f2 = nt.modinv(QS[-1] % PARAMS.p, PARAMS.p)
    outs = bb2.unpack((e0, e1), f=f2)
    sk2 = she.SK(params2, sk.s_ints, sk.var)

    for b in range(B):
        # object-level reference pipeline
        ref = she.mod_switch(
            she.key_switch_quad_circ(hint, she.ct_mul(cts_a[b], cts_b[b]))
        )
        # bit-exact ciphertext components
        for k in range(2):
            np.testing.assert_array_equal(
                np.asarray(outs[b].cs[k].data),
                np.asarray(ref.cs[k].to_crt().data),
            )
        assert outs[b].f == ref.f
        # and correct decryption
        m1, m2 = msgs[b]
        np.testing.assert_array_equal(
            she.decrypt(sk2, outs[b]), she.pt_mul(PARAMS, m1, m2)
        )


def test_batched_encrypt_decrypts(rng):
    key = jax.random.PRNGKey(3)
    sk = she.gen_sk(PARAMS, jax.random.PRNGKey(4))
    bb = BatchedBGV(PARAMS)
    enc = bb.build_encrypt(sk)
    B = 3
    msgs = rng.integers(0, PARAMS.p, (PARAMS.ctx.n, B)).astype(np.int32)
    import jax.numpy as jnp

    c0, c1 = enc(jnp.asarray(msgs), key)
    cts = bb.unpack((c0, c1))
    for b in range(B):
        np.testing.assert_array_equal(she.decrypt(sk, cts[b]), msgs[:, b])
    # determinism
    d0, d1 = enc(jnp.asarray(msgs), key)
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(d0))
