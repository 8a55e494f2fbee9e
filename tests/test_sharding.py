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
