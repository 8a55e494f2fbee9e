"""Pallas NTT kernel (interpreter mode on CPU) vs jnp/numpy paths — bit-exact."""

import numpy as np
import pytest
import jax.numpy as jnp

from lol_tpu import numtheory as nt, zq
from lol_tpu.ops import ntt
from lol_tpu.ops.pallas import ntt_kernel as pk

CASES = [(256, nt.ntt_primes(512, 30, 1)[0]), (1024, 12289)]


@pytest.mark.parametrize("n,q", CASES)
@pytest.mark.parametrize("inverse", [False, True])
def test_pallas_matches_numpy(n, q, inverse, rng):
    plan = ntt.ntt_plan(n, q)
    B = 128
    a = rng.integers(0, q, (B, n), dtype=np.uint64).astype(np.uint32)
    got = np.asarray(pk.ntt_batched(jnp.asarray(a), plan, inverse=inverse, interpret=True))
    want = ntt.np_ntt_inverse(a, plan) if inverse else ntt.np_ntt_forward(a, plan)
    np.testing.assert_array_equal(got, want)


def test_pallas_cm_roundtrip(rng):
    n, q = 256, 12289
    plan = ntt.ntt_plan(n, q)
    a = rng.integers(0, q, (n, 128), dtype=np.uint64).astype(np.uint32)
    fwd = pk.ntt_cm(jnp.asarray(a), plan, interpret=True)
    back = pk.ntt_cm(fwd, plan, inverse=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(back), a)


@pytest.mark.parametrize("window", [128, 256, 1024])
def test_window_override_matches_default(window, rng):
    """The tS window knob (small-batch sweep harness) changes only the
    cross/block stage split — results stay bit-exact vs the default
    split and the numpy oracle, both directions."""
    n, q = 1024, 12289
    plan = ntt.ntt_plan(n, q)
    a = rng.integers(0, q, (n, 128), dtype=np.uint64).astype(np.uint32)
    fwd = pk.ntt_cm(jnp.asarray(a), plan, interpret=True, window=window)
    np.testing.assert_array_equal(
        np.asarray(fwd), ntt.np_ntt_forward(a.T, plan).T
    )
    back = pk.ntt_cm(fwd, plan, inverse=True, interpret=True, window=window)
    np.testing.assert_array_equal(np.asarray(back), a)


def test_pallas_nonmultiple_batch_padding(rng):
    n, q = 256, 12289
    plan = ntt.ntt_plan(n, q)
    a = rng.integers(0, q, (3, n), dtype=np.uint64).astype(np.uint32)
    got = np.asarray(pk.ntt_batched(jnp.asarray(a), plan, interpret=True))
    np.testing.assert_array_equal(got, ntt.np_ntt_forward(a, plan))


@pytest.mark.parametrize("inverse", [False, True])
def test_lazy_matches_exact_at_max_modulus(inverse, rng):
    """Harvey lazy-reduction path == fully-reduced path, bit-exact, at a
    modulus near 2^30 (the tight end of the 4q < 2^32 range proof)."""
    n = 512
    q = nt.ntt_primes(2 * n, 30, 1)[0]
    plan = ntt.ntt_plan(n, q)
    a = rng.integers(0, q, (n, 128), dtype=np.uint64).astype(np.uint32)
    a[0, :] = q - 1  # extremal residues stress the [0, 4q) bound
    a = jnp.asarray(a)
    exact = pk.ntt_cm(a, plan, inverse=inverse, interpret=True, lazy=False)
    lazy = pk.ntt_cm(a, plan, inverse=inverse, interpret=True, lazy=True)
    np.testing.assert_array_equal(np.asarray(exact), np.asarray(lazy))


@pytest.mark.parametrize("inverse", [False, True])
@pytest.mark.parametrize("radix", [4, 8, 16])
def test_fused_radix_matches_radix2(inverse, radix, rng):
    n, q = 1024, 12289
    plan = ntt.ntt_plan(n, q)
    a = jnp.asarray(rng.integers(0, q, (n, 128), dtype=np.uint64).astype(np.uint32))
    r2 = pk.ntt_cm(a, plan, inverse=inverse, interpret=True, radix=2)
    rr = pk.ntt_cm(a, plan, inverse=inverse, interpret=True, radix=radix)
    np.testing.assert_array_equal(np.asarray(r2), np.asarray(rr))


@pytest.mark.parametrize("inverse", [False, True])
@pytest.mark.parametrize("B", [256, 512])
def test_wide_lane_tiles_match_numpy(B, inverse, rng):
    """ADVICE r2: the TILE(128)->lanes in-kernel concat widening only
    fires at lanes > 128 — exercise it in interpreter mode at B=256/512
    (auto-selected lane tiles 256/512) against the numpy oracle."""
    n, q = 512, nt.ntt_primes(1024, 30, 1)[0]
    plan = ntt.ntt_plan(n, q)
    a = rng.integers(0, q, (n, B), dtype=np.uint64).astype(np.uint32)
    got = np.asarray(pk.ntt_cm(jnp.asarray(a), plan, inverse=inverse,
                               interpret=True))
    want = (ntt.np_ntt_inverse(a.T, plan) if inverse
            else ntt.np_ntt_forward(a.T, plan)).T
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("B", [128, 512])
def test_pre_digit_prologue_matches_redigit(B, rng):
    """ADVICE r2: ntt_cm(..., pre_digit_q=q_src) == _redigit then the
    staged XLA forward NTT, bit-exact (the fused RNS-gadget digit
    re-expansion prologue; covers both the 128-lane and widened paths).
    n=2048 > WINDOW so the prologue runs in the cross kernel (S > 0),
    the fused step's real shape."""
    n = 2048
    q_src, q = nt.ntt_primes(2 * n, 30, 2)
    plan = ntt.ntt_plan(n, q)
    a = rng.integers(0, q_src, (n, B), dtype=np.uint64).astype(np.uint32)
    a[0, :] = q_src - 1  # extremal residues stress the centering branch
    got = np.asarray(
        pk.ntt_cm(jnp.asarray(a), plan, pre_digit_q=q_src, interpret=True)
    )
    r = pk._redigit(jnp.asarray(a), q_src, q)
    want = np.asarray(
        jnp.moveaxis(ntt.ntt_forward_stages(jnp.moveaxis(r, 0, -1), plan), -1, 0)
    )
    np.testing.assert_array_equal(got, want)


def test_sub_tile_lanes(rng):
    """ADVICE r2: an explicit lanes argument below the 128 native tile
    ships correspondingly narrow twiddle tables (no widening, no crash)."""
    n, q = 256, 12289
    plan = ntt.ntt_plan(n, q)
    a = rng.integers(0, q, (n, 64), dtype=np.uint64).astype(np.uint32)
    got = np.asarray(
        pk.ntt_cm(jnp.asarray(a), plan, lanes=64, interpret=True)
    )
    np.testing.assert_array_equal(got, ntt.np_ntt_forward(a.T, plan).T)


@pytest.mark.parametrize("B", [128, 256])
def test_pointwise_ct_mul_matches_xla(B, rng):
    """Fused elementwise ct_mul kernel == the XLA channel math, bit-exact
    (SURVEY native component 10 — zipWithT as a fused VMEM kernel)."""
    from lol_tpu.ops.pallas import pointwise as pw

    n, q = 512, nt.ntt_primes(1024, 30, 1)[0]
    arrs = [
        jnp.asarray(rng.integers(0, q, (n, B), dtype=np.uint64).astype(np.uint32))
        for _ in range(4)
    ]
    c0, c1, d0, d1 = arrs
    e0, e1, e2 = pw.ct_mul_cm(c0, c1, d0, d1, q, interpret=True)
    np.testing.assert_array_equal(np.asarray(e0), np.asarray(zq.mul_mod(c0, d0, q)))
    np.testing.assert_array_equal(
        np.asarray(e1),
        np.asarray(zq.add_mod(zq.mul_mod(c0, d1, q), zq.mul_mod(c1, d0, q), q)),
    )
    np.testing.assert_array_equal(np.asarray(e2), np.asarray(zq.mul_mod(c1, d1, q)))


@pytest.mark.parametrize("window", [64, 512])
@pytest.mark.parametrize("radix", [2, 8, 16, 32])
def test_dit_inverse_matches_numpy(window, radix, rng):
    """The route-B inverse (DIT-bitrev-input + twist + per-row scale,
    ntt_cm alg='dit') == numpy oracle == the GS route, bit-exact, over
    the window/radix grid incl. the single-call S=0 shape, at a modulus
    near 2^30 (lazy range proof), lazy AND exact forms."""
    n = 512
    q = nt.ntt_primes(2 * n, 30, 1)[0]
    plan = ntt.ntt_plan(n, q)
    a = rng.integers(0, q, (n, 128), dtype=np.uint64).astype(np.uint32)
    a[0, :] = q - 1  # extremal residues stress the [0, 4q) bound
    want = ntt.np_ntt_inverse(a.T, plan).T
    aj = jnp.asarray(a)
    for lazy in (True, False):
        got = pk.ntt_cm(aj, plan, inverse=True, alg="dit", window=window,
                        radix=radix, lazy=lazy, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), want)


def test_dit_inverse_rejects_forward():
    n, q = 256, 12289
    plan = ntt.ntt_plan(n, q)
    a = jnp.zeros((n, 128), dtype=jnp.uint32)
    with pytest.raises(ValueError, match="inverse-only"):
        pk.ntt_cm(a, plan, alg="dit", interpret=True)
