"""Fused elementwise Pallas kernels for pointwise ring ops.

SURVEY §3.9 native component 10: the reference's `zipWithT` C loops ->
fused VMEM elementwise kernels, available as standalone primitives.

A/B verdict (v5e, n=2^14, B=1024): the BGV step does NOT use this —
wiring ct_mul_cm into build_step measured the whole step ~9% SLOWER
than the XLA-emitted Hadamards (XLA schedules the elementwise chains
around the opaque Pallas NTT custom calls; a standalone kernel
serializes against them, and its in-isolation advantage is smaller
than that overlap).  Kept as the fused primitive for contexts without
adjacent custom calls, and as the documented zipWithT analog.

Arithmetic is the exact same `zq.mul_mod`/`add_mod` u32 code as the XLA
path — bit-identical results (asserted by the interpret-mode test and
by the step's object-path equality tests).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ... import zq


def _ct_mul_kernel(c0_ref, c1_ref, d0_ref, d1_ref, e0_ref, e1_ref, e2_ref,
                   *, q):
    a0, a1 = c0_ref[...], c1_ref[...]
    b0, b1 = d0_ref[...], d1_ref[...]
    e0_ref[...] = zq.mul_mod(a0, b0, q)
    e1_ref[...] = zq.add_mod(
        zq.mul_mod(a0, b1, q), zq.mul_mod(a1, b0, q), q
    )
    e2_ref[...] = zq.mul_mod(a1, b1, q)


@lru_cache(maxsize=512)
def _build_ct_mul(q: int, n: int, B: int, interpret: bool):
    # 4 inputs + 3 outputs + the Barrett mulhi temporaries are all live
    # at once: (512, 512) blocks blew the 16MB scoped-VMEM stack (29MB);
    # (128, 512) keeps the stack ~7MB
    R = min(n, 256)
    L = next((w for w in (512, 256, 128) if B % w == 0), B)
    grid = (n // R, B // L)
    spec = pl.BlockSpec((R, L), lambda i, j: (i, j), memory_space=pltpu.VMEM)

    @jax.jit
    def run(c0, c1, d0, d1):
        return pl.pallas_call(
            partial(_ct_mul_kernel, q=q),
            out_shape=tuple(
                jax.ShapeDtypeStruct((n, B), jnp.uint32) for _ in range(3)
            ),
            grid=grid,
            in_specs=[spec] * 4,
            out_specs=(spec,) * 3,
            interpret=interpret,
        )(c0, c1, d0, d1)

    return run


def ct_mul_cm(c0, c1, d0, d1, q: int, interpret: bool = False):
    """(n, B) single-channel degree-2 ciphertext component convolution:
    -> (e0, e1, e2) = (c0 d0, c0 d1 + c1 d0, c1 d1) mod q, one fused
    kernel (4 reads + 3 writes total).  Requires 128 | B and 8 | n."""
    n, B = c0.shape
    return _build_ct_mul(q, n, B, interpret)(c0, c1, d0, d1)
