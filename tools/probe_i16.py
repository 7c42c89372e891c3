"""Mosaic legalization probe: which int16 VECTOR ops lower on this chip?

Round-3 toolchain findings (ROADMAP.md) established that i16 vector
min/cmp and 16-bit lane rotates do NOT legalize, killing the
native-int16 SGM sweep and cost kernels. The cost kernel's RING/VSUM
stage, however, needs only ADD/SUB (+ a final cast) -- if `arith.addi`
on i16 vectors lowers, the ring scratch (the largest VMEM tenant of
kernels/costvol.py: (2*pad+2) * bb * D * W * 4 bytes today) halves,
buying bigger (bb, rps) tiles.

Each probe compiles + runs a toy kernel on the real backend and prints
OK / the Mosaic error class. Usage: python tools/probe_i16.py
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SHAPE = (8, 64, 256)  # (bb, D, W)-shaped tile, like the ring rows


def run(name, kernel, n_in, dtype=jnp.int16, shape=SHAPE):
    xs = [
        jnp.asarray(np.random.randint(0, 100, shape), dtype)
        for _ in range(n_in)
    ]
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(shape, dtype),
        )(*xs)
        out.block_until_ready()
        print(f"{name:28s} OK   (sum={int(jnp.sum(out.astype(jnp.int32)))})")
        return True
    except Exception as e:  # noqa: BLE001 - report the error class
        msg = str(e).split("\n")[0][:110]
        print(f"{name:28s} FAIL {type(e).__name__}: {msg}")
        return False


def main():
    print(f"backend: {jax.devices()[0]}")

    def k_add(a, b, o):
        o[...] = a[...] + b[...]

    def k_addsub(a, b, c, o):
        o[...] = a[...] + b[...] - c[...]

    def k_where(a, b, o):
        cols = jax.lax.broadcasted_iota(jnp.int32, a.shape, 2)
        o[...] = jnp.where(cols < 4, a[...], b[...])

    def k_cast_f32_i16(a, o):
        o[...] = (a[...].astype(jnp.float32) * 2.0).astype(jnp.int16)

    def k_cast_i16_f32_roll(a, o):
        f = a[...].astype(jnp.float32)
        o[...] = pltpu.roll(f, 1, axis=2).astype(jnp.int16)

    def k_shift(a, o):
        # ties-to-even halving needs right_shift + bitwise_and on i16
        half = jnp.right_shift(a[...], 1)
        o[...] = half + jnp.bitwise_and(a[...], jnp.asarray(1, jnp.int16))

    run("i16 add", k_add, 2)
    run("i16 add+sub (ring update)", k_addsub, 3)
    run("i16 select/where", k_where, 2)
    run("f32->i16 cast (round trip)", k_cast_f32_i16, 1)
    run("i16->f32 cast + roll", k_cast_i16_f32_roll, 1)
    run("i16 shift/and (halving)", k_shift, 1)


if __name__ == "__main__":
    main()
