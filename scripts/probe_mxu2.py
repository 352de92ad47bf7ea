"""Round-5 probe #2: where do the 47 us/visit go?

probe_mxu.py measured 0.35 TFLOP/s for per-visit (16,TT)x(16,R) dots in
a fori_loop — 25x below the K-utilization-derated MXU estimate.  Vary
one factor at a time: tile size, dynamic-slice read, reduce style,
matmul orientation, loop style.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 4096
HI = jax.lax.Precision.HIGHEST


def timed(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def run(name, kernel, tt, n_visits, blocks=8, n_tiles=64):
    tab = jnp.asarray(np.random.default_rng(0).normal(
        size=(n_tiles * 16, tt)).astype(np.float32))
    feats = jnp.asarray(np.random.default_rng(1).normal(
        size=(blocks * 16, R)).astype(np.float32))
    fblk = pl.BlockSpec((16, R), lambda i: (i, 0), memory_space=pltpu.VMEM)
    oblk = pl.BlockSpec((8, R), lambda i: (i, 0), memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        functools.partial(kernel, n_visits=n_visits, n_tiles=n_tiles,
                          tt=tt),
        grid=(blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), fblk],
        out_specs=oblk,
        out_shape=jax.ShapeDtypeStruct((blocks * 8, R), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    dt = timed(jax.jit(fn), tab, feats)
    visits = blocks * n_visits
    flops = visits * 2 * 16 * tt * R
    print(f"{name:42s} TT={tt:4d}: {dt*1e3:7.2f} ms "
          f"{dt/visits*1e6:7.2f} us/visit "
          f"{flops/dt/1e12:6.2f} TFLOP/s")


def k_full(tab_ref, f_ref, o_ref, *, n_visits, n_tiles, tt):
    """dyn-slice + dot + min-reduce + acc (the probe#1 shape)."""
    f = f_ref[...]

    def body(i, acc):
        row = (i * 7) % n_tiles
        tile = tab_ref[pl.ds(row * 16, 16), :]
        out = jax.lax.dot_general(tile, f, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32,
                                  precision=HI)
        return jnp.minimum(acc, jnp.broadcast_to(
            jnp.min(out, axis=0, keepdims=True), (8, R)))

    o_ref[...] = jax.lax.fori_loop(0, n_visits, body,
                                   jnp.full((8, R), 3e38, jnp.float32))


def k_static_tile(tab_ref, f_ref, o_ref, *, n_visits, n_tiles, tt):
    """same but STATIC tile read (isolates the dynamic slice)."""
    f = f_ref[...]
    tile = tab_ref[0:16, :]

    def body(i, acc):
        out = jax.lax.dot_general(tile, f, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32,
                                  precision=HI)
        return jnp.minimum(acc, jnp.broadcast_to(
            jnp.min(out, axis=0, keepdims=True), (8, R)))

    o_ref[...] = jax.lax.fori_loop(0, n_visits, body,
                                   jnp.full((8, R), 3e38, jnp.float32))


def k_no_reduce(tab_ref, f_ref, o_ref, *, n_visits, n_tiles, tt):
    """dyn-slice + dot, accumulate one row (isolates the min-reduce)."""
    f = f_ref[...]

    def body(i, acc):
        row = (i * 7) % n_tiles
        tile = tab_ref[pl.ds(row * 16, 16), :]
        out = jax.lax.dot_general(tile, f, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32,
                                  precision=HI)
        return jnp.minimum(acc, out[0:8])

    o_ref[...] = jax.lax.fori_loop(0, n_visits, body,
                                   jnp.full((8, R), 3e38, jnp.float32))


def k_rays_major(tab_ref, f_ref, o_ref, *, n_visits, n_tiles, tt):
    """orientation flip: (R,16)x(16,TT) -> (R,TT); lane-dim reduce."""
    # build a (R,16) matrix once outside the loop via transpose
    ft = jnp.transpose(f_ref[...], (1, 0))     # (R, 16)

    def body(i, acc):
        row = (i * 7) % n_tiles
        tile = tab_ref[pl.ds(row * 16, 16), :]
        out = jax.lax.dot_general(ft, tile, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32,
                                  precision=HI)   # (R, TT)
        m = jnp.min(out, axis=1, keepdims=True)   # (R, 1)
        return jnp.minimum(acc, jnp.broadcast_to(
            m.reshape(1, R), (8, R)))             # incl. the relayout

    o_ref[...] = jax.lax.fori_loop(0, n_visits, body,
                                   jnp.full((8, R), 3e38, jnp.float32))


def k_batched8(tab_ref, f_ref, o_ref, *, n_visits, n_tiles, tt):
    """8 tiles per dot: (16, 8*TT) one wide matmul per loop step."""
    f = f_ref[...]

    def body(i, acc):
        row = (i * 7) % (n_tiles // 8)
        tile = tab_ref[pl.ds(row * 128, 128), :]  # 8 tiles stacked
        wide = jnp.concatenate([tile[k * 16:(k + 1) * 16] for k in
                                range(8)], axis=1)  # (16, 8*TT)
        out = jax.lax.dot_general(wide, f, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32,
                                  precision=HI)
        return jnp.minimum(acc, jnp.broadcast_to(
            jnp.min(out, axis=0, keepdims=True), (8, R)))

    o_ref[...] = jax.lax.fori_loop(0, n_visits // 8, body,
                                   jnp.full((8, R), 3e38, jnp.float32))


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    run("full (dyn slice+dot+reduce)", k_full, 128, 64)
    run("full (dyn slice+dot+reduce)", k_full, 512, 16)
    run("static tile", k_static_tile, 128, 64)
    run("no cross-sublane reduce", k_no_reduce, 128, 64)
    run("rays-major (R,16)x(16,TT)", k_rays_major, 128, 64)
    run("8-tiles-per-dot wide", k_batched8, 128, 64)
