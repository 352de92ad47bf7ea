"""Round-5 probe #3: verify probe#2's suspicious 99 TFLOP/s and bisect
probe#1 (47 us/visit) vs probe#2 (0.17 us/visit): n_tiles? second
output? correctness?"""
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
    return float(np.median(ts)), out


def k_full(tab_ref, f_ref, o_ref, *, n_visits, n_tiles, tt):
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


def run(name, tt, n_visits, blocks=8, n_tiles=64):
    tab = jnp.asarray(np.random.default_rng(0).normal(
        size=(n_tiles * 16, tt)).astype(np.float32))
    feats = jnp.asarray(np.random.default_rng(1).normal(
        size=(blocks * 16, R)).astype(np.float32))
    fblk = pl.BlockSpec((16, R), lambda i: (i, 0), memory_space=pltpu.VMEM)
    oblk = pl.BlockSpec((8, R), lambda i: (i, 0), memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        functools.partial(k_full, n_visits=n_visits, n_tiles=n_tiles,
                          tt=tt),
        grid=(blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), fblk],
        out_specs=oblk,
        out_shape=jax.ShapeDtypeStruct((blocks * 8, R), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    dt, out = timed(jax.jit(fn), tab, feats)
    visits = blocks * n_visits
    flops = visits * 2 * 16 * tt * R
    print(f"{name:34s} TT={tt:4d} V={n_visits:3d} tiles={n_tiles:4d}: "
          f"{dt*1e3:7.2f} ms {dt/visits*1e6:7.2f} us/visit "
          f"{flops/dt/1e12:6.2f} TFLOP/s")
    return np.asarray(out), np.asarray(tab), np.asarray(feats)


def check_correct(out, tab, feats, n_visits, n_tiles, blocks=8):
    ok = True
    for b in range(blocks):
        f = feats[b * 16:(b + 1) * 16].astype(np.float64)  # (16, R)
        acc = np.full(R, 3e38)
        for i in range(n_visits):
            row = (i * 7) % n_tiles
            tile = tab[row * 16:(row + 1) * 16].astype(np.float64)
            o = tile.T @ f
            acc = np.minimum(acc, o.min(axis=0))
        got = out[b * 8]
        rel = np.abs(got - acc) / np.maximum(np.abs(acc), 1e-3)
        if rel.max() > 1e-4:
            ok = False
            print(f"  block {b}: MAX REL ERR {rel.max():.2e}")
    print("  correctness:", "OK" if ok else "FAIL")


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    out, tab, feats = run("v2 repro", 128, 64, n_tiles=64)
    check_correct(out, tab, feats, 64, 64)
    run("more tiles", 128, 64, n_tiles=512)
    run("probe1 shape (V=64, tiles=512)", 128, 64, n_tiles=512)
    run("more visits", 128, 512, n_tiles=64)
    run("more visits+tiles", 128, 512, n_tiles=512)
