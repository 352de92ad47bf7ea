"""Round-5 probe: fundamentals of the ray-major MXU leaf-test path.

The r4 profile (docs/PROFILE_bathroom_r4.md) names "ray-major MXU leaf
testing" as the next machine-mapping lever: the constant-form
Moller-Trumbore is linear in 10 per-ray features [d, o, G=o x d, 1], so
det / t*det / u*det / v*det for a whole treelet of triangles is a
(16, T) constants tile contracted against (16, R) ray features — MXU
work instead of the scalar-loop VPU unroll.

Before building the kernel, measure the three unknowns that decide
whether it can win on a v5e:

  1. Mosaic matmul throughput at K=16 (the feature dim): the MXU is a
     128-deep systolic array, so K=16 nominally wastes 8x.  Measured
     effective FLOP/s for dot_general((16,T),(16,R)) in f32.
  2. f32 matmul PRECISION inside Pallas: if Mosaic lowers f32 dots to
     single-pass bf16 the barycentric tests are garbage (bf16 eps
     ~8e-3); needs ~1e-6 relative.
  3. The relayout cost between the traversal layout (32, 128) and the
     matmul layout (1, 4096) for per-ray state joins.

Run ON TPU: python scripts/probe_mxu.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 4096          # rays per block
TT = 128          # triangles per treelet tile
V = 64            # visits per block per kernel call


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


# ---------------------------------------------------------------- 1+2: matmul
def visit_kernel(tab_ref, f_ref, t_ref, o_ref, *, n_visits, n_tiles,
                 epilogue, precision):
    """Per grid program: n_visits leaf-style visits against a resident
    constants table; each visit = one (16,TT)x(16,R) dot (+ optional
    MT epilogue), accumulated into (1,R) state."""
    f = f_ref[...]                       # (16, R)

    def body(i, acc):
        row = (i * 7) % n_tiles          # pseudo-random tile walk
        tile = tab_ref[pl.ds(row * 16, 16), :]   # (16, TT)
        out = jax.lax.dot_general(
            tile, f, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision)  # (TT, R)
        if epilogue:
            # constant-form MT epilogue: rows of `out` are interleaved
            # blocks [det|tdet|udet|vdet] of TT/4 triangles
            q = TT // 4
            det, tdet, udet, vdet = (out[0:q], out[q:2 * q],
                                     out[2 * q:3 * q], out[3 * q:4 * q])
            sgn = jnp.where(det < 0.0, -1.0, 1.0)
            ad = det * sgn
            su = udet * sgn
            sv = vdet * sgn
            st = tdet * sgn
            t_b = acc
            hit = ((ad >= 1e-12) & (su >= 0.0) & (sv >= 0.0)
                   & (su + sv <= ad) & (st > 0.0) & (st < t_b * ad))
            cand = jnp.where(hit, st / jnp.where(hit, ad, 1.0), 3e38)
            return jnp.minimum(acc, jnp.broadcast_to(
                jnp.min(cand, axis=0, keepdims=True), (8, R)))
        return jnp.minimum(acc, jnp.broadcast_to(
            jnp.min(out, axis=0, keepdims=True), (8, R)))

    acc = jax.lax.fori_loop(0, n_visits, body,
                            jnp.full((8, R), 3e38, jnp.float32))
    t_ref[...] = acc
    o_ref[...] = jnp.broadcast_to(jnp.sum(f, axis=0, keepdims=True),
                                  (8, R))


def bench_matmul(n_tiles=512, epilogue=False, blocks=8,
                 precision=jax.lax.Precision.HIGHEST):
    tab = jnp.asarray(
        np.random.default_rng(0).normal(size=(n_tiles * 16, TT))
        .astype(np.float32))
    feats = jnp.asarray(
        np.random.default_rng(1).normal(size=(blocks * 16, R))
        .astype(np.float32))
    grid = (blocks,)
    fblk = pl.BlockSpec((16, R), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    oblk = pl.BlockSpec((8, R), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    tab_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        functools.partial(visit_kernel, n_visits=V, n_tiles=n_tiles,
                          epilogue=epilogue, precision=precision),
        grid=grid,
        in_specs=[tab_spec, fblk],
        out_specs=(oblk, oblk),
        out_shape=(jax.ShapeDtypeStruct((blocks * 8, R), jnp.float32),
                   jax.ShapeDtypeStruct((blocks * 8, R), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    dt, _ = timed(jax.jit(lambda t, f: fn(t, f)), tab, feats)
    flops = blocks * V * (2 * 16 * TT * R)
    label = ("matmul+epilogue" if epilogue else "matmul-only") \
        + f"[{str(precision).split('.')[-1]}]"
    print(f"{label}: {dt*1e3:.2f} ms for {blocks}x{V} visits "
          f"({dt/(blocks*V)*1e6:.2f} us/visit, "
          f"{flops/dt/1e12:.2f} TFLOP/s effective)")
    return dt


# ------------------------------------------------------------- 2: precision
def precision_check():
    rng = np.random.default_rng(2)
    a = (rng.normal(size=(16, TT)) * 100).astype(np.float32)
    b = (rng.normal(size=(16, R)) * 100).astype(np.float32)

    def k(a_ref, b_ref, o_ref, *, prec):
        o_ref[...] = jax.lax.dot_general(
            a_ref[...], b_ref[...], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)

    for prec in (jax.lax.Precision.DEFAULT, jax.lax.Precision.HIGHEST):
        out = pl.pallas_call(
            functools.partial(k, prec=prec),
            out_shape=jax.ShapeDtypeStruct((TT, R), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(jnp.asarray(a), jnp.asarray(b))
        ref = a.astype(np.float64).T @ b.astype(np.float64)
        rel = np.abs(np.asarray(out) - ref) / np.maximum(np.abs(ref), 1e-3)
        print(f"pallas f32 dot [{prec}] relative error: "
              f"median {np.median(rel):.2e} max {rel.max():.2e}")


# ------------------------------------------------------------- 3: relayout
def bench_relayout():
    def k(x_ref, o_ref, *, n_iter):
        x = x_ref[...]                       # (32, 128)

        def body(i, acc):
            wide = acc.reshape(1, 32 * 128)      # (1, 4096)
            wide = wide + 1.0
            return wide.reshape(32, 128)

        o_ref[...] = jax.lax.fori_loop(0, n_iter, body, x)

    blocks = 64
    x = jnp.zeros((blocks * 32, 128), jnp.float32)
    blk = pl.BlockSpec((32, 128), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    for n_iter in (1, 65):
        fn = pl.pallas_call(
            functools.partial(k, n_iter=n_iter), grid=(blocks,),
            in_specs=[blk], out_specs=blk,
            out_shape=jax.ShapeDtypeStruct((blocks * 32, 128),
                                           jnp.float32))
        dt, _ = timed(jax.jit(fn), x)
        print(f"relayout loop n={n_iter}: {dt*1e3:.3f} ms")


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    precision_check()
    bench_matmul(epilogue=False,
                 precision=jax.lax.Precision.DEFAULT)
    bench_matmul(epilogue=False)
    bench_matmul(epilogue=True)
    bench_relayout()
