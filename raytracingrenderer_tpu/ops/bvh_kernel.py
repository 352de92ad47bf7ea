"""Pallas TPU kernel: packet BVH traversal (closest-hit + any-hit).

TPU-native re-design of the reference's per-thread recursive BVH walk
(/root/reference/RTBase/Geometry.h:399-462).  A vector machine has no
efficient per-lane gather, so per-ray independent tree walks (the GPU
idiom) do not map; instead each grid program traverses the tree ONCE for
a whole block of rays — scalar control flow over a shared stack, vector
data flow over the ray block:

- Only INTERNAL nodes exist in the walk: each row stores both children's
  bounds and child codes (internal row index, or ~leaf row), so one
  visit = one row, two AABB tests against every ray in the block (scalar
  bounds broadcast against (sub, 128) ray component registers — pure
  VPU, zero gathers), then descend into the near child and push the far
  one only on a true fork.
- Leaves are consumed inline without touching the stack: one leaf = one
  full 128-lane row holding up to 14 triangles (9 floats each, empty
  slots zeroed so their degenerate determinant can never hit) plus the
  leaf's base triangle index; the dense masked Moller-Trumbore unroll is
  the same form as ops/mt_kernel.py.
- Near/far ordering is the classic direction-sign heuristic: the build
  packs each node's split axis and which child sits lower along it; the
  kernel compares against the ray block's mean direction sign — no
  per-visit reductions for ordering.
- Per-ray predication rides in the traversal state itself: the current
  subtree's per-ray box-entry distance `t_entry` (+inf where the ray
  missed).  The live mask is `t_entry < t_best`, which re-prunes against
  the *fresh* per-ray best distance at every step for free.

Memory layout note: Mosaic stores every (N, k) VMEM array padded to 128
lanes (512 bytes/row for f32), so narrow per-triangle tables waste 14x —
both tables here therefore pack full rows: nodes (I, 16) f32 (codes
stored as exactly-representable f32 integers) and leaves (L, 128) f32.
Total footprint is ~(I + L) * 512 B, ~40 MB for the 331k-triangle
bathroom scene, against the chip's 128 MB VMEM.  Scalar reads use
dynamic-sublane indexing, the one dynamic-scalar-read form Mosaic
supports.

Any-hit reuses the kernel with occluded rays' t_best forced negative so
every mask test drops them, plus a whole-block early exit.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.vec import V3
from ..geometry.intersect import BIG_T, DET_EPS, Hit
from ..scene.types import BVH, Triangles

RAY_SUB = 32            # sublane rows per ray block (tunable)
RAY_LANE = 128
MAX_STACK = 64          # >= tree depth; binned SAH depth ~ 2*log2(B)
INF = 3.0e38            # plain float: jnp scalars can't be captured
SLOTS = 14              # triangles per leaf row: 14*9 = 126 <= 126 lanes
LANE_START = 126        # leaf row lane holding the base triangle index
LANE_COUNT = 127        # leaf row lane holding the slot count


def _kernel(nodes_ref, leaf_ref,
            ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, t0_ref,
            t_ref, tri_ref, u_ref, v_ref,
            tstack_ref, nstack_ref,
            *, init_code: int, max_iters: int, any_hit: bool,
            ray_sub: int, leaf16: bool):
    blk = (ray_sub, RAY_LANE)
    ox = ox_ref[...]
    oy = oy_ref[...]
    oz = oz_ref[...]
    dx = dx_ref[...]
    dy = dy_ref[...]
    dz = dz_ref[...]
    ix = 1.0 / jnp.where(jnp.abs(dx) < 1e-20, 1e-20, dx)
    iy = 1.0 / jnp.where(jnp.abs(dy) < 1e-20, 1e-20, dy)
    iz = 1.0 / jnp.where(jnp.abs(dz) < 1e-20, 1e-20, dz)
    oix = ox * ix
    oiy = oy * iy
    oiz = oz * iz
    # per-block feature G = o x d for the constant-form leaf test
    gx = oy * dz - oz * dy
    gy = oz * dx - ox * dz
    gz = ox * dy - oy * dx
    # block mean direction sign, for the near-child heuristic
    sdx = jnp.sum(dx) > 0.0
    sdy = jnp.sum(dy) > 0.0
    sdz = jnp.sum(dz) > 0.0

    def slab(c0, t_b, m):
        """Children boxes of internal row c0 -> (te_l, te_r) per ray,
        +INF where missed/pruned.  One row: [llo lhi rlo rhi] x xyz."""
        def one(base):
            lox = nodes_ref[c0, base + 0]
            loy = nodes_ref[c0, base + 1]
            loz = nodes_ref[c0, base + 2]
            hix = nodes_ref[c0, base + 3]
            hiy = nodes_ref[c0, base + 4]
            hiz = nodes_ref[c0, base + 5]
            t0x = lox * ix - oix
            t1x = hix * ix - oix
            t0y = loy * iy - oiy
            t1y = hiy * iy - oiy
            t0z = loz * iz - oiz
            t1z = hiz * iz - oiz
            tmin = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                           jnp.minimum(t0y, t1y)),
                               jnp.minimum(t0z, t1z))
            tmax = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                           jnp.maximum(t0y, t1y)),
                               jnp.maximum(t0z, t1z))
            te = jnp.maximum(tmin, 0.0)
            ok = m & (tmax >= te) & (te < t_b)
            return jnp.where(ok, te, INF)

        return one(0), one(6)

    def leaf_test16(row, m, t_b, tri_b, u_b, v_b):
        """Constant-form MT over the leaf's slots (see pack_leaves16):
        ~42 VPU ops/slot vs ~65 for the raw (p0,e1,e2) form, with the
        o x d feature amortized per block.  Dense unroll on purpose: a
        per-slot scalar branch on the fill count was measured 50%
        SLOWER (Mosaic branch + vector-phi overhead,
        scripts/probe_kernel_ab.py r4)."""
        r0 = 2 * row
        r1 = r0 + 1
        base = leaf_ref[r1, LANE16_START].astype(jnp.int32)
        for k in range(SLOTS):
            rr = r0 if k < 8 else r1
            c = 16 * (k if k < 8 else k - 8)
            nx_ = leaf_ref[rr, c + 0]
            ny_ = leaf_ref[rr, c + 1]
            nz_ = leaf_ref[rr, c + 2]
            e1x = leaf_ref[rr, c + 3]
            e1y = leaf_ref[rr, c + 4]
            e1z = leaf_ref[rr, c + 5]
            e2x = leaf_ref[rr, c + 6]
            e2y = leaf_ref[rr, c + 7]
            e2z = leaf_ref[rr, c + 8]
            p1x = leaf_ref[rr, c + 9]
            p1y = leaf_ref[rr, c + 10]
            p1z = leaf_ref[rr, c + 11]
            p2x = leaf_ref[rr, c + 12]
            p2y = leaf_ref[rr, c + 13]
            p2z = leaf_ref[rr, c + 14]
            c0 = leaf_ref[rr, c + 15]
            det = -(dx * nx_ + dy * ny_ + dz * nz_)
            tp = ox * nx_ + oy * ny_ + oz * nz_ - c0          # t*det
            up = (gx * e2x + gy * e2y + gz * e2z
                  + dx * p2x + dy * p2y + dz * p2z)           # u*det
            vp = -(gx * e1x + gy * e1y + gz * e1z
                   + dx * p1x + dy * p1y + dz * p1z)          # v*det
            sgn = jnp.where(det < 0.0, -1.0, 1.0)
            ad = det * sgn                                    # |det|
            su = up * sgn
            sv = vp * sgn
            st = tp * sgn
            hit = (m & (ad >= DET_EPS) & (su >= 0.0) & (sv >= 0.0)
                   & (su + sv <= ad) & (st > 0.0) & (st < t_b * ad))
            if any_hit:
                # occluded rays' t_best goes negative: every later mask
                # and test predicate drops them automatically
                t_b = jnp.where(hit, -1.0, t_b)
                tri_b = jnp.where(hit, base + k, tri_b).astype(jnp.int32)
            else:
                r = 1.0 / jnp.where(hit, ad, 1.0)
                t_b = jnp.where(hit, st * r, t_b)
                tri_b = jnp.where(hit, base + k, tri_b).astype(jnp.int32)
                u_b = jnp.where(hit, su * r, u_b)
                v_b = jnp.where(hit, sv * r, v_b)
        return t_b, tri_b, u_b, v_b

    def leaf_test9(row, m, t_b, tri_b, u_b, v_b):
        """Raw-form MT over 9-float slots (pack_leaves): measured best
        for closest-hit, where the constant-form's extra scalar reads
        outweigh its op savings (+3%); any-hit uses leaf_test16 (-4%)."""
        base = leaf_ref[row, LANE_START].astype(jnp.int32)
        for k in range(SLOTS):
            c = 9 * k
            p0x = leaf_ref[row, c + 0]
            p0y = leaf_ref[row, c + 1]
            p0z = leaf_ref[row, c + 2]
            e1x = leaf_ref[row, c + 3]
            e1y = leaf_ref[row, c + 4]
            e1z = leaf_ref[row, c + 5]
            e2x = leaf_ref[row, c + 6]
            e2y = leaf_ref[row, c + 7]
            e2z = leaf_ref[row, c + 8]
            pvx = dy * e2z - dz * e2y
            pvy = dz * e2x - dx * e2z
            pvz = dx * e2y - dy * e2x
            det = e1x * pvx + e1y * pvy + e1z * pvz
            inv_det = jnp.where(jnp.abs(det) < DET_EPS, 0.0, 1.0 / det)
            tvx = ox - p0x
            tvy = oy - p0y
            tvz = oz - p0z
            uu = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
            qvx = tvy * e1z - tvz * e1y
            qvy = tvz * e1x - tvx * e1z
            qvz = tvx * e1y - tvy * e1x
            vv = (dx * qvx + dy * qvy + dz * qvz) * inv_det
            tt = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
            hit = (m & (jnp.abs(det) >= DET_EPS) & (uu >= 0.0)
                   & (vv >= 0.0) & (uu + vv <= 1.0) & (tt > 0.0)
                   & (tt < t_b))
            if any_hit:
                t_b = jnp.where(hit, -1.0, t_b)
                tri_b = jnp.where(hit, base + k, tri_b).astype(jnp.int32)
            else:
                t_b = jnp.where(hit, tt, t_b)
                tri_b = jnp.where(hit, base + k, tri_b).astype(jnp.int32)
                u_b = jnp.where(hit, uu, u_b)
                v_b = jnp.where(hit, vv, v_b)
        return t_b, tri_b, u_b, v_b

    leaf_test = leaf_test16 if leaf16 else leaf_test9

    def body(state):
        it, sp, have, code, te, t_b, tri_b, u_b, v_b = state
        # refill from the stack when the walk ran out of a subtree
        do_pop = jnp.logical_not(have)
        slot = jnp.maximum(sp - 1, 0)
        code = jnp.where(do_pop, nstack_ref[slot], code)
        te_mem = tstack_ref[pl.ds(slot * ray_sub, ray_sub), :]
        te = jnp.where(do_pop, te_mem, te)
        sp = jnp.where(do_pop, slot, sp)

        m = te < t_b
        # any-hit only: occluded rays drop out (t_b = -1), so whole
        # blocks go dead as the walk proceeds — a scalar liveness branch
        # per visit buys back their 2-slab/leaf-MT vector cost (-12% on
        # real NEE batches).  For closest-hit the branch overhead LOSES
        # ~12% (fully-pruned visits are rare before rays terminate), so
        # the guard is compiled out (scripts/probe_kernel_ab.py).
        m_any = jnp.any(m) if any_hit else jnp.bool_(True)
        is_leaf = code < 0

        # ---- leaf: dense unrolled MT over one full leaf row ------------
        leaf_row = jnp.maximum((-code) - 1, 0)
        t_b, tri_b, u_b, v_b = jax.lax.cond(
            is_leaf & m_any,
            lambda args: leaf_test(leaf_row, m, *args),
            lambda args: args,
            (t_b, tri_b, u_b, v_b))

        # ---- internal: both children from one row, ordered descent ----
        safe = jnp.maximum(code, 0)

        def live_inner(_):
            tel, ter = slab(safe, t_b, m & jnp.logical_not(is_leaf))
            return (tel, ter,
                    nodes_ref[safe, 12].astype(jnp.int32),
                    nodes_ref[safe, 13].astype(jnp.int32),
                    nodes_ref[safe, 14].astype(jnp.int32))

        def pruned(_):
            inf = jnp.full(blk, INF, jnp.float32)
            z = jnp.int32(0)
            return inf, inf, z, z, z

        if any_hit:
            tel, ter, lcode, rcode, ab = jax.lax.cond(
                m_any & jnp.logical_not(is_leaf), live_inner, pruned, 0)
        else:
            tel, ter, lcode, rcode, ab = live_inner(0)
        axis = ab & 3  # bit0..1: axis, bit2: left child lower on axis
        l_low = (ab & 4) > 0
        d_pos = jax.lax.select(axis == 0, sdx,
                               jax.lax.select(axis == 1, sdy, sdz))
        left_near = d_pos == l_low

        code_f = jnp.where(left_near, lcode, rcode)
        code_s = jnp.where(left_near, rcode, lcode)
        te_f = jnp.where(left_near, tel, ter)
        te_s = jnp.where(left_near, ter, tel)
        any_f = jnp.min(te_f) < INF
        any_s = jnp.min(te_s) < INF

        # fork: push the far child; else follow the single live child
        @pl.when(any_f & any_s)
        def _():
            nstack_ref[sp] = code_s
            tstack_ref[pl.ds(sp * ray_sub, ray_sub), :] = te_s

        sp = sp + (any_f & any_s).astype(jnp.int32)
        have = any_f | any_s
        code = jnp.where(any_f, code_f, code_s)
        te = jnp.where(any_f, te_f, te_s)
        if any_hit:
            # whole-block early exit once every ray is occluded
            done = jnp.max(t_b) < 0.0
            have = have & jnp.logical_not(done)
            sp = jnp.where(done, 0, sp)
        return it + 1, sp, have, code, te, t_b, tri_b, u_b, v_b

    def cond(state):
        it, sp, have, *_ = state
        return (have | (sp > 0)) & (it < jnp.int32(max_iters))

    init = (jnp.int32(0), jnp.int32(0), jnp.bool_(True),
            jnp.int32(init_code),
            jnp.zeros(blk, jnp.float32),          # root entry-t
            t0_ref[...],
            jnp.full(blk, -1, jnp.int32),
            jnp.zeros(blk, jnp.float32),
            jnp.zeros(blk, jnp.float32))
    out = jax.lax.while_loop(cond, body, init)
    _, _, _, _, _, t_b, tri_b, u_b, v_b = out
    t_ref[...] = t_b
    tri_ref[...] = tri_b
    u_ref[...] = u_b
    v_ref[...] = v_b


def widen(bvh: BVH) -> BVH:
    """Attach the 4-wide collapse to a binary BVH (host-side, load time).

    Each wide node absorbs a binary internal node plus its internal
    children: its children are the grandchildren (or leaf children) of
    the binary node, so one kernel visit tests up to 4 boxes and the
    scalar while_loop runs ~2x fewer iterations — the fixed per-visit
    cost (stack traffic, scalar reads, the leaf lax.cond) is what
    dominates incoherent-ray traversal (scripts/profile_bathroom.py).
    Children are sorted ascending by centroid along the axis of largest
    child-centroid spread, so near-to-far ordering per ray block is a
    single direction-sign test (same heuristic as the binary pack).

    Leaf rows are SHARED with the binary kernel: leaf ids here are the
    same cumsum-of-leaves indices pack_tables uses.
    """
    import numpy as np
    if isinstance(bvh.right, jax.core.Tracer):
        raise ValueError("widen() needs concrete arrays (call at load)")
    right = np.asarray(bvh.right)
    lo = np.asarray(bvh.lo)
    hi = np.asarray(bvh.hi)
    b = right.shape[0]
    is_int = right >= 0
    lid = np.cumsum(~is_int) - 1   # leaf-row id per binary node
    if b == 0 or not is_int[0]:
        # single-leaf root: no wide rows; one dummy all-empty row keeps
        # Mosaic away from zero-sized tables
        return bvh.replace_wide(
            np.full((1, 4), -1, np.int32), np.zeros((1, 4), np.int32),
            np.zeros(1, np.int32))

    def children_of(i):
        out = []
        for c in (i + 1, right[i]):
            if is_int[c]:
                out.extend((c + 1, right[c]))
            else:
                out.append(c)
        return out

    # preorder DFS assigns wide rows
    order = []
    wid_of = {}
    stack = [0]
    while stack:
        i = stack.pop()
        wid_of[i] = len(order)
        order.append(i)
        for c in reversed(children_of(i)):
            if is_int[c]:
                stack.append(c)
    w = len(order)
    wsel = np.full((w, 4), -1, np.int32)
    wcode = np.zeros((w, 4), np.int32)
    waxis = np.zeros(w, np.int32)
    for row, i in enumerate(order):
        cs = children_of(i)
        cen = (lo[cs] + hi[cs]) * 0.5           # (k, 3)
        axis = int(np.argmax(cen.max(0) - cen.min(0)))
        cs = [cs[j] for j in np.argsort(cen[:, axis], kind="stable")]
        waxis[row] = axis
        for k, c in enumerate(cs):
            wsel[row, k] = c
            wcode[row, k] = (wid_of[c] if is_int[c]
                             else -(int(lid[c]) + 1))
    return bvh.replace_wide(wsel, wcode, waxis)


def pack_leaves16(bvh: BVH, tris: Triangles) -> jax.Array:
    """(2L, 128) f32 leaf rows in CONSTANT-FORM: each slot stores the
    precomputed scalar-triple-product constants instead of raw
    (p0, e1, e2), so the kernel's per-slot Moller-Trumbore collapses
    from ~65 VPU ops to ~42 using the per-block feature G = o x d:

        det   = -(d . N),            N  = e1 x e2
        t*det =  o . N - c0,         c0 = p0 . N
        u*det =  G . e2 + d . P2,    P2 = p0 x e2
        v*det = -G . e1 - d . P1,    P1 = p0 x e1

    (identities det3(a,b,c) = a.(bxc) with G = o x d; u, v, t recover
    by one reciprocal of det on hit lanes).  16 consts/slot
    [N e1 e2 P1 P2 c0] -> slots 0-7 in row 2i (8*16 = 128 lanes),
    slots 8-13 in row 2i+1 (96 lanes) with the base triangle index and
    count at lanes 120/121.  Empty slots are all-zero: det == 0 fails
    the |det| >= eps predicate.
    """
    right = bvh.right
    b = right.shape[0]
    is_int = right >= 0
    n_leaf = (int(b) + 1) // 2
    leaf_ids = jnp.nonzero(~is_int, size=n_leaf, fill_value=0)[0]
    start = bvh.start[leaf_ids]
    count = bvh.count[leaf_ids]
    t_count = tris.count
    k = jnp.arange(SLOTS, dtype=jnp.int32)
    ti = jnp.clip(start[:, None] + k[None, :], 0, max(t_count - 1, 0))
    valid = k[None, :] < count[:, None]

    def stack3(v):
        return jnp.stack([v.x, v.y, v.z], axis=-1).astype(jnp.float32)

    p0 = stack3(tris.p0)
    e1 = stack3(tris.e1)
    e2 = stack3(tris.e2)
    n = jnp.cross(e1, e2)
    p1 = jnp.cross(p0, e1)
    p2 = jnp.cross(p0, e2)
    c0 = jnp.sum(p0 * n, axis=-1, keepdims=True)
    tri16 = jnp.concatenate([n, e1, e2, p1, p2, c0], axis=-1)  # (T, 16)
    g = jnp.where(valid[..., None], tri16[ti], 0.0)  # (L, SLOTS, 16)
    row_a = g[:, :8].reshape(n_leaf, 128)
    row_b = jnp.concatenate([
        g[:, 8:].reshape(n_leaf, 96),
        jnp.zeros((n_leaf, 24), jnp.float32),
        start.astype(jnp.float32)[:, None],
        count.astype(jnp.float32)[:, None],
        jnp.zeros((n_leaf, 6), jnp.float32)], axis=1)  # (L, 128)
    return jnp.stack([row_a, row_b], axis=1).reshape(2 * n_leaf, 128)


LANE16_START = 120   # row 2i+1 lane holding the base triangle index
LANE16_COUNT = 121


def pack_leaves(bvh: BVH, tris: Triangles) -> jax.Array:
    """(L, 128) f32 leaf rows: SLOTS triangles x 9 floats + base index +
    count; shared by the binary and wide node kernels."""
    right = bvh.right
    b = right.shape[0]
    is_int = right >= 0
    n_leaf = (int(b) + 1) // 2
    leaf_ids = jnp.nonzero(~is_int, size=n_leaf, fill_value=0)[0]
    start = bvh.start[leaf_ids]
    count = bvh.count[leaf_ids]
    t_count = tris.count
    k = jnp.arange(SLOTS, dtype=jnp.int32)
    ti = jnp.clip(start[:, None] + k[None, :], 0, max(t_count - 1, 0))
    valid = k[None, :] < count[:, None]
    tri9 = jnp.stack([
        tris.p0.x, tris.p0.y, tris.p0.z,
        tris.e1.x, tris.e1.y, tris.e1.z,
        tris.e2.x, tris.e2.y, tris.e2.z], axis=-1).astype(jnp.float32)
    g = jnp.where(valid[..., None], tri9[ti], 0.0)  # (L, SLOTS, 9)
    return jnp.concatenate([
        g.reshape(n_leaf, SLOTS * 9),
        start.astype(jnp.float32)[:, None],
        count.astype(jnp.float32)[:, None]], axis=1)  # (L, 128)


def pack_tables_wide(bvh: BVH, tris: Triangles
                     ) -> Tuple[jax.Array, jax.Array]:
    """Pack (wide nodes (W, 32->128) f32, leaves (L, 128) f32).

    Wide row layout: lanes 6k..6k+5 = child k [lo.xyz hi.xyz] (empty
    children get inverted boxes that can never pass the slab test),
    lanes 24..27 = child codes (f32 ints), lane 28 = sort axis.
    jnp ops so the pack is jit-hoisted; the wide structure (wsel/wcode/
    waxis) was precomputed host-side by widen().
    """
    wsel = bvh.wsel
    valid = wsel >= 0
    sel = jnp.maximum(wsel, 0)
    # Empty slots get a POINT at +3e38, not an inverted box: the slab
    # test normalizes lo/hi with min/max, so an inverted box tests as
    # always-hit.  A far point yields per-axis slab t's that are either
    # mixed-sign (tmax < 0 -> miss) or all >= ~1.7e38 > every t_best
    # (seeds are clamped to 1e30), so it can never pass.
    clo = jnp.where(valid[..., None], bvh.lo[sel], 3.0e38)   # (W, 4, 3)
    chi = jnp.where(valid[..., None], bvh.hi[sel], 3.0e38)
    per_child = jnp.concatenate([clo, chi], axis=-1)         # (W, 4, 6)
    w = wsel.shape[0]
    nodes = jnp.concatenate([
        per_child.reshape(w, 24).astype(jnp.float32),
        bvh.wcode.astype(jnp.float32),
        bvh.waxis.astype(jnp.float32)[:, None],
        jnp.zeros((w, 3), jnp.float32)], axis=1)             # (W, 32)
    return nodes, pack_leaves(bvh, tris)


def _kernel_wide(nodes_ref, leaf_ref,
                 ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, t0_ref,
                 t_ref, tri_ref, u_ref, v_ref,
                 tstack_ref, nstack_ref,
                 *, init_code: int, max_iters: int, any_hit: bool,
                 ray_sub: int, leaf16: bool = False):
    """4-wide variant of _kernel: one visit = up to 4 child slab tests,
    far children pushed in sorted order so the nearest live child is
    followed immediately.  (leaf16 ignored: wide tables always pack raw
    9-float leaves.)"""
    blk = (ray_sub, RAY_LANE)
    ox = ox_ref[...]
    oy = oy_ref[...]
    oz = oz_ref[...]
    dx = dx_ref[...]
    dy = dy_ref[...]
    dz = dz_ref[...]
    ix = 1.0 / jnp.where(jnp.abs(dx) < 1e-20, 1e-20, dx)
    iy = 1.0 / jnp.where(jnp.abs(dy) < 1e-20, 1e-20, dy)
    iz = 1.0 / jnp.where(jnp.abs(dz) < 1e-20, 1e-20, dz)
    oix = ox * ix
    oiy = oy * iy
    oiz = oz * iz
    sdx = jnp.sum(dx) > 0.0
    sdy = jnp.sum(dy) > 0.0
    sdz = jnp.sum(dz) > 0.0

    def slab(c0, base, t_b, m):
        lox = nodes_ref[c0, base + 0]
        loy = nodes_ref[c0, base + 1]
        loz = nodes_ref[c0, base + 2]
        hix = nodes_ref[c0, base + 3]
        hiy = nodes_ref[c0, base + 4]
        hiz = nodes_ref[c0, base + 5]
        t0x = lox * ix - oix
        t1x = hix * ix - oix
        t0y = loy * iy - oiy
        t1y = hiy * iy - oiy
        t0z = loz * iz - oiz
        t1z = hiz * iz - oiz
        tmin = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                       jnp.minimum(t0y, t1y)),
                           jnp.minimum(t0z, t1z))
        tmax = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                       jnp.maximum(t0y, t1y)),
                           jnp.maximum(t0z, t1z))
        te = jnp.maximum(tmin, 0.0)
        ok = m & (tmax >= te) & (te < t_b)
        return jnp.where(ok, te, INF)

    def leaf_test(row, m, t_b, tri_b, u_b, v_b):
        # dense unroll on purpose — see _kernel.leaf_test
        base = leaf_ref[row, LANE_START].astype(jnp.int32)
        for k in range(SLOTS):
            c = 9 * k
            p0x = leaf_ref[row, c + 0]
            p0y = leaf_ref[row, c + 1]
            p0z = leaf_ref[row, c + 2]
            e1x = leaf_ref[row, c + 3]
            e1y = leaf_ref[row, c + 4]
            e1z = leaf_ref[row, c + 5]
            e2x = leaf_ref[row, c + 6]
            e2y = leaf_ref[row, c + 7]
            e2z = leaf_ref[row, c + 8]
            pvx = dy * e2z - dz * e2y
            pvy = dz * e2x - dx * e2z
            pvz = dx * e2y - dy * e2x
            det = e1x * pvx + e1y * pvy + e1z * pvz
            inv_det = jnp.where(jnp.abs(det) < DET_EPS, 0.0, 1.0 / det)
            tvx = ox - p0x
            tvy = oy - p0y
            tvz = oz - p0z
            uu = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
            qvx = tvy * e1z - tvz * e1y
            qvy = tvz * e1x - tvx * e1z
            qvz = tvx * e1y - tvy * e1x
            vv = (dx * qvx + dy * qvy + dz * qvz) * inv_det
            tt = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
            hit = (m & (jnp.abs(det) >= DET_EPS) & (uu >= 0.0)
                   & (vv >= 0.0) & (uu + vv <= 1.0) & (tt > 0.0)
                   & (tt < t_b))
            if any_hit:
                t_b = jnp.where(hit, -1.0, t_b)
                tri_b = jnp.where(hit, base + k, tri_b).astype(jnp.int32)
            else:
                t_b = jnp.where(hit, tt, t_b)
                tri_b = jnp.where(hit, base + k, tri_b).astype(jnp.int32)
                u_b = jnp.where(hit, uu, u_b)
                v_b = jnp.where(hit, vv, v_b)
        return t_b, tri_b, u_b, v_b

    def body(state):
        it, sp, have, code, te, t_b, tri_b, u_b, v_b = state
        do_pop = jnp.logical_not(have)
        slot = jnp.maximum(sp - 1, 0)
        code = jnp.where(do_pop, nstack_ref[slot], code)
        te_mem = tstack_ref[pl.ds(slot * ray_sub, ray_sub), :]
        te = jnp.where(do_pop, te_mem, te)
        sp = jnp.where(do_pop, slot, sp)

        m = te < t_b
        # liveness guard for any-hit only (see _kernel)
        m_any = jnp.any(m) if any_hit else jnp.bool_(True)
        is_leaf = code < 0

        leaf_row = jnp.maximum((-code) - 1, 0)
        t_b, tri_b, u_b, v_b = jax.lax.cond(
            is_leaf & m_any,
            lambda args: leaf_test(leaf_row, m, *args),
            lambda args: args,
            (t_b, tri_b, u_b, v_b))

        safe = jnp.maximum(code, 0)

        def live_inner(_):
            mi = m & jnp.logical_not(is_leaf)
            return (slab(safe, 0, t_b, mi), slab(safe, 6, t_b, mi),
                    slab(safe, 12, t_b, mi), slab(safe, 18, t_b, mi),
                    nodes_ref[safe, 24].astype(jnp.int32),
                    nodes_ref[safe, 25].astype(jnp.int32),
                    nodes_ref[safe, 26].astype(jnp.int32),
                    nodes_ref[safe, 27].astype(jnp.int32),
                    nodes_ref[safe, 28].astype(jnp.int32))

        def pruned(_):
            inf = jnp.full(blk, INF, jnp.float32)
            z = jnp.int32(0)
            return inf, inf, inf, inf, z, z, z, z, z

        if any_hit:
            te0, te1, te2, te3, c0, c1, c2, c3, axis = jax.lax.cond(
                m_any & jnp.logical_not(is_leaf), live_inner, pruned, 0)
        else:
            te0, te1, te2, te3, c0, c1, c2, c3, axis = live_inner(0)
        d_pos = jax.lax.select(axis == 0, sdx,
                               jax.lax.select(axis == 1, sdy, sdz))
        # children stored ascending along axis; iterate far -> near so
        # the followed child (last live) is the nearest
        tes = (te0, te1, te2, te3)
        cds = (c0, c1, c2, c3)
        have = jnp.bool_(False)
        code = jnp.int32(0)
        te = jnp.full(blk, INF, jnp.float32)
        for j in range(4):
            k_pos, k_neg = 3 - j, j
            te_k = jnp.where(d_pos, tes[k_pos], tes[k_neg])
            code_k = jnp.where(d_pos, cds[k_pos], cds[k_neg])
            alive_k = jnp.min(te_k) < INF

            @pl.when(alive_k & have)
            def _(code=code, te=te):
                nstack_ref[sp] = code
                tstack_ref[pl.ds(sp * ray_sub, ray_sub), :] = te

            sp = sp + (alive_k & have).astype(jnp.int32)
            code = jnp.where(alive_k, code_k, code)
            te = jnp.where(alive_k, te_k, te)
            have = have | alive_k
        if any_hit:
            done = jnp.max(t_b) < 0.0
            have = have & jnp.logical_not(done)
            sp = jnp.where(done, 0, sp)
        return it + 1, sp, have, code, te, t_b, tri_b, u_b, v_b

    def cond(state):
        it, sp, have, *_ = state
        return (have | (sp > 0)) & (it < jnp.int32(max_iters))

    init = (jnp.int32(0), jnp.int32(0), jnp.bool_(True),
            jnp.int32(init_code),
            jnp.zeros(blk, jnp.float32),
            t0_ref[...],
            jnp.full(blk, -1, jnp.int32),
            jnp.zeros(blk, jnp.float32),
            jnp.zeros(blk, jnp.float32))
    out = jax.lax.while_loop(cond, body, init)
    _, _, _, _, _, t_b, tri_b, u_b, v_b = out
    t_ref[...] = t_b
    tri_ref[...] = tri_b
    u_ref[...] = u_b
    v_ref[...] = v_b


def pack_tables(bvh: BVH, tris: Triangles, leaf16: bool = True
                ) -> Tuple[jax.Array, jax.Array]:
    """Pack (nodes (I, 16) f32, leaves f32) kernel tables; leaves are
    constant-form (2L, 128) rows with leaf16 (the any-hit kernel's
    form) or raw 9-float (L, 128) rows without (closest-hit's form).

    Codes are stored as f32 integers (exact: all indices < 2^24);
    internal child = its internal row index, leaf child = -(leaf_row+1).
    jnp ops so the pack is jit-hoisted (loop-invariant) when traced
    inside a render; gathers run once per render.
    """
    if bvh.leaf_max > SLOTS:
        raise ValueError(
            f"BVH leaf_max {bvh.leaf_max} exceeds the kernel's {SLOTS} "
            f"slots per leaf row; rebuild with max_leaf <= {SLOTS}")
    right = bvh.right
    b = right.shape[0]
    is_int = right >= 0
    n_int = max((int(b) - 1) // 2, 1)
    iid = jnp.cumsum(is_int.astype(jnp.int32)) - 1
    lid = jnp.cumsum((~is_int).astype(jnp.int32)) - 1
    int_ids = jnp.nonzero(is_int, size=n_int, fill_value=0)[0]

    leaves = pack_leaves16(bvh, tris) if leaf16 else pack_leaves(bvh,
                                                                 tris)

    # ---- internal rows --------------------------------------------------
    left = int_ids + 1
    rgt = right[int_ids]

    def code_of(orig):
        return jnp.where(is_int[orig], iid[orig],
                         -(lid[orig] + 1)).astype(jnp.float32)

    lc = (bvh.lo[left] + bvh.hi[left]) * 0.5
    rc = (bvh.lo[rgt] + bvh.hi[rgt]) * 0.5
    axis = jnp.argmax(jnp.abs(rc - lc), axis=1).astype(jnp.int32)
    l_low = jnp.take_along_axis(lc, axis[:, None], 1)[:, 0] <= \
        jnp.take_along_axis(rc, axis[:, None], 1)[:, 0]
    ab = (axis | jnp.where(l_low, 4, 0)).astype(jnp.float32)
    nodes = jnp.concatenate([
        bvh.lo[left].astype(jnp.float32), bvh.hi[left].astype(jnp.float32),
        bvh.lo[rgt].astype(jnp.float32), bvh.hi[rgt].astype(jnp.float32),
        code_of(left)[:, None], code_of(rgt)[:, None], ab[:, None],
        jnp.zeros((n_int, 1), jnp.float32)], axis=1)  # (I, 16)
    return nodes, leaves


def _init_code(bvh: BVH) -> int:
    """Host-static root code (0 = first internal, ~leaf_row otherwise).

    Under jit trace the arrays are abstract; a single-leaf root can only
    occur for scenes with <= leaf_max triangles, which the dispatch
    routes to the brute kernel — so an internal root (code 0) is the
    only traced case.
    """
    import numpy as np
    if isinstance(bvh.right, jax.core.Tracer):
        return 0
    # np.asarray BEFORE indexing: jnp indexing on a constant inside a jit
    # trace would lift it to a tracer
    if int(np.asarray(bvh.right)[0]) >= 0:
        return 0
    return -1  # root is leaf row 0


def traverse_packet(bvh: BVH, tris: Triangles, o: V3, d: V3, t_init,
                    any_hit: bool = False, interpret: bool = False,
                    ray_sub: int = RAY_SUB, wide: bool = None,
                    leaf16: bool = None) -> Hit:
    """Packet traversal over the whole ray batch (grid over ray blocks).

    t_init seeds the per-ray search radius: +BIG_T for closest-hit, the
    segment length for any-hit (occluded iff a triangle id is recorded).
    `wide` forces the 4-wide kernel (default: only for trees too deep
    for the binary stack — measured slower otherwise).  `leaf16` picks
    the constant-form leaf table (2 rows/leaf; default for any-hit,
    where it measured -4%) vs the raw 9-float form (1 row/leaf; default
    for closest-hit, +3% the other way) — callers can force raw when
    the constant-form tables would exceed VMEM.  (A dual-visit ILP
    variant was tried and measured worse — the shared t_best serializes
    the two visits' chains; experiment record in
    docs/PROFILE_bathroom_r4.md, code removed in r5.)
    """
    n = o.x.shape[0]
    ray_block = ray_sub * RAY_LANE
    if wide is None:
        # Measured on v5e (scripts/bench_wide.py, bathroom 330k tris):
        # the binary kernel wins ~15% on both coherent and incoherent
        # rays — slab/MT vector work dominates, not per-visit overhead —
        # so wide serves only trees too deep for the binary stack
        # (wide depth is half the binary depth).
        wide = bvh.depth > MAX_STACK and wide_ok(bvh)
    if leaf16 is None:
        leaf16 = any_hit
    if wide:
        leaf16 = False
        nodes, leaves = pack_tables_wide(bvh, tris)
    else:
        nodes, leaves = pack_tables(bvh, tris, leaf16=leaf16)
    init_code = _init_code(bvh)
    n_nodes = bvh.right.shape[0]
    pad = (-n) % ray_block
    n_pad = n + pad

    def grid2d(x, fill=0.0):
        x = jnp.pad(x.astype(jnp.float32), (0, pad), constant_values=fill)
        return x.reshape(n_pad // RAY_LANE, RAY_LANE)

    # pad lanes get t_init = -1: `t_entry < t_best` is false forever.
    # Clamp the seed below the miss sentinel INF so box-missed rays
    # (te = INF) fail `te < t_best` immediately and re-pruning engages
    # before the first hit (advisor r2: BIG_T > INF defeated it).
    t0 = jnp.pad(jnp.minimum(jnp.broadcast_to(t_init, (n,)), 1e30)
                 .astype(jnp.float32), (0, pad), constant_values=-1.0)
    t0 = t0.reshape(n_pad // RAY_LANE, RAY_LANE)

    n_blocks = n_pad // ray_block
    grid_rows = n_pad // RAY_LANE
    fn = _kernel_wide if wide else _kernel
    kernel = functools.partial(
        fn, init_code=init_code, max_iters=4 * n_nodes + 64,
        any_hit=any_hit, ray_sub=ray_sub, leaf16=leaf16)
    stack_n = MAX_STACK
    blk = pl.BlockSpec((ray_sub, RAY_LANE), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    tab = pl.BlockSpec(memory_space=pltpu.VMEM)  # whole-table, resident
    out_shapes = (
        jax.ShapeDtypeStruct((grid_rows, RAY_LANE), jnp.float32),
        jax.ShapeDtypeStruct((grid_rows, RAY_LANE), jnp.int32),
        jax.ShapeDtypeStruct((grid_rows, RAY_LANE), jnp.float32),
        jax.ShapeDtypeStruct((grid_rows, RAY_LANE), jnp.float32),
    )
    t, tri, u, v = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[tab, tab] + [blk] * 7,
        out_specs=(blk, blk, blk, blk),
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((stack_n * ray_sub, RAY_LANE), jnp.float32),
            pltpu.SMEM((stack_n,), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(nodes, leaves,
      grid2d(o.x), grid2d(o.y), grid2d(o.z),
      grid2d(d.x), grid2d(d.y, 1.0), grid2d(d.z), t0)
    t = t.reshape(-1)[:n]
    tri = tri.reshape(-1)[:n]
    # misses keep the caller's seed (the clamp to 1e30 is kernel-internal)
    t = jnp.where(tri >= 0, t, jnp.broadcast_to(t_init, (n,)))
    return Hit(t, tri, u.reshape(-1)[:n], v.reshape(-1)[:n])


def closest_hit_packet(bvh: BVH, tris: Triangles, o: V3, d: V3,
                       interpret: bool = False) -> Hit:
    n = o.x.shape[0]
    # misses keep t = BIG_T (t_init) and tri = -1, matching intersect.Hit
    return traverse_packet(bvh, tris, o, d,
                           jnp.full(n, BIG_T, jnp.float32),
                           any_hit=False, interpret=interpret)


def any_hit_packet(bvh: BVH, tris: Triangles, o: V3, d: V3, max_t,
                   interpret: bool = False) -> jax.Array:
    h = traverse_packet(bvh, tris, o, d, max_t, any_hit=True,
                        interpret=interpret)
    return h.tri >= 0


def table_bytes(bvh: BVH, tris: Triangles, leaf16: bool = False) -> int:
    """VMEM footprint of the resident tables (every row is padded to 128
    lanes = 512 B by Mosaic; guard for the dispatch).  Query-dependent:
    closest-hit packs raw (L, 128) leaves (I + L rows total); any-hit's
    constant-form leaves (pack_leaves16) use two rows per leaf
    (I + 2L).  Charging 2L unconditionally rejected scenes up to ~2x
    smaller than the closest-hit kernel actually fits (advisor r4)."""
    b = bvh.right.shape[0]
    n_int, n_leaf = (b - 1) // 2, (b + 1) // 2
    leaf_rows = 2 * n_leaf if leaf16 else n_leaf
    return (n_int + leaf_rows) * 512


def wide_ok(bvh: BVH) -> bool:
    """Wide-kernel stack bound: each visit pushes at most 3 (live
    children - 1), so worst-case stack depth is 3 * wide tree depth."""
    return (bvh.wsel is not None
            and 3 * ((bvh.depth + 1) // 2) + 1 <= MAX_STACK)


def usable(bvh: BVH) -> bool:
    """Static dispatch guard: leaf rows hold at most SLOTS triangles AND
    the tree fits a kernel's fixed traversal stack (advisor r2: a
    degenerate binned-SAH tree can exceed it; depth==0 means an old/
    unknown build — route those to the stackless path too)."""
    return (bvh.leaf_max <= SLOTS and 0 < bvh.depth
            and (bvh.depth <= MAX_STACK or wide_ok(bvh)))
