"""Ray-major MXU pair testing over a treelet cut of the BVH.

The r4 bathroom profile (docs/PROFILE_bathroom_r4.md) concluded the
packet kernel's residual cost is the BLOCK-UNION of incoherent rays'
node sets: one scalar tree-walk serves a 4096-ray block, so every ray
pays for the union (~10.5k triangle tests/ray measured-equivalent).
The r5 union probe (scripts/probe_treelet_union.py) showed the per-RAY
candidate set is tiny — mean 5.8 / p90 11 treelets of <=128 triangles
under a proxy-hit pruning radius (~740 tests/ray) — an order of
magnitude below any block-granular scheme, including candidate-sorted
block unions (139 treelets/block measured, /tmp-probe r5).  This
module therefore goes ray-major:

  1. `candidates`: per ray, the treelets whose box the ray enters
     within its pruning radius (two-level box test: coarse groups,
     then their fine children), up to M_SLOTS per ray; overflow rays
     fall back to the packet kernel.
  2. pairs: (ray, treelet) pairs sorted by treelet id — ONE lax.sort
     (measured ~35 ms for 5M pairs on v5e, vs ~400 ms for the packet
     kernel's whole bathroom closest-hit) so each kernel tile tests
     rays that SHARE a constants tile.
  3. `_pair_kernel`: per 1024-pair tile, the constant-form
     Moller-Trumbore is 4 dot_generals (1024,16)x(16,T_LEAF) against
     the resident per-treelet constants table — dense MXU work with
     zero gathers — plus a VPU predicate epilogue and per-pair min.
     Straddling tiles (pairs of several treelets) loop over the
     distinct ids present.
  4. resolve: scatter-min per ray; unresolved (overflowed) rays re-run
     the packet kernel with every other lane's search radius negative,
     which prunes their blocks to near-zero traversal cost.

Constant-form algebra (same identities as bvh_kernel.pack_leaves16,
replacing the reference's per-ray recursive walk + per-triangle test,
/root/reference/RTBase/Geometry.h:89-105,399-427): with per-ray
features [d, o, G = o x d, 1] and per-triangle constants
[N = e1 x e2, e1, e2, P1 = p0 x e1, P2 = p0 x e2, c0 = p0 . N]:

    det   = -(d . N)                 t*det =  o . N - c0
    u*det =  G . e2 + d . P2         v*det = -(G . e1 + d . P1)

four 16-dim contractions per (ray, triangle) pair — a matmul.  f32
precision on the MXU requires precision=HIGHEST (Mosaic's default f32
dot is single-pass bf16, 2e-3 relative error — measured in
scripts/probe_mxu.py along with the throughput numbers).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.vec import V3
from ..geometry.intersect import BIG_T, DET_EPS, Hit
from ..scene.types import BVH, Triangles

T_LEAF = 128        # triangles per treelet (pair-test tile width)
M_SLOTS = 12        # per-ray candidate cap (p90 measured 11)
M_COARSE = 6        # per-ray coarse-group cap
G_CHILD = 24        # max fine treelets per coarse group (cut enforces)
PAIR_TILE = 1024    # pairs per kernel tile
SENTINEL = 0x7FFFFF
INF = 3.0e38


def attach_treelets(bvh: BVH, t_max: int = T_LEAF,
                    g_child: int = G_CHILD) -> BVH:
    """Host-side: cut the BVH into treelets (subtrees with <= t_max
    triangles, contiguous triangle ranges in the DFS layout) plus a
    coarse grouping (<= g_child treelets each) for the two-level
    candidate search.  Topology-only: boxes are read from bvh.lo/hi at
    trace time, so geometry/refit keeps them fresh for free."""
    right = np.asarray(bvh.right)
    start = np.asarray(bvh.start)
    count = np.asarray(bvh.count)
    b = right.shape[0]
    cnt = np.zeros(b, np.int64)
    st = np.zeros(b, np.int64)
    for i in range(b - 1, -1, -1):
        if right[i] < 0:
            cnt[i] = count[i]
            st[i] = start[i]
        else:
            cnt[i] = cnt[i + 1] + cnt[right[i]]
            st[i] = min(st[i + 1], st[right[i]])

    def cut_fine(i):
        out, s = [], [i]
        while s:
            j = s.pop()
            if right[j] < 0 or cnt[j] <= t_max:
                out.append(j)
            else:
                s.append(right[j])   # push right first -> pop left first
                s.append(j + 1)
        return out

    fine, coarse = [], []
    s = [0]
    while s:
        i = s.pop()
        f = cut_fine(i)
        if len(f) <= g_child:
            coarse.append((i, len(fine), len(f)))
            fine.extend(f)
        else:
            s.append(right[i])
            s.append(i + 1)
    tl_nodes = np.array(fine, np.int32)
    return bvh.replace_treelets(
        tl_nodes, st[tl_nodes].astype(np.int32),
        cnt[tl_nodes].astype(np.int32),
        np.array([c[0] for c in coarse], np.int32),
        np.array([c[1] for c in coarse], np.int32),
        np.array([c[2] for c in coarse], np.int32))


def has_treelets(bvh) -> bool:
    return (isinstance(bvh, BVH) and bvh.tl_nodes is not None
            and bvh.tc_nodes is not None)


def pack_constants(bvh: BVH, tris: Triangles) -> jax.Array:
    """(K*16, T_LEAF) f32 per-treelet constants, rows
    [N(3) e1(3) e2(3) P1(3) P2(3) c0] per triangle column — 16
    f32/triangle (the shared-tile 4-pass form; a one-matmul (16, 4T)
    layout costs 64 f32/triangle and exceeds VMEM).  jnp: hoisted
    per trace; picks up refit-moved vertices automatically.  Padded
    slots are all-zero: det == 0 fails the |det| >= eps predicate."""
    k = bvh.tl_nodes.shape[0]
    t_count = tris.count
    s = bvh.tl_start
    c = bvh.tl_count
    j = jnp.arange(T_LEAF, dtype=jnp.int32)
    ti = jnp.clip(s[:, None] + j[None, :], 0, max(t_count - 1, 0))
    valid = j[None, :] < c[:, None]

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
    g = jnp.where(valid[..., None], tri16[ti], 0.0)  # (K, T_LEAF, 16)
    return jnp.transpose(g, (0, 2, 1)).reshape(k * 16, T_LEAF)


# --------------------------------------------------------------------------
# phase A: per-ray candidate treelets (two-level box test, pure jnp)

def _slab_hits(box, o: V3, inv: V3, t_seed):
    """Rays (N,) against boxes given as 6 component arrays
    (lox, loy, loz, hix, hiy, hiz), each broadcastable to (N, B):
    True where the ray enters the box before t_seed.  Component-wise
    on purpose: a (..., 3) layout pads 3 lanes to 128 on TPU (42x
    VMEM/HBM blowup — this function's first draft OOM'd at 77 GB)."""
    lox, loy, loz, hix, hiy, hiz = box
    t0x = (lox - o.x[:, None]) * inv.x[:, None]
    t1x = (hix - o.x[:, None]) * inv.x[:, None]
    t0y = (loy - o.y[:, None]) * inv.y[:, None]
    t1y = (hiy - o.y[:, None]) * inv.y[:, None]
    t0z = (loz - o.z[:, None]) * inv.z[:, None]
    t1z = (hiz - o.z[:, None]) * inv.z[:, None]
    tmin = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                   jnp.minimum(t0y, t1y)),
                       jnp.minimum(t0z, t1z))
    tmax = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                   jnp.maximum(t0y, t1y)),
                       jnp.maximum(t0z, t1z))
    te = jnp.maximum(tmin, 0.0)
    return (tmax >= te) & (te < t_seed[:, None])


def _extract_slots(hit, ids, m_slots):
    """hit (N, B) bool, ids (B,) or (N, B) int32 -> (slots (N, m)
    int32 (-1 empty), overflow (N,) bool).  m max-passes over the hit
    matrix: fusion-friendly, no sorts, no scatters."""
    if ids.ndim == 1:
        ids = jnp.broadcast_to(ids[None, :], hit.shape)
    pos = jnp.cumsum(hit.astype(jnp.int32), axis=1) - 1
    slots = [jnp.max(jnp.where(hit & (pos == m), ids, -1), axis=1)
             for m in range(m_slots)]
    return jnp.stack(slots, axis=1), (pos[:, -1] + 1) > m_slots


_CAND_CHUNK = 65536


def candidates(bvh: BVH, o: V3, d: V3, t_seed
               ) -> Tuple[jax.Array, jax.Array]:
    """Per-ray fine-treelet candidate slots (N, M_SLOTS) int32 (-1
    empty) and overflow flags (candidate set exceeded a cap at either
    level -> packet-kernel fallback).  t_seed is a valid upper bound
    on the ray's closest hit (proxy pre-pass; BIG_T when unknown), so
    the candidate set provably contains the winning treelet.

    Chunked via lax.map: the fine stage's packed-row gather
    materializes (chunk, Mc, 256) f32 — at full bathroom batch width
    that is 6+ GB per copy (measured HBM OOM)."""
    n = o.x.shape[0]
    if n > _CAND_CHUNK and n % _CAND_CHUNK == 0:
        nc = n // _CAND_CHUNK
        rs = lambda a: a.reshape(nc, _CAND_CHUNK)
        slots, over = jax.lax.map(
            lambda args: _candidates_impl(bvh, V3(*args[0:3]),
                                          V3(*args[3:6]), args[6]),
            (rs(o.x), rs(o.y), rs(o.z), rs(d.x), rs(d.y), rs(d.z),
             rs(t_seed)))
        return slots.reshape(n, M_SLOTS), over.reshape(n)
    return _candidates_impl(bvh, o, d, t_seed)


def _candidates_impl(bvh: BVH, o: V3, d: V3, t_seed):
    inv = V3(1.0 / jnp.where(jnp.abs(d.x) < 1e-20, 1e-20, d.x),
             1.0 / jnp.where(jnp.abs(d.y) < 1e-20, 1e-20, d.y),
             1.0 / jnp.where(jnp.abs(d.z) < 1e-20, 1e-20, d.z))
    cbox = tuple(a[bvh.tc_nodes][None, :]
                 for a in (bvh.lo[:, 0], bvh.lo[:, 1], bvh.lo[:, 2],
                           bvh.hi[:, 0], bvh.hi[:, 1], bvh.hi[:, 2]))
    hit_c = _slab_hits(cbox, o, inv, t_seed)
    k2 = bvh.tc_nodes.shape[0]
    cslots, over_c = _extract_slots(
        hit_c, jnp.arange(k2, dtype=jnp.int32), M_COARSE)
    # fine children: ONE packed-row gather per (ray, coarse slot).
    # XLA TPU gathers cost ~8-10 ns per ROW regardless of width
    # (measured, scripts/profile_treelet_phases.py): per-element
    # gathers of the child boxes were 7 x (N, Mc*G) = 1e9 rows = 8+
    # seconds; packing each coarse group's children into one 256-lane
    # row [lox*G loy*G loz*G hix*G hiy*G hiz*G fid*G pad] makes it
    # N*Mc = 6M rows (~50 ms).
    g = G_CHILD
    fall = jnp.arange(g, dtype=jnp.int32)
    cid = bvh.tc_start[:, None] + fall[None, :]           # (K2, G)
    cvalid = fall[None, :] < bvh.tc_count[:, None]
    cid = jnp.where(cvalid, cid, 0)
    f_nodes_all = bvh.tl_nodes[cid]                       # (K2, G)
    comp = [bvh.lo[:, 0], bvh.lo[:, 1], bvh.lo[:, 2],
            bvh.hi[:, 0], bvh.hi[:, 1], bvh.hi[:, 2]]
    packed = jnp.concatenate(
        [jnp.where(cvalid, a[f_nodes_all], 3.0e38) for a in comp]
        + [jnp.where(cvalid, cid, -1).astype(jnp.float32),
           jnp.zeros((k2, 256 - 7 * g), jnp.float32)],
        axis=1)                                           # (K2, 256)
    safe_c = jnp.maximum(cslots, 0)                       # (N, Mc)
    rows = packed[safe_c]                                 # (N, Mc, 256)
    n = rows.shape[0]
    take = lambda i: rows[:, :, i * g:(i + 1) * g].reshape(n, -1)
    fbox = tuple(take(i) for i in range(6))
    fid = take(6).astype(jnp.int32)                       # (N, Mc*G)
    fvalid = (fid >= 0) & (cslots >= 0).repeat(g, axis=1)
    fid = jnp.maximum(fid, 0)
    hit_f = _slab_hits(fbox, o, inv, t_seed) & fvalid
    slots, over_f = _extract_slots(hit_f, fid, M_SLOTS)
    return slots, over_c | over_f


# --------------------------------------------------------------------------
# phase B: MXU pair-test kernel

def _pair_kernel(tab_ref, f_ref, tid_ref, t_ref, tri_ref,
                 rem_ref, *, n_treelets: int):
    """One PAIR_TILE of (ray, treelet) pairs, sorted by treelet id.

    Loops over the distinct treelet ids present in the tile (the sort
    makes most tiles treelet-pure); per id: 4 MXU passes against the
    resident constants tile, predicate epilogue, per-pair min +
    argmin column.  Sentinel rows (invalid pairs / padding) never
    match a real id and cost one cheap empty check.

    LAYOUT: pairs live on the LANE axis everywhere — features as
    (16, PAIR_TILE), per-pair scalars as (1, PAIR_TILE), matmul
    outputs as (T_LEAF, PAIR_TILE) — because (a) a (P, 1) HBM array
    pads its lane dim 128x (6 GB for bathroom's pair count, measured
    OOM), (b) a (PAIR_TILE, 1) loop carry costs 128 vregs and blows
    Mosaic's while legalization, and (c) Mosaic cannot reshape between
    lane-major and sublane-major layouts.  The loop carries only
    scalars; per-pair state lives in the output refs + a scratch."""
    feats = f_ref[0]                       # (16, PAIR_TILE)
    tid = tid_ref[0]                       # (1, PAIR_TILE) int32
    # per-pair search radius rides in feature lane 10 (one gather
    # instead of two: each 12M-row gather costs ~100 ms)
    maxt = feats[10:11]                    # (1, PAIR_TILE) f32
    t_ref[0] = jnp.full((1, PAIR_TILE), INF, jnp.float32)
    tri_ref[0] = jnp.full((1, PAIR_TILE), -1, jnp.int32)
    rem_ref[...] = jnp.ones((1, PAIR_TILE), jnp.int32)
    dcol = feats[0:3]                      # (3, PAIR_TILE)
    ocol = feats[3:6]
    gcol = feats[6:9]
    z1 = jnp.zeros((1, PAIR_TILE), jnp.float32)
    z3 = jnp.zeros((3, PAIR_TILE), jnp.float32)
    z6 = jnp.zeros((6, PAIR_TILE), jnp.float32)
    one = jnp.ones((1, PAIR_TILE), jnp.float32)
    # per-pass feature layouts against constant rows
    # [N(0:3) e1(3:6) e2(6:9) P1(9:12) P2(12:15) c0(15)]
    f_det = jnp.concatenate([-dcol, z3, z3, z3, z3, z1], axis=0)
    f_tdt = jnp.concatenate([ocol, z3, z3, z3, z3, -one], axis=0)
    f_udt = jnp.concatenate([z6, gcol, z3, dcol, z1], axis=0)
    f_vdt = jnp.concatenate([z3, -gcol, z3, -dcol, z3, z1], axis=0)

    def dot(f, tile):
        # (16, T).T @ (16, P) -> (T, P): pairs stay on lanes
        return jax.lax.dot_general(
            tile, f, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    def body(state):
        it, _ = state
        remaining = rem_ref[...] > 0               # (1, PAIR_TILE)
        cur = jnp.min(jnp.where(remaining, tid, SENTINEL))
        rows = remaining & (tid == cur)

        @pl.when(cur < SENTINEL)
        def _():
            tile = tab_ref[pl.ds(cur * 16, 16), :]   # (16, T_LEAF)
            det = dot(f_det, tile)                   # (T, PAIR_TILE)
            tdt = dot(f_tdt, tile)
            udt = dot(f_udt, tile)
            vdt = dot(f_vdt, tile)
            sgn = jnp.where(det < 0.0, -1.0, 1.0)
            ad = det * sgn
            su = udt * sgn
            sv = vdt * sgn
            st = tdt * sgn
            hit = ((ad >= DET_EPS) & (su >= 0.0) & (sv >= 0.0)
                   & (su + sv <= ad) & (st > 0.0) & (st < maxt * ad))
            cand = jnp.where(hit, st / jnp.where(hit, ad, 1.0), INF)
            tmin = jnp.min(cand, axis=0, keepdims=True)  # (1, P)
            row = jax.lax.broadcasted_iota(jnp.int32, cand.shape, 0)
            cmin = jnp.min(jnp.where(cand <= tmin, row, T_LEAF),
                           axis=0, keepdims=True)
            upd = rows & (tmin < INF)
            t_ref[0] = jnp.where(upd, tmin, t_ref[0])
            tri_ref[0] = jnp.where(upd, cmin, tri_ref[0])

        new_rem = remaining & (tid != cur) & (cur < SENTINEL)
        rem_ref[...] = new_rem.astype(jnp.int32)
        return it + 1, jnp.any(new_rem)

    def cond(state):
        it, has_more = state
        return has_more & (it < jnp.int32(PAIR_TILE))

    jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.bool_(True)))


def _pair_test(consts, feats_p, tid_p, n_treelets: int,
               interpret: bool = False):
    """Run the pair kernel over P pairs (P a multiple of PAIR_TILE).
    Returns (t (P,), col (P,)) — col is the within-treelet row of
    each pair's best hit (T_LEAF when none)."""
    p = tid_p.shape[0]
    n_tiles = p // PAIR_TILE
    # lanes-major tiling (see _pair_kernel LAYOUT note)
    tid3 = tid_p.reshape(n_tiles, 1, PAIR_TILE)
    f3 = jnp.transpose(feats_p.reshape(n_tiles, PAIR_TILE, 16),
                       (0, 2, 1))                 # (n, 16, PAIR_TILE)
    pblk = pl.BlockSpec((1, 1, PAIR_TILE), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    fblk = pl.BlockSpec((1, 16, PAIR_TILE), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    tab = pl.BlockSpec(memory_space=pltpu.VMEM)
    t, col = pl.pallas_call(
        functools.partial(_pair_kernel, n_treelets=n_treelets),
        grid=(n_tiles,),
        in_specs=[tab, fblk, pblk],
        out_specs=(pblk, pblk),
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles, 1, PAIR_TILE), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1, PAIR_TILE), jnp.int32)),
        scratch_shapes=[pltpu.VMEM((1, PAIR_TILE), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(consts, f3, tid3)
    return t.reshape(-1), col.reshape(-1)


# --------------------------------------------------------------------------
# top level

def _feats(o: V3, d: V3, radius) -> jax.Array:
    """(N, 16) per-ray feature rows [d, o, G = o x d, 1, radius, 0...].
    Lane 10 carries the per-ray search radius so the pair kernel needs
    only ONE per-pair gather (constant rows 10.. are zero, so the lane
    never reaches the dot products)."""
    g = o.cross(d)
    n = o.x.shape[0]
    z = jnp.zeros(n, jnp.float32)
    return jnp.stack(
        [d.x, d.y, d.z, o.x, o.y, o.z, g.x, g.y, g.z,
         jnp.ones(n, jnp.float32), radius, z, z, z, z, z], axis=1)


def traverse_treelet(bvh: BVH, tris: Triangles, o: V3, d: V3, t_init,
                     any_hit: bool = False,
                     interpret: bool = False) -> Hit:
    """Closest-hit (or any-hit) via candidate pairs + MXU testing;
    overflowed rays fall back to the packet kernel (their non-overflow
    lane-mates get a negative radius, so fallback blocks prune to
    near-zero).  Output contract matches bvh_kernel.traverse_packet:
    misses keep the caller's t_init seed and tri = -1."""
    from . import bvh_kernel
    n = o.x.shape[0]
    k = bvh.tl_nodes.shape[0]
    t_seed = jnp.minimum(jnp.broadcast_to(t_init, (n,)), 1e30)
    active = t_seed > 0.0
    # closest-hit: inflate the candidate/test radius slightly so the
    # proxy hit that PRODUCED the seed is itself admitted (a strict
    # `<` at t == seed would silently drop it and report a miss)
    radius = t_seed if any_hit else t_seed * 1.0001 + 1e-5
    slots, overflow = candidates(bvh, o, d,
                                 jnp.where(active, radius, -1.0))
    overflow = overflow & active

    # pairs sorted by treelet id (invalid slots key to the sentinel).
    # The payload is the ORIGINAL PAIR INDEX, so results can be
    # restored to (N, M) layout by a second sort instead of a
    # scatter-min per ray — XLA TPU serializes non-unique-index
    # scatters (measured ~9 s for 12.6M pair updates; the sort-back
    # costs ~tens of ms).
    m = M_SLOTS
    tid = jnp.where(slots >= 0, slots, SENTINEL).astype(jnp.int32)
    p_n = n * m
    tid_f = tid.reshape(-1)
    pidx = jnp.arange(p_n, dtype=jnp.int32)
    tid_s, pidx_s = jax.lax.sort((tid_f, pidx), num_keys=1)
    pad = (-p_n) % PAIR_TILE
    tid_s = jnp.pad(tid_s, (0, pad), constant_values=SENTINEL)
    pidx_s = jnp.pad(pidx_s, (0, pad), constant_values=p_n)
    ray_s = jnp.minimum(pidx_s // m, n - 1)

    feats = _feats(o, d, radius)
    feats_p = feats[ray_s]                       # (P, 16), ONE gather
    consts = pack_constants(bvh, tris)
    t_pair, col_pair = _pair_test(consts, feats_p, tid_s,
                                  k, interpret=interpret)

    # resolve: sort results back to (N, M) pair order, reduce over M;
    # the winner's TREELET id (not its triangle) rides along so the
    # only remaining gather is one N-row tl_start lookup
    ok = (t_pair < INF) & (tid_s < SENTINEL)
    code_pair = jnp.where(
        ok, tid_s * (T_LEAF + 1) + jnp.minimum(col_pair, T_LEAF), -1)
    t_sc = jnp.where(ok, t_pair, INF)
    _, t_o, code_o = jax.lax.sort(
        (pidx_s, t_sc, code_pair), num_keys=1)
    t_nm = t_o[:p_n].reshape(n, m)
    code_nm = code_o[:p_n].reshape(n, m)
    t_best = jnp.min(t_nm, axis=1)
    sel = jnp.argmin(t_nm, axis=1)
    code_best = jnp.take_along_axis(code_nm, sel[:, None], 1)[:, 0]
    tid_best = jnp.maximum(code_best, 0) // (T_LEAF + 1)
    col_best = jnp.maximum(code_best, 0) % (T_LEAF + 1)
    tri_best = jnp.where(code_best >= 0,
                         bvh.tl_start[jnp.clip(tid_best, 0,
                                               max(k - 1, 0))]
                         + col_best, -1)
    found = (t_best < INF) & active & ~overflow

    # fallback: packet kernel; only unresolved lanes keep a live
    # radius, so their non-overflow lane-mates' blocks prune to ~zero.
    # any-hit: a pair hit is already definitive occlusion — only
    # overflowed UN-occluded rays need the full walk.  closest-hit:
    # overflowed rays re-search below min(seed, partial-best).
    if any_hit:
        fb_t = jnp.where(overflow & ~(t_best < INF), t_seed, -1.0)
    else:
        fb_t = jnp.where(overflow, jnp.minimum(radius, t_best), -1.0)
    h_fb = bvh_kernel.traverse_packet(bvh, tris, o, d, fb_t,
                                      any_hit=any_hit,
                                      interpret=interpret)
    fb_hit = overflow & (h_fb.tri >= 0)
    # overflow lanes: packet result if it found something closer,
    # else the partial pair result (a real hit when t_best < INF)
    part = overflow & (t_best < INF) & ~fb_hit
    t_out = jnp.where(found | part, t_best, jnp.broadcast_to(t_init,
                                                             (n,)))
    t_out = jnp.where(fb_hit, h_fb.t, t_out)
    tri_out = jnp.where(found | part, tri_best, -1)
    tri_out = jnp.where(fb_hit, h_fb.tri, tri_out)

    # barycentrics: one differentiable-free MT re-solve on winners
    from ..geometry.intersect import _mt_test
    safe_tri = jnp.maximum(tri_out, 0)
    tt, uu, vv, okk = _mt_test(tris, safe_tri, o, d)
    has = tri_out >= 0
    return Hit(jnp.where(has, t_out, jnp.broadcast_to(t_init, (n,))),
               jnp.where(has, tri_out, -1),
               jnp.where(has, uu, 0.0), jnp.where(has, vv, 0.0))


def closest_hit_treelet(bvh: BVH, tris: Triangles, o: V3, d: V3,
                        t_seed, interpret: bool = False) -> Hit:
    """t_seed: per-ray valid hit upper bound (proxy pre-pass result;
    BIG_T where unknown; negative = inactive lane)."""
    return traverse_treelet(bvh, tris, o, d, t_seed,
                            interpret=interpret)


def any_hit_treelet(bvh: BVH, tris: Triangles, o: V3, d: V3, max_t,
                    interpret: bool = False) -> jax.Array:
    h = traverse_treelet(bvh, tris, o, d, max_t, any_hit=True,
                         interpret=interpret)
    return h.tri >= 0
