"""Batched ray-scene intersection: brute force oracle + flat-BVH traversal.

Replaces the reference's recursive pointer-chasing traversal
(/root/reference/RTBase/Geometry.h:399-462) with data-parallel forms:

- `closest_hit_brute` / `any_hit_brute`: Moller-Trumbore over all
  triangles, chunked via lax.scan so VMEM stays bounded.  This is the
  correctness oracle and the fast path for small scenes (cornell-box's 36
  triangles fit in registers).
- `closest_hit_bvh` / `any_hit_bvh`: lockstep stack-based traversal of the
  flattened BVH with jax.lax.while_loop over the whole ray batch; ordered
  near-child-first descent with ray-t pruning (both improvements the
  reference leaves on the table — its traversal visits children in fixed
  order with no pruning, Geometry.h:399-427).

Triangle test is Moller-Trumbore on (p0, e1, e2); barycentric mapping to
the reference convention (alpha->v0, beta->v1, gamma->v2, Geometry.h:
89-105,106-112) is alpha = 1-u-v, beta = u, gamma = v.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core.vec import V3
from ..scene.types import BVH, Triangles

MAX_STACK = 64
DET_EPS = 1e-12
BIG_T = 3.4e38


class Hit(NamedTuple):
    t: jax.Array      # (N,) hit distance (BIG_T if miss)
    tri: jax.Array    # (N,) int32 triangle id (-1 if miss)
    u: jax.Array      # (N,) barycentric beta (weight of v1)
    v: jax.Array      # (N,) barycentric gamma (weight of v2)

    @property
    def valid(self) -> jax.Array:
        return self.tri >= 0


def _mt_test(tris: Triangles, idx, o: V3, d: V3):
    """Moller-Trumbore for rays (N,) against gathered triangles idx (N,)
    or broadcast (N, C).  Returns (t, u, v, hit)."""
    p0 = tris.p0.gather(idx)
    e1 = tris.e1.gather(idx)
    e2 = tris.e2.gather(idx)
    pvec = d.cross(e2)
    det = e1.dot(pvec)
    # double-where: 1/det must never be evaluated at det≈0, or its
    # backward produces 0*inf=NaN on degenerate lanes (geom_grads
    # re-solves this differentiably, common.shading_data)
    bad = jnp.abs(det) < DET_EPS
    inv_det = jnp.where(bad, 0.0, 1.0 / jnp.where(bad, 1.0, det))
    tvec = o - p0
    u = tvec.dot(pvec) * inv_det
    qvec = tvec.cross(e1)
    v = d.dot(qvec) * inv_det
    t = e2.dot(qvec) * inv_det
    hit = ((jnp.abs(det) >= DET_EPS) & (u >= 0.0) & (v >= 0.0)
           & (u + v <= 1.0) & (t > 0.0))
    return t, u, v, hit


def miss_all(n_ray: int) -> Hit:
    return Hit(jnp.full(n_ray, BIG_T, jnp.float32),
               jnp.full(n_ray, -1, jnp.int32),
               jnp.zeros(n_ray, jnp.float32),
               jnp.zeros(n_ray, jnp.float32))


def closest_hit_brute(tris: Triangles, o: V3, d: V3,
                      chunk: int = 4096) -> Hit:
    n_tri = tris.count
    n_ray = o.x.shape[0]
    if n_tri == 0:
        return miss_all(n_ray)
    chunk = min(chunk, n_tri)
    # Derive the carry from the ray arrays (not fresh constants) so its
    # device-varying axes match under shard_map.
    best = Hit(jnp.full_like(o.x, BIG_T),
               jnp.full_like(o.x, -1.0).astype(jnp.int32),
               jnp.zeros_like(o.x), jnp.zeros_like(o.x))
    n_chunks = max(1, -(-n_tri // chunk))
    pad = n_chunks * chunk

    def body(carry, start):
        idx = start + jnp.arange(chunk, dtype=jnp.int32)
        valid_tri = idx < n_tri
        safe = jnp.minimum(idx, n_tri - 1)
        t, u, v, hit = _mt_test(
            tris, safe[None, :],
            V3(o.x[:, None], o.y[:, None], o.z[:, None]),
            V3(d.x[:, None], d.y[:, None], d.z[:, None]))
        hit = hit & valid_tri[None, :] & (t < carry.t[:, None])
        t = jnp.where(hit, t, BIG_T)
        j = jnp.argmin(t, axis=1)
        tj = jnp.take_along_axis(t, j[:, None], 1)[:, 0]
        better = tj < carry.t
        sel = jnp.take_along_axis
        new = Hit(
            jnp.where(better, tj, carry.t),
            jnp.where(better, safe[j], carry.tri).astype(jnp.int32),
            jnp.where(better, sel(u, j[:, None], 1)[:, 0], carry.u),
            jnp.where(better, sel(v, j[:, None], 1)[:, 0], carry.v))
        return new, None

    starts = jnp.arange(0, pad, chunk, dtype=jnp.int32)
    best, _ = jax.lax.scan(body, best, starts)
    return best


def any_hit_brute(tris: Triangles, o: V3, d: V3, max_t: jax.Array,
                  chunk: int = 4096) -> jax.Array:
    """True where segment [0, max_t] is occluded."""
    hit = closest_hit_brute(tris, o, d, chunk)
    return hit.valid & (hit.t < max_t)


def _slab(lo, hi, o: V3, inv_d: V3, t_max):
    """Ray-AABB slab test (reference AABB::rayAABB, Geometry.h:151-183).
    lo/hi are (..., 3) gathered node bounds."""
    t0x = (lo[..., 0] - o.x) * inv_d.x
    t1x = (hi[..., 0] - o.x) * inv_d.x
    t0y = (lo[..., 1] - o.y) * inv_d.y
    t1y = (hi[..., 1] - o.y) * inv_d.y
    t0z = (lo[..., 2] - o.z) * inv_d.z
    t1z = (hi[..., 2] - o.z) * inv_d.z
    tmin = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                   jnp.minimum(t0y, t1y)),
                       jnp.minimum(t0z, t1z))
    tmax = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                   jnp.maximum(t0y, t1y)),
                       jnp.maximum(t0z, t1z))
    return tmin, (tmax >= jnp.maximum(tmin, 0.0)) & (tmin < t_max)


def _traverse(bvh: BVH, tris: Triangles, o: V3, d: V3, t_init,
              any_hit: bool, max_leaf: int):
    """Shared lockstep traversal core."""
    n = o.x.shape[0]
    inv_d = V3(1.0 / jnp.where(jnp.abs(d.x) < 1e-20, 1e-20, d.x),
               1.0 / jnp.where(jnp.abs(d.y) < 1e-20, 1e-20, d.y),
               1.0 / jnp.where(jnp.abs(d.z) < 1e-20, 1e-20, d.z))
    lane = jnp.arange(n)

    # Root box test seeds the stack.
    _, root_hit = _slab(bvh.lo[0], bvh.hi[0], o, inv_d, t_init)
    stack = jnp.zeros((n, MAX_STACK), jnp.int32)
    sp = root_hit.astype(jnp.int32)

    # Termination is structurally guaranteed (children indices strictly
    # increase in the DFS layout), but a hard iteration cap bounds the
    # kernel's worst case for device watchdogs.
    max_iters = 4 * bvh.right.shape[0] + 64

    init = (jnp.int32(0), stack, sp,
            Hit(t_init, jnp.full(n, -1, jnp.int32),
                jnp.zeros(n), jnp.zeros(n)))

    def cond(state):
        it, _, sp, _ = state
        return jnp.any(sp > 0) & (it < max_iters)

    def body(state):
        it, stack, sp, best = state
        active = sp > 0
        top = jnp.maximum(sp - 1, 0)
        node = stack[lane, top]
        sp = jnp.where(active, sp - 1, sp)
        is_leaf = bvh.right[node] == -1

        # --- leaf: test up to max_leaf triangles -----------------------
        start = bvh.start[node]
        count = bvh.count[node]
        leaf_active = active & is_leaf
        t_b, tri_b, u_b, v_b = best
        for k in range(max_leaf):
            tri_idx = jnp.minimum(start + k, tris.count - 1)
            t, u, v, hit = _mt_test(tris, tri_idx, o, d)
            hit = hit & leaf_active & (k < count) & (t < t_b)
            t_b = jnp.where(hit, t, t_b)
            tri_b = jnp.where(hit, tri_idx, tri_b).astype(jnp.int32)
            u_b = jnp.where(hit, u, u_b)
            v_b = jnp.where(hit, v, v_b)
        best = Hit(t_b, tri_b, u_b, v_b)
        if any_hit:
            # Early out: once occluded, clear the stack.
            sp = jnp.where(best.tri >= 0, 0, sp)

        # --- inner: test both children, push far then near -------------
        inner_active = active & ~is_leaf
        left = node + 1
        right = bvh.right[node]
        lt, lhit = _slab(bvh.lo[left], bvh.hi[left], o, inv_d, best.t)
        rt, rhit = _slab(bvh.lo[right], bvh.hi[right], o, inv_d, best.t)
        lhit = lhit & inner_active
        rhit = rhit & inner_active
        near_is_left = lt <= rt
        first = jnp.where(near_is_left, left, right)
        second = jnp.where(near_is_left, right, left)
        first_hit = jnp.where(near_is_left, lhit, rhit)
        second_hit = jnp.where(near_is_left, rhit, lhit)
        # push far child first so the near child pops first
        stack = stack.at[lane, jnp.minimum(sp, MAX_STACK - 1)].set(
            jnp.where(second_hit, second, stack[lane, jnp.minimum(
                sp, MAX_STACK - 1)]))
        sp = sp + second_hit.astype(jnp.int32)
        stack = stack.at[lane, jnp.minimum(sp, MAX_STACK - 1)].set(
            jnp.where(first_hit, first, stack[lane, jnp.minimum(
                sp, MAX_STACK - 1)]))
        sp = sp + first_hit.astype(jnp.int32)
        return it + 1, stack, sp, best

    _, _, _, best = jax.lax.while_loop(cond, body, init)
    return best


def _traverse_stackless(bvh: BVH, tris: Triangles, o: V3, d: V3, t_init,
                        any_hit: bool, max_leaf: int):
    """Stackless threaded traversal over DFS skip links.

    Per-ray state is just the current node index — no stack arrays, no
    scatters (the stack variant's per-lane scatter is both slow and has
    proven destabilizing on the TPU runtime).  Trade-off: fixed DFS
    child order instead of near-first, so rays cannot prune by visiting
    the closer subtree first; the t_best test still prunes boxes.
    """
    n = o.x.shape[0]
    b = bvh.right.shape[0]
    inv_d = V3(1.0 / jnp.where(jnp.abs(d.x) < 1e-20, 1e-20, d.x),
               1.0 / jnp.where(jnp.abs(d.y) < 1e-20, 1e-20, d.y),
               1.0 / jnp.where(jnp.abs(d.z) < 1e-20, 1e-20, d.z))

    max_iters = 2 * b + 2
    # derive carries from the ray arrays (not fresh constants) so their
    # device-varying axes match under shard_map
    init = (jnp.int32(0), jnp.zeros_like(o.x).astype(jnp.int32),
            Hit(t_init, jnp.full_like(o.x, -1.0).astype(jnp.int32),
                jnp.zeros_like(o.x), jnp.zeros_like(o.x)))

    def cond(state):
        it, node, best = state
        return jnp.any(node < b) & (it < max_iters)

    def body(state):
        it, node, best = state
        active = node < b
        nd = jnp.minimum(node, b - 1)
        _, box_hit = _slab(bvh.lo[nd], bvh.hi[nd], o, inv_d, best.t)
        box_hit = box_hit & active
        is_leaf = bvh.right[nd] == -1

        # leaf: test triangles
        start = bvh.start[nd]
        count = bvh.count[nd]
        leaf_active = box_hit & is_leaf
        t_b, tri_b, u_b, v_b = best
        for k in range(max_leaf):
            tri_idx = jnp.minimum(start + k, tris.count - 1)
            t, u, v, hit = _mt_test(tris, tri_idx, o, d)
            hit = hit & leaf_active & (k < count) & (t < t_b)
            t_b = jnp.where(hit, t, t_b)
            tri_b = jnp.where(hit, tri_idx, tri_b).astype(jnp.int32)
            u_b = jnp.where(hit, u, u_b)
            v_b = jnp.where(hit, v, v_b)
        best = Hit(t_b, tri_b, u_b, v_b)

        # next node: descend on inner-box hit, else skip over subtree
        descend = box_hit & ~is_leaf
        nxt = jnp.where(descend, nd + 1, bvh.skip[nd])
        if any_hit:
            nxt = jnp.where(best.tri >= 0, b, nxt)  # early out
        node = jnp.where(active, nxt, node)
        return it + 1, node, best

    _, _, best = jax.lax.while_loop(cond, body, init)
    return best


def closest_hit_bvh(bvh: BVH, tris: Triangles, o: V3, d: V3,
                    max_leaf: Optional[int] = None) -> Hit:
    n = o.x.shape[0]
    return _traverse_stackless(bvh, tris, o, d, jnp.full(n, BIG_T), False,
                               max_leaf or bvh.leaf_max)


def any_hit_bvh(bvh: BVH, tris: Triangles, o: V3, d: V3,
                max_t: jax.Array, max_leaf: Optional[int] = None
                ) -> jax.Array:
    best = _traverse_stackless(bvh, tris, o, d, max_t, True,
                               max_leaf or bvh.leaf_max)
    return best.tri >= 0


def closest_hit_bvh_stack(bvh: BVH, tris: Triangles, o: V3, d: V3,
                          max_leaf: Optional[int] = None) -> Hit:
    """Stack-based ordered traversal (kept for comparison/benchmarks)."""
    n = o.x.shape[0]
    return _traverse(bvh, tris, o, d, jnp.full(n, BIG_T), False,
                     max_leaf or bvh.leaf_max)


def _sort_key(scene, o: V3, d: V3, active) -> jax.Array:
    """Coherence key for wavefront ray sorting: [active | direction
    octant | 6-bit-per-axis Morton cell of the origin].

    Bounce/shadow rays arrive in pixel order but point anywhere; the
    packet kernel's cost is the UNION of each 4096-ray block's node
    sets, so regrouping rays by (octant, origin cell) collapses that
    union toward the coherent-primary case.  Inactive rays sort to the
    back, so whole blocks of dead lanes terminate in tree-depth steps.
    This replaces the reference's tile queue locality (its threads get
    coherence for free from screen-space tiles, Renderer.h:795-853) —
    and is the wavefront "sort/compact rays by liveness" step SURVEY §7
    plans.
    """
    c = scene.bounds.centre
    r = jnp.maximum(scene.bounds.radius, 1e-6)
    def cell(x, cx):
        q = jnp.clip((x - cx) / (2.0 * r) + 0.5, 0.0, 0.999)
        return (q * 64.0).astype(jnp.uint32)          # 6 bits
    def spread3(v):
        # classic 10-bit Morton spread (bit i -> bit 3i); inputs are 6-bit
        v = (v | (v << 16)) & jnp.uint32(0x30000FF)
        v = (v | (v << 8)) & jnp.uint32(0x300F00F)
        v = (v | (v << 4)) & jnp.uint32(0x30C30C3)
        v = (v | (v << 2)) & jnp.uint32(0x9249249)
        return v
    morton = (spread3(cell(o.x, c.x))
              | (spread3(cell(o.y, c.y)) << 1)
              | (spread3(cell(o.z, c.z)) << 2))       # 18 bits
    octant = ((d.x > 0).astype(jnp.uint32)
              | ((d.y > 0).astype(jnp.uint32) << 1)
              | ((d.z > 0).astype(jnp.uint32) << 2))  # 3 bits
    key = (octant << 18) | morton
    return jnp.where(active, key, jnp.uint32(0x7FFFFFFF))


def _sorted_call(scene, o: V3, d: V3, active, payload, fn):
    """Sort rays by coherence key, run fn on the sorted batch, unsort.

    payload: extra per-ray arrays to permute along (e.g. max_t).
    fn(o, d, *payload) -> pytree of per-ray arrays.
    """
    key = _sort_key(scene, o, d, active)
    n = key.shape[0]
    args = jax.lax.sort(
        (key, o.x, o.y, o.z, d.x, d.y, d.z,
         jnp.arange(n, dtype=jnp.int32)) + tuple(payload),
        num_keys=1)
    perm = args[7]
    out = fn(V3(args[1], args[2], args[3]), V3(args[4], args[5], args[6]),
             *args[8:])
    inv = jnp.zeros(n, jnp.int32).at[perm].set(
        jnp.arange(n, dtype=jnp.int32))
    return jax.tree_util.tree_map(lambda a: a[inv], out)


def closest_hit(scene, o: V3, d: V3, active=None,
                presorted: bool = False) -> Hit:
    """Scene-level dispatch (reference Scene::traverse, Scene.h:107-130).

    `active` marks live lanes; inactive lanes return misses without
    paying traversal (their search radius is negative).  `presorted`
    promises the caller already coherence-sorted the batch (wavefront
    mode), skipping the internal sort/unsort round-trip.

    Outputs are stop-gradiented: hit structure (ids, t, barycentrics) is
    discrete path structure under the detached-sampling differentiation
    strategy (SURVEY.md §7), and the BVH while_loop is not reverse-mode
    differentiable anyway.
    """
    o = jax.lax.stop_gradient(o)
    d = jax.lax.stop_gradient(d)
    n = o.x.shape[0]
    tris = jax.lax.stop_gradient(scene.triangles)
    t_init = jnp.full(n, BIG_T, jnp.float32)
    if active is not None:
        t_init = jnp.where(jax.lax.stop_gradient(active), t_init, -1.0)
    from ..ops import bvh_kernel, mt_kernel
    from ..parallel.scene_shard import ShardedBVH, traverse_sharded
    if isinstance(scene.bvh, ShardedBVH):
        h = traverse_sharded(scene.bvh, o, d, t_init)
        return jax.tree_util.tree_map(jax.lax.stop_gradient, h)
    if scene.bvh is not None and scene.triangles.count > 64:
        from ..ops import treelet
        if mt_kernel.use_pallas() and treelet.has_treelets(scene.bvh):
            # Ray-major MXU pair-testing path (ops/treelet.py): per-ray
            # candidate treelets bounded by a proxy-hit radius, tested
            # as (1024,16)x(16,128) MXU tiles.  The proxy pre-pass
            # that measured flat as a PACKET seed is load-bearing
            # here: it is the candidate-set pruning radius.
            pre = _proxy_prepass(tris, o, d, t_init)
            h = treelet.closest_hit_treelet(scene.bvh, tris, o, d,
                                            jnp.minimum(pre.t, t_init))
            h = h._replace(t=jnp.where(h.tri >= 0, h.t, BIG_T))
        elif mt_kernel.use_pallas() and _packet_fits(scene.bvh, tris):
            # (No proxy pre-pass here: seeding closest-hit with a
            # top-128-triangle t bound measured +5% — near-first
            # ordered traversal self-bounds within its first visits,
            # so the proxy bound only duplicates it.  The pre-pass
            # pays on the any-hit path below, where a resolved ray
            # skips traversal entirely: -20%.)
            if presorted:
                h = bvh_kernel.traverse_packet(scene.bvh, tris, o, d,
                                               t_init)
            else:
                act = (jnp.ones(n, bool) if active is None
                       else jax.lax.stop_gradient(active))
                h = _sorted_call(
                    scene, o, d, act, (t_init,),
                    lambda so, sd, st: bvh_kernel.traverse_packet(
                        scene.bvh, tris, so, sd, st))
            h = h._replace(t=jnp.where(h.tri >= 0, h.t, BIG_T))
        else:
            # Fallback for scenes whose packet tables exceed VMEM.
            # CAUTION (measured r4): on the tunneled TPU backend this
            # lockstep while_loop runs until the LAST ray finishes —
            # ~1e5 gather iterations on incoherent bounce rays — and
            # can trip the device watchdog (worker crash).  Fine on
            # CPU and for coherent primaries; beyond-VMEM scenes on
            # TPU should use scene_shards=N instead.
            h = _traverse_stackless(scene.bvh, tris, o, d, t_init, False,
                                    scene.bvh.leaf_max)
            h = h._replace(t=jnp.where(h.tri >= 0, h.t, BIG_T))
    else:
        if mt_kernel.use_pallas():
            h = mt_kernel.intersect_pallas(tris, o, d, t_init)
            h = h._replace(t=jnp.where(h.tri >= 0, h.t, BIG_T))
        else:
            h = closest_hit_brute(tris, o, d)
            if active is not None:
                dead = ~jax.lax.stop_gradient(active)
                h = Hit(jnp.where(dead, BIG_T, h.t),
                        jnp.where(dead, -1, h.tri), h.u, h.v)
    h = jax.tree_util.tree_map(jax.lax.stop_gradient, h)
    # Residual tag for the remat policy (config.RenderConfig.remat): the
    # checkpointed backward saves exactly these and recomputes the rest,
    # so the BVH walk never runs twice.
    from jax.ad_checkpoint import checkpoint_name
    return jax.tree_util.tree_map(
        lambda a: checkpoint_name(a, "ray_hit"), h)


# VMEM budget for the packet kernel's resident tables (node + leaf
# rows); the rest of the 128 MB/core holds ray blocks, the traversal
# stack and pipeline buffers.
_PACKET_TABLE_BYTES = 96 * 1024 * 1024

# Proxy pre-pass (packet path only): brute-test every ray against the
# K largest triangles first.  Interior scenes are enclosed by a handful
# of big surfaces (walls/floor/ceiling: bathroom's top-128 by area),
# so almost every bounce ray gets a TIGHT t upper bound for ~2 ms of
# SMEM-resident MT — and the packet traversal's per-ray re-pruning
# (t_entry < t_best) then culls whole subtrees beyond the wall the ray
# would hit.  This attacks the block-union cost the coherence sort
# can't: a block's rays may wander anywhere, but none can wander PAST
# its proxy hit.  Shadow rays occluded by a big surface resolve
# entirely and skip traversal.
_PREPASS_K = 128


def _proxy_prepass(tris: Triangles, o: V3, d: V3, t_init) -> Hit:
    from ..ops import mt_kernel
    k = min(_PREPASS_K, tris.count)
    _, idx = jax.lax.top_k(tris.area, k)  # hoisted: loop-invariant
    sub = jax.tree_util.tree_map(lambda a: a[idx], tris)
    h = mt_kernel.intersect_pallas(sub, o, d, t_init)
    return h._replace(tri=jnp.where(h.tri >= 0, idx[h.tri], -1))


def _packet_fits(bvh, tris, leaf16: bool = False) -> bool:
    """leaf16: the any-hit kernel's constant-form leaves cost 2 rows per
    leaf; closest-hit's raw leaves cost 1 (see bvh_kernel.table_bytes)."""
    from ..ops import bvh_kernel
    return (bvh_kernel.usable(bvh)
            and bvh_kernel.table_bytes(bvh, tris, leaf16)
            <= _PACKET_TABLE_BYTES)


def occluded(scene, o: V3, d: V3, max_t: jax.Array,
             presorted: bool = False) -> jax.Array:
    """Scene-level any-hit (reference Scene::visible, Scene.h:161-169).
    Boolean visibility is non-differentiable by nature; stop-gradiented.
    Lanes with max_t < 0 are inactive and skip traversal.  `presorted`:
    the caller's batch is already origin-coherent (wavefront mode) —
    shadow rays inherit the hit points' sort, so the extra sort+unsort
    buys little and is skipped."""
    o = jax.lax.stop_gradient(o)
    d = jax.lax.stop_gradient(d)
    max_t = jax.lax.stop_gradient(max_t)
    tris = jax.lax.stop_gradient(scene.triangles)
    from jax.ad_checkpoint import checkpoint_name
    from ..ops import bvh_kernel, mt_kernel
    from ..parallel.scene_shard import ShardedBVH, traverse_sharded
    tag = lambda occ: checkpoint_name(occ, "ray_occ")  # noqa: E731
    if isinstance(scene.bvh, ShardedBVH):
        return tag(traverse_sharded(scene.bvh, o, d, max_t,
                                    any_hit=True).tri >= 0)
    if scene.bvh is not None and scene.triangles.count > 64:
        from ..ops import treelet
        if mt_kernel.use_pallas() and treelet.has_treelets(scene.bvh):
            # ray-major MXU pair-testing path (see closest_hit)
            pre_occ = _proxy_prepass(tris, o, d, max_t).tri >= 0
            rem_t = jnp.where(pre_occ, -1.0, max_t)
            occ = treelet.any_hit_treelet(scene.bvh, tris, o, d, rem_t)
            return tag(occ | pre_occ)
        if mt_kernel.use_pallas() and _packet_fits(scene.bvh, tris):
            # constant-form leaves (2 rows/leaf) are the measured-best
            # any-hit form, but cost ~1.5x the raw tables: degrade to
            # raw leaves rather than to the stackless fallback (which
            # can trip the TPU watchdog on incoherent rays) when only
            # the bigger form exceeds the VMEM budget (advisor r4)
            leaf16 = _packet_fits(scene.bvh, tris, leaf16=True)
            # proxy pre-pass: segments blocked by a big surface resolve
            # here and skip traversal (their max_t goes negative)
            pre_occ = _proxy_prepass(tris, o, d, max_t).tri >= 0
            rem_t = jnp.where(pre_occ, -1.0, max_t)
            if presorted:
                occ = bvh_kernel.traverse_packet(
                    scene.bvh, tris, o, d, rem_t, any_hit=True,
                    leaf16=leaf16).tri >= 0
            else:
                occ = _sorted_call(
                    scene, o, d, rem_t > 0.0, (rem_t,),
                    lambda so, sd, st: bvh_kernel.traverse_packet(
                        scene.bvh, tris, so, sd, st, any_hit=True,
                        leaf16=leaf16).tri >= 0)
            return tag(occ | pre_occ)
        return tag(any_hit_bvh(scene.bvh, tris, o, d, max_t))
    if mt_kernel.use_pallas():
        return tag(mt_kernel.any_hit_pallas(tris, o, d, max_t))
    return tag(any_hit_brute(tris, o, d, max_t))
