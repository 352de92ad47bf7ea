"""Host-side binned-SAH BVH build -> flat arrays (numpy).

The reference builds a pointer-tree BVH with a full std::sort per split
(O(n log^2 n), /root/reference/RTBase/Geometry.h:325-398) and declares —
but never uses — binned-SAH constants (Geometry.h:241-243).  Here the
build is the real binned SAH (16 bins, largest centroid axis), emitted
directly as flattened depth-first arrays for the TPU traversal kernels:
node i's left child is i+1; `right` holds the right-child index or -1
for leaves.  Builds are per-scene, not per-frame, so host numpy is the
right tool; a C++ builder can slot in behind the same array contract.
"""
from __future__ import annotations

import sys
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..scene.types import BVH

NUM_BINS = 16
MAX_LEAF = 4
TRAVERSE_COST = 1.0
TRIANGLE_COST = 2.0


def build(tp: np.ndarray, max_leaf: int = MAX_LEAF, bins: int = NUM_BINS,
          all_axes: bool = False, refs: "Tuple[np.ndarray, ...]" = None,
          ) -> Tuple[BVH, np.ndarray]:
    """tp: (T, 3, 3) triangle vertex positions.

    Returns (flat BVH, triangle order) — triangles must be reordered by
    `order` so leaves reference contiguous ranges.

    bins/all_axes: SAH quality knobs (round 5).  The default (16 bins,
    largest centroid axis) mirrors the reference's declared constants;
    all_axes sweeps every axis's bins and takes the global best.

    refs: optional pre-split reference arrays (ref_lo, ref_hi, ref_tri)
    from presplit() — build over clipped AABB references instead of
    whole-triangle AABBs (SBVH-style spatial splits without leaf-level
    clipping: leaves still test FULL triangles, so any found hit is real
    geometry and closest-hit stays exact; `order` then carries duplicate
    triangle ids and len(order) >= T).
    """
    t_count = len(tp)
    ref_tri = None
    if refs is not None:
        tri_lo, tri_hi, ref_tri = refs
        tri_lo = tri_lo.astype(np.float64)
        tri_hi = tri_hi.astype(np.float64)
        cent = (tri_lo + tri_hi) * 0.5
        t_count = len(ref_tri)  # internal ids index REFERENCES
        order = np.arange(t_count)
    else:
        cent = tp.mean(axis=1).astype(np.float64)
        tri_lo = tp.min(axis=1).astype(np.float64)
        tri_hi = tp.max(axis=1).astype(np.float64)
        order = np.arange(t_count)
    lo_list, hi_list, right_list, start_list, count_list = [], [], [], [], []

    def emit(lo, hi, right, start, count) -> int:
        lo_list.append(lo)
        hi_list.append(hi)
        right_list.append(right)
        start_list.append(start)
        count_list.append(count)
        return len(lo_list) - 1

    def node_bounds(ids):
        return tri_lo[ids].min(axis=0), tri_hi[ids].max(axis=0)

    def surface(lo, hi):
        d = np.maximum(hi - lo, 0.0)
        return 2.0 * (d[0] * d[1] + d[1] * d[2] + d[2] * d[0])

    sys.setrecursionlimit(10000)

    def rec(ids: np.ndarray, start: int) -> int:
        lo, hi = node_bounds(ids)
        n = len(ids)
        if n <= max_leaf:
            order[start:start + n] = ids
            return emit(lo, hi, -1, start, n)
        c = cent[ids]
        cmin = c.min(axis=0)
        cmax = c.max(axis=0)
        axes = (range(3) if all_axes
                else (int(np.argmax(cmax - cmin)),))
        root_area = max(surface(lo, hi), 1e-30)
        best_cost, best_mask = np.inf, None
        for axis in axes:
            extent = cmax[axis] - cmin[axis]
            if extent < 1e-12:
                continue
            rel = (c[:, axis] - cmin[axis]) / extent
            bix = np.minimum((rel * bins).astype(np.int64), bins - 1)
            # Per-bin counts and bounds
            counts = np.bincount(bix, minlength=bins)
            bin_lo = np.full((bins, 3), np.inf)
            bin_hi = np.full((bins, 3), -np.inf)
            for b in range(bins):
                m = bix == b
                if counts[b]:
                    bin_lo[b] = tri_lo[ids[m]].min(axis=0)
                    bin_hi[b] = tri_hi[ids[m]].max(axis=0)
            # Prefix/suffix sweep of areas (same sweep idea as the
            # reference's per-object SAH, but over bins).
            lcnt = np.cumsum(counts)[:-1]
            rcnt = n - lcnt
            l_lo = np.minimum.accumulate(bin_lo, axis=0)[:-1]
            l_hi = np.maximum.accumulate(bin_hi, axis=0)[:-1]
            r_lo = np.minimum.accumulate(bin_lo[::-1], axis=0)[::-1][1:]
            r_hi = np.maximum.accumulate(bin_hi[::-1], axis=0)[::-1][1:]
            l_area = np.array([surface(l_lo[i], l_hi[i])
                               for i in range(bins - 1)])
            r_area = np.array([surface(r_lo[i], r_hi[i])
                               for i in range(bins - 1)])
            with np.errstate(invalid="ignore"):
                cost = (TRAVERSE_COST + TRIANGLE_COST
                        * (l_area * lcnt + r_area * rcnt) / root_area)
            cost = np.where((lcnt == 0) | (rcnt == 0), np.inf, cost)
            b = int(np.argmin(cost))
            if np.isfinite(cost[b]) and cost[b] < best_cost:
                best_cost = float(cost[b])
                best_mask = bix <= b
        if best_mask is None:
            # Degenerate: all centroids coincide — split evenly.
            half = n // 2
            left_ids, right_ids = ids[:half], ids[half:]
        elif best_cost >= TRIANGLE_COST * n and n <= max_leaf:
            # Leaf is cheaper than the best split (cost-based cutoff
            # the reference declares but never applies).
            order[start:start + n] = ids
            return emit(lo, hi, -1, start, n)
        else:
            left_ids, right_ids = ids[best_mask], ids[~best_mask]
        node = emit(lo, hi, 0, 0, 0)  # patched below
        rec(left_ids, start)
        right_idx = rec(right_ids, start + len(left_ids))
        right_list[node] = right_idx
        return node

    if t_count:
        rec(order.copy(), 0)
    else:
        emit(np.zeros(3), np.zeros(3), -1, 0, 0)
    if ref_tri is not None:
        order = ref_tri[order]  # reference slots -> (duplicated) tri ids

    right_np = np.asarray(right_list, np.int32)
    from ..scene.types import tree_depth
    return BVH(
        lo=jnp.asarray(np.asarray(lo_list), jnp.float32),
        hi=jnp.asarray(np.asarray(hi_list), jnp.float32),
        right=jnp.asarray(right_np),
        start=jnp.asarray(start_list, jnp.int32),
        count=jnp.asarray(count_list, jnp.int32),
        skip=jnp.asarray(compute_skip(right_np)),
        leaf_max=int(max((c for c in count_list), default=0)) or 1,
        depth=tree_depth(right_np),
    ), order


def presplit(tp: np.ndarray, exclude: np.ndarray = None,
             area_factor: float = 0.25, max_ratio: float = 1.4,
             ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Early-split-clipping pre-pass -> clipped AABB references.

    Architectural scenes (bathroom's walls/floor) have a few huge
    triangles whose AABBs force large sibling overlap; splitting their
    *references* (AABB midpoint of the longest axis, polygon clipped
    against the plane) before the SAH build removes the overlap.  The
    reference renderer has no analogue (its per-object sort BVH keeps
    whole-triangle bounds, Geometry.h:325-398); on the TPU the win is
    direct: the packet kernel's block-union visit cost scales with node
    overlap (docs/PROFILE_bathroom_r4.md).

    Leaves still test FULL triangles (pack_leaves gathers real p0/e1/e2
    rows), so any intersection found through a clipped box is real
    geometry and closest-hit stays exact; duplicate hits agree on t.

    exclude: (T,) bool — references of these triangles are never split.
    Emissive triangles MUST be excluded: the light table and the
    MIS light-id map assume one reference per light triangle.

    area_factor: split while a reference's AABB surface area exceeds
    area_factor * mean triangle-AABB area.  max_ratio bounds the total
    reference count at max_ratio * T (largest references split first).

    Returns (ref_lo, ref_hi, ref_tri): pass as `refs=` to build().
    NOTE: validate() asserts whole triangles inside leaf bounds and
    does not apply to pre-split trees.
    """
    import heapq

    t = len(tp)
    tp64 = tp.astype(np.float64)
    lo = tp64.min(1)
    hi = tp64.max(1)
    d = hi - lo
    area = 2.0 * (d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2]
                  + d[:, 2] * d[:, 0])
    thr = area_factor * float(area.mean()) if t else 0.0
    budget = max(int(max_ratio * t) - t, 0)

    def clip(poly, axis, s, keep_low):
        # Sutherland-Hodgman against the single plane x[axis] = s.
        out = []
        n = len(poly)
        for j in range(n):
            a, b = poly[j], poly[(j + 1) % n]
            ain = (a[axis] <= s) if keep_low else (a[axis] >= s)
            bin_ = (b[axis] <= s) if keep_low else (b[axis] >= s)
            if ain:
                out.append(a)
            if ain != bin_:
                f = (s - a[axis]) / (b[axis] - a[axis])
                out.append(a + (b - a) * f)
        return out

    out_lo, out_hi, out_tri = [], [], []
    heap = []
    ctr = 0
    for i in range(t):
        if (exclude is not None and exclude[i]) or area[i] <= thr:
            out_lo.append(lo[i]); out_hi.append(hi[i]); out_tri.append(i)
        else:
            heapq.heappush(heap, (-area[i], ctr, i,
                                  [tp64[i, 0], tp64[i, 1], tp64[i, 2]]))
            ctr += 1
    while heap:
        neg_a, _, i, poly = heapq.heappop(heap)
        arr = np.asarray(poly)
        plo, phi = arr.min(0), arr.max(0)
        if budget <= 0 or -neg_a <= thr:
            out_lo.append(plo); out_hi.append(phi); out_tri.append(i)
            continue
        axis = int(np.argmax(phi - plo))
        s = 0.5 * (plo[axis] + phi[axis])
        halves = [clip(poly, axis, s, True), clip(poly, axis, s, False)]
        halves = [h for h in halves if len(h) >= 3]
        if len(halves) < 2:  # numerically one-sided: stop splitting it
            out_lo.append(plo); out_hi.append(phi); out_tri.append(i)
            continue
        budget -= 1
        for h in halves:
            ha = np.asarray(h)
            hlo = np.maximum(ha.min(0), plo)
            hhi = np.minimum(ha.max(0), phi)
            hd = np.maximum(hhi - hlo, 0.0)
            a2 = 2.0 * (hd[0] * hd[1] + hd[1] * hd[2] + hd[2] * hd[0])
            heapq.heappush(heap, (-a2, ctr, i, h))
            ctr += 1
    return (np.asarray(out_lo, np.float32), np.asarray(out_hi, np.float32),
            np.asarray(out_tri, np.int64))


def sah_cost(bvh: BVH) -> float:
    """Total SAH cost of a flat tree (root-area-normalised expected
    traversal cost; the builder's own objective — a host-side quality
    metric for A/B'ing build variants without the chip)."""
    lo = np.asarray(bvh.lo, np.float64)
    hi = np.asarray(bvh.hi, np.float64)
    right = np.asarray(bvh.right)
    count = np.asarray(bvh.count)
    d = np.maximum(hi - lo, 0.0)
    area = 2.0 * (d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2]
                  + d[:, 2] * d[:, 0])
    root = max(area[0], 1e-30)
    leaf = right == -1
    return float((np.where(leaf, TRIANGLE_COST * count, TRAVERSE_COST)
                  * area).sum() / root)


def compute_skip(right: np.ndarray) -> np.ndarray:
    """DFS-successor ("skip") links from the right-child array.

    skip[root] = B; for an inner node i: skip[i+1] (left child) = right[i]
    and skip[right[i]] = skip[i].  Enables stackless threaded traversal.
    """
    b = len(right)
    skip = np.full(b, b, np.int32)
    for i in range(b):
        r = right[i]
        if r != -1:
            skip[i + 1] = r
            skip[r] = skip[i]
    return skip


def validate(bvh: BVH, tp_reordered: np.ndarray) -> None:
    """Host-side invariant check: every triangle inside its leaf bounds,
    children inside parents. Raises AssertionError on violation."""
    lo = np.asarray(bvh.lo)
    hi = np.asarray(bvh.hi)
    right = np.asarray(bvh.right)
    start = np.asarray(bvh.start)
    count = np.asarray(bvh.count)
    eps = 1e-3
    covered = np.zeros(len(tp_reordered), bool)
    for i in range(len(lo)):
        if right[i] == -1:
            s, c = start[i], count[i]
            covered[s:s + c] = True
            if c:
                t = tp_reordered[s:s + c].reshape(-1, 3)
                assert (t >= lo[i] - eps).all() and (t <= hi[i] + eps).all(), i
        else:
            for ch in (i + 1, right[i]):
                assert (lo[ch] >= lo[i] - eps).all(), (i, ch)
                assert (hi[ch] <= hi[i] + eps).all(), (i, ch)
    assert covered.all(), "leaf ranges must cover every triangle"
