"""Delaunay TIN construction + linear interpolation (J7 / A10).

Reference analogs: PDAL ``filters.hag_delaunay`` (vcd/preprocessing/
preprocess.py:201-219) — TIN of ground points, height-above-ground = z minus
the TIN surface under each point — and the residual resampler's
matplotlib.tri Triangulation + LinearTriInterpolator (apply.py:415-477).
Neither scipy nor matplotlib exists in the target env, so this is a
from-scratch vectorized Bowyer-Watson: insertion is a Python loop (per-tile
point counts are a few thousand), but every geometric predicate inside an
insertion — circumcircle containment over ALL current triangles, boundary
edge extraction — is a numpy array operation, and interpolation locates
queries with a bucket-grid + batched barycentric test (no per-query loop).

Distributed use: `resample.resample_to_points(..., method="tin")` runs this
inside the tile+halo cogroup kernel — with a halo wider than the typical
triangle edge, interior triangles match the global triangulation (boundary
effects only within one halo width of a tile edge, where the reference's
NaN -> nodata convention applies anyway).
"""

from __future__ import annotations

import numpy as np

NODATA = -9999.0


def _circumcircles(pts: np.ndarray, tris: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Circumcenter + squared radius per triangle, vectorized.
    Degenerate (collinear) triangles get r2 = +inf (always 'bad', so they
    are removed at the first opportunity)."""
    a = pts[tris[:, 0]]
    b = pts[tris[:, 1]]
    c = pts[tris[:, 2]]
    d = 2.0 * (a[:, 0] * (b[:, 1] - c[:, 1]) + b[:, 0] * (c[:, 1] - a[:, 1]) + c[:, 0] * (a[:, 1] - b[:, 1]))
    a2 = (a * a).sum(1)
    b2 = (b * b).sum(1)
    c2 = (c * c).sum(1)
    with np.errstate(divide="ignore", invalid="ignore"):
        ux = (a2 * (b[:, 1] - c[:, 1]) + b2 * (c[:, 1] - a[:, 1]) + c2 * (a[:, 1] - b[:, 1])) / d
        uy = (a2 * (c[:, 0] - b[:, 0]) + b2 * (a[:, 0] - c[:, 0]) + c2 * (b[:, 0] - a[:, 0])) / d
    cc = np.column_stack([ux, uy])
    r2 = ((a - cc) ** 2).sum(1)
    bad = ~np.isfinite(r2) | (np.abs(d) < 1e-12)
    r2 = np.where(bad, np.inf, r2)
    return cc, r2


def delaunay_np(p: np.ndarray) -> np.ndarray:
    """Bowyer-Watson Delaunay triangulation of 2D points.
    Returns (n_tri, 3) vertex-index triangles. Duplicate points must be
    deduplicated by the caller.

    Storage is slot-based (optimization round r6): triangles live in
    preallocated capacity-doubled arrays with an ``alive`` mask, compacted
    only when the dead fraction passes 1/2 — the previous formulation
    rebuilt tris/cc/r2 with vstack + boolean indexing on EVERY insertion
    (O(T) fresh allocations x n insertions dominated the per-tile TIN
    kernel; measured ~2 s for a 2.7k-sample tile at sf0.1). Insertion
    order, predicates and arithmetic are unchanged, so the triangle SET is
    identical; only the output row order differs (it was
    insertion-history-dependent before too)."""
    n = len(p)
    if n < 3:
        return np.empty((0, 3), dtype=np.int64)
    # super-triangle comfortably containing all points
    lo = p.min(axis=0)
    hi = p.max(axis=0)
    c = (lo + hi) / 2.0
    m = max(hi[0] - lo[0], hi[1] - lo[1], 1e-9) * 64.0
    sup = np.array([[c[0] - m, c[1] - m], [c[0] + m, c[1] - m], [c[0], c[1] + m]])
    pts = np.vstack([p, sup])

    cap = max(64, 4 * n)
    tris = np.zeros((cap, 3), dtype=np.int64)
    ccx = np.zeros(cap)
    ccy = np.zeros(cap)
    r2a = np.full(cap, -1.0)  # dead slots: r2 < 0 never matches the test
    alive = np.zeros(cap, dtype=bool)
    tris[0] = (n, n + 1, n + 2)
    cc0, r20 = _circumcircles(pts, tris[:1])
    ccx[0], ccy[0] = cc0[0, 0], cc0[0, 1]
    r2a[0] = r20[0]
    alive[0] = True
    hi_slot = 1
    n_alive = 1

    for i in range(n):
        q = pts[i]
        dx = q[0] - ccx[:hi_slot]
        dy = q[1] - ccy[:hi_slot]
        # dead slots carry r2 = -1, so they fail the containment test
        # without a separate mask pass
        bad = dx * dx + dy * dy <= r2a[:hi_slot] * (1.0 + 1e-12)
        idx = np.flatnonzero(bad)
        if idx.size == 0:
            # numerically possible on near-degenerate input: skip the point
            continue
        bt = tris[idx]
        # cavity boundary = edges of bad triangles that appear exactly once
        e = np.concatenate([bt[:, [0, 1]], bt[:, [1, 2]], bt[:, [2, 0]]])
        e_sorted = np.sort(e, axis=1)
        key = e_sorted[:, 0] * (n + 3) + e_sorted[:, 1]
        order = np.argsort(key, kind="stable")
        ks = key[order]
        first = np.ones(len(ks), dtype=bool)
        first[1:] = ks[1:] != ks[:-1]
        idx_first = np.flatnonzero(first)
        counts = np.diff(np.append(idx_first, len(ks)))
        singles = idx_first[counts == 1]
        boundary = e[order[singles]]  # original orientation of the lone edge
        nb = len(boundary)
        alive[idx] = False
        r2a[idx] = -1.0
        n_alive -= idx.size
        if hi_slot + nb > cap:
            new_cap = max(2 * cap, hi_slot + nb)
            tris = np.resize(tris, (new_cap, 3))
            ccx = np.resize(ccx, new_cap)
            ccy = np.resize(ccy, new_cap)
            r2n = np.full(new_cap, -1.0)
            r2n[:cap] = r2a
            r2a = r2n
            al = np.zeros(new_cap, dtype=bool)
            al[:cap] = alive
            alive = al
            cap = new_cap
        sl = slice(hi_slot, hi_slot + nb)
        tris[sl, 0] = boundary[:, 0]
        tris[sl, 1] = boundary[:, 1]
        tris[sl, 2] = i
        ncc, nr2 = _circumcircles(pts, tris[sl])
        ccx[sl] = ncc[:, 0]
        ccy[sl] = ncc[:, 1]
        r2a[sl] = nr2
        alive[sl] = True
        hi_slot += nb
        n_alive += nb
        if hi_slot > 2 * n_alive and hi_slot > 1024:
            keep_idx = np.flatnonzero(alive[:hi_slot])
            k = len(keep_idx)
            tris[:k] = tris[keep_idx]
            ccx[:k] = ccx[keep_idx]
            ccy[:k] = ccy[keep_idx]
            r2a[:k] = r2a[keep_idx]
            alive[:hi_slot] = False
            alive[:k] = True
            r2a[k:hi_slot] = -1.0
            hi_slot = k
    out = tris[np.flatnonzero(alive[:hi_slot])]
    keep = (out < n).all(axis=1)
    return out[keep]


def tin_interpolate_np(
    p: np.ndarray, z: np.ndarray, q: np.ndarray, tris: np.ndarray | None = None
) -> np.ndarray:
    """Linear TIN interpolation of z at query points q; NaN outside the
    triangulated hull. Point location: triangles are binned into a uniform
    bucket grid by bbox; each bucket's queries run ONE batched barycentric
    test against that bucket's triangles."""
    out = np.full(len(q), np.nan)
    if len(q) == 0:
        return out
    if tris is None:
        tris = delaunay_np(p)
    if len(tris) == 0:
        return out
    a = p[tris[:, 0]]
    b = p[tris[:, 1]]
    c = p[tris[:, 2]]
    # bucket grid sized to the median triangle bbox
    t_lo = np.minimum(np.minimum(a, b), c)
    t_hi = np.maximum(np.maximum(a, b), c)
    cell = max(float(np.median(t_hi[:, 0] - t_lo[:, 0])), 1e-9) * 2.0
    g0 = t_lo.min(axis=0)
    bx0 = np.floor((t_lo[:, 0] - g0[0]) / cell).astype(np.int64)
    bx1 = np.floor((t_hi[:, 0] - g0[0]) / cell).astype(np.int64)
    by0 = np.floor((t_lo[:, 1] - g0[1]) / cell).astype(np.int64)
    by1 = np.floor((t_hi[:, 1] - g0[1]) / cell).astype(np.int64)
    nbx = int(bx1.max()) + 1
    # triangle -> bucket expansion (triangles usually span 1-4 buckets)
    spans = (bx1 - bx0 + 1) * (by1 - by0 + 1)
    tri_ids = np.repeat(np.arange(len(tris)), spans)
    bkeys = np.empty(int(spans.sum()), dtype=np.int64)
    pos = 0
    for t in range(len(tris)):  # spans are tiny; loop is over triangles once
        xs = np.arange(bx0[t], bx1[t] + 1)
        ys = np.arange(by0[t], by1[t] + 1)
        kk = (xs[:, None] * (1 << 20) + ys[None, :]).ravel()
        bkeys[pos : pos + len(kk)] = kk
        pos += len(kk)
    order = np.argsort(bkeys, kind="stable")
    bkeys_s = bkeys[order]
    tri_s = tri_ids[order]

    qx = np.floor((q[:, 0] - g0[0]) / cell).astype(np.int64)
    qy = np.floor((q[:, 1] - g0[1]) / cell).astype(np.int64)
    qkey = qx * (1 << 20) + qy
    qorder = np.argsort(qkey, kind="stable")
    qs = qkey[qorder]
    starts = np.flatnonzero(np.r_[True, qs[1:] != qs[:-1]])
    ends = np.append(starts[1:], len(qs))
    det = (b[:, 1] - c[:, 1]) * (a[:, 0] - c[:, 0]) + (c[:, 0] - b[:, 0]) * (a[:, 1] - c[:, 1])
    for s_, e_ in zip(starts, ends):
        key = qs[s_]
        lo = np.searchsorted(bkeys_s, key, side="left")
        hi = np.searchsorted(bkeys_s, key, side="right")
        if lo == hi:
            continue
        cand = np.unique(tri_s[lo:hi])
        qi = qorder[s_:e_]
        qq = q[qi]  # (m, 2)
        ca, cb, cc_, cd = a[cand], b[cand], c[cand], det[cand]
        with np.errstate(divide="ignore", invalid="ignore"):
            w0 = ((cb[:, 1] - cc_[:, 1])[None, :] * (qq[:, 0:1] - cc_[None, :, 0])
                  + (cc_[:, 0] - cb[:, 0])[None, :] * (qq[:, 1:2] - cc_[None, :, 1])) / cd[None, :]
            w1 = ((cc_[:, 1] - ca[:, 1])[None, :] * (qq[:, 0:1] - cc_[None, :, 0])
                  + (ca[:, 0] - cc_[:, 0])[None, :] * (qq[:, 1:2] - cc_[None, :, 1])) / cd[None, :]
        w2 = 1.0 - w0 - w1
        eps = -1e-12
        inside = (w0 >= eps) & (w1 >= eps) & (w2 >= eps) & np.isfinite(w0) & np.isfinite(w1)
        hit = inside.argmax(axis=1)
        has = inside.any(axis=1)
        if not has.any():
            continue
        hi_t = cand[hit[has]]
        rows = np.flatnonzero(has)
        zv = (
            w0[rows, hit[has]] * z[tris[hi_t, 0]]
            + w1[rows, hit[has]] * z[tris[hi_t, 1]]
            + w2[rows, hit[has]] * z[tris[hi_t, 2]]
        )
        out[qi[rows]] = zv
    return out
