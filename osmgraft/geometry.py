"""Exact integer geometry: ray-cast point-in-polygon + polygon cell covers.

Reproduces the reference's PIP decision procedure bit-for-bit
(``osmc/CountryPolygon.c:59-126``) on 1e-7-degree fixed-point integers,
widened to int64 (the C code computes the cross products in int32 and can
overflow on continent-scale segments — a latent bug we do not copy; see
SURVEY.md §8).

Semantics contract (per segment (p0, p1), query point a):
  * a == p0 or a == p1                              -> TOUCHING
  * cross = (p1-p0) x (a-p0):
      cross > 0 (LEFT)  and p0y <  ay <= p1y        -> CROSSING
      cross < 0 (RIGHT) and p1y <  ay <= p0y        -> CROSSING
      cross == 0, collinear, within the segment     -> TOUCHING
      otherwise                                     -> INESSENTIAL
  * any TOUCHING segment         -> BOUNDARY  (callers treat as inside,
                                    ``osmc/obm.c:28-30``)
  * odd number of CROSSINGs      -> INSIDE, else OUTSIDE
  * polygon with zero segments   -> INSIDE for every point
                                    (``osmc/CountryPolygon.c:105-107``)
  * bbox reject first            -> OUTSIDE (``CountryPolygon.c:109-111``)

A polygon is a flat segment list: holes are simply additional rings
appended to the same list (parity handles them), matching the reference's
``.poly`` reader (``osmc/CountryPolygon.c:128-208``).

The numpy kernel is fully vectorized over (points x segments) blocks —
it is the inner loop of the spatial join's refine stage (called from a
pandas UDF over Arrow batches, never per-row Python).
"""

from __future__ import annotations

import numpy as np

from . import cells

OUTSIDE, INSIDE, BOUNDARY = 0, 1, 2


class Ring:
    """One closed ring as int64 e7 vertex arrays (first != last required;
    closure segment is implicit, matching the reference's END-delimited
    rings which close last->first)."""

    __slots__ = ("xs", "ys", "hole")

    def __init__(self, xs, ys, hole: bool = False):
        self.xs = np.asarray(xs, dtype=np.int64)
        self.ys = np.asarray(ys, dtype=np.int64)
        self.hole = hole

    def segments(self):
        """(p0x, p0y, p1x, p1y) arrays, one row per segment incl. closure."""
        x0, y0 = self.xs, self.ys
        x1, y1 = np.roll(self.xs, -1), np.roll(self.ys, -1)
        return x0, y0, x1, y1


class Polygon:
    """Flat segment-list polygon with a bbox (CountryPolygon.h:16-26)."""

    def __init__(self, boundary_id: int, name: str, rings: list[Ring]):
        self.boundary_id = boundary_id
        self.name = name
        self.rings = rings
        segs = [r.segments() for r in rings]
        if segs:
            self.p0x = np.concatenate([s[0] for s in segs])
            self.p0y = np.concatenate([s[1] for s in segs])
            self.p1x = np.concatenate([s[2] for s in segs])
            self.p1y = np.concatenate([s[3] for s in segs])
            self.bbox = (
                int(min(self.p0x.min(), self.p1x.min())),
                int(min(self.p0y.min(), self.p1y.min())),
                int(max(self.p0x.max(), self.p1x.max())),
                int(max(self.p0y.max(), self.p1y.max())),
            )
        else:  # the empty "FULL" polygon matches everything
            self.p0x = self.p0y = self.p1x = self.p1y = np.array([], dtype=np.int64)
            self.bbox = (
                -cells.HALF_WORLD,
                -cells.HALF_WORLD,
                cells.HALF_WORLD,
                cells.HALF_WORLD,
            )

    @property
    def n_segments(self) -> int:
        return int(self.p0x.size)

    @classmethod
    def from_segments(cls, boundary_id: int, name: str, p0x, p0y, p1x, p1y):
        """Rebuild a polygon from flat segment arrays (executor-side
        reconstruction for the distributed cover builder; ring structure
        is irrelevant to cover/PIP, which run on the segment list)."""
        self = cls.__new__(cls)
        self.boundary_id = boundary_id
        self.name = name
        self.rings = []
        self.p0x = np.asarray(p0x, dtype=np.int64)
        self.p0y = np.asarray(p0y, dtype=np.int64)
        self.p1x = np.asarray(p1x, dtype=np.int64)
        self.p1y = np.asarray(p1y, dtype=np.int64)
        if self.p0x.size:
            self.bbox = (
                int(min(self.p0x.min(), self.p1x.min())),
                int(min(self.p0y.min(), self.p1y.min())),
                int(max(self.p0x.max(), self.p1x.max())),
                int(max(self.p0y.max(), self.p1y.max())),
            )
        else:
            self.bbox = (
                -cells.HALF_WORLD,
                -cells.HALF_WORLD,
                cells.HALF_WORLD,
                cells.HALF_WORLD,
            )
        return self

    def segment_rows(self):
        """list of (p0x, p0y, p1x, p1y) python-int tuples (oracle SQL gen)."""
        return [
            (int(a), int(b), int(c), int(d))
            for a, b, c, d in zip(self.p0x, self.p0y, self.p1x, self.p1y)
        ]


def pip_batch(ax, ay, p0x, p0y, p1x, p1y):
    """Classify points (ax, ay) against one segment list. Returns int8
    array of OUTSIDE/INSIDE/BOUNDARY. Vectorized (n_points x n_segments);
    for large batches callers should chunk points.
    """
    ax = np.asarray(ax, dtype=np.int64)[:, None]
    ay = np.asarray(ay, dtype=np.int64)[:, None]
    if p0x.size == 0:
        return np.full(ax.shape[0], INSIDE, dtype=np.int8)
    p0x, p0y, p1x, p1y = (np.asarray(v, dtype=np.int64)[None, :] for v in (p0x, p0y, p1x, p1y))

    vx = p1x - p0x  # segment vector a
    vy = p1y - p0y
    bx = ax - p0x  # point vector b
    by = ay - p0y
    cross = vx * by - bx * vy

    is_endpoint = ((ax == p0x) & (ay == p0y)) | ((ax == p1x) & (ay == p1y))
    on_left = cross > 0
    on_right = cross < 0
    collinear = ~is_endpoint & (cross == 0)
    # BEHIND/BEYOND only matter when collinear; compute the products and
    # norms in float64 (the C code compares sqrt() doubles,
    # CountryPolygon.c:77-78) — product signs are exact in float64 and
    # the norm comparison cannot tie for distinct collinear int points
    # at e7 scale, while int64 would overflow at (2*HALF_WORLD)^2.
    vxf, vyf = vx.astype(np.float64), vy.astype(np.float64)
    bxf, byf = bx.astype(np.float64), by.astype(np.float64)
    behind = collinear & ((vxf * bxf < 0) | (vyf * byf < 0))
    beyond = collinear & ~behind & (vxf * vxf + vyf * vyf < bxf * bxf + byf * byf)
    between = collinear & ~behind & ~beyond

    touching = is_endpoint | between
    crossing = (on_left & (p0y < ay) & (ay <= p1y)) | (
        on_right & (p1y < ay) & (ay <= p0y)
    )

    touched = touching.any(axis=1)
    parity = (crossing.sum(axis=1) & 1).astype(bool)
    out = np.where(touched, BOUNDARY, np.where(parity, INSIDE, OUTSIDE))
    return out.astype(np.int8)


def pip_polygon(ax, ay, poly: Polygon):
    """Full reference semantics incl. empty-polygon and bbox reject."""
    ax = np.asarray(ax, dtype=np.int64)
    ay = np.asarray(ay, dtype=np.int64)
    if poly.n_segments == 0:
        return np.full(ax.shape[0], INSIDE, dtype=np.int8)
    minx, miny, maxx, maxy = poly.bbox
    inb = (ax >= minx) & (ax <= maxx) & (ay >= miny) & (ay <= maxy)
    res = np.full(ax.shape[0], OUTSIDE, dtype=np.int8)
    if inb.any():
        res[inb] = pip_batch(ax[inb], ay[inb], poly.p0x, poly.p0y, poly.p1x, poly.p1y)
    return res


def pip_matches(ax, ay, poly: Polygon):
    """boolean: INSIDE or BOUNDARY (callers' truthiness, obm.c:28-30)."""
    return pip_polygon(ax, ay, poly) != OUTSIDE


# ---------------------------------------------------------------------------
# Polygon cell cover (lon/lat grid — edges are straight lines, cover exact)
# ---------------------------------------------------------------------------


def _edge_cells(p0x, p0y, p1x, p1y, level: int):
    """Conservative supercover: all grid cells a segment passes through.

    Walks the segment column-by-column (exact rational column-boundary
    intersections in integer arithmetic) — every cell whose closed
    rectangle intersects the segment is emitted.
    """
    n = 1 << level
    out = set()

    def axis_tile(v):
        t = ((v + cells.HALF_WORLD) * n) // cells.WORLD
        return min(max(t, 0), n - 1)

    for ix in range(p0x.size):
        x0, y0, x1, y1 = int(p0x[ix]), int(p0y[ix]), int(p1x[ix]), int(p1y[ix])
        if x1 < x0:
            x0, y0, x1, y1 = x1, y1, x0, y0
        c0, c1 = axis_tile(x0), axis_tile(x1)
        dx, dy = x1 - x0, y1 - y0
        for cx in range(c0, c1 + 1):
            # x-extent of this column clipped to the segment
            colxmin, colxmax, _, _ = cells.cell_bounds_e7(
                cells.cell_id(cx, 0, level)
            )
            sx0, sx1 = max(x0, int(colxmin)), min(x1, int(colxmax))
            if dx == 0:
                ylo, yhi = min(y0, y1), max(y0, y1)
            else:
                # y at the clipped x-extent ends, exact rational rounding
                # outward so the cover can only grow (conservative)
                ya = y0 + (dy * (sx0 - x0)) // dx
                yb = y0 + (dy * (sx1 - x0)) // dx
                ylo, yhi = min(ya, yb), max(ya, yb) + 1  # +1 absorbs floor
                ylo = max(min(ylo, max(y0, y1)), min(y0, y1))
                yhi = max(min(yhi, max(y0, y1)), min(y0, y1))
            for cy in range(axis_tile(ylo), axis_tile(yhi) + 1):
                out.add((cx, cy))
    return out


def polygon_cover(poly: Polygon, level: int, compacted: bool = False):
    """Exact-superset cell cover of a polygon on the lon/lat grid.

    cover = supercover(all edges)  ∪  cells whose center is INSIDE.
    Any cell intersecting the polygon either contains part of an edge
    (-> in the supercover) or lies entirely inside (-> its center is
    inside, caught by the scan) — so no false negatives; the residual
    PIP refine removes false positives.

    The empty FULL polygon covers the entire grid — represented as the
    single level-0 cell (callers must uncompact or special-case it).
    """
    if poly.n_segments == 0:
        return np.array([cells.cell_id(0, 0, 0)], dtype=np.int64)

    edge = _edge_cells(poly.p0x, poly.p0y, poly.p1x, poly.p1y, level)

    n = 1 << level
    minx, miny, maxx, maxy = poly.bbox
    cx0 = int(((minx + cells.HALF_WORLD) * n) // cells.WORLD)
    cx1 = int(((maxx + cells.HALF_WORLD) * n) // cells.WORLD)
    cy0 = int(((miny + cells.HALF_WORLD) * n) // cells.WORLD)
    cy1 = int(((maxy + cells.HALF_WORLD) * n) // cells.WORLD)
    cx0, cx1 = max(cx0, 0), min(cx1, n - 1)
    cy0, cy1 = max(cy0, 0), min(cy1, n - 1)

    interior = set()
    if cx1 >= cx0 and cy1 >= cy0:
        xs = np.arange(cx0, cx1 + 1, dtype=np.int64)
        ys = np.arange(cy0, cy1 + 1, dtype=np.int64)
        # cell centers, exact midpoint of rational bounds
        xmin, xmax, _, _ = cells.cell_bounds_e7(cells.cell_id(xs, np.zeros_like(xs), level))
        _, _, ymin, ymax = cells.cell_bounds_e7(cells.cell_id(np.zeros_like(ys), ys, level))
        cxs = (xmin + xmax) // 2
        cys = (ymin + ymax) // 2
        gx, gy = np.meshgrid(cxs, cys, indexing="ij")
        res = pip_polygon(gx.ravel(), gy.ravel(), poly)
        ix, iy = np.meshgrid(xs, ys, indexing="ij")
        hit = res != OUTSIDE
        interior = set(zip(ix.ravel()[hit].tolist(), iy.ravel()[hit].tolist()))

    allc = edge | interior
    arr = np.array(
        sorted(cells.cell_id(x, y, level) for x, y in allc), dtype=np.int64
    )
    return cells.compact(arr) if compacted else arr
