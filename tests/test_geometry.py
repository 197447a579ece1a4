"""PIP parity tests: exact reference semantics (osmc/CountryPolygon.c).

A direct, scalar transcription of the reference's decision procedure is
used as the oracle; the vectorized kernel must agree everywhere,
including BOUNDARY / collinear / endpoint / empty-polygon cases.
"""

import math

import numpy as np

from osmgraft import cells
from osmgraft.geometry import (
    BOUNDARY,
    INSIDE,
    OUTSIDE,
    Polygon,
    Ring,
    pip_polygon,
    polygon_cover,
)


def oracle_pip(x, y, poly: Polygon) -> int:
    """Scalar re-statement of osmc/CountryPolygon.c:59-126 (int math)."""
    if poly.n_segments == 0:
        return INSIDE
    minx, miny, maxx, maxy = poly.bbox
    if x < minx or y < miny or x > maxx or y > maxy:
        return OUTSIDE
    parity = 0
    for p0x, p0y, p1x, p1y in poly.segment_rows():
        if (x, y) == (p0x, p0y) or (x, y) == (p1x, p1y):
            return BOUNDARY
        ax_, ay_ = p1x - p0x, p1y - p0y
        bx_, by_ = x - p0x, y - p0y
        sa = ax_ * by_ - bx_ * ay_
        if sa > 0:
            if p0y < y <= p1y:
                parity = 1 - parity
        elif sa < 0:
            if p1y < y <= p0y:
                parity = 1 - parity
        else:
            if (ax_ * bx_ < 0) or (ay_ * by_ < 0):
                pass  # BEHIND
            elif math.sqrt(ax_ * ax_ + ay_ * ay_) < math.sqrt(bx_ * bx_ + by_ * by_):
                pass  # BEYOND
            else:
                return BOUNDARY  # BETWEEN
    return INSIDE if parity else OUTSIDE


def square(cx, cy, half):
    return Ring(
        [cx - half, cx + half, cx + half, cx - half],
        [cy - half, cy - half, cy + half, cy + half],
    )


def test_empty_polygon_matches_everything():
    p = Polygon(1, "full", [])
    res = pip_polygon([0, 10**9, -(10**9)], [0, 5, -5], p)
    assert np.all(res == INSIDE)


def test_square_inside_outside_boundary():
    p = Polygon(1, "sq", [square(0, 0, 100)])
    pts = [
        (0, 0, INSIDE),
        (99, 99, INSIDE),
        (100, 0, BOUNDARY),  # on edge
        (100, 100, BOUNDARY),  # vertex
        (101, 0, OUTSIDE),
        (-100, -100, BOUNDARY),
        (0, -101, OUTSIDE),
        (0, 100, BOUNDARY),
    ]
    xs = [t[0] for t in pts]
    ys = [t[1] for t in pts]
    got = pip_polygon(xs, ys, p)
    assert got.tolist() == [t[2] for t in pts]


def test_hole_ring_parity():
    outer = square(0, 0, 1000)
    hole = square(0, 0, 100, )
    p = Polygon(1, "donut", [outer, Ring(hole.xs, hole.ys, hole=True)])
    got = pip_polygon([0, 500, 1500, 100], [0, 0, 0, 0], p)
    # center is in the hole -> OUTSIDE; mid-ring INSIDE; far OUTSIDE;
    # on hole edge -> BOUNDARY
    assert got.tolist() == [OUTSIDE, INSIDE, OUTSIDE, BOUNDARY]


def test_concave_polygon():
    # L-shape
    ring = Ring(
        [0, 400, 400, 200, 200, 0],
        [0, 0, 100, 100, 300, 300],
    )
    p = Polygon(1, "L", [ring])
    got = pip_polygon([100, 300, 300, 100], [200, 200, 50, 50], p)
    assert got.tolist() == [INSIDE, OUTSIDE, INSIDE, INSIDE]


def test_vectorized_matches_scalar_oracle_random():
    rng = np.random.RandomState(42)
    for trial in range(8):
        nvert = rng.randint(3, 12)
        # random simple-ish polygon: points on a jittered circle (no
        # self-intersection needed for parity agreement — both sides
        # implement the same procedure)
        ang = np.sort(rng.uniform(0, 2 * math.pi, nvert))
        rad = rng.randint(50, 500, nvert)
        xs = (np.cos(ang) * rad).astype(np.int64)
        ys = (np.sin(ang) * rad).astype(np.int64)
        p = Polygon(1, f"r{trial}", [Ring(xs, ys)])
        px = rng.randint(-600, 600, 300).astype(np.int64)
        py = rng.randint(-600, 600, 300).astype(np.int64)
        # include exact vertices and edge midpoints
        px = np.concatenate([px, xs, (xs + np.roll(xs, -1)) // 2])
        py = np.concatenate([py, ys, (ys + np.roll(ys, -1)) // 2])
        got = pip_polygon(px, py, p)
        want = np.array([oracle_pip(int(x), int(y), p) for x, y in zip(px, py)])
        assert np.array_equal(got, want)


def test_cover_is_exact_superset():
    rng = np.random.RandomState(1)
    for trial in range(5):
        nvert = rng.randint(3, 10)
        ang = np.sort(rng.uniform(0, 2 * math.pi, nvert))
        rad = rng.randint(10**7, 10**8, nvert)
        cx, cy = rng.randint(-10**9, 10**9), rng.randint(-7 * 10**8, 7 * 10**8)
        xs = (cx + np.cos(ang) * rad).astype(np.int64)
        ys = (cy + np.sin(ang) * rad).astype(np.int64)
        p = Polygon(1, f"c{trial}", [Ring(xs, ys)])
        level = 9
        cover = set(polygon_cover(p, level).tolist())
        # every matching random point's cell must be in the cover
        px = rng.randint(cx - 2 * 10**8, cx + 2 * 10**8, 2000).astype(np.int64)
        py = rng.randint(cy - 2 * 10**8, cy + 2 * 10**8, 2000).astype(np.int64)
        match = pip_polygon(px, py, p) != OUTSIDE
        pc = cells.lonlat_cell(px[match], py[match], level)
        assert set(pc.tolist()) <= cover


def test_cover_compact_preserves_coverage():
    p = Polygon(1, "sq", [square(0, 0, 50_000_000)])
    level = 8
    cov = polygon_cover(p, level)
    comp = polygon_cover(p, level, compacted=True)
    assert set(cells.uncompact(comp, level).tolist()) == set(cov.tolist())
    assert comp.size <= cov.size
