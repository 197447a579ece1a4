"""Property-based spot checks (SURVEY §5.3) — hypothesis over the pure
numpy kernels (no Spark session needed)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from osmgraft import cells
from osmgraft.geometry import OUTSIDE, Polygon, Ring, pip_polygon

LON = st.integers(min_value=-cells.HALF_WORLD, max_value=cells.HALF_WORLD - 1)
LAT = st.integers(min_value=-850_000_000, max_value=850_000_000)
LEVEL = st.integers(min_value=1, max_value=18)


@settings(max_examples=200, deadline=None)
@given(lon=LON, lat=LAT, level=LEVEL)
def test_parent_of_cell_is_coarser_cell(lon, lat, level):
    c = cells.lonlat_cell(np.int64(lon), np.int64(lat), level)
    p = cells.parent(np.array([c]))[0]
    assert p == cells.lonlat_cell(np.int64(lon), np.int64(lat), level - 1)


@settings(max_examples=200, deadline=None)
@given(lon=LON, lat=LAT, level=LEVEL)
def test_point_is_inside_its_cell_bounds(lon, lat, level):
    c = cells.lonlat_cell(np.int64(lon), np.int64(lat), level)
    xmin, xmax, ymin, ymax = cells.cell_bounds_e7(np.array([c]))
    assert xmin[0] <= lon <= xmax[0]
    assert ymin[0] <= lat <= ymax[0]


@settings(max_examples=100, deadline=None)
@given(
    lon=LON, lat=LAT,
    level=st.integers(min_value=2, max_value=16),
    k=st.integers(min_value=1, max_value=3),
)
def test_k_ring_contains_own_cell_and_is_complete(lon, lat, level, k):
    c = int(cells.lonlat_cell(np.int64(lon), np.int64(lat), level))
    ring = set(cells.k_ring(c, k).tolist())
    assert c in ring
    n = 1 << level
    _, y, x = cells.cell_decode(np.array([c]))
    expect = set()
    for dy in range(-k, k + 1):
        yy = int(y[0]) + dy
        if 0 <= yy < n:
            for dx in range(-k, k + 1):
                expect.add(int(cells.cell_id((int(x[0]) + dx) % n, yy, level)))
    assert ring == expect


@settings(max_examples=60, deadline=None)
@given(
    cx=st.integers(min_value=-10**9, max_value=10**9),
    cy=st.integers(min_value=-7 * 10**8, max_value=7 * 10**8),
    data=st.data(),
)
def test_random_ring_cover_superset(cx, cy, data):
    nvert = data.draw(st.integers(min_value=3, max_value=8))
    angs = sorted(
        data.draw(
            st.lists(
                st.floats(min_value=0, max_value=6.28, allow_nan=False),
                min_size=nvert, max_size=nvert, unique=True,
            )
        )
    )
    rad = data.draw(
        st.lists(
            st.integers(min_value=10**6, max_value=5 * 10**7),
            min_size=nvert, max_size=nvert,
        )
    )
    xs = np.array([cx + int(np.cos(a) * r) for a, r in zip(angs, rad)], dtype=np.int64)
    ys = np.array([cy + int(np.sin(a) * r) for a, r in zip(angs, rad)], dtype=np.int64)
    poly = Polygon(1, "h", [Ring(xs, ys)])
    level = 10
    from osmgraft.geometry import polygon_cover

    cover = set(polygon_cover(poly, level).tolist())
    # sample points near the polygon; every match's cell must be covered
    px = data.draw(
        st.lists(
            st.integers(min_value=cx - 10**8, max_value=cx + 10**8),
            min_size=20, max_size=20,
        )
    )
    py = data.draw(
        st.lists(
            st.integers(min_value=cy - 10**8, max_value=cy + 10**8),
            min_size=20, max_size=20,
        )
    )
    px, py = np.array(px, dtype=np.int64), np.array(py, dtype=np.int64)
    res = pip_polygon(px, py, poly)
    hit = res != OUTSIDE
    pc = cells.lonlat_cell(px[hit], py[hit], level)
    assert set(pc.tolist()) <= cover


@settings(max_examples=100, deadline=None)
@given(lat=LAT)
def test_mercator_monotone_and_symmetric(lat):
    y = int(cells.mercator_y_e7(np.int64(lat)))
    y_neg = int(cells.mercator_y_e7(np.int64(-lat)))
    assert y == -y_neg
    if lat >= 0:
        assert y >= lat or lat < 10  # mercator stretches poleward
