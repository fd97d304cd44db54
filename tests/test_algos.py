"""Host-side algo utilities (convex hull, Hungarian, undirected graph)."""

import numpy as np

from mloam_tpu.utils import algos


class TestConvexHull:
    def test_square_with_interior_points(self):
        rng = np.random.default_rng(0)
        corners = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], float)
        interior = rng.uniform(0.1, 0.9, (50, 2))
        hull = algos.convex_hull_2d(np.vstack([corners, interior]))
        assert len(hull) == 4
        assert {tuple(p) for p in hull} == {tuple(p) for p in corners}
        assert abs(algos.polygon_area(hull) - 1.0) < 1e-12

    def test_hull_contains_all_points(self):
        rng = np.random.default_rng(1)
        pts = rng.normal(size=(200, 2))
        hull = algos.convex_hull_2d(pts)
        # every point is inside: cross products with all CCW edges >= 0
        for k in range(len(hull)):
            a, b = hull[k], hull[(k + 1) % len(hull)]
            s = np.cross(b - a, pts - a)
            assert np.all(s >= -1e-9)

    def test_degenerate_collinear(self):
        pts = np.array([[0, 0], [1, 1], [2, 2], [3, 3]], float)
        hull = algos.convex_hull_2d(pts)
        assert len(hull) == 2

    def test_ccw_order(self):
        rng = np.random.default_rng(2)
        hull = algos.convex_hull_2d(rng.normal(size=(64, 2)))
        assert algos.polygon_area(hull) > 0


class TestHungarian:
    def _brute(self, cost):
        import itertools

        n, m = cost.shape
        best = None
        if n <= m:
            for perm in itertools.permutations(range(m), n):
                c = sum(cost[i, j] for i, j in enumerate(perm))
                if best is None or c < best:
                    best = c
        return best

    def test_matches_bruteforce_square(self):
        rng = np.random.default_rng(3)
        for _ in range(20):
            c = rng.uniform(size=(5, 5))
            r, cidx = algos.hungarian(c)
            got = c[r, cidx].sum()
            assert abs(got - self._brute(c)) < 1e-9

    def test_matches_bruteforce_rect(self):
        rng = np.random.default_rng(4)
        for shape in [(3, 6), (6, 3), (4, 7)]:
            c = rng.uniform(size=shape)
            r, cidx = algos.hungarian(c)
            assert len(r) == min(shape)
            assert len(set(r.tolist())) == len(r)
            assert len(set(cidx.tolist())) == len(cidx)
            want = self._brute(c if shape[0] <= shape[1] else c.T)
            assert abs(c[r, cidx].sum() - want) < 1e-9

    def test_identity_preference(self):
        c = np.full((4, 4), 10.0) - 9.0 * np.eye(4)
        r, cidx = algos.hungarian(c)
        np.testing.assert_array_equal(r, cidx)


class TestUndirectedGraph:
    def test_components(self):
        g = algos.UndirectedGraph(7)
        g.add_edge(0, 1)
        g.add_edge(1, 2)
        g.add_edge(4, 5)
        comps = g.components()
        assert [0, 1, 2] in comps
        assert [4, 5] in comps
        assert [3] in comps and [6] in comps

    def test_chain_merge(self):
        g = algos.UndirectedGraph(100)
        for i in range(99):
            g.add_edge(i, i + 1)
        assert len(g.components()) == 1
