"""ops layer: voxel reductions, kNN, masked selection, range projection."""

import jax
import jax.numpy as jnp
import numpy as np

from mloam_tpu.core import rangeimage as ri
from mloam_tpu.ops import knn as knn_ops
from mloam_tpu.ops import select, voxel


class TestVoxel:
    def test_downsample_merges_same_cell(self):
        xyz = jnp.array(
            [[0.01, 0.01, 0.01], [0.02, 0.02, 0.02], [5.0, 5.0, 5.0], [9.0, 0.0, 0.0]]
        )
        mask = jnp.array([True, True, True, False])
        out, m, _ = voxel.voxel_downsample(xyz, mask, leaf=0.5)
        assert int(m.sum()) == 2
        got = np.sort(np.asarray(out[m]), axis=0)
        want = np.sort(np.array([[0.015, 0.015, 0.015], [5.0, 5.0, 5.0]]), axis=0)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_downsample_matches_bruteforce(self):
        key = jax.random.PRNGKey(0)
        xyz = jax.random.uniform(key, (500, 3), minval=-10, maxval=10)
        mask = jnp.arange(500) < 400
        leaf = 1.0
        out, m, _ = voxel.voxel_downsample(xyz, mask, leaf)
        # brute force with numpy
        pts = np.asarray(xyz[:400])
        cells = {}
        for p in pts:
            k = tuple(np.floor(p / leaf).astype(int))
            cells.setdefault(k, []).append(p)
        want = np.sort(np.array([np.mean(v, 0) for v in cells.values()]), axis=0)
        got = np.sort(np.asarray(out[m]), axis=0)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_cov_filter_weights_and_rejection(self):
        # two points in one cell: one high-cov (rejected), two weighted
        xyz = jnp.array([[0.0, 0, 0], [0.1, 0, 0], [0.2, 0, 0]])
        cov = jnp.stack(
            [0.1 * jnp.eye(3), 0.3 * jnp.eye(3), 5.0 * jnp.eye(3)]
        )  # traces 0.3, 0.9, 15 (reject)
        mask = jnp.ones(3, bool)
        out_xyz, out_cov, m, _ = voxel.voxel_downsample_with_cov(
            xyz, cov, mask, leaf=1.0, trace_threshold=2.0
        )
        assert int(m.sum()) == 1
        w1, w2 = 2.0 - 0.3, 2.0 - 0.9
        want = (w1 * xyz[0] + w2 * xyz[1]) / (w1 + w2)
        np.testing.assert_allclose(out_xyz[0], want, atol=1e-6)
        want_cov = (w1**2 * cov[0] + w2**2 * cov[1]) / (w1 + w2) ** 2
        np.testing.assert_allclose(out_cov[0], want_cov, atol=1e-6)


    def test_two_class_matches_separate(self):
        key = jax.random.PRNGKey(5)
        ka, kb = jax.random.split(key)
        xa = jax.random.uniform(ka, (300, 3), minval=-20, maxval=20)
        xb = jax.random.uniform(kb, (500, 3), minval=-20, maxval=20)
        ma = jnp.arange(300) < 250
        mb = jnp.arange(500) < 430
        a_ds, a_m, b_ds, b_m = voxel.voxel_downsample_two_class(
            xa, ma, 0.5, xb, mb, 1.0
        )
        ra, rma, _ = voxel.voxel_downsample(xa, ma, 0.5, packed=True)
        rb, rmb, _ = voxel.voxel_downsample(xb, mb, 1.0, packed=True)
        assert int(a_m.sum()) == int(rma.sum())
        assert int(b_m.sum()) == int(rmb.sum())
        np.testing.assert_allclose(
            np.sort(np.asarray(a_ds[a_m]), 0), np.sort(np.asarray(ra[rma]), 0),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.sort(np.asarray(b_ds[b_m]), 0), np.sort(np.asarray(rb[rmb]), 0),
            atol=1e-5,
        )

    def test_two_class_all_invalid_class(self):
        xa = jnp.zeros((8, 3))
        xb = jnp.ones((8, 3))
        a_ds, a_m, b_ds, b_m = voxel.voxel_downsample_two_class(
            xa, jnp.zeros(8, bool), 0.5, xb, jnp.ones(8, bool), 0.5
        )
        assert int(a_m.sum()) == 0 and int(b_m.sum()) == 1


class TestKNN:
    def test_matches_bruteforce(self):
        kq, kr = jax.random.split(jax.random.PRNGKey(1))
        q = jax.random.normal(kq, (64, 3))
        r = jax.random.normal(kr, (300, 3)) * 2
        mask = jnp.arange(300) < 250
        d, i = knn_ops.knn(q, r, mask, k=5, chunk=128)
        dn = np.array(knn_ops.pairwise_sqdist(q, r))
        dn[:, 250:] = np.inf
        want_i = np.argsort(dn, axis=1)[:, :5]
        want_d = np.take_along_axis(dn, want_i, 1)
        np.testing.assert_allclose(np.sort(d, 1), np.sort(want_d, 1), atol=1e-4)
        # distances must match (indices can differ on ties)
        np.testing.assert_allclose(
            np.take_along_axis(dn, np.asarray(i), 1), np.asarray(d), atol=1e-4
        )

    def test_single_chunk_path(self):
        q = jnp.array([[0.0, 0, 0]])
        r = jnp.array([[1.0, 0, 0], [0.1, 0, 0], [2.0, 0, 0]])
        d, i = knn_ops.knn(q, r, jnp.ones(3, bool), k=2)
        assert i[0, 0] == 1 and i[0, 1] == 0
        np.testing.assert_allclose(d[0], [0.01, 1.0], atol=1e-6)


class TestSelect:
    def test_masked_top_k(self):
        s = jnp.array([3.0, 9.0, 1.0, 7.0])
        m = jnp.array([True, False, True, True])
        vals, idx, valid = select.masked_top_k(s, m, 2)
        assert list(idx) == [3, 0]
        assert valid.all()

    def test_compact_by_mask(self):
        v = jnp.arange(6, dtype=jnp.float32)[:, None]
        m = jnp.array([False, True, False, True, True, False])
        out, nm = select.compact_by_mask(v, m)
        assert list(out[:3, 0]) == [1.0, 3.0, 4.0]
        assert nm[:3].all() and not nm[3:].any()

    def test_compact_stride_under_cap(self):
        # fits the cap: identical to stable compaction, padded with fill
        v = jnp.arange(8, dtype=jnp.float32)[:, None]
        m = jnp.array([False, True, False, True, True, False, True, False])
        out, nm = select.compact_stride(v, m, cap=6)
        assert list(out[:4, 0]) == [1.0, 3.0, 4.0, 6.0]
        assert list(nm) == [True] * 4 + [False] * 2
        assert (out[4:] == 0.0).all()

    def test_compact_stride_over_cap(self):
        # more valid rows than cap: even stride over the compacted order
        n, cap = 100, 10
        v = jnp.arange(n, dtype=jnp.float32)[:, None]
        m = jnp.ones((n,), bool)
        out, nm = select.compact_stride(v, m, cap=cap)
        assert nm.all()
        np.testing.assert_allclose(
            out[:, 0], np.floor(np.arange(cap) * n / cap)
        )

    def test_compact_stride_empty(self):
        v = jnp.ones((5, 2))
        m = jnp.zeros((5,), bool)
        out, nm = select.compact_stride(v, m, cap=3)
        assert not nm.any() and (out == 0).all()

    def test_compact_gather_indices_matches_compact_stride(self):
        rng = np.random.default_rng(3)
        n, cap = 200, 16
        v = jnp.asarray(rng.normal(size=(n, 2)).astype(np.float32))
        m = jnp.asarray(rng.random(n) < 0.6)
        src, om = select.compact_gather_indices(m, cap)
        ref, rm = select.compact_stride(v, m, cap)
        np.testing.assert_array_equal(np.asarray(om), np.asarray(rm))
        got = np.where(np.asarray(om)[:, None], np.asarray(v)[src], 0.0)
        np.testing.assert_allclose(got, np.asarray(ref))

    def test_even_stride_exact_at_large_products(self):
        # f32 floor(ar*num/cap) loses integer precision past ~2^24;
        # the split-product integer form must stay exact (no duplicated
        # or skipped source rows) at the largest supported cap
        cap = 65536
        for num in (65535, 50000, 123457):
            ar = jnp.arange(cap, dtype=jnp.int32)
            got = np.asarray(select._even_stride(ar, jnp.int32(num), cap))
            want = (np.arange(cap, dtype=np.int64) * num) // cap
            np.testing.assert_array_equal(got, want)
            assert got.max() < num


class TestRangeImage:
    def test_project_roundtrip(self):
        model = ri.LidarModel(n_rings=16, n_cols=360)
        # synthesize points exactly on the grid
        rings = jnp.arange(16)
        vert = jnp.deg2rad(-15 + 2.0 * rings)
        az = jnp.deg2rad(jnp.arange(360, dtype=jnp.float32) - 179.5)
        rng = 5.0
        pts = jnp.stack(
            jnp.broadcast_arrays(
                rng * jnp.cos(vert)[:, None] * jnp.cos(az)[None, :],
                rng * jnp.cos(vert)[:, None] * jnp.sin(az)[None, :],
                rng * jnp.sin(vert)[:, None] * jnp.ones((1, 360)),
            ),
            axis=-1,
        ).reshape(-1, 3)
        img = ri.project(pts, jnp.ones(pts.shape[0], bool), model)
        assert bool(img.valid.all())
        np.testing.assert_allclose(img.rng, rng, atol=1e-4)

    def test_collision_keeps_closest(self):
        model = ri.LidarModel(n_rings=16, n_cols=360)
        pts = jnp.array([[5.0, 0.0, 0.0], [2.0, 0.0, 0.0]])
        img = ri.project(pts, jnp.ones(2, bool), model)
        assert float(img.rng.max()) == 2.0

    def test_out_of_fov_dropped(self):
        model = ri.LidarModel(n_rings=16, n_cols=360)
        pts = jnp.array([[1.0, 0.0, 5.0]])  # way above +15 deg
        img = ri.project(pts, jnp.ones(1, bool), model)
        assert not bool(img.valid.any())


class TestSym3x3:
    def test_eigvals_match_lapack(self):
        import jax
        from mloam_tpu.ops import sym3x3
        key = jax.random.PRNGKey(0)
        B = jax.random.normal(key, (200, 3, 3))
        A = B @ jnp.swapaxes(B, -1, -2)
        want = np.linalg.eigvalsh(np.asarray(A))
        got = np.asarray(sym3x3.eigvalsh3(A))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_eigvecs_are_eigvecs(self):
        import jax
        from mloam_tpu.ops import sym3x3
        key = jax.random.PRNGKey(1)
        B = jax.random.normal(key, (100, 3, 3))
        A = B @ jnp.swapaxes(B, -1, -2)
        vals, v_small = sym3x3.smallest_eigvec3(A)
        _, v_large = sym3x3.largest_eigvec3(A)
        # A v = lambda v
        res_s = np.asarray(
            jnp.einsum("nij,nj->ni", A, v_small) - vals[:, :1] * v_small
        )
        res_l = np.asarray(
            jnp.einsum("nij,nj->ni", A, v_large) - vals[:, 2:] * v_large
        )
        scale = np.asarray(vals[:, 2:])
        assert (np.linalg.norm(res_s, axis=1) / (scale[:, 0] + 1)).max() < 1e-3
        assert (np.linalg.norm(res_l, axis=1) / (scale[:, 0] + 1)).max() < 1e-3

    def test_degenerate_isotropic(self):
        from mloam_tpu.ops import sym3x3
        A = jnp.broadcast_to(jnp.eye(3), (4, 3, 3))
        vals, v = sym3x3.smallest_eigvec3(A)
        np.testing.assert_allclose(vals, 1.0, atol=1e-5)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(v), axis=1), 1.0)


class TestPallasKNN:
    """Interpret-mode checks of the bucketed Pallas k-NN against the XLA
    path (the real-chip compile is exercised by bench/verify runs)."""

    def _interp(self):
        import functools
        from jax.experimental import pallas as pl

        orig = pl.pallas_call
        pl.pallas_call = functools.partial(orig, interpret=True)
        return pl, orig

    def test_1nn_exact_matches_xla(self):
        import jax
        import mloam_tpu.ops.pallas_knn as PK

        pl, orig = self._interp()
        try:
            q = jax.random.normal(jax.random.PRNGKey(0), (700, 3)) * 5
            r = jax.random.normal(jax.random.PRNGKey(1), (3000, 3)) * 5
            mask = jnp.arange(3000) < 2500
            d, i = PK.knn_pallas(q, r, mask, 1)
            d2, i2 = knn_ops.knn(q, r, mask, 1)
            np.testing.assert_allclose(
                np.asarray(d[:, 0]), np.asarray(d2[:, 0]), atol=1e-3
            )
            assert float((i[:, 0] == i2[:, 0]).mean()) == 1.0
        finally:
            pl.pallas_call = orig

    def test_knn_recall_on_clustered_points(self):
        """Voxel-sorted map layout: spatially adjacent points adjacent in
        storage — the case the interleaved buckets are designed for."""
        import jax
        import mloam_tpu.ops.pallas_knn as PK

        pl, orig = self._interp()
        try:
            rng = np.random.default_rng(3)
            # clustered reference, sorted by position (voxel-pack order)
            r = rng.uniform(-40, 40, (5000, 3)).astype(np.float32)
            order = np.lexsort((r[:, 2] // 0.5, r[:, 1] // 0.5, r[:, 0] // 0.5))
            r = jnp.asarray(r[order])
            q = jnp.asarray(rng.uniform(-40, 40, (512, 3)).astype(np.float32))
            mask = jnp.ones((5000,), bool)
            k = 5
            d, i = PK.knn_pallas(q, r, mask, k)
            d_x, i_x = jax.lax.top_k(
                -jnp.sum((q[:, None] - r[None]) ** 2, -1), k
            )
            # sorted ascending, nearest exact, high recall of the true set
            assert bool(jnp.all(d[:, 1:] >= d[:, :-1] - 1e-5))
            assert float((i[:, 0] == i_x[:, 0]).mean()) > 0.999
            true_sets = np.asarray(i_x)
            got = np.asarray(i)
            recall = np.mean([
                len(set(got[n]) & set(true_sets[n])) / k
                for n in range(got.shape[0])
            ])
            assert recall > 0.9, recall
        finally:
            pl.pallas_call = orig

    def test_mask_contract(self):
        import mloam_tpu.ops.pallas_knn as PK

        pl, orig = self._interp()
        try:
            rng = np.random.default_rng(5)
            r = jnp.asarray(rng.uniform(-10, 10, (2500, 3)).astype(np.float32))
            q = jnp.asarray(rng.uniform(-10, 10, (300, 3)).astype(np.float32))
            mask = jnp.arange(2500) < 40  # almost everything masked
            d, i = PK.knn_pallas(q, r, mask, 5)
            i_np, d_np = np.asarray(i), np.asarray(d)
            finite = d_np < 1e29
            assert np.all(i_np[finite] < 40)
            assert np.all((i_np >= 0) & (i_np < 2500))
        finally:
            pl.pallas_call = orig
