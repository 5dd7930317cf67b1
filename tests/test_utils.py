"""Unit tests for core math/compression/rng/sorting utilities vs closed forms."""
import numpy as np
import pytest

from idkengine_tpu.utils import compression as comp
from idkengine_tpu.utils import mathutil as mu
from idkengine_tpu.utils import sorting


class TestHalton:
    def test_base2_prefix(self):
        # classic halton base-2: 1/2, 1/4, 3/4, 1/8, 5/8...
        got = mu.halton(np.arange(5), 2)
        np.testing.assert_allclose(got, [0.5, 0.25, 0.75, 0.125, 0.625])

    def test_range(self):
        pts = mu.halton_2d(256)
        assert pts.shape == (256, 2)
        assert (pts >= 0).all() and (pts < 1).all()


class TestMorton:
    def test_order_preserving_on_diagonal(self):
        pts = np.linspace(0, 0.999, 64)[:, None].repeat(3, axis=1)
        codes = mu.morton_encode(pts)
        assert (np.diff(codes.astype(np.int64)) >= 0).all()

    def test_axis_interleave(self):
        # x=1 quantized to lsb of x channel (bit position 2)
        c = mu.morton_encode(np.array([[1.5 / 1024, 0, 0]]))
        assert c[0] == 0b100
        c = mu.morton_encode(np.array([[0, 1.5 / 1024, 0]]))
        assert c[0] == 0b010
        c = mu.morton_encode(np.array([[0, 0, 1.5 / 1024]]))
        assert c[0] == 0b001


class TestHalfArea:
    def test_unit_cube(self):
        assert mu.half_area(np.array([1.0, 1.0, 1.0])) == 3.0

    def test_flat(self):
        assert mu.half_area(np.array([2.0, 3.0, 0.0])) == 6.0


class TestQuat:
    def test_round_trip(self):
        rs = np.random.RandomState(1)
        q = rs.randn(4)
        q /= np.linalg.norm(q)
        m = mu.quat_to_matrix(q)
        q2 = mu.matrix_to_quat(m)
        # q and -q are the same rotation
        assert np.allclose(q, q2, atol=1e-5) or np.allclose(q, -q2, atol=1e-5)

    def test_slerp_endpoints(self):
        q0 = np.array([0, 0, 0, 1.0])
        q1 = np.array([np.sin(0.5), 0, 0, np.cos(0.5)])
        np.testing.assert_allclose(mu.quat_slerp(q0, q1, 0.0), q0, atol=1e-6)
        np.testing.assert_allclose(mu.quat_slerp(q0, q1, 1.0), q1, atol=1e-6)

    def test_trs_decompose_roundtrip(self):
        rs = np.random.RandomState(2)
        t = rs.randn(3)
        q = rs.randn(4)
        q /= np.linalg.norm(q)
        s = np.abs(rs.randn(3)) + 0.5
        m = mu.trs_matrix(t, q, s)
        t2, q2, s2 = mu.decompose_trs(m)
        np.testing.assert_allclose(t, t2, atol=1e-5)
        np.testing.assert_allclose(s, s2, atol=1e-5)
        m2 = mu.trs_matrix(t2, q2, s2)
        np.testing.assert_allclose(m, m2, atol=1e-4)


class TestCompression:
    def test_octahedral_round_trip(self):
        rs = np.random.RandomState(3)
        n = rs.randn(1000, 3)
        n /= np.linalg.norm(n, axis=-1, keepdims=True)
        dec = comp.decompress_normal(comp.compress_normal(n))
        dots = np.sum(n * dec, axis=-1)
        assert dots.min() > 0.9999

    def test_r11g11b10_round_trip(self):
        rs = np.random.RandomState(4)
        v = np.abs(rs.randn(1000, 3)).astype(np.float32) * 10
        dec = comp.unpack_r11g11b10(comp.pack_r11g11b10(v))
        rel = np.abs(dec - v) / np.maximum(v, 1e-6)
        assert rel.max() < 0.05  # 5/6-bit mantissa

    def test_r11g11b10_zero(self):
        dec = comp.unpack_r11g11b10(comp.pack_r11g11b10(np.zeros((1, 3))))
        np.testing.assert_array_equal(dec, 0.0)

    def test_jnp_decode_matches_numpy(self):
        import jax.numpy as jnp

        rs = np.random.RandomState(5)
        n = rs.randn(64, 3)
        n /= np.linalg.norm(n, axis=-1, keepdims=True)
        packed = comp.compress_normal(n)
        a = comp.decompress_normal(packed)
        b = np.asarray(comp.decompress_normal(jnp.asarray(packed), jnp))
        np.testing.assert_allclose(a, b, atol=1e-5)


class TestSorting:
    def test_float_to_key_order(self):
        rs = np.random.RandomState(6)
        f = rs.randn(500).astype(np.float32) * 100
        keys = sorting.float_to_key(f)
        order_f = np.argsort(f, kind="stable")
        order_k = np.argsort(keys, kind="stable")
        np.testing.assert_array_equal(f[order_f], f[order_k])

    def test_radix_sort_matches_argsort(self):
        rs = np.random.RandomState(7)
        keys = rs.randint(0, 2**32, 1000, dtype=np.uint64).astype(np.uint32)
        idx = sorting.radix_sort_indices(keys)
        assert (np.diff(keys[idx].astype(np.int64)) >= 0).all()

    def test_stable_partition(self):
        arr = np.array([5, 1, 4, 2, 3])
        mask = arr >= 3
        out, pivot = sorting.stable_partition(arr, mask)
        np.testing.assert_array_equal(out, [5, 4, 3, 1, 2])
        assert pivot == 3


class TestRng:
    def test_pcg_uniform_distribution(self):
        import jax.numpy as jnp

        from idkengine_tpu.utils import rng

        state = rng.init_state(jnp.arange(10000), 0)
        _, u = rng.uniform(state)
        u = np.asarray(u)
        assert 0.0 <= u.min() and u.max() < 1.0
        assert abs(u.mean() - 0.5) < 0.02
        assert abs(np.corrcoef(u[:-1], u[1:])[0, 1]) < 0.05

    def test_r2_low_discrepancy(self):
        import jax.numpy as jnp

        from idkengine_tpu.utils import rng

        pts = np.asarray(rng.r2(jnp.arange(1000)))
        assert pts.shape == (1000, 2)
        assert abs(pts.mean() - 0.5) < 0.02


class TestProjection:
    def test_reverse_z_depth(self):
        p = mu.perspective_reverse_z(np.radians(60), 1.0, 0.1)
        # near plane -> depth 1
        v = p @ np.array([0, 0, -0.1, 1.0])
        assert v[2] / v[3] == pytest.approx(1.0, abs=1e-5)
        # far -> depth 0
        v = p @ np.array([0, 0, -1e6, 1.0])
        assert v[2] / v[3] == pytest.approx(0.0, abs=1e-4)

    def test_look_at(self):
        m = mu.look_at(np.array([0, 0, 5.0]), np.zeros(3), np.array([0, 1.0, 0]))
        v = m @ np.array([0, 0, 0, 1.0])
        np.testing.assert_allclose(v[:3], [0, 0, -5], atol=1e-6)


def test_moving_sphere_vs_sphere_ccd():
    from idkengine_tpu.collision import moving_sphere_vs_sphere

    # head-on: spheres 10 apart, radii 1+1, closing speed 10 => touch at
    # t = (10-2)/10 = 0.8
    t = moving_sphere_vs_sphere([0, 0, 0], [10, 0, 0], 1.0,
                                [10, 0, 0], [0, 0, 0], 1.0)
    assert t is not None and abs(t - 0.8) < 1e-9
    # separating: no hit
    assert moving_sphere_vs_sphere([0, 0, 0], [-5, 0, 0], 1.0,
                                   [10, 0, 0], [5, 0, 0], 1.0) is None
    # already overlapping: t=0
    assert moving_sphere_vs_sphere([0, 0, 0], [0, 0, 0], 2.0,
                                   [1, 0, 0], [0, 0, 0], 2.0) == 0.0
    # grazing miss (lateral offset > sum radii)
    assert moving_sphere_vs_sphere([0, 2.1, 0], [10, 0, 0], 1.0,
                                   [10, 0, 0], [0, 0, 0], 1.0) is None


def test_frustum_sat_intersect():
    import numpy as np

    from idkengine_tpu.collision import Frustum, convex_sat_intersect
    from idkengine_tpu.utils import mathutil as mu

    view = mu.look_at(np.array([0.0, 0, 0]), np.array([0.0, 0, -1]),
                      np.array([0.0, 1, 0]))
    proj = mu.perspective_reverse_z(60.0, 1.0, 0.1)
    fr = Frustum.from_view_projection(proj @ view)

    # box in front of the camera intersects, box behind does not
    assert convex_sat_intersect(fr, Frustum.from_aabb([-1, -1, -6], [1, 1, -4]))
    assert not convex_sat_intersect(fr, Frustum.from_aabb([-1, -1, 4], [1, 1, 6]))
    # box far off to the side: disjoint
    assert not convex_sat_intersect(fr, Frustum.from_aabb([50, -1, -6], [52, 1, -4]))
    # two frustums looking at each other overlap; rotated-apart ones do not
    view2 = mu.look_at(np.array([0.0, 0, -20]), np.array([0.0, 0, 0]),
                       np.array([0.0, 1, 0]))
    fr2 = Frustum.from_view_projection(proj @ view2)
    assert convex_sat_intersect(fr, fr2)
    view3 = mu.look_at(np.array([0.0, 0, 200]), np.array([0.0, 0, 300]),
                       np.array([0.0, 1, 0]))
    fr3 = Frustum.from_view_projection(proj @ view3)
    assert not convex_sat_intersect(fr, fr3)
