"""Map arena tests: insert/erase/query, covisibility, save/load, jit.

Covers the reference Map/HashMap surface (insertMapFrame/insertMapPoint/
eraseMapFrame/eraseMapPoint, counts, save/load — ``GSLAM/core/Map.h``) in
its arena re-design, plus arena-specific behavior: capacity overflow,
masked batch insertion, and jit-compiled insertion.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gslam_tpu.core.sim3 import sim3_identity
from gslam_tpu.map import (
    MapArena, add_observations, arena_stats, covisibility_matrix,
    covisibility_topk, erase_frame, erase_points, frame_point_ids,
    insert_frame, insert_points, load_arena, make_arena, save_arena,
)

CAPS = dict(cap_frames=8, cap_kps=16, cap_points=64, cap_obs=128)


def mk():
    return make_arena(**CAPS)


def frame_args(seed=0, count=5):
    rng = np.random.default_rng(seed)
    K = CAPS["cap_kps"]
    return dict(
        pose=sim3_identity(),
        time=1.5,
        kp_uv=jnp.asarray(rng.uniform(0, 100, (K, 2)).astype(np.float32)),
        kp_meta=jnp.zeros((K, 4), jnp.float32),
        desc=jnp.asarray(rng.integers(0, 2**31, (K, 8)).astype(np.uint32)),
        kp_count=count,
    )


class TestInsert:
    def test_insert_frame(self):
        a = mk()
        a, fid = insert_frame(a, **frame_args())
        assert int(fid) == 0
        a, fid2 = insert_frame(a, **frame_args(1))
        assert int(fid2) == 1
        st = arena_stats(a)
        assert st["n_frames"] == 2 and st["valid_frames"] == 2
        assert float(a.frame_time[0]) == 1.5

    def test_frame_overflow(self):
        a = mk()
        for i in range(CAPS["cap_frames"] + 2):
            a, fid = insert_frame(a, **frame_args(i))
        st = arena_stats(a)
        assert st["n_frames"] == CAPS["cap_frames"]
        assert st["overflow"]
        assert int(fid) == -1

    def test_insert_points_masked(self):
        a = mk()
        xyz = jnp.asarray(np.arange(30).reshape(10, 3).astype(np.float32))
        desc = jnp.zeros((10, 8), jnp.uint32)
        valid = jnp.asarray([1, 0, 1, 1, 0, 1, 1, 1, 0, 1], bool)
        a, ids = insert_points(a, xyz, desc, valid, ref_frame=0)
        ids = np.asarray(ids)
        assert (ids[~np.asarray(valid)] == -1).all()
        assert sorted(ids[np.asarray(valid)]) == list(range(7))
        # xyz written to the right slots
        for i, pid in enumerate(ids):
            if pid >= 0:
                np.testing.assert_allclose(a.point_xyz[pid],
                                           np.asarray(xyz)[i])
        assert arena_stats(a)["n_points"] == 7

    def test_insert_points_batches_accumulate(self):
        a = mk()
        for b in range(3):
            xyz = jnp.full((5, 3), float(b))
            a, ids = insert_points(a, xyz, jnp.zeros((5, 8), jnp.uint32),
                                   jnp.ones(5, bool), ref_frame=b)
        assert arena_stats(a)["n_points"] == 15
        assert float(a.point_xyz[10, 0]) == 2.0

    def test_point_overflow(self):
        a = mk()
        xyz = jnp.zeros((CAPS["cap_points"] + 10, 3))
        a, ids = insert_points(
            a, xyz, jnp.zeros((xyz.shape[0], 8), jnp.uint32),
            jnp.ones(xyz.shape[0], bool), ref_frame=0)
        st = arena_stats(a)
        assert st["n_points"] == CAPS["cap_points"] and st["overflow"]

    def test_observations(self):
        a = mk()
        a, fid = insert_frame(a, **frame_args())
        a, pids = insert_points(a, jnp.zeros((4, 3)),
                                jnp.zeros((4, 8), jnp.uint32),
                                jnp.ones(4, bool), ref_frame=0)
        a = add_observations(a, fid, pids, jnp.arange(4),
                             jnp.asarray([1, 1, 0, 1], bool))
        assert arena_stats(a)["valid_obs"] == 3
        pts = np.asarray(frame_point_ids(a, fid, 8))
        assert set(pts[pts >= 0]) == {0, 1, 3}


class TestEraseAndCovis:
    def build(self):
        """3 frames; pts 0-3 seen by f0&f1, pts 4-5 by f1&f2."""
        a = mk()
        for i in range(3):
            a, _ = insert_frame(a, **frame_args(i))
        a, pids = insert_points(a, jnp.zeros((6, 3)),
                                jnp.zeros((6, 8), jnp.uint32),
                                jnp.ones(6, bool), ref_frame=0)
        ones = jnp.ones(6, bool)
        a = add_observations(a, 0, pids, jnp.arange(6),
                             jnp.asarray([1, 1, 1, 1, 0, 0], bool))
        a = add_observations(a, 1, pids, jnp.arange(6), ones)
        a = add_observations(a, 2, pids, jnp.arange(6),
                             jnp.asarray([0, 0, 0, 0, 1, 1], bool))
        return a

    def test_covisibility_matrix(self):
        C = np.asarray(covisibility_matrix(self.build()))
        assert C[0, 1] == 4 and C[1, 0] == 4
        assert C[1, 2] == 2 and C[0, 2] == 0
        assert C[0, 0] == 0  # diagonal zeroed

    def test_covisibility_topk(self):
        ids, counts = covisibility_topk(self.build(), 1, k=3, min_common=1)
        ids, counts = np.asarray(ids), np.asarray(counts)
        assert ids[0] == 0 and counts[0] == 4
        assert ids[1] == 2 and counts[1] == 2
        assert ids[2] == -1

    def test_min_common_filters(self):
        ids, counts = covisibility_topk(self.build(), 1, k=3, min_common=3)
        assert np.asarray(ids)[1] == -1  # f2 (2 common) filtered

    def test_erase_points(self):
        a = self.build()
        a = erase_points(a, jnp.asarray([0, 1]))
        C = np.asarray(covisibility_matrix(a))
        assert C[0, 1] == 2
        assert arena_stats(a)["valid_points"] == 4

    def test_erase_frame(self):
        a = self.build()
        a = erase_frame(a, jnp.asarray(1))
        st = arena_stats(a)
        assert st["valid_frames"] == 2
        C = np.asarray(covisibility_matrix(a))
        assert C[1].sum() == 0 and C[:, 1].sum() == 0


class TestPersistJit:
    def test_save_load_roundtrip(self, tmp_path):
        a = TestEraseAndCovis().build()
        p = str(tmp_path / "map.npz")
        save_arena(a, p)
        b = load_arena(p)
        assert arena_stats(a) == arena_stats(b)
        np.testing.assert_array_equal(a.frame_kp_uv, b.frame_kp_uv)
        np.testing.assert_array_equal(a.obs_point, b.obs_point)

    def test_jit_insert(self):
        """Insertion compiles and is shape-stable (one compilation)."""
        args = frame_args()

        @jax.jit
        def step(a):
            a, fid = insert_frame(a, **args)
            return a, fid

        a = mk()
        a, f0 = step(a)
        a, f1 = step(a)
        assert int(f0) == 0 and int(f1) == 1
        assert arena_stats(a)["n_frames"] == 2

    def test_jit_full_pipeline(self):
        @jax.jit
        def step(a, xyz):
            a, fid = insert_frame(a, **frame_args())
            a, pids = insert_points(a, xyz, jnp.zeros((4, 8), jnp.uint32),
                                    jnp.ones(4, bool), ref_frame=fid)
            a = add_observations(a, fid, pids, jnp.arange(4),
                                 jnp.ones(4, bool))
            return a

        a = step(mk(), jnp.ones((4, 3)))
        st = arena_stats(a)
        assert st == {**st, "n_frames": 1, "n_points": 4, "valid_obs": 4}


class TestMaintenance:
    def test_cull_points(self):
        from gslam_tpu.map import cull_points

        a = TestEraseAndCovis().build()
        # advance frame counter so ages pass the gate
        a = a.replace(n_frames=jnp.asarray(10, jnp.int32))
        before = arena_stats(a)["valid_points"]
        out = cull_points(a, min_obs=2, min_age_frames=0)
        st = arena_stats(out)
        # pts 0-3 have 2 obs (f0+f1), pts 4-5 have 2 obs (f1+f2): all stay
        assert st["valid_points"] == before
        out2 = cull_points(a, min_obs=3, min_age_frames=0)
        assert arena_stats(out2)["valid_points"] == 0

    def test_compact_after_erase(self):
        from gslam_tpu.map import compact_arena

        a = TestEraseAndCovis().build()
        a = erase_points(a, jnp.asarray([0, 2]))
        xyz_before = np.array(a.point_xyz)
        a2, old2new = compact_arena(a)
        st = arena_stats(a2)
        assert st["valid_points"] == 4 and st["n_points"] == 4
        o2n = np.asarray(old2new)
        assert o2n[0] == -1 and o2n[2] == -1
        # surviving points keep their data at remapped slots
        for old in (1, 3, 4, 5):
            np.testing.assert_array_equal(
                np.asarray(a2.point_xyz[o2n[old]]), xyz_before[old])
        # covisibility preserved under remap
        C = np.asarray(covisibility_matrix(a2))
        assert C[0, 1] == 2 and C[1, 2] == 2


class TestMergeArenas:
    """Multi-session map merge (BASELINE config #5 building block)."""

    def _mini(self, seed, n_pts=5):
        from gslam_tpu.map.arena import (DESC_WORDS, add_observations,
                                         insert_frame, insert_points,
                                         make_arena)

        a = make_arena(8, 16, 32, 64)
        rng = np.random.default_rng(seed)
        kp = jnp.asarray(rng.uniform(0, 100, (16, 2)).astype(np.float32))
        a, fid = insert_frame(
            a, jnp.asarray([0, 0, 0, 1, 0, 0, 0, 1.], jnp.float32),
            jnp.asarray(0.0), kp, jnp.zeros((16, 4)),
            jnp.zeros((16, DESC_WORDS), jnp.uint32), jnp.asarray(16))
        xyz = jnp.asarray(rng.normal(0, 1, (n_pts, 3)).astype(np.float32))
        a, pids = insert_points(a, xyz,
                                jnp.zeros((n_pts, DESC_WORDS), jnp.uint32),
                                jnp.ones(n_pts, bool), jnp.asarray(fid))
        a = add_observations(a, fid, pids, jnp.arange(n_pts),
                             jnp.ones(n_pts, bool))
        return a, xyz

    def test_merge_offsets_and_transform(self):
        from gslam_tpu.map.arena import arena_stats, merge_arenas

        a, xa = self._mini(0)
        b, xb = self._mini(1)
        T = jnp.asarray([1., 2., 3., 1, 0, 0, 0, 2.], jnp.float32)
        m = merge_arenas(a, b, transform_b=T)
        st = arena_stats(m)
        assert st["n_frames"] == 2 and st["n_points"] == 10
        assert st["n_obs"] == 10 and not st["overflow"]
        np.testing.assert_allclose(np.asarray(m.point_xyz[:5]),
                                   np.asarray(xa), rtol=1e-6)
        # b's world mapped through Sim3 (scale 2, translate [1,2,3])
        np.testing.assert_allclose(
            np.asarray(m.point_xyz[5:10]),
            2.0 * np.asarray(xb) + np.array([1, 2, 3]), rtol=1e-5)
        # index offsets: b's single frame is now slot 1
        assert int(m.obs_frame[int(a.n_obs)]) == 1
        assert int(m.point_ref_frame[5]) == 1
        # the rebase must preserve each frame's CAMERA-coordinate view
        # of its own points: pose' o T == pose (the pre-round-5 code
        # left-composed T, moving cameras opposite to points)
        from gslam_tpu.core.sim3 import sim3_apply

        pc_before = np.asarray(sim3_apply(b.frame_pose[0][None],
                                          jnp.asarray(xb)))
        pc_after = np.asarray(sim3_apply(m.frame_pose[1][None],
                                         m.point_xyz[5:10]))
        np.testing.assert_allclose(pc_after, pc_before, rtol=1e-5,
                                   atol=1e-6)

    def test_merge_capacity_checks(self):
        from gslam_tpu.map.arena import merge_arenas

        a, _ = self._mini(0)
        b, _ = self._mini(1)
        with pytest.raises(ValueError):
            merge_arenas(a, b, cap_frames=1)
