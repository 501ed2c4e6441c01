"""Distributed Schur BA tests on a virtual 8-device CPU mesh.

Validates SPMD correctness: the sharded reduction must match the
single-device bundle_adjust to float tolerance, on 1D ('pt') and 2D
('pt' x 'obs') meshes, with non-divisible sizes exercising padding.
"""

import pytest as _pytest

pytestmark = _pytest.mark.slow  # e2e/mesh tier: excluded from tests-fast

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gslam_tpu.opt.ba import ba_cost, bundle_adjust
from gslam_tpu.parallel.dist_ba import distributed_bundle_adjust
from gslam_tpu.parallel.mesh import make_mesh

from tests.test_opt import make_ba_problem


def cpu_mesh(shape):
    devs = jax.devices("cpu")
    n = shape[0] * shape[1]
    if len(devs) < n:
        pytest.skip(f"needs {n} cpu devices")
    return make_mesh(shape, devices=devs[:n])


class TestDistributedBA:
    @pytest.mark.parametrize("shape", [(4, 1), (8, 1), (4, 2)])
    def test_matches_single_device(self, rng, shape):
        prob, gt_poses, gt_X = make_ba_problem(
            rng, C=5, P=40, O=4, pose_noise=0.02, point_noise=0.05)
        mesh = cpu_mesh(shape)
        out_d, costs_d = distributed_bundle_adjust(prob, mesh, iters=8)
        out_s, stats_s = bundle_adjust(prob, iters=8)
        # both must converge to (nearly) zero cost on clean data
        assert float(costs_d[-1]) < 1e-9
        assert float(stats_s.cost[-1]) < 1e-9
        np.testing.assert_allclose(np.asarray(out_d.cam_pose),
                                   np.asarray(out_s.cam_pose), atol=1e-3)

    def test_padding_nondivisible(self, rng):
        # P=37 not divisible by 4; O=3 not divisible by 2
        prob, _, _ = make_ba_problem(rng, C=4, P=37, O=3,
                                     pose_noise=0.01, point_noise=0.02)
        mesh = cpu_mesh((4, 2))
        out, costs = distributed_bundle_adjust(prob, mesh, iters=6)
        assert float(costs[-1]) < 1e-9
        assert out.point_xyz.shape == prob.point_xyz.shape

    def test_cost_decreases(self, rng):
        prob, _, _ = make_ba_problem(rng, C=6, P=64, O=5,
                                     pose_noise=0.03, point_noise=0.08)
        mesh = cpu_mesh((8, 1))
        out, costs = distributed_bundle_adjust(prob, mesh, iters=8)
        costs = np.asarray(costs)
        assert costs[-1] < costs[0] * 1e-3
        assert np.all(np.diff(costs) <= 1e-6)

    def test_fixed_blocks_respected(self, rng):
        prob, _, _ = make_ba_problem(rng, C=4, P=32, O=4, pose_noise=0.02)
        mesh = cpu_mesh((4, 1))
        out, _ = distributed_bundle_adjust(prob, mesh, iters=4)
        np.testing.assert_array_equal(np.asarray(out.cam_pose[0]),
                                      np.asarray(prob.cam_pose[0]))


class TestFaultRecovery:
    """SURVEY 5.3: fail-stop + checkpoint-based restart.

    The recovery story is: map state is a pytree checkpoint (npz); if a
    host's shard is lost mid-run, reload the checkpoint and re-run —
    results must reproduce exactly (deterministic distributed BA)."""

    def test_shard_drop_recovers_from_checkpoint(self, rng, tmp_path):
        from gslam_tpu.opt.ba import BundleProblem

        mesh = cpu_mesh((4, 1))
        prob, _, _ = make_ba_problem(rng, pose_noise=0.02,
                                     point_noise=0.05)
        ref, ref_costs = distributed_bundle_adjust(prob, mesh, iters=4)
        ref_costs = np.asarray(ref_costs)

        # checkpoint the problem state (the arena analog for this test)
        ckpt = {f"f{i}": np.asarray(x)
                for i, x in enumerate(jax.tree_util.tree_leaves(prob))}
        np.savez(tmp_path / "ckpt.npz", **ckpt)

        # FAULT: one device's landmark shard is lost/corrupted
        P = prob.point_xyz.shape[0]
        lost = slice(0, P // 4)  # shard of device 0 on the 'pt' axis
        corrupted = prob._replace(
            point_xyz=prob.point_xyz.at[lost].set(1e3))
        out_bad, costs_bad = distributed_bundle_adjust(corrupted, mesh,
                                                       iters=4)
        # damage is observable: cost well above the healthy run's (the
        # robust kernel caps per-residual influence, so ~14x not ~1e6x)
        assert float(np.asarray(costs_bad)[0]) > 5 * ref_costs[0]

        # RECOVERY: reload checkpoint, re-run -> bit-identical costs
        z = np.load(tmp_path / "ckpt.npz")
        leaves = [z[f"f{i}"] for i in range(len(z.files))]
        restored = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(prob), leaves)
        out2, costs2 = distributed_bundle_adjust(restored, mesh, iters=4)
        np.testing.assert_array_equal(np.asarray(costs2), ref_costs)
        np.testing.assert_array_equal(np.asarray(out2.cam_pose),
                                      np.asarray(ref.cam_pose))


class TestMultiSequenceDistributedBA:
    """BASELINE config #5 analog: maps from two sequences merged into
    one arena and globally bundle-adjusted over the device mesh
    (shard-local landmark elimination, psum'd camera system)."""

    def test_merge_then_distributed_global_ba(self):
        from gslam_tpu.datasets.synthetic import SyntheticDataset
        from gslam_tpu.map.arena import arena_stats, merge_arenas
        from gslam_tpu.models.keyframe_slam import KeyframeSLAM, SLAMConfig
        from gslam_tpu.opt.ba import global_bundle_adjust

        cfg = dict(max_kps=160, fast_threshold=0.1, ba_window=3,
                   ba_points=192, ba_iters=2, cap_frames=16,
                   cap_points=1024, cap_obs=4096, local_map_size=256)

        def run(seed):
            ds = SyntheticDataset(n_frames=8, n_points=250, width=160,
                                  height=120, motion="line", depth=True,
                                  seed=seed)
            ds.open("synth://")
            slam = KeyframeSLAM(ds.camera, SLAMConfig(**cfg))
            for fr in ds:
                slam.track(fr)
            return slam, ds.camera

        s1, cam = run(3)
        s2, _ = run(11)
        # sequence 2's world placed 50m away (as an inter-sequence
        # alignment from loop closure would)
        T = jnp.asarray([50., 0., 0., 1, 0, 0, 0, 1.], jnp.float32)
        merged = merge_arenas(s1.arena, s2.arena, transform_b=T)
        st = arena_stats(merged)
        assert st["n_frames"] == (int(s1.arena.n_frames)
                                  + int(s2.arena.n_frames))
        assert st["valid_points"] > 100

        mesh = cpu_mesh((4, 2))
        out, costs = global_bundle_adjust(merged, cam, iters=4,
                                          max_cams=16, max_points=1024,
                                          max_obs_per_point=8, mesh=mesh)
        costs = np.asarray(costs)
        assert np.isfinite(costs).all()
        assert costs[-1] <= costs[0] * 1.05  # BA does not diverge
        # both sequences' keyframes stayed in their own neighborhoods
        # — checked on camera CENTERS, not pose translations (the
        # translation-sign check masked a real merge bug: poses were
        # left-composed with the alignment transform, moving cameras
        # OPPOSITE to the points; fixed round 5)
        from gslam_tpu.core.se3 import se3_inverse

        n1 = int(s1.arena.n_frames)
        ctr = np.asarray(se3_inverse(
            out.frame_pose[:st["n_frames"], :7])[:, :3])
        assert np.abs(ctr[:n1, 0]).max() < 25.0
        assert ctr[n1:, 0].min() > 25.0
        # cameras and points must be in the SAME rebased world: b's
        # points sit around x=+50 like b's cameras
        pv = np.asarray(out.point_valid)
        px = np.asarray(out.point_xyz)[pv]
        assert px[:, 0].max() > 25.0


class TestShardedTracking:
    """Frame-parallel tracking (parallel/tracking.py): B frames sharded
    over a 1-D 'dp' mesh must give bit-identical results to running the
    fused tracking step per frame on one device."""

    def test_matches_per_frame(self):
        from gslam_tpu.models.graft import example_inputs, track_forward
        from gslam_tpu.parallel.mesh import make_dp_mesh
        from gslam_tpu.parallel.tracking import sharded_track_batch

        devs = jax.devices("cpu")
        if len(devs) < 4:
            pytest.skip("needs 4 cpu devices")
        mesh = make_dp_mesh(4, devices=devs)
        img, cam, xyz, desc, valid, key = example_inputs(
            H=96, W=128, M=512, max_kps=128)
        B = 8
        imgs = jnp.stack([img + 1e-4 * i for i in range(B)])
        keys = jax.random.split(key, B)
        poses, n_inl, n_feat = sharded_track_batch(
            mesh, imgs, cam, xyz, desc, valid, keys, max_kps=128,
            ransac_b=64)
        assert poses.shape == (B, 7)
        for i in range(0, B, 3):
            T, n, nf = track_forward(imgs[i], cam, xyz, desc, valid,
                                     keys[i], max_kps=128, ransac_b=64)
            np.testing.assert_allclose(np.asarray(poses[i]),
                                       np.asarray(T), atol=1e-5)
            assert int(n_inl[i]) == int(n)
            assert int(n_feat[i]) == int(nf)
        # the step found real inlier sets (not degenerate)
        assert int(jnp.min(n_inl)) > 20


class TestRingExchangeBA:
    """Ring-exchange distributed BA (ppermute; SURVEY 5.7's
    ring-attention analog): camera blocks sharded over the mesh and
    rotated between neighbors instead of replicated + psum'd."""

    def test_matches_single_device(self, rng):
        from jax.sharding import Mesh

        from gslam_tpu.parallel.dist_ba import \
            distributed_bundle_adjust_ring

        devs = jax.devices("cpu")
        if len(devs) < 8:
            pytest.skip("needs 8 cpu devices")
        mesh = Mesh(np.array(devs[:8]), ("pt",))
        prob, gt_poses, gt_X = make_ba_problem(
            rng, C=6, P=64, O=4, pose_noise=0.02, point_noise=0.05)
        out_r, costs_r = distributed_bundle_adjust_ring(prob, mesh,
                                                        iters=8)
        out_s, stats_s = bundle_adjust(prob, iters=8)
        assert float(costs_r[-1]) < 1e-9
        np.testing.assert_allclose(np.asarray(out_r.cam_pose),
                                   np.asarray(out_s.cam_pose), atol=1e-3)
        np.testing.assert_allclose(np.asarray(costs_r),
                                   np.asarray(stats_s.cost),
                                   rtol=0.05, atol=1e-8)

    def test_ppermute_in_jaxpr(self, rng):
        """The ring variant must actually exchange via ppermute (this
        is the VERDICT round-2 item's 'done' check)."""
        from jax.sharding import Mesh

        from gslam_tpu.parallel.dist_ba import \
            distributed_bundle_adjust_ring

        devs = jax.devices("cpu")
        if len(devs) < 4:
            pytest.skip("needs 4 cpu devices")
        mesh = Mesh(np.array(devs[:4]), ("pt",))
        prob, _, _ = make_ba_problem(rng, C=4, P=16, O=3)
        jaxpr = jax.make_jaxpr(
            lambda p: distributed_bundle_adjust_ring(p, mesh, iters=1))(
            prob)
        assert "ppermute" in str(jaxpr)


class TestRingPallasBackend:
    def test_ring_pallas_matches_jnp_backend(self):
        """distributed_bundle_adjust_ring(backend='pallas', interpret)
        on the virtual mesh walks the same LM trajectory as its jnp
        backend: per-shard fused-kernel partials ARE the reduce-scatter
        payload."""
        import jax

        from gslam_tpu.parallel.dist_ba import \
            distributed_bundle_adjust_ring
        from jax.sharding import Mesh

        rng = np.random.default_rng(0)
        prob, _, _ = make_ba_problem(rng, C=6, P=64, O=4,
                                     pose_noise=0.02, point_noise=0.05)
        devs = jax.devices("cpu")
        if len(devs) < 4:
            pytest.skip("needs 4 cpu devices")
        mesh = Mesh(np.array(devs[:4]), ("pt",))
        with jax.default_matmul_precision("highest"):
            out_j, costs_j = distributed_bundle_adjust_ring(
                prob, mesh, iters=5)
            out_p, costs_p = distributed_bundle_adjust_ring(
                prob, mesh, iters=5, backend="pallas", interpret=True)
        # late iterations sit at the f32 cost floor (1e-9..1e-11)
        # where summation-order noise dominates; the meaningful
        # contract is the convergence path and the final state
        np.testing.assert_allclose(np.asarray(costs_p),
                                   np.asarray(costs_j), rtol=2e-2,
                                   atol=1e-8)
        np.testing.assert_allclose(np.asarray(out_p.cam_pose),
                                   np.asarray(out_j.cam_pose),
                                   atol=1e-4)
