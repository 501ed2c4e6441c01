"""Loop closure end-to-end: BoW detection + verification + pose-graph
correction on a full-circle synthetic sequence (BASELINE config #3's
loop-closure component, offline analog).
"""

import pytest as _pytest

pytestmark = _pytest.mark.slow  # e2e/mesh tier: excluded from tests-fast

import jax.numpy as jnp
import numpy as np
import pytest

from gslam_tpu.datasets.synthetic import SyntheticDataset
from gslam_tpu.eval import evaluate_trajectory
from gslam_tpu.models.keyframe_slam import KeyframeSLAM, SLAMConfig
from gslam_tpu.models.loop_closure import LoopCloser
from gslam_tpu.ops.frontend import extract_features
from gslam_tpu.ops.vocab import train_vocabulary, transform, score_l2


def ring_ds(n=48):
    # 48 frames over the full circle: 7.5 deg/frame rotation (24 would
    # be 15 deg/frame — beyond what the descriptor frontend tracks)
    ds = SyntheticDataset(n_frames=n, n_points=500, width=192,
                          height=144, motion="ring", depth=True,
                          radius=6.0, world_extent=5.0)
    ds.open("synth://")
    return ds


@pytest.fixture(scope="module")
def voc():
    # train on descriptors from a few frames of the same world
    ds = ring_ds(6)
    descs = []
    for fr in ds:
        f = extract_features(jnp.asarray(fr.image), max_kps=128,
                             threshold=0.1)
        descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
    return train_vocabulary(np.concatenate(descs), k=6, L=2, seed=0)


class TestBoWRetrieval:
    def test_same_view_scores_higher(self, voc):
        ds = ring_ds(24)
        frames = list(ds)
        feats = [extract_features(jnp.asarray(fr.image), max_kps=128,
                                  threshold=0.1)
                 for fr in (frames[0], frames[1], frames[12])]
        del ds
        bows = [transform(voc, f.desc, f.valid)[0] for f in feats]
        db = jnp.stack([bows[1], bows[2]])
        s = np.asarray(score_l2(bows[0], db))
        # neighbor view (frame 1) must beat the opposite side (frame 12)
        assert s[0] > s[1]


def _ring_frames(n=48, revisit=0):
    """Ring sequence, optionally extended past the full circle by
    ``revisit`` frames that re-traverse the start (re-stamped copies of
    the first frames) — the canonical loop-closure geometry: by the
    time the camera is back, a full circle of drift separates its pose
    estimate from the start-region map."""
    import dataclasses

    frames = list(ring_ds(n))
    for j in range(revisit):
        src = frames[j]
        frames.append(dataclasses.replace(
            src, id=n + j, timestamp=(n + j) / 30.0))
    return frames


def _run_ring(voc, n=48, revisit=0):
    frames = _ring_frames(n, revisit)
    cfg = SLAMConfig(max_kps=192, fast_threshold=0.1, ba_window=4,
                     ba_points=256, ba_iters=3, cap_frames=64,
                     cap_points=4096, cap_obs=16384,
                     local_map_size=512, kf_max_gap=4)
    slam = KeyframeSLAM(frames[0].camera, cfg, vocabulary=voc)
    if voc is not None:
        slam.loop_closer.min_gap = 6
        slam.loop_closer.min_inliers = 13  # 192-kp scale (default 20
        #                                    assumes 500+ features)
    gts, ts = [], []
    for fr in frames:
        slam.track(fr)
        gts.append(fr.gt_pose[:3])
        ts.append(fr.timestamp)
    m = evaluate_trajectory(np.asarray(ts), slam.positions(),
                            np.asarray(ts), np.stack(gts),
                            with_scale=False)
    return slam, m, frames


class TestLoopClosureE2E:
    def test_ring_provably_closes(self, voc):
        """The closure must actually FIRE with DEFAULT detection
        thresholds (the self-calibrating relative score replaces
        round-2's hand-tuned per-test min_score) and must keep the map
        bounded.

        Honesty notes.  (1) At this instrument scale (192x144, <=192
        kps) verification tops out around 15-20 inliers, so the
        corrected pose carries noise comparable to a full ring's
        drift; a ">=2x ATE improvement" gate would be tuning theater.
        (2) A tracking-GAP variant cannot serve either: the hardened
        relocalization re-anchors the lost tracker onto the old map
        before drift can accumulate (see TestRelocalization — which is
        the strong-verification recovery proof).  What this test pins
        down end-to-end: detection fires on a genuine revisit,
        verification passes its plausibility gates, the pose-graph
        correction + loop-observation fusion are applied, and the
        trajectory stays bounded.
        """
        slam_on, m_on, _ = _run_ring(voc, revisit=10)
        assert isinstance(slam_on.loop_closer, LoopCloser)
        assert slam_on.loop_closer.n_kf >= 5
        assert len(slam_on.loop_closer.closed) >= 1  # detect+verify fired
        assert m_on.ate_rmse < 2.0


class TestRelocalization:
    def test_kidnapped_recovery(self, voc):
        """Kidnapped-camera e2e: after mapping the full ring, teleport
        the tracker to a bogus pose and feed a frame from the far side
        of the ring.  BoW relocalization (no motion prior survives a
        kidnap) must snap the pose back to where the mapping run placed
        that view, and tracking must re-engage on the next frame."""
        slam, _, frames = _run_ring(voc)
        mapped = [np.asarray(p) for p in slam.trajectory]
        # kidnap: far-away pose, dead motion model
        import jax.numpy as jnp
        from gslam_tpu.core.se3 import se3_identity

        slam.pose_wc = jnp.asarray(
            np.concatenate([[50.0, 50.0, 50.0], [0, 0, 0, 1.0]])
            .astype(np.float32))
        slam.velocity = se3_identity()
        slam._lost_frames = 0
        target = 24  # opposite side of the ring from the kidnap pose
        slam.track(frames[target])
        est = np.asarray(slam.pose_wc[:3])
        ref = mapped[target][:3]
        # mapped[target] is in PRE-loop-correction coordinates while
        # the reloc pose is post-correction -> compare coarsely (the
        # ring diameter is 12 m; a wrong-side reloc would be ~12 off),
        # then let tracking re-engagement be the strong gate
        assert np.linalg.norm(est - ref) < 2.0, \
            f"relocalization missed: {est} vs {ref}"
        # next frame tracks normally again
        slam.track(frames[target + 1])
        assert slam.stats[-1]["n_inliers"] >= slam.cfg.min_track_inliers


class TestLoopClosureVI:
    def test_ring_with_imu_edges(self, voc):
        """Ring sequence with synthetic IMU: inertial rotation edges
        flow into the loop pose graph and the gate still holds."""
        ds = SyntheticDataset(n_frames=48, n_points=500, width=192,
                              height=144, motion="ring", depth=True,
                              radius=6.0, world_extent=5.0, imu=True)
        ds.open("synth://")
        cfg = SLAMConfig(max_kps=192, fast_threshold=0.1, ba_window=4,
                         ba_points=256, ba_iters=3, cap_frames=64,
                         cap_points=4096, cap_obs=16384,
                         local_map_size=512, kf_max_gap=4)
        slam = KeyframeSLAM(ds.camera, cfg, vocabulary=voc)
        slam.loop_closer.min_gap = 6
        slam.loop_closer.min_inliers = 15
        gts, ts = [], []
        for fr in ds:
            slam.track(fr)
            gts.append(fr.gt_pose[:3])
            ts.append(fr.timestamp)
        m = evaluate_trajectory(np.asarray(ts), slam.positions(),
                                np.asarray(ts), np.stack(gts),
                                with_scale=False)
        # bounded-drift sanity only — this test's contract is that the
        # IMU edges FLOW into the loop pose graph without destabilizing
        # the run (accuracy gates live in the VI/e2e tests); the
        # no-IMU/no-hygiene failure mode it guards against blew past 5
        assert m.ate_rmse < 4.0
        assert len(slam.imu_edges) >= slam.loop_closer.n_kf - 2
