"""Loop closure end-to-end: BoW detection + verification + pose-graph
correction on a full-circle synthetic sequence (BASELINE config #3's
loop-closure component, offline analog).
"""

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


class TestLoopClosureE2E:
    def test_ring_closes_loop(self, voc):
        ds = ring_ds(48)
        cfg = SLAMConfig(max_kps=192, fast_threshold=0.1, ba_window=4,
                         ba_points=256, ba_iters=3, cap_frames=64,
                         cap_points=4096, cap_obs=16384,
                         local_map_size=512, kf_max_gap=4)
        slam = KeyframeSLAM(ds.camera, cfg, vocabulary=voc)
        assert isinstance(slam.loop_closer, LoopCloser)
        slam.loop_closer.min_score = 0.10
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
        # full ring with periodic keyframes: trajectory must stay sane;
        # the loop closer ran its detect/verify path over every KF
        assert m.ate_rmse < 1.0
        assert slam.loop_closer.n_kf >= 5


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
        slam.loop_closer.min_score = 0.10
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
        assert m.ate_rmse < 1.0
        assert len(slam.imu_edges) >= slam.loop_closer.n_kf - 2
