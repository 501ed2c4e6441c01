"""CLI: the ``gslam`` binary analog.

Reference surface (``GSLAM/gslam/main.cpp``): ``gslam <app> -dataset
<path> [svar args]`` with Svar-registered apps — 'qviz' (GUI), 'play'
(headless run), 'tests' (gtest runner).  Here:

    python -m gslam_tpu play  -dataset seq.synth -slam keyframe
    python -m gslam_tpu eval  -dataset seq.synth -slam keyframe
    python -m gslam_tpu viz   -dataset seq.synth -out /tmp/run
    python -m gslam_tpu bench
    python -m gslam_tpu tests [pytest args]

The Qt GUI is out of scope for TPU pods (SURVEY section 7 item 8); 'viz'
is the headless equivalent: trajectory + map export (PLY / PNG).
"""

from __future__ import annotations

import os
import sys
import time
from typing import List

# first compile through the TPU tunnel is slow (20-40s+/kernel); the
# persistent cache makes every later CLI invocation start warm
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gslam_jax_cache")

import numpy as np

from gslam_tpu.app.config import Svar, svar
from gslam_tpu.app.registry import APPS, SLAMS, open_dataset
from gslam_tpu.utils.logging import get_logger
from gslam_tpu.utils.timer import timer

log = get_logger("cli")


def _build_slam(dataset, s: Svar):
    import gslam_tpu.models  # ensure registry population
    import gslam_tpu.models.direct  # noqa: F401
    import gslam_tpu.models.stereo  # noqa: F401

    name = s.arg("slam", "keyframe", "SLAM system (registry name)")
    kwargs = {}
    # forward EVERY -slam.<field> flag to the model config (Svar's
    # hierarchical-key ergonomics; unknown fields fail loudly in the
    # config dataclass rather than being dropped silently)
    for key, val in s.subtree("slam").items():
        kwargs[key] = val
    # -vocabulary voc.npz | DBoW3-style .txt | flat binary (.voc/.gvoc):
    # enables BoW loop closure and relocalization (reference:
    # gslam -vocabulary <file>)
    voc_path = s.arg("vocabulary", "",
                     "BoW vocabulary (npz / DBoW3 text / binary)")
    if voc_path:
        from gslam_tpu.ops.vocab import (load_binary, load_dbow3_text,
                                         load_vocabulary)

        if voc_path.endswith(".txt"):
            kwargs["vocabulary"] = load_dbow3_text(voc_path)
        elif voc_path.endswith(".npz"):
            kwargs["vocabulary"] = load_vocabulary(voc_path)
        else:
            kwargs["vocabulary"] = load_binary(voc_path)
    slam = SLAMS.create(name, dataset.camera, **kwargs)
    # -load_map: resume / localize on a prebuilt arena (Map::load)
    load_map = s.arg("load_map", "", "resume from a map arena (npz)")
    if load_map and hasattr(slam, "load_map"):
        slam.load_map(load_map)
        log.info("loaded map arena from %s", load_map)
    return slam


def _maybe_force_cpu(s: Svar) -> None:
    """-cpu true: run on the host CPU backend.

    Some environments force-register an accelerator backend in every
    process (so JAX_PLATFORMS is ineffective); routing default placement
    to the CPU client is the reliable way to run device-free.
    """
    if s.arg("cpu", False, "run on host CPU (ignore accelerators)"):
        import jax

        jax.config.update("jax_default_device", jax.devices("cpu")[0])


def _maybe_debug(s: Svar) -> None:
    """-debug true: the sanitizer analog (SURVEY 5.2).

    The functional model obviates data races; the numerical failure
    mode that remains is NaN/Inf propagation through jitted graphs.
    Debug mode makes every such event fail LOUDLY at its source
    (``jax_debug_nans`` re-runs the offending op un-jitted and raises
    with a stack trace); ``-debug.nojit true`` additionally disables
    jit entirely for op-by-op gold runs.
    """
    if s.arg("debug", False, "fail loudly on NaN/Inf (jax_debug_nans)"):
        import jax

        jax.config.update("jax_debug_nans", True)
    if s.arg("debug.nojit", False, "disable jit (op-by-op debugging)"):
        import jax

        jax.config.update("jax_disable_jit", True)


def _run_sequence(s: Svar):
    _maybe_force_cpu(s)
    _maybe_debug(s)
    path = s.arg("dataset", "", "dataset path (extension dispatch)")
    if not path:
        raise SystemExit("need -dataset <path>")
    try:
        ds = open_dataset(path)
    except (OSError, KeyError) as e:
        raise SystemExit(f"could not open dataset {path}: {e}")
    if not ds.is_opened():
        raise SystemExit(f"could not open dataset {path}")
    slam = _build_slam(ds, s)
    skip = s.arg("Dataset.Skip", 0, "frames to skip")
    max_frames = s.arg("Dataset.Max", 0, "max frames (0 = all)")
    # SURVEY 5.1: xprof device traces (view with tensorboard/xprof)
    profile_dir = s.arg("profile", "", "write a jax.profiler trace here")
    # SURVEY 5.5: per-frame metrics as streamed JSON lines
    metrics_path = s.arg("metrics", "", "stream per-frame metric JSONL here")
    metrics = None
    if metrics_path:
        from gslam_tpu.utils.metrics import MetricsRegistry

        metrics = MetricsRegistry(stream=open(metrics_path, "w"))
    if profile_dir:
        import jax

        jax.profiler.start_trace(profile_dir)
    # SURVEY section 2 row 25 (qviz watches the run LIVE): re-emit the
    # interactive viewer every K keyframes via atomic file replace; the
    # emitted HTML auto-reloads, so a browser shows the map growing
    viz_live = s.arg("viz.live", 0,
                     "re-emit the HTML viewer every K keyframes (0=off)")
    viz_live_path = s.arg("out", "run") + ".html" if viz_live else ""
    last_live_kf = 0
    # batched dispatch (slam.track_batch): buffer this many frames and
    # track them in one device round trip (SLAMConfig.dispatch_batch)
    batch_k = int(getattr(getattr(slam, "cfg", None),
                          "dispatch_batch", 1) or 1)
    batch_k = batch_k if hasattr(slam, "track_batch") else 1
    buf = []
    gts, ts = [], []
    n = 0

    def _flush_batch():
        if not buf:
            return
        n_stats0 = len(getattr(slam, "stats", []))
        t0 = time.perf_counter()
        with timer.section("app/frame"):
            slam.track_batch([f for _, f in buf])
            timer.block(None)
        ms = 1e3 * (time.perf_counter() - t0) / len(buf)
        if metrics is not None:
            rows = getattr(slam, "stats", [])[n_stats0:]
            for (fid, _), row in zip(buf, rows):
                metrics.emit(frame=fid, track_ms=ms, **dict(row))
        buf.clear()

    try:
        for i, fr in enumerate(ds):
            if i < skip:
                continue
            if batch_k > 1:
                buf.append((fr.id, fr))
                if len(buf) >= batch_k:
                    _flush_batch()
            else:
                t0 = time.perf_counter()
                with timer.section("app/frame"):
                    slam.track(fr)
                    timer.block(None)
                if metrics is not None:
                    row = dict(slam.stats[-1]) \
                        if getattr(slam, "stats", None) else {}
                    metrics.emit(frame=fr.id,
                                 track_ms=1e3 * (time.perf_counter() - t0),
                                 **row)
            if fr.gt_pose is not None:
                gts.append(fr.gt_pose[:3])
            ts.append(fr.timestamp)
            if viz_live and getattr(slam, "stats", None):
                n_kf = slam.stats[-1].get("n_kf", 0)
                if n_kf >= last_live_kf + viz_live:
                    from gslam_tpu.app.webviz import export_run_html

                    with timer.section("app/viz_live"):
                        export_run_html(
                            viz_live_path, slam,
                            gt=np.stack(gts) if gts else None,
                            title=f"{path} (live, frame {fr.id})",
                            refresh_s=2.0)
                    last_live_kf = n_kf
            n += 1
            if max_frames and n >= max_frames:
                break
        _flush_batch()
    finally:
        if profile_dir:
            jax.profiler.stop_trace()
            log.info("wrote profiler trace to %s", profile_dir)
        if metrics is not None:
            metrics._stream.close()
    if viz_live:
        # final emit with the reload timer OFF so the browser settles
        from gslam_tpu.app.webviz import export_run_html

        export_run_html(viz_live_path, slam,
                        gt=np.stack(gts) if gts else None,
                        title=f"{path} (finished)")
        log.info("live viewer finalized at %s", viz_live_path)
    # SURVEY 5.4: Map::save analog — snapshot the arena pytree
    save_map = s.arg("save_map", "", "write the map arena (npz) here")
    if save_map and hasattr(slam, "arena"):
        from gslam_tpu.map.arena import save_arena

        save_arena(slam.arena, save_map)
        log.info("saved map arena to %s", save_map)
    # trajectory export: TUM (.txt: t xyz qxyzw) or KITTI (.kitti: 3x4)
    save_traj = s.arg("save_traj", "",
                      "write trajectory (TUM .txt / .kitti)")
    if save_traj and getattr(slam, "trajectory", None):
        from gslam_tpu.eval.trajectory import (save_kitti_trajectory,
                                               save_tum_trajectory)

        poses = np.stack(slam.trajectory)[:, :7]
        if save_traj.endswith(".kitti"):
            save_kitti_trajectory(save_traj, poses)
        else:
            save_tum_trajectory(save_traj, np.asarray(ts), poses)
        log.info("saved trajectory to %s", save_traj)
    return ds, slam, np.asarray(ts), (np.stack(gts) if gts else None)


@APPS.register("play")
def app_play(s: Svar) -> int:
    ds, slam, ts, gt = _run_sequence(s)
    log.info("tracked %d frames", len(ts))
    print(timer.table())
    return 0


@APPS.register("eval")
def app_eval(s: Svar) -> int:
    from gslam_tpu.eval import evaluate_trajectory
    from gslam_tpu.eval.report import EvalReport

    ds, slam, ts, gt = _run_sequence(s)
    traj = None
    if gt is not None and len(gt) == len(ts):
        # corrected trajectory when the SLAM exposes it (reference
        # SaveTrajectory semantics: frames re-based on their reference
        # keyframe's FINAL pose, so loop corrections apply to the
        # whole path, not just frames after the closure)
        pos = (slam.corrected_positions()
               if hasattr(slam, "corrected_positions")
               else slam.positions())
        traj = evaluate_trajectory(
            ts, pos, ts, gt,
            with_scale=bool(s.arg("eval.sim3", False,
                                  "Sim3 (monocular) alignment")))
    rep = EvalReport(s["dataset"], traj,
                     extra={"frames": len(ts),
                            "keyframes": int(slam.arena.n_frames)
                            if hasattr(slam, "arena") else 0})
    print(rep.table())
    out = s.arg("out", "", "write JSON report here")
    if out:
        with open(out, "w") as f:
            f.write(rep.json())
    return 0


@APPS.register("viz")
def app_viz(s: Svar) -> int:
    """Headless visualization: PLY map + trajectory, PNG overview."""
    import os

    ds, slam, ts, gt = _run_sequence(s)
    out = s.arg("out", "/tmp/gslam_viz", "output prefix")
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)

    pos = slam.positions()
    # trajectory PLY
    with open(out + "_traj.ply", "w") as f:
        f.write("ply\nformat ascii 1.0\n"
                f"element vertex {len(pos)}\n"
                "property float x\nproperty float y\nproperty float z\n"
                "end_header\n")
        for p in pos:
            f.write(f"{p[0]} {p[1]} {p[2]}\n")
    # map points PLY
    if hasattr(slam, "arena"):
        xyz = np.asarray(slam.arena.point_xyz)
        ok = np.asarray(slam.arena.point_valid)
        pts = xyz[ok]
        with open(out + "_map.ply", "w") as f:
            f.write("ply\nformat ascii 1.0\n"
                    f"element vertex {len(pts)}\n"
                    "property float x\nproperty float y\nproperty float z\n"
                    "end_header\n")
            for p in pts:
                f.write(f"{p[0]} {p[1]} {p[2]}\n")
    # interactive self-contained HTML viewer (qviz analog)
    from gslam_tpu.app.webviz import export_run_html

    export_run_html(out + ".html", slam, gt=gt,
                    title=f"gslam_tpu · {s['dataset']}")
    log.info("wrote %s.html (interactive viewer)", out)
    # PNG overview
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(8, 6))
        ax.plot(pos[:, 0], pos[:, 2], "b-", label="estimate")
        if gt is not None:
            ax.plot(gt[:, 0], gt[:, 2], "g--", label="ground truth")
        if hasattr(slam, "arena"):
            ax.scatter(pts[:, 0], pts[:, 2], s=1, c="gray", alpha=0.4,
                       label="map")
        ax.set_xlabel("x [m]")
        ax.set_ylabel("z [m]")
        ax.legend()
        ax.set_aspect("equal")
        fig.savefig(out + ".png", dpi=120)
        log.info("wrote %s.png", out)
    except Exception as e:  # matplotlib optional
        log.warning("no PNG: %s", e)
    log.info("wrote %s_traj.ply / %s_map.ply", out, out)
    return 0


@APPS.register("bench")
def app_bench(s: Svar) -> int:
    import bench

    bench.main()
    return 0


@APPS.register("tests")
def app_tests(s: Svar) -> int:
    """gtest-runner analog: run the pytest suite."""
    import pytest

    return pytest.main(["tests/", "-q"] + sys.argv[3:])


def main(argv: List[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    positional = svar.parse_main(argv)
    if not positional:
        print(__doc__)
        print("apps:", APPS.names())
        return 1
    app = positional[0]
    if app not in APPS:
        print(f"unknown app {app!r}; have {APPS.names()}")
        return 1
    return APPS.create(app, svar)
