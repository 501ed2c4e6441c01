"""Benchmark: frames/s of the flagship fused tracking step on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The metric is ON-CHIP sustained frames/s of the full per-frame SLAM hot
path (FAST+BRIEF extraction on 640x480, GEMM Hamming matching vs a
2048-point local map, 256-hypothesis PnP RANSAC + GN refine) measured
by the SEQUENCE-DELTA method: the step runs over N frames inside ONE
``lax.scan`` dispatch, timed at two sequence lengths, and the
difference isolates pure per-frame on-chip time.  Every timing forces
host materialization of a result scalar — on remote-execution backends
``block_until_ready`` can resolve before the work runs, which made
round-1/2's pipelined-dispatch fps numbers measure the ENQUEUE rate of
the control plane, not the chip (round-3 finding; BASELINE.md).

vs_baseline: the reference (GSLAM, CPU, ICCV'19-era) evaluates SLAM
plugins at real-time camera rate; 30 frames/s is the de-facto reference
throughput bound for its integrated pipelines (the paper's per-frame
timing tables gate on camera rate; exact numbers were not extractable —
BASELINE.md).  vs_baseline = fps / 30.
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gslam_jax_cache")

BASELINE_FPS = 30.0


def main() -> None:
    import numpy as np

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from gslam_tpu.models.graft import example_inputs, track_forward

    img, cam, xyz, desc, valid, key = example_inputs()

    def seq_time(N: int, use_pallas: bool, reps: int = 3) -> float:
        """Wall time of N varied frames in ONE scan dispatch, with the
        output scalar materialized (forces remote execution)."""
        imgs_b = jnp.stack([img] * N) \
            + jnp.arange(N)[:, None, None] * 1e-6
        keys_b = jax.random.split(key, N)

        def body(c, x):
            im, k = x
            T, n, cnt = track_forward(im, cam, xyz, desc, valid, k,
                                      use_pallas=use_pallas)
            return c + T.sum() + n, None

        step = jax.jit(
            lambda ims, ks: jax.lax.scan(body, 0.0, (ims, ks))[0])
        float(step(imgs_b, keys_b))          # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(step(imgs_b, keys_b))      # materialize => executed
            best = min(best, time.perf_counter() - t0)
        return best

    def measure(use_pallas: bool):
        N1, N2 = 8, 40
        t1 = seq_time(N1, use_pallas)
        t2 = seq_time(N2, use_pallas)
        on_chip = max(t2 - t1, 1e-9) / (N2 - N1)
        return 1.0 / on_chip, on_chip, N2 / t2

    fps, on_chip, fps_e2e = measure(False)
    variant = "jnp"
    try:
        fps_p, on_chip_p, fps_e2e_p = measure(True)
        if fps_p > fps:
            fps, on_chip, fps_e2e, variant = (fps_p, on_chip_p,
                                              fps_e2e_p, "pallas")
    except Exception:
        pass  # non-TPU backend without Mosaic support

    # control-plane reference: one no-op round trip
    nop = jax.jit(lambda x: x + 1.0)
    float(nop(jnp.float32(0)))
    t0 = time.perf_counter()
    float(nop(jnp.float32(1)))
    dispatch_ms = (time.perf_counter() - t0) * 1e3

    ba_its = ba_iters_per_s()

    try:
        full = slam_full_system()
    except Exception as e:  # never lose the primary metric
        full = {"slam_fps_full_system": None,
                "slam_full_system_error": repr(e)[:200]}

    print(json.dumps({
        "metric": "tracking_step_fps",
        "value": round(fps, 2),
        "unit": "frames/s/chip (on-chip, sequence-delta)",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        "variant": variant,
        "on_chip_us_per_frame": round(on_chip * 1e6, 1),
        "fps_seq_e2e": round(fps_e2e, 2),
        "dispatch_roundtrip_ms": round(dispatch_ms, 2),
        "ba_iters_per_s": round(ba_its, 1),
        **full,
    }))


def slam_full_system() -> dict:
    """FULL product SLAM loop throughput (round-4 verdict Weak #1 /
    next-round item 1): the real ``KeyframeSLAM`` — batched-dispatch
    tracking, keyframe promotion + insertion, local BA through the
    fused Schur kernel, live map hygiene, host control — over a
    VGA textured synthetic world (the longrun's ring scene), measured
    by the sequence-delta method: wall time of a 64-frame and a
    192-frame run (fresh SLAM each, warm compile cache), difference /
    128 isolates the steady-state per-frame cost including every
    subsystem and every host sync.  Loop closure is off here (no
    vocabulary): its cost is recorded separately by the longrun tier.

    Returns extra JSON fields: ``slam_fps_full_system`` plus a
    per-stage wall split from the timer registry (track/BA/hygiene/
    keyframe/host shares of the 192-frame run)."""
    from gslam_tpu.datasets.synthetic import SyntheticDataset
    from gslam_tpu.models.keyframe_slam import KeyframeSLAM, SLAMConfig
    from gslam_tpu.utils.timer import timer

    # ONE lap in 192 frames (~1.9 deg/frame): the longrun's scene at a
    # camera rate the frontend tracks (2 laps here = 15 deg/frame
    # turned the whole run into relocalization — nothing batches)
    ds = SyntheticDataset(n_frames=192, n_points=1200, width=640,
                          height=480, motion="ring_out", depth=True,
                          texture=True, radius=14.0, world_extent=8.0,
                          laps=1, noise=0.01)
    ds.open("synth://")
    frames = list(ds)

    cfg = dict(max_kps=512, fast_threshold=0.08, local_map_size=2048,
               ba_points=1024, kf_max_gap=8, cap_frames=64,
               dispatch_batch=8)

    def run(n: int) -> float:
        slam = KeyframeSLAM(ds.camera, SLAMConfig(**cfg))
        t0 = time.perf_counter()
        slam.track_batch(frames[:n])
        return time.perf_counter() - t0

    run(48)                      # compile everything (cached) + warm
    t1 = min(run(64) for _ in range(2))
    snap0 = {k: v["total"] for k, v in timer.stats().items()}
    t2 = min(run(192) for _ in range(2))
    snap1 = {k: v["total"] for k, v in timer.stats().items()}
    per_frame = max(t2 - t1, 1e-9) / 128.0

    # stage split of ONE 192-frame run (the last timed one): timer
    # totals are cumulative, so diff the snapshots and halve nothing —
    # the min() above ran twice, so scale shares to fractions instead
    split_s = {k: snap1.get(k, 0.0) - snap0.get(k, 0.0)
               for k in ("slam/track_batch", "slam/extract",
                         "slam/track_fused", "slam/keyframe",
                         "slam/local_ba", "slam/hygiene")}
    # track_batch/extract/track_fused/keyframe/local_ba/hygiene are
    # disjoint wall spans (keyframe covers insertion only; local BA
    # and hygiene have their own sections)
    tot = sum(split_s.values()) or 1.0
    split = {k.split("/")[1]: round(v / tot, 3) for k, v in
             split_s.items()}
    return {
        "slam_fps_full_system": round(1.0 / per_frame, 2),
        "slam_full_ms_per_frame": round(per_frame * 1e3, 3),
        "slam_full_split_frac": split,
        "slam_full_config": {"frames": "64->192 delta",
                             "batch": 8, "loop_closure": "off"},
    }


def ba_iters_per_s() -> float:
    """Secondary metric: LM iterations/s of a local-BA-sized problem
    (8 cams x 1024 points x 8 obs slots) on-chip via the delta method.

    Uses the best available backend (the fused residual->Schur Pallas
    kernel on TPU, ~49 us/iter; jnp one-hot-GEMM Schur elsewhere); the
    delta span is 400 iterations because the kernel path's per-iter
    cost sits below dispatch jitter at short spans."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from gslam_tpu.core.se3 import se3_identity
    from gslam_tpu.opt.ba import (BundleProblem, bundle_adjust,
                                  resolve_ba_backend)

    rng = np.random.default_rng(0)
    C, P, O = 8, 1024, 8
    X = np.stack([rng.uniform(-2, 2, P), rng.uniform(-1.5, 1.5, P),
                  rng.uniform(3, 9, P)], -1).astype(np.float32)
    poses = np.tile(np.asarray(se3_identity()), (C, 1)).astype(np.float32)
    poses[:, 0] = 0.1 * np.arange(C)
    obs_cam = rng.integers(0, C, (P, O)).astype(np.int32)
    pc = X[:, None] + poses[obs_cam][..., :3]
    uv = (pc[..., :2] / pc[..., 2:3]).astype(np.float32)
    uv += rng.normal(0, 5e-4, uv.shape).astype(np.float32)
    problem = BundleProblem(
        cam_pose=jnp.asarray(poses),
        cam_fixed=jnp.zeros(C, bool).at[0].set(True),
        point_xyz=jnp.asarray(X + rng.normal(0, 0.01, X.shape)
                              .astype(np.float32)),
        point_fixed=jnp.zeros(P, bool),
        obs_cam=jnp.asarray(obs_cam),
        obs_uv=jnp.asarray(uv),
        obs_valid=jnp.ones((P, O), bool),
        obs_weight=jnp.ones((P, O), jnp.float32))

    backend = resolve_ba_backend(problem)

    def t_of(iters: int) -> float:
        out, stats = bundle_adjust(problem, iters=iters,
                                   backend=backend)        # compile
        float(out.cam_pose.sum())
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            out, stats = bundle_adjust(problem, iters=iters,
                                       backend=backend)
            float(out.cam_pose.sum())        # materialize => executed
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = t_of(100), t_of(500)
    return 400.0 / max(t2 - t1, 1e-9)


if __name__ == "__main__":
    main()
