"""ReSTIR at a real resolution (VERDICT r2 item 9).

Compiles and runs the ReSTIR renderer at 960x540 (scene 4) on the TPU,
records compile time and ms/frame, and compares equal-frame-budget ReSTIR
vs plain MC against a long MC ground truth — the variance-reduction claim
the reference's (dead) RestirHpmRenderer was built to make
(/root/reference/src/RestirHpmRenderer.cpp, data/shader/restir/*.comp).

Writes output/restir_960.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from nrc_hpm_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

from nrc_hpm_tpu.camera import Camera
from nrc_hpm_tpu.config import AppConfig, RestirConfig, SceneConfig
from nrc_hpm_tpu.models.restir import RestirRenderer
from nrc_hpm_tpu.renderer import McRenderer

W, H = 960, 540
FRAMES = int(os.environ.get("RESTIR_FRAMES", "16"))
TRUTH_FRAMES = int(os.environ.get("RESTIR_TRUTH_FRAMES", "256"))


def mse(a, b):
    return float(np.mean((np.asarray(a[..., :3]) - np.asarray(b[..., :3]))
                         ** 2))


def sync(state):
    """REAL device sync: the axon tunnel acks block_until_ready before
    device execution finishes (round-3 finding, bench.py:sync); only a
    data-dependent scalar fetch is a trustworthy barrier."""
    import jax.numpy as jnp
    return float(jnp.sum(state.image))


def run_restir(cfg, cam, out, suffix=""):
    r = RestirRenderer(cfg)
    state = r.init_state(0)
    t0 = time.time()
    state = r.step(state, cam)
    jax.block_until_ready(state.image)
    out[f"restir_compile_plus_first_frame_s{suffix}"] = round(
        time.time() - t0, 1)
    print(f"restir{suffix} compile+first: "
          f"{out[f'restir_compile_plus_first_frame_s{suffix}']}s", flush=True)

    sync(state)
    t0 = time.time()
    for _ in range(FRAMES - 1):
        state = r.step(state, cam)
    sync(state)
    dt = (time.time() - t0) / (FRAMES - 1)
    out[f"restir_ms_per_frame{suffix}"] = round(dt * 1000, 1)
    print(f"restir{suffix}: {dt*1000:.1f} ms/frame", flush=True)
    return np.asarray(state.image)


def main():
    import dataclasses
    cfg = AppConfig(scene=SceneConfig.preset(4), render_width=W,
                    render_height=H, mc_path_length=32,
                    restir=RestirConfig(path_vertex_count=4,
                                        spatial_kernel_size=3,
                                        temporal_kernel_size=2,
                                        mis_weights=True))
    cam = Camera.reference_camera(aspect=W / H)
    out = {"resolution": f"{W}x{H}", "frames": FRAMES,
           "truth_frames": TRUTH_FRAMES, "scene": 4}

    # headline: MIS-weighted splicing (round 5); uniform = shader parity
    restir_img = run_restir(cfg, cam, out)
    cfg_uni = dataclasses.replace(
        cfg, restir=dataclasses.replace(cfg.restir, mis_weights=False))
    restir_uni_img = run_restir(cfg_uni, cam, out, suffix="_uniform")

    mc = McRenderer(cfg)
    mst = mc.init_state(1)
    t0 = time.time()
    mst = mc.step(mst, cam)
    sync(mst)
    out["mc_compile_plus_first_frame_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    for _ in range(FRAMES - 1):
        mst = mc.step(mst, cam)
    sync(mst)
    out["mc_ms_per_frame"] = round((time.time() - t0) / (FRAMES - 1) * 1000,
                                   1)
    print(f"mc32: {out['mc_ms_per_frame']} ms/frame", flush=True)
    mc_img = np.asarray(mst.image)

    # steps_per_dispatch kept small: a 960x540 32-bounce frame is ~7 s of
    # device time and the tunnel kills dispatches much past ~60 s.
    # The 256-frame truth costs ~26 min of chip; cache it on disk.
    truth_path = f"output/restir_960_truth_{TRUTH_FRAMES}.npy"
    if os.path.exists(truth_path):
        truth = np.load(truth_path)
        print(f"truth loaded from {truth_path}", flush=True)
    else:
        truth = np.asarray(mc.render(cam, TRUTH_FRAMES, seed=7,
                                     steps_per_dispatch=4))
        os.makedirs("output", exist_ok=True)
        np.save(truth_path, truth)
    out["restir_mse_vs_truth"] = mse(restir_img, truth)
    out["restir_mse_vs_truth_uniform"] = mse(restir_uni_img, truth)
    out["mc_mse_vs_truth"] = mse(mc_img, truth)
    out["mse_ratio_restir_over_mc"] = round(
        out["restir_mse_vs_truth"] / max(out["mc_mse_vs_truth"], 1e-12), 4)
    out["mse_ratio_uniform_over_mc"] = round(
        out["restir_mse_vs_truth_uniform"] / max(out["mc_mse_vs_truth"],
                                                 1e-12), 4)
    print(json.dumps(out, indent=1), flush=True)
    os.makedirs("output", exist_ok=True)
    with open("output/restir_960.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
