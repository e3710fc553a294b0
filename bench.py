"""Benchmark entry point: one JSON line for the driver.

Headline metric: rays/s for the full online-NRC frame (trace + filtered
cache inference + 65,536 train samples through 4 Adam batches + composite)
at the reference's canonical 1920x1080 workload
(src/main.cu:156-157,432-439) on one TPU chip.

The headline runs the TPU-TUNED operating point (AppConfig.tpu_tuned —
identical semantics, hash-grid tables sized into the rowsweep fast-gather
window; quality parity vs the 2^19 table is documented in BASELINE.md).

The full BASELINE metric set is recorded by default (VERDICT r2 item 5) —
frozen-cache frame, NRC inference samples/s, MC ground-truth frame, and
the reference-default-encoding (2^19) frame — to stderr AND to
output/bench_full.json.  NRC_BENCH_FULL=0 keeps only the headline.
NRC_BENCH_PROFILE=1 additionally chain-times the 8-stage breakdown; it
defaults OFF because isolating each stage costs ~11 min of device time.
`total` + theoretical FPS are recorded unconditionally from the measured
frame.  Round-5 headline: 1797.6 ms = 1.154M rays/s (packed-row
compaction takes, exact-zero empty macro cells + plan retune, unrolled
2-bounce primary, 2^12 tables at measured quality parity — BASELINE.md
"Whole-frame trail").  The frame remains tracing-bound; nn stages are
~35 ms after the 2^12 adoption.

Sub-100ms measurements use the chained-scan protocol (profiler._chain_time):
the axon tunnel acks block_until_ready early, so naive wall timing of small
programs measures dispatch, not execution.

vs_baseline is relative to the round-1 measurement of this same metric
(BENCH_r01.json: 250455.7 rays/s/chip).
"""

import json
import os
import sys
import time

ROUND1_RAYS_PER_S = 250455.7


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _flag(name, default="1"):
    return os.environ.get(name, default).lower() not in ("", "0", "false")


def sync(out) -> float:
    """REAL device sync: fetch a scalar that data-depends on every output
    leaf.  The axon tunnel acks block_until_ready before device execution
    finishes, so only a device->host value transfer is a trustworthy
    barrier (same principle as profiler._chain_time)."""
    import jax
    import jax.numpy as jnp
    tok = jnp.float32(0.0)
    for leaf in jax.tree.leaves(out):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.number):
            tok = tok + jnp.sum(leaf).astype(jnp.float32)
    return float(tok)


def wall(fn, n, *args):
    out = None
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
        args = (out,) + args[1:]
    sync(out)
    return (time.time() - t0) / n, out


def main():
    import jax

    from nrc_hpm_tpu.utils.compile_cache import enable_compilation_cache
    cache_dir = enable_compilation_cache()
    log(f"compilation cache: {cache_dir}")
    # Record warm/cold status so first-frame numbers are interpretable:
    # round 4's headline recorded an 814 s cold compile that was mostly
    # the remote compile helper degrading (BASELINE.md) — the artifact
    # must say which regime it measured (VERDICT r4 item 9).
    try:
        n_cached = sum(1 for _ in os.scandir(cache_dir))
    except OSError:
        n_cached = 0
    results_cache = {"compile_cache_entries_before": n_cached,
                     "compile_cache_status":
                         "warm" if n_cached > 0 else "cold"}
    log(f"compile cache entries before run: {n_cached} "
        f"({results_cache['compile_cache_status']})")

    from nrc_hpm_tpu.camera import Camera
    from nrc_hpm_tpu.config import AppConfig
    from nrc_hpm_tpu.renderer import McRenderer, NrcRenderer

    dev = jax.devices()[0]
    log(f"device: {dev}")
    full = _flag("NRC_BENCH_FULL")
    results = {"device": str(dev), **results_cache}

    cfg = AppConfig.tpu_tuned()  # scene 4, 1080p, rowsweep-sized hash grid
    cam = Camera.reference_camera(aspect=cfg.render_width / cfg.render_height)
    n_rays = cfg.render_width * cfg.render_height

    # ---- NRC online-training frame (the headline) ----
    r = NrcRenderer(cfg)
    state = r.init_state(0)
    t0 = time.time()
    state = r.step(state, cam, train=True)
    sync(state)
    results["compile_plus_first_frame_s"] = round(time.time() - t0, 1)
    log(f"nrc compile+first frame: {results['compile_plus_first_frame_s']}s")

    frames = 8
    dt, state = wall(lambda s: r.step(s, cam, train=True), frames, state)
    nrc_rays_s = n_rays / dt
    results["nrc_online_ms_per_frame"] = round(dt * 1000, 1)
    results["nrc_online_rays_per_s"] = round(nrc_rays_s, 1)
    results["nrc_loss"] = round(float(state.nrc.loss), 4)
    log(f"nrc online: {dt*1000:.1f} ms/frame, {nrc_rays_s:.3e} rays/s, "
        f"loss {float(state.nrc.loss):.4f}")

    # ---- context: frozen-cache frame (BASELINE config 3) ----
    if not full:
        log("frozen bench skipped: set NRC_BENCH_FULL=1")
    else:
        try:
            state = r.step(state, cam, train=False)
            sync(state)
            fdt, state = wall(lambda s: r.step(s, cam, train=False), 4,
                              state)
            results["nrc_frozen_ms_per_frame"] = round(fdt * 1000, 1)
            results["nrc_frozen_rays_per_s"] = round(n_rays / fdt, 1)
            log(f"nrc frozen: {fdt*1000:.1f} ms/frame, "
                f"{n_rays/fdt:.3e} rays/s")
        except Exception as e:
            log(f"frozen bench skipped: {e}")

    # ---- context: NRC inference samples/s (chain-timed, production) ----
    try:
        from nrc_hpm_tpu.profiler import _chain_time
        n_inf = 622592  # ~30% of 1080p, the infer-compaction capacity
        x5 = jax.random.uniform(jax.random.PRNGKey(1), (n_inf, 5))
        idt = _chain_time(lambda st, x: r.cache.infer(st, x),
                          (state.nrc, x5), ns=(1, 5))
        results["nrc_infer_ms"] = round(idt * 1000, 2)
        results["nrc_infer_samples_per_s"] = round(n_inf / idt, 1)
        log(f"nrc infer: {idt*1000:.2f} ms / {n_inf} samples = "
            f"{n_inf/idt:.3e} samples/s (chain-timed)")
        # FULL-batch latency (VERDICT r4 item 6): the reference/tcnn
        # number covers the whole 2.07M-sample 1080p batch
        # (NrcHpmRenderer.cu:705, one 2^21 batch); the compacted kernel
        # rate above flatters cross-system reads ~3x, so record the
        # dense uncompacted batch too.
        n_dense = cfg.render_width * cfg.render_height
        xd = jax.random.uniform(jax.random.PRNGKey(2), (n_dense, 5))
        ddt_i = _chain_time(lambda st, x: r.cache.infer(st, x),
                            (state.nrc, xd), ns=(1, 3))
        results["nrc_infer_fullbatch_ms"] = round(ddt_i * 1000, 2)
        results["nrc_infer_fullbatch_samples_per_s"] = round(
            n_dense / ddt_i, 1)
        log(f"nrc infer full 1080p batch: {ddt_i*1000:.2f} ms / "
            f"{n_dense} samples = {n_dense/ddt_i:.3e} samples/s")
    except Exception as e:
        log(f"infer bench skipped: {e}")

    # ---- context: MC renderer rays/s ----
    if not full:
        log("mc bench skipped: set NRC_BENCH_FULL=1")
    else:
        try:
            mc = McRenderer(cfg)
            mst = mc.init_state(0)
            mst = mc.step(mst, cam)
            sync(mst)
            mdt, mst = wall(lambda s: mc.step(s, cam), 3, mst)
            results["mc32_ms_per_frame"] = round(mdt * 1000, 1)
            results["mc32_rays_per_s"] = round(n_rays / mdt, 1)
            log(f"mc32: {mdt*1000:.1f} ms/frame, {n_rays/mdt:.3e} rays/s")
        except Exception as e:
            log(f"mc bench skipped: {e}")

    # ---- context: reference-default encoding (2^19 tables) ----
    if not full:
        log("2^19 bench skipped: set NRC_BENCH_FULL=1")
    else:
        try:
            r19 = NrcRenderer(AppConfig())
            s19 = r19.init_state(0)
            s19 = r19.step(s19, cam, train=True)
            sync(s19)
            ddt, s19 = wall(lambda s: r19.step(s, cam, train=True), 3, s19)
            results["nrc_online_2e19_ms_per_frame"] = round(ddt * 1000, 1)
            results["nrc_online_2e19_rays_per_s"] = round(n_rays / ddt, 1)
            log(f"nrc online (2^19 tables): {ddt*1000:.1f} ms/frame, "
                f"{n_rays/ddt:.3e} rays/s")
        except Exception as e:
            log(f"2^19 bench skipped: {e}")

    # ---- context: 8-stage breakdown (the reference's timestamp pool) ----
    # `total` + theoretical FPS (NrcHpmRenderer.cu:517-539) are ALWAYS
    # recorded from the measured frame so the artifact is self-contained;
    # the per-stage isolation behind NRC_BENCH_PROFILE costs ~11 min.
    results["stages_ms"] = {
        "total": results["nrc_online_ms_per_frame"],
        "theoretical_fps": round(
            1000.0 / results["nrc_online_ms_per_frame"], 3),
    }
    if not (full and _flag("NRC_BENCH_PROFILE", default="0")):
        log("per-stage profile skipped (costs ~11 min): set "
            "NRC_BENCH_FULL=1 NRC_BENCH_PROFILE=1; `total` above is the "
            "measured frame")
    else:
        try:
            from nrc_hpm_tpu.profiler import (format_stage_report,
                                              profile_nrc_frame)
            stages = profile_nrc_frame(
                r, state, cam, total_ms=results["nrc_online_ms_per_frame"])
            results["stages_ms"] = {k: round(v, 2) for k, v in
                                    stages.items()}
            log(format_stage_report(stages))
            with open("output/stage_profile_r4.json", "w") as f:
                json.dump({"note": "8-stage breakdown; total = measured "
                                   "fused frame", "stages_ms":
                           results["stages_ms"]}, f, indent=1)
        except Exception as e:
            log(f"stage profile skipped: {e}")

    try:
        os.makedirs("output", exist_ok=True)
        with open("output/bench_full.json", "w") as f:
            json.dump(results, f, indent=1)
        log("full metrics written to output/bench_full.json")
    except Exception as e:
        log(f"could not write bench_full.json: {e}")

    print(json.dumps({
        "metric": "nrc_online_rays_per_s_1080p",
        "value": results["nrc_online_rays_per_s"],
        "unit": "rays/s/chip",
        "vs_baseline": round(nrc_rays_s / ROUND1_RAYS_PER_S, 3),
    }))


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
