"""Frame renderers: Monte-Carlo ground truth and the NRC renderer.

TPU-first rebuild of src/McHpmRenderer.cpp and src/NrcHpmRenderer.cu: where
the reference records command buffers over five compute pipelines, two Vulkan
submits, an external-semaphore CUDA section and a host readback per frame
(SURVEY §3.2), here each frame is ONE jitted pure function
``state -> state`` — trace, pack, infer, train and composite fuse into a
single XLA program with no host round-trips.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import flax.struct
import jax
import jax.numpy as jnp

from .camera import Camera, pixel_rays
from .config import AppConfig
from .integrator import (TraceParams, primary_miss_mask, trace_fixed,
                         trace_primary)
from .lights import LightFlags, Lights, lights_from_scene, sample_env_map
from .utils import rng
from .volume import Volume


def _volume_from_config(cfg: AppConfig) -> Volume:
    import os
    path = cfg.scene.volume_path
    if not os.path.exists(path):
        alt = os.path.join("/root/reference", path)
        if os.path.exists(alt):
            path = alt
    return Volume.from_vdb(path, cfg.scene.density, cfg.scene.volume_g)


# ---------------------------------------------------------------------------
# Monte-Carlo renderer (McHpmRenderer equivalent)
# ---------------------------------------------------------------------------

@flax.struct.dataclass
class McState:
    """Accumulation image + blend counter + frame PRNG key."""

    image: jax.Array       # (H, W, 4): rgb + didScatter info in w
    blend_index: jax.Array  # () int32
    key: jax.Array          # jax PRNG key for per-frame seeds


class McRenderer:
    """Pure-MC reference-quality renderer (src/McHpmRenderer.cpp:121-151,
    data/shader/mc/render.comp): per pixel one ``path_length``-bounce
    delta-tracked path per frame, temporally accumulated."""

    def __init__(self, cfg: AppConfig, vol: Optional[Volume] = None,
                 lights: Optional[Lights] = None, width: Optional[int] = None,
                 height: Optional[int] = None, path_length: Optional[int] = None,
                 blend: bool = True):
        self.cfg = cfg
        self.width = width or cfg.render_width
        self.height = height or cfg.render_height
        self.path_length = path_length or cfg.mc_path_length
        self.blend = blend
        self.vol = vol if vol is not None else _volume_from_config(cfg)
        self.lights = lights if lights is not None \
            else lights_from_scene(cfg.scene)
        self.params = TraceParams(flags=LightFlags.from_scene(cfg.scene),
                                  max_track_steps=cfg.max_track_steps)
        self._step = jax.jit(partial(
            _mc_step, params=self.params, width=self.width,
            height=self.height, path_length=self.path_length,
            blend=self.blend))

    def init_state(self, seed: int = 0) -> McState:
        return McState(
            image=jnp.zeros((self.height, self.width, 4), jnp.float32),
            blend_index=jnp.int32(1),
            key=jax.random.PRNGKey(seed))

    def step(self, state: McState, camera: Camera) -> McState:
        return self._step(state, camera, self.vol, self.lights)

    def render(self, camera: Camera, frames: int, seed: int = 0) -> jax.Array:
        """Accumulate ``frames`` frames and return the (H, W, 4) image."""
        state = self.init_state(seed)
        for _ in range(frames):
            state = self.step(state, camera)
        return state.image


def _mc_step(state: McState, camera: Camera, vol: Volume, lights: Lights,
             *, params: TraceParams, width: int, height: int,
             path_length: int, blend: bool) -> McState:
    key, sub = jax.random.split(state.key)
    frame_rand = rng.frame_random(sub)

    ro, rd, frag_uv = pixel_rays(camera, width, height)
    rng_state = rng.init_state(frag_uv, frame_rand)
    ro_b = jnp.broadcast_to(ro, rd.shape)

    miss = primary_miss_mask(vol, ro_b, rd)
    res = trace_fixed(rng_state, vol, lights, params, ro_b, rd,
                      path_length, active=~miss)
    did_scatter = res["did_scatter"]
    env_color = sample_env_map(lights.env, rd)
    rgb = jnp.where(did_scatter[..., None], res["radiance"], env_color)
    out = jnp.concatenate(
        [rgb, did_scatter[..., None].astype(jnp.float32)], axis=-1)

    if blend:
        bf = 1.0 / state.blend_index.astype(jnp.float32)
        image = bf * out + (1.0 - bf) * state.image
        blend_index = state.blend_index + 1
    else:
        image = out
        blend_index = state.blend_index
    return McState(image=image, blend_index=blend_index, key=key)


# ---------------------------------------------------------------------------
# Shared primary-trace used by the NRC renderer (nrc/gen_rays.comp main)
# ---------------------------------------------------------------------------

def primary_pass(rng_state, vol, lights, params: TraceParams, cfg: AppConfig,
                 ro, rd):
    """gen_rays.comp:53-101: short path + NRC query export.

    Returns dict with primary_color (..., 4) = (rgb, throughput),
    did_scatter, nrc_pos, nrc_dir, state.
    """
    miss = primary_miss_mask(vol, ro, rd)
    res = trace_primary(rng_state, vol, lights, params, ro, rd, cfg,
                        active=~miss)
    did_scatter = res["did_scatter"] & ~miss
    env_color = sample_env_map(lights.env, rd)
    # miss OR no-scatter -> env color with throughput 1 (gen_rays.comp:82-94)
    use_env = miss | ~did_scatter
    rgb = jnp.where(use_env[..., None], env_color, res["radiance"])
    w = jnp.where(use_env, 1.0, res["throughput"])
    primary_color = jnp.concatenate([rgb, w[..., None]], axis=-1)
    return dict(primary_color=primary_color, did_scatter=did_scatter,
                nrc_pos=res["terminal_pos"], nrc_dir=res["terminal_dir"],
                state=res["state"])
