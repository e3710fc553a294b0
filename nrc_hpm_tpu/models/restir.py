"""ReSTIR path-reservoir renderer for heterogeneous participating media.

TPU rebuild of the reference's FOUR ReSTIR compute shaders
(data/shader/restir/{local_init,temporal_reuse,spatial_reuse,render}.comp +
data/shader/include/restir-descriptors.glsl).  The reference's host-side
``RestirHpmRenderer.cpp`` is one giant block comment — dead code (SURVEY
§2.5) — so this module goes beyond the running reference: it makes the
pipeline operational, as one jitted ``state -> state`` frame over dense
per-pixel reservoir arrays instead of four dispatches over SSBOs.

Per frame:
  1. **local_init** (local_init.comp): per pixel, walk PATH_VERTEX_COUNT
     candidate vertices from the volume entry (random step = uniform in
     10% of the distance to the box exit, phase-resampled direction at
     density > 0), storing (position, random light-probe direction) per
     vertex; pixel info = (env background, didScatter).
  2. **temporal_reuse** (temporal_reuse.comp): streaming single-reservoir
     resampling over TEMPORAL_KERNEL_SIZE previous frames x path suffixes;
     the chosen (frame, vertex) splices that old reservoir's suffix into
     the current path.  Old reservoirs live in a ring indexed by
     frameCounter % TEMPORAL_KERNEL_SIZE.
  3. **spatial_reuse** (spatial_reuse.comp): same streaming RIS over the
     SPATIAL_KERNEL_SIZE^2 - 1 neighbours' suffixes, splicing from the
     selected neighbour.
  4. **render** (render.comp): shade the reservoir path — per vertex with
     density > 0, single-scatter lighting via the 3-arg TraceScene
     (stored probe direction for the env term), the HG phase factor
     applied at the exchange vertex, 8-step fixed transmittance between
     vertices; background shows through while transmittance == 1.

Documented divergences from the (dead, unfinishable) GLSL:
  - spatial_reuse.comp:19-20 tests the CENTER pixel's didScatter when
    vetting a neighbour and can splice from uninitialized memory when
    nothing is selected; we test the NEIGHBOUR's flag and splice only on a
    real selection.
  - temporal_reuse.comp's StoreOldPathVertex writes through the
    ``pathReservoir`` binding at reservoir-strided offsets (out of bounds
    of that buffer; the bound OldPathReservoirs buffer is never written) —
    we keep a real (T, H, W, V, 6) ring.
  - render.comp:101 writes the output Y-flipped relative to the NRC/MC
    renderers; we keep the shared orientation.

Beyond-reference (round 5, VERDICT r4 item 10): **MIS-weighted splicing**
(``RestirConfig.mis_weights``, default on).  The GLSL streams candidates
with UNIFORM probability 1/stream — pure mixing, no importance: a
backward-pointing suffix (HG(0.8) phase ~0.03) is spliced as readily as a
forward one, and the per-pixel sample is then mostly wasted, which is why
the round-4 artifact measured per-frame MSE 2.4x worse than MC
(output/restir_960.json).  With mis_weights the stream is weighted RIS:
each candidate's resampling weight is the phase reconnection factor the
shader will apply at the exchange vertex (render.comp:80-84 semantics),
selection is w/wsum, and shading scales the spliced suffix by the
unbiased contribution weight W = wsum / (M * w_sel) — so the applied
reconnection factor becomes the stream's MEAN candidate weight
(ph_sel * W = wsum/M), the standard RIS estimator for a factorized
target.  With w == 1 for every candidate this reduces EXACTLY to the
uniform scheme (selection probabilities, RNG consumption, and W == 1),
which is what mis_weights=False runs.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import flax.struct
import jax
import jax.numpy as jnp

from ..camera import Camera, pixel_rays
from ..config import AppConfig
from ..integrator import TraceParams, trace_scene
from ..lights import LightFlags, Lights, lights_from_scene, sample_env_map
from ..sampling import hg_phase, new_ray_dir
from ..transmittance import fixed_step_transmittance
from ..utils import rng
from ..volume import Volume, find_entry_exit, get_density


@flax.struct.dataclass
class RestirState:
    """All per-run ReSTIR buffers (the reference's images + SSBOs)."""

    image: jax.Array            # (H, W, 4) outputImage
    pixel_info: jax.Array       # (H, W, 4) env background + didScatter flag
    stats: jax.Array            # (H, W, 2) sampleStreamIndex, exchangeVertex
    reservoir: jax.Array        # (H, W, V, 6) current path vertices (pos,dir)
    old_reservoirs: jax.Array   # (T, H, W, V, 6) previous-frame ring
    frame: jax.Array            # () int32 frameCounter
    key: jax.Array


class RestirRenderer:
    """Volumetric path-reservoir ReSTIR (local init + temporal reuse +
    spatial reuse + shading), one jitted step per frame."""

    def __init__(self, cfg: AppConfig, vol: Optional[Volume] = None,
                 lights: Optional[Lights] = None,
                 width: Optional[int] = None, height: Optional[int] = None):
        from ..renderer import _volume_from_config
        self.cfg = cfg
        self.width = width or cfg.render_width
        self.height = height or cfg.render_height
        self.vol = vol if vol is not None else _volume_from_config(cfg)
        self.lights = lights if lights is not None \
            else lights_from_scene(cfg.scene)
        # Default TraceParams (NOT primary_params): ReSTIR's local-init
        # pass traces path_vertex_count(8)-vertex paths whose alive set
        # decays over bounces — the regime where delta-phase lane
        # compaction measured as a WIN (BASELINE.md round 4: compaction
        # loses only on short ~1.3-bounce primary traces).
        self.params = TraceParams(flags=LightFlags.from_scene(cfg.scene),
                                  max_track_steps=cfg.max_track_steps,
                                  env_fixed16=cfg.env_fixed16)
        self.n_vertices = cfg.restir.path_vertex_count
        self.spatial_kernel = cfg.restir.spatial_kernel_size
        self.temporal_kernel = cfg.restir.temporal_kernel_size
        self._step = jax.jit(
            partial(_restir_step, params=self.params,
                    width=self.width, height=self.height,
                    n_vertices=self.n_vertices,
                    spatial_kernel=self.spatial_kernel,
                    temporal_kernel=self.temporal_kernel,
                    mis_weights=cfg.restir.mis_weights),
            donate_argnums=(0,))

    def init_state(self, seed: int = 0) -> RestirState:
        h, w, v, t = (self.height, self.width, self.n_vertices,
                      self.temporal_kernel)
        return RestirState(
            image=jnp.zeros((h, w, 4), jnp.float32),
            pixel_info=jnp.zeros((h, w, 4), jnp.float32),
            stats=jnp.zeros((h, w, 2), jnp.float32),
            reservoir=jnp.zeros((h, w, v, 6), jnp.float32),
            old_reservoirs=jnp.zeros((t, h, w, v, 6), jnp.float32),
            frame=jnp.int32(0),
            key=jax.random.PRNGKey(seed))

    def step(self, state: RestirState, camera: Camera) -> RestirState:
        return self._step(state, camera, self.vol, self.lights)

    def render(self, camera: Camera, frames: int, seed: int = 0) -> jax.Array:
        state = self.init_state(seed)
        for _ in range(frames):
            state = self.step(state, camera)
        return state.image


# ---------------------------------------------------------------------------
# Stage 1: local candidate generation (restir/local_init.comp)
# ---------------------------------------------------------------------------

def _local_init(rng_state, vol: Volume, lights: Lights, ro, rd,
                prev_reservoir, n_vertices: int):
    """GenPath (local_init.comp:7-45): walk V candidate vertices from the
    box entry; each vertex stores (position, fresh random probe direction).
    Pixels whose ray misses the box keep their previous reservoir
    (the shader leaves the SSBO untouched on miss)."""
    entry, _, hit = find_entry_exit(vol, ro, rd)
    cur = entry
    cur_dir = rd
    did_scatter = jnp.zeros(hit.shape, bool)
    verts = []
    for _ in range(n_vertices):
        dens = get_density(vol, cur)
        scat = hit & (dens > 0.0)
        did_scatter = did_scatter | scat
        # direction resample at scattering vertices (NewRayDir phase=true)
        nd, rng_state = new_ray_dir(rng_state, cur_dir, vol.g,
                                    phase_sampling=True, active=scat)
        cur_dir = jnp.where(scat[..., None], nd, cur_dir)
        # stored probe direction (NewRayDir phase=false, local_init.comp:37)
        probe, rng_state = new_ray_dir(rng_state, cur_dir, vol.g,
                                       phase_sampling=False, active=hit)
        verts.append(jnp.concatenate([cur, probe], axis=-1))
        # next candidate: uniform step within 10% of distance-to-exit
        _, exit_pt, _ = find_entry_exit(vol, cur, cur_dir)
        max_dist = jnp.linalg.norm(exit_pt - cur, axis=-1) * 0.1
        u, rng_state = rng.masked_uniform(rng_state, hit)
        cur = cur + cur_dir * (u * max_dist)[..., None]

    new_res = jnp.stack(verts, axis=-2)                    # (..., V, 6)
    reservoir = jnp.where(hit[..., None, None], new_res, prev_reservoir)
    env = sample_env_map(lights.env, rd)
    did = hit & did_scatter
    pixel_info = jnp.concatenate(
        [env, did[..., None].astype(jnp.float32)], axis=-1)
    # restirStats = (sampleStreamIndex=1, exchangeVertex=0)
    stats = jnp.stack([jnp.ones(hit.shape, jnp.float32),
                       jnp.zeros(hit.shape, jnp.float32)], axis=-1)
    return reservoir, pixel_info, stats, rng_state


# ---------------------------------------------------------------------------
# Stage 2: temporal reuse (restir/temporal_reuse.comp)
# ---------------------------------------------------------------------------

def _splice_weight(own_res, q, v: int, g):
    """Resampling weight of splicing a suffix starting at position ``q``
    onto the own prefix [0..v-1]: the phase reconnection factor _shade
    will apply at the exchange vertex (render.comp:80-84 semantics —
    hg_phase of the angle between the prefix's incoming direction and the
    connection direction).  Cheap (pure VPU, no density gathers); the RIS
    contribution weight self-corrects any target-function mismatch."""
    r = own_res[..., v - 1, :3]
    if v >= 2:
        last_dir = r - own_res[..., v - 2, :3]
        last_dir = last_dir / jnp.maximum(
            jnp.linalg.norm(last_dir, axis=-1, keepdims=True), 1e-12)
    else:
        last_dir = jnp.zeros_like(r)
    conn = q - r
    conn = conn / jnp.maximum(
        jnp.linalg.norm(conn, axis=-1, keepdims=True), 1e-12)
    return hg_phase(jnp.sum(last_dir * -conn, axis=-1), g)


def _temporal_reuse(rng_state, reservoir, old_reservoirs, stats, mis,
                    pixel_info, frame, n_vertices: int, temporal_kernel: int,
                    g=0.0, weighted: bool = False):
    scat = pixel_info[..., 3] == 1.0
    stream = stats[..., 0]
    wsum, w_sel = mis[..., 0], mis[..., 1]
    t_idx = jnp.full(scat.shape, -1, jnp.int32)
    v_idx = jnp.zeros(scat.shape, jnp.int32)
    # streaming RIS over (temporal slot, suffix start vertex)
    # (temporal_reuse.comp:7-33); only scattered pixels run the stream.
    # weighted=False: w == 1 makes w/wsum == 1/stream — the shader's
    # uniform scheme exactly (same probabilities, same RNG consumption).
    for t in range(temporal_kernel):
        if weighted:
            slot_t = jnp.mod(frame - (t + 1), temporal_kernel)
            bank = jax.lax.dynamic_index_in_dim(
                old_reservoirs, slot_t, axis=0, keepdims=False)
            valid_t = (frame > t).astype(jnp.float32)
        for v in range(1, n_vertices):
            if weighted:
                w = _splice_weight(reservoir, bank[..., v, :3], v,
                                   g) * valid_t
            else:
                w = jnp.ones(scat.shape, jnp.float32)
            wsum_new = wsum + w
            prob = w / jnp.maximum(wsum_new, 1e-20)
            u, rng_state = rng.masked_uniform(rng_state, scat)
            sel = scat & (u < prob)
            t_idx = jnp.where(sel, t, t_idx)
            v_idx = jnp.where(sel, v, v_idx)
            w_sel = jnp.where(sel, w, w_sel)
            wsum = jnp.where(scat, wsum_new, wsum)
            stream = jnp.where(scat, stream + 1.0, stream)
    stats = jnp.stack([jnp.where(scat, stream, stats[..., 0]),
                       jnp.where(scat, v_idx.astype(jnp.float32),
                                 stats[..., 1])], axis=-1)
    mis = jnp.stack([wsum, w_sel], axis=-1)

    # UpdateReservoir (temporal_reuse.comp:35-64); no-op on frame 0
    do = scat & (t_idx >= 0) & (frame > 0)
    t_back = jnp.minimum(t_idx, frame - 1) + 1
    last_slot = jnp.mod(frame - t_back, temporal_kernel)    # per pixel
    cur_slot = jnp.mod(frame, temporal_kernel)              # scalar

    # current reservoir -> old ring (only for pixels that resampled)
    cur_bank = jax.lax.dynamic_index_in_dim(
        old_reservoirs, cur_slot, axis=0, keepdims=False)
    cur_bank = jnp.where(do[..., None, None], reservoir, cur_bank)
    old_reservoirs = jax.lax.dynamic_update_index_in_dim(
        old_reservoirs, cur_bank, cur_slot, axis=0)

    # splice suffix [v_idx:] from the selected old reservoir
    sel_old = jnp.take_along_axis(
        old_reservoirs,
        last_slot[None, ..., None, None].astype(jnp.int32), axis=0)[0]
    vmask = jnp.arange(n_vertices) >= v_idx[..., None]       # (..., V)
    take = do[..., None] & vmask
    reservoir = jnp.where(take[..., None], sel_old, reservoir)
    return reservoir, old_reservoirs, stats, mis, rng_state


# ---------------------------------------------------------------------------
# Stage 3: spatial reuse (restir/spatial_reuse.comp)
# ---------------------------------------------------------------------------

def _spatial_reuse(rng_state, reservoir, stats, mis, pixel_info,
                   n_vertices: int, spatial_kernel: int,
                   height: int, width: int, g=0.0,
                   weighted: bool = False):
    scat = pixel_info[..., 3] == 1.0
    stream = stats[..., 0]
    wsum, w_sel = mis[..., 0], mis[..., 1]
    k_max = spatial_kernel // 2
    yy = jnp.arange(height)[:, None]
    xx = jnp.arange(width)[None, :]
    pos_all = reservoir[..., :3]                            # (H, W, V, 3)

    sel_dx = jnp.zeros(scat.shape, jnp.int32)
    sel_dy = jnp.zeros(scat.shape, jnp.int32)
    v_idx = jnp.zeros(scat.shape, jnp.int32)
    found = jnp.zeros(scat.shape, bool)
    for dx in range(-k_max, k_max + 1):
        for dy in range(-k_max, k_max + 1):
            if dx == 0 and dy == 0:
                continue
            ny = yy + dy
            nx = xx + dx
            in_bounds = (ny >= 0) & (ny < height) & (nx >= 0) & (nx < width)
            nb_scat = in_bounds & (
                pixel_info[jnp.clip(ny, 0, height - 1),
                           jnp.clip(nx, 0, width - 1), 3] == 1.0)
            ok = scat & nb_scat
            if weighted:
                # static shift: wrapped border rows have ok == False
                nb_pos = jnp.roll(pos_all, shift=(-dy, -dx), axis=(0, 1))
            for v in range(1, n_vertices):
                if weighted:
                    w = _splice_weight(reservoir, nb_pos[..., v, :], v, g)
                else:
                    w = jnp.ones(scat.shape, jnp.float32)
                wsum_new = jnp.where(ok, wsum + w, wsum)
                prob = w / jnp.maximum(wsum_new, 1e-20)
                u, rng_state = rng.masked_uniform(rng_state, ok)
                sel = ok & (u < prob)
                sel_dx = jnp.where(sel, dx, sel_dx)
                sel_dy = jnp.where(sel, dy, sel_dy)
                v_idx = jnp.where(sel, v, v_idx)
                w_sel = jnp.where(sel, w, w_sel)
                found = found | sel
                wsum = wsum_new
                stream = jnp.where(ok, stream + 1.0, stream)
    stats = jnp.stack([jnp.where(scat, stream, stats[..., 0]),
                       jnp.where(found, v_idx.astype(jnp.float32),
                                 stats[..., 1])], axis=-1)
    mis = jnp.stack([wsum, w_sel], axis=-1)

    # splice the chosen neighbour's suffix (UpdateReservoir,
    # spatial_reuse.comp:44-53) — reads the PRE-STAGE reservoir snapshot
    # (the shader reads racily in place; a snapshot is the deterministic
    # equivalent)
    gy = jnp.clip(yy + sel_dy, 0, height - 1)
    gx = jnp.clip(xx + sel_dx, 0, width - 1)
    nb_res = reservoir[gy, gx]                              # (H, W, V, 6)
    vmask = jnp.arange(n_vertices) >= v_idx[..., None]
    take = found[..., None] & vmask
    reservoir = jnp.where(take[..., None], nb_res, reservoir)
    return reservoir, stats, mis, rng_state


# ---------------------------------------------------------------------------
# Stage 4: shading (restir/render.comp)
# ---------------------------------------------------------------------------

def _shade(rng_state, vol: Volume, lights: Lights, p: TraceParams,
           reservoir, stats, pixel_info, n_vertices: int, mis=None):
    """ShadePath (render.comp:7-60): accumulate single-scatter lighting
    along the reservoir path with 8-step inter-vertex transmittance; the HG
    phase importance factor applies at the exchange start vertex — scaled
    by the RIS contribution weight W = wsum / (M * w_sel) when ``mis`` is
    given (with uniform weights W == 1, the shader's behavior)."""
    scat_px = pixel_info[..., 3] == 1.0
    exchange = stats[..., 1].astype(jnp.int32)
    if mis is not None:
        wsum, w_sel = mis[..., 0], mis[..., 1]
        m_count = jnp.maximum(stats[..., 0] - 1.0, 1.0)
        ris_w = jnp.where(w_sel > 0.0,
                          wsum / (m_count * jnp.maximum(w_sel, 1e-20)),
                          1.0)
    else:
        ris_w = jnp.ones(exchange.shape, jnp.float32)

    last = reservoir[..., 0, :3]
    last_dir = jnp.zeros_like(last)
    light = jnp.zeros_like(last)
    trans = jnp.ones(last.shape[:-1], jnp.float32)
    total_phase = jnp.ones_like(trans)

    for i in range(1, n_vertices):
        vp = reservoir[..., i, :3]
        probe = reservoir[..., i, 3:]
        cur_dir = vp - last
        cur_dir = cur_dir / jnp.maximum(
            jnp.linalg.norm(cur_dir, axis=-1, keepdims=True), 1e-12)
        dens = get_density(vol, vp)
        m = scat_px & (dens > 0.0)

        scene, rng_state = trace_scene(rng_state, vol, lights, p, vp,
                                       cur_dir, m, env_dir=probe)
        ph = jnp.where(i == exchange,
                       hg_phase(jnp.sum(last_dir * -cur_dir, axis=-1),
                                vol.g) * ris_w,
                       1.0)
        total_phase = jnp.where(m, total_phase * ph, total_phase)
        s_int = dens[..., None] * scene * total_phase[..., None]
        t_r = fixed_step_transmittance(vol, vp, last, 8)
        light = jnp.where(m[..., None],
                          light + trans[..., None] * s_int, light)
        trans = jnp.where(m, trans * t_r, trans)
        last = jnp.where(m[..., None], vp, last)
        last_dir = jnp.where(m[..., None], cur_dir, last_dir)

    # transmittance == 1 (nothing shaded) -> background (render.comp:94-97)
    bg = pixel_info[..., :3]
    rgb = jnp.where((trans == 1.0)[..., None], bg, light)
    return jnp.concatenate([rgb, trans[..., None]], axis=-1), rng_state


# ---------------------------------------------------------------------------
# Full frame
# ---------------------------------------------------------------------------

def _restir_step(state: RestirState, camera: Camera, vol: Volume,
                 lights: Lights, *, params: TraceParams, width: int,
                 height: int, n_vertices: int, spatial_kernel: int,
                 temporal_kernel: int,
                 mis_weights: bool = False) -> RestirState:
    key, sub = jax.random.split(state.key)
    frame_rand = rng.frame_random(sub)

    ro, rd, frag_uv = pixel_rays(camera, width, height)
    ro = jnp.broadcast_to(ro, rd.shape)
    # each dispatch re-seeds from the same per-frame uniform (every
    # restir/*.comp main() runs the same InitRandom preamble)
    rs = rng.init_state(frag_uv, frame_rand)

    reservoir, pixel_info, stats, rs = _local_init(
        rs, vol, lights, ro, rd, state.reservoir, n_vertices)
    # per-frame RIS accumulators (wsum, w_sel); like the stream count,
    # they reset every frame
    mis = jnp.zeros(stats.shape[:-1] + (2,), jnp.float32)

    rs2 = rng.init_state(frag_uv, frame_rand)
    reservoir, old_reservoirs, stats, mis, rs2 = _temporal_reuse(
        rs2, reservoir, state.old_reservoirs, stats, mis, pixel_info,
        state.frame, n_vertices, temporal_kernel, g=vol.g,
        weighted=mis_weights)

    rs3 = rng.init_state(frag_uv, frame_rand)
    reservoir, stats, mis, rs3 = _spatial_reuse(
        rs3, reservoir, stats, mis, pixel_info, n_vertices, spatial_kernel,
        height, width, g=vol.g, weighted=mis_weights)

    rs4 = rng.init_state(frag_uv, frame_rand)
    image, rs4 = _shade(rs4, vol, lights, params, reservoir, stats,
                        pixel_info, n_vertices, mis=mis)

    return RestirState(image=image, pixel_info=pixel_info, stats=stats,
                       reservoir=reservoir, old_reservoirs=old_reservoirs,
                       frame=state.frame + 1, key=key)
