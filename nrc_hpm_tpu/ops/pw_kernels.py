"""Pallas TPU kernel: the piecewise-majorant tracking event engine.

One kernel fuses, per tracking segment, everything the XLA path spreads
over a dozen fused regions (transmittance.py: _coarse_profile +
_indexed_draws_lead + _map_events + position/index math):

  1. the coarse majorant/control profile along each lane's segment —
     C+1 regular samples of the bf16-packed macrocell table, served by an
     in-register rowsweep over the whole table (VMEM-resident, ~28 rows);
  2. the control/residual cumulative optical depths (ccum/rcum);
  3. S stateless Exp(1) event draws per lane (Jenkins-hash indexed by the
     global event counter — bit-identical to transmittance._indexed_draws);
  4. inversion of the piecewise-linear rcum at each event depth via
     telescoping step-indicator sums;
  5. the fine-density-grid linear index, interval control c_at and
     residual width sres = sigma - c at each event.

The ONE thing that stays outside is the fine-grid density gather itself
(1.7M voxels — far beyond any in-kernel gather primitive; XLA's scalar
gather path serves it), plus the cheap transmittance/resolution fold.

Every intermediate that the XLA path materialized in HBM ((C, N) profiles,
(S, C, N) membership products) lives in VMEM scratch here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .loops import unrolled_fori

LANES = 128
ROWS = 8               # lane-rows per program: 8 x 128 = 1024 lanes
UNROLL = 8             # kernel-loop partial unroll (ops/loops.py): full
                       # unroll traced ~10k primitives/kernel (150 s of
                       # 1080p trace time); unroll=1 serialized the VPU
                       # (~35% slower frames).  TPU v5e sweep
                       # (experiments/kernel_tune.py): 8 is fastest of
                       # {1,2,4,8} while keeping traces ~8x below full
                       # unroll.
_SALT_EVENT = 0x9E3779B9   # matches transmittance ratio event draws
_SALT_DELTA = 0x85EBCA6B   # matches transmittance delta event draws

def _hash_u32(x):
    x = x + (x << 10)
    x = x ^ (x >> 6)
    x = x + (x << 3)
    x = x ^ (x >> 11)
    x = x + (x << 15)
    return x


def _uniform(seed, k, salt: int):
    """float in [0,1): float_construct(hash(seed ^ hash(salt + k))).
    Constants stay numpy scalars so the kernel captures nothing."""
    import numpy as np
    hk = _hash_u32(k + np.uint32(salt))
    m = _hash_u32(seed ^ hk)
    f = jax.lax.bitcast_convert_type(
        (m & 0x007FFFFF) | 0x3F800000, jnp.float32)
    return f - 1.0


def _unpack_profile(word_f32):
    """bf16-packed (majorant, control) word (bitcast f32) -> (sig, ctl)."""
    w = jax.lax.bitcast_convert_type(word_f32, jnp.uint32)
    sig = jax.lax.bitcast_convert_type(w & jnp.uint32(0xFFFF0000),
                                       jnp.float32)
    ctl = jax.lax.bitcast_convert_type(w << 16, jnp.float32)
    return sig, jnp.minimum(ctl, sig)


def _make_kernel(C: int, S: int, n_rows: int, salt: int):
    # the tele8 inversion iterates C // 8 tiles; a non-multiple-of-8 C
    # would silently skip trailing intervals (ADVICE r4)
    assert C % 8 == 0, f"interval count C={C} must be a multiple of 8"

    def kernel(params, ebase_smem, tbl_ref,
               sx, sy, sz, dx, dy, dz, tmax_ref, seed_ref, elast_ref,
               lin_out, t_out, c_out, sres_out, enew_out, rtot_out,
               ctot_out, sig_scr, ctl_scr, rcum_scr):
        # scene constants (volume.py geometry; see pw_events caller)
        inv_skyx, inv_skyy, inv_skyz = params[0], params[1], params[2]
        mx, my, mz = params[3], params[4], params[5]
        X, Y, Z = params[6], params[7], params[8]
        density_factor = params[9]

        # The profile/inversion loops below are jax.lax loops, NOT Python
        # unrolls: the unrolled form traced ~10k primitives per kernel
        # instance (~8.5 s each, x18 call-site shapes = 150 s of the 1080p
        # step's trace time) for identical generated code.
        ox, oy, oz = sx[...], sy[...], sz[...]
        vx, vy, vz = dx[...], dy[...], dz[...]
        tmax = tmax_ref[...]
        h = tmax * (1.0 / C)

        def macro_lookup(px, py, pz):
            # cell coords
            cx = (px * inv_skyx + 0.5) * mx
            cy = (py * inv_skyy + 0.5) * my
            cz = (pz * inv_skyz + 0.5) * mz
            in_strict = ((cx >= 0) & (cx < mx) & (cy >= 0) & (cy < my)
                         & (cz >= 0) & (cz < mz))
            in_ext = ((cx >= -1) & (cx < mx + 1) & (cy >= -1)
                      & (cy < my + 1) & (cz >= -1) & (cz < mz + 1))
            ix = jnp.clip(jnp.floor(cx), 0.0, mx - 1.0)
            iy = jnp.clip(jnp.floor(cy), 0.0, my - 1.0)
            iz = jnp.clip(jnp.floor(cz), 0.0, mz - 1.0)
            lin = (ix * (my * mz) + iy * mz + iz).astype(jnp.int32)
            r = lin // LANES
            c = lin % LANES
            shape = lin.shape

            def srow8(t, acc):
                # 8-row tile per trip, static indexing inside: dynamic
                # single-row slices dominated the sweep (see
                # ops/fused_encode_mlp.py body8 / fused_kernel_decomp)
                tile = tbl_ref[pl.ds(t * 8, 8)]
                for k in range(8):
                    rowv = jnp.broadcast_to(tile[k:k + 1], shape)
                    picked = jnp.take_along_axis(rowv, c, axis=1)
                    acc = jnp.where(r == t * 8 + k, picked, acc)
                return acc

            acc = unrolled_fori(-(-n_rows // 8), srow8,
                                jnp.zeros(shape, jnp.float32), UNROLL)
            sig, ctl = _unpack_profile(acc)
            sig = jnp.where(in_ext, sig, 0.0) * density_factor
            ctl = jnp.where(in_strict, ctl, 0.0) * density_factor
            return sig, ctl

        # ---- profile: C+1 points -> C intervals + cumsums ----
        p_sig0, p_ctl0 = macro_lookup(ox, oy, oz)

        def prof_body(i, carry):
            p_sig, p_ctl, ccum, rcum = carry
            t_i = jnp.asarray(i + 1).astype(jnp.float32) * h
            nx = ox + t_i * vx
            ny = oy + t_i * vy
            nz = oz + t_i * vz
            n_sig, n_ctl = macro_lookup(nx, ny, nz)
            sig = jnp.maximum(p_sig, n_sig)
            ctl = jnp.minimum(jnp.minimum(p_ctl, n_ctl), sig)
            sig_scr[pl.ds(i, 1)] = sig[None]
            ctl_scr[pl.ds(i, 1)] = ctl[None]
            ccum = ccum + ctl * h
            rcum = rcum + (sig - ctl) * h
            rcum_scr[pl.ds(i, 1)] = rcum[None]
            return n_sig, n_ctl, ccum, rcum

        zero = jnp.zeros_like(h)
        # rows [C, C+8): read by the last tele8 tile (ci+1 at ci = C-1)
        sig_scr[pl.ds(C, 8)] = jnp.zeros((8,) + h.shape, jnp.float32)
        ctl_scr[pl.ds(C, 8)] = jnp.zeros((8,) + h.shape, jnp.float32)
        _, _, ccum, rcum = unrolled_fori(
            C, prof_body, (p_sig0, p_ctl0, zero, zero), UNROLL)
        rtot_out[...] = rcum
        ctot_out[...] = ccum

        # ---- S events: draw, invert, emit ----
        seed = seed_ref[...]
        e_base = ebase_smem[0]

        def ev_body(s, E):
            k = (jnp.uint32(e_base) + jnp.asarray(s).astype(jnp.uint32)
                 + jnp.zeros(seed.shape, jnp.uint32))
            u = _uniform(seed, k, salt)
            E = E - jnp.log1p(-u)

            # telescoping inversion over the C intervals, 8-row tiles:
            # the per-interval form issued 31 x 5 dynamic scratch slices
            # per event; tiles make it 4 x 3.  The extra ci = C-1 step
            # only fires for beyond-events (gef = [E >= rcum total]),
            # whose t/c_at/sres outputs are masked by the callers; the
            # zero-filled rows past C keep its arithmetic finite.
            def tele8(t, carry):
                kacc, e_left, c_at, sig_at, r_prev = carry
                rc_t = rcum_scr[pl.ds(t * 8, 8)]
                ctl9 = ctl_scr[pl.ds(t * 8, 9)]
                sig9 = sig_scr[pl.ds(t * 8, 9)]
                for kk in range(8):
                    rc = rc_t[kk]
                    gef = (E >= rc).astype(jnp.float32)
                    kacc = kacc + gef
                    e_left = e_left + gef * (rc - r_prev)
                    c_at = c_at + gef * (ctl9[kk + 1] - ctl9[kk])
                    sig_at = sig_at + gef * (sig9[kk + 1] - sig9[kk])
                    r_prev = rc
                return kacc, e_left, c_at, sig_at, r_prev

            kacc, e_left, c_at, sig_at, _ = unrolled_fori(
                C // 8, tele8,
                (jnp.zeros_like(E), jnp.zeros_like(E), ctl_scr[0],
                 sig_scr[0], jnp.zeros_like(E)), UNROLL)
            beyond = E >= rcum
            # e_left sums ge_c * d_rcum with d relative to the PREVIOUS
            # rcum — i.e. e_left = rcum[kacc-1] for kacc >= 1
            sres = jnp.maximum(sig_at - c_at, 1e-12)
            rate_h = sres * h
            t = kacc * h + (E - e_left) * h / jnp.maximum(rate_h, 1e-20)
            t = jnp.where(beyond, -1.0, t)
            px = ox + t * vx
            py = oy + t * vy
            pz = oz + t * vz
            ux = px * inv_skyx + 0.5
            uy = py * inv_skyy + 0.5
            uz = pz * inv_skyz + 0.5
            inside = ((ux >= 0.0) & (ux < 1.0) & (uy >= 0.0) & (uy < 1.0)
                      & (uz >= 0.0) & (uz < 1.0))
            gx = jnp.clip(jnp.floor(ux * X), 0.0, X - 1.0)
            gy = jnp.clip(jnp.floor(uy * Y), 0.0, Y - 1.0)
            gz = jnp.clip(jnp.floor(uz * Z), 0.0, Z - 1.0)
            lin = (gx * (Y * Z) + gy * Z + gz).astype(jnp.int32)
            lin = jnp.where(inside & ~beyond, lin, -1)
            lin_out[pl.ds(s, 1)] = lin[None]
            t_out[pl.ds(s, 1)] = t[None]
            c_out[pl.ds(s, 1)] = c_at[None]
            sres_out[pl.ds(s, 1)] = sres[None]
            return E

        enew_out[...] = jax.lax.fori_loop(0, S, ev_body, elast_ref[...])

    return kernel


def _make_profile_kernel(C: int, n_rows: int, want_ctrl: bool,
                         salt_ctrl: int):
    """Profile-only kernel: the coarse majorant/control sweep of
    _make_kernel without event generation.  Emits the residual/control
    total optical depths and (for delta tracking) the CONTROL-stream first
    collision t, replacing the XLA-side _coarse_profile + _map_events
    pre-pass that cost ~90 ms per full-width tracking call
    (transmittance.py round-4 restructure)."""
    assert C % 8 == 0, f"interval count C={C} must be a multiple of 8"

    def kernel(params, tbl_ref, sx, sy, sz, dx, dy, dz, tmax_ref, seed_ref,
               rtot_out, ctot_out, tctrl_out, ctl_scr, ccum_scr):
        inv_skyx, inv_skyy, inv_skyz = params[0], params[1], params[2]
        mx, my, mz = params[3], params[4], params[5]
        density_factor = params[9]

        ox, oy, oz = sx[...], sy[...], sz[...]
        vx, vy, vz = dx[...], dy[...], dz[...]
        tmax = tmax_ref[...]
        h = tmax * (1.0 / C)

        def macro_lookup(px, py, pz):
            cx = (px * inv_skyx + 0.5) * mx
            cy = (py * inv_skyy + 0.5) * my
            cz = (pz * inv_skyz + 0.5) * mz
            in_strict = ((cx >= 0) & (cx < mx) & (cy >= 0) & (cy < my)
                         & (cz >= 0) & (cz < mz))
            in_ext = ((cx >= -1) & (cx < mx + 1) & (cy >= -1)
                      & (cy < my + 1) & (cz >= -1) & (cz < mz + 1))
            ix = jnp.clip(jnp.floor(cx), 0.0, mx - 1.0)
            iy = jnp.clip(jnp.floor(cy), 0.0, my - 1.0)
            iz = jnp.clip(jnp.floor(cz), 0.0, mz - 1.0)
            lin = (ix * (my * mz) + iy * mz + iz).astype(jnp.int32)
            r = lin // LANES
            c = lin % LANES
            shape = lin.shape

            def srow8(t, acc):
                # 8-row tiles (see the event kernel's srow8)
                tile = tbl_ref[pl.ds(t * 8, 8)]
                for k in range(8):
                    rowv = jnp.broadcast_to(tile[k:k + 1], shape)
                    picked = jnp.take_along_axis(rowv, c, axis=1)
                    acc = jnp.where(r == t * 8 + k, picked, acc)
                return acc

            acc = unrolled_fori(-(-n_rows // 8), srow8,
                                jnp.zeros(shape, jnp.float32), UNROLL)
            sig, ctl = _unpack_profile(acc)
            sig = jnp.where(in_ext, sig, 0.0) * density_factor
            ctl = jnp.where(in_strict, ctl, 0.0) * density_factor
            return sig, ctl

        p_sig0, p_ctl0 = macro_lookup(ox, oy, oz)

        def prof_body(i, carry):
            p_sig, p_ctl, ccum, rcum = carry
            t_i = jnp.asarray(i + 1).astype(jnp.float32) * h
            nx = ox + t_i * vx
            ny = oy + t_i * vy
            nz = oz + t_i * vz
            n_sig, n_ctl = macro_lookup(nx, ny, nz)
            sig = jnp.maximum(p_sig, n_sig)
            ctl = jnp.minimum(jnp.minimum(p_ctl, n_ctl), sig)
            ctl_scr[pl.ds(i, 1)] = ctl[None]
            ccum = ccum + ctl * h
            rcum = rcum + (sig - ctl) * h
            ccum_scr[pl.ds(i, 1)] = ccum[None]
            return n_sig, n_ctl, ccum, rcum

        zero = jnp.zeros_like(h)
        # rows [C, C+8): read by the last tele8 tile (ci+1 at ci = C-1)
        ctl_scr[pl.ds(C, 8)] = jnp.zeros((8,) + h.shape, jnp.float32)
        _, _, ccum, rcum = unrolled_fori(
            C, prof_body, (p_sig0, p_ctl0, zero, zero), UNROLL)
        rtot_out[...] = rcum
        ctot_out[...] = ccum

        if want_ctrl:
            # control collision: one Exp(1) draw inverted through ccum —
            # bit-identical to the XLA _indexed_draws_lead(seed, 0, 1,
            # salt_ctrl) + _map_events path (transmittance.delta_track_pw)
            seed = seed_ref[...]
            k0 = jnp.zeros(seed.shape, jnp.uint32)
            E = -jnp.log1p(-_uniform(seed, k0, salt_ctrl))

            def tele8(t, carry):
                kacc, e_left, c_at, cc_prev = carry
                cc_t = ccum_scr[pl.ds(t * 8, 8)]
                ctl9 = ctl_scr[pl.ds(t * 8, 9)]
                for kk in range(8):
                    cc = cc_t[kk]
                    gef = (E >= cc).astype(jnp.float32)
                    kacc = kacc + gef
                    e_left = e_left + gef * (cc - cc_prev)
                    c_at = c_at + gef * (ctl9[kk + 1] - ctl9[kk])
                    cc_prev = cc
                return kacc, e_left, c_at, cc_prev

            kacc, e_left, c_at, _ = unrolled_fori(
                C // 8, tele8,
                (jnp.zeros_like(E), jnp.zeros_like(E), ctl_scr[0],
                 jnp.zeros_like(E)), UNROLL)
            beyond = E >= ccum
            rate_h = jnp.maximum(c_at * h, 1e-20)
            t = kacc * h + (E - e_left) * h / rate_h
            tctrl_out[...] = jnp.where(beyond, jnp.float32(3.0e38), t)
        else:
            tctrl_out[...] = jnp.full_like(h, 3.0e38)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("C", "n_rows", "want_ctrl",
                                    "salt_ctrl", "interpret"))
def _pw_profile_call(params, tbl, sx, sy, sz, dx, dy, dz, tmax, seed, *,
                     C: int, n_rows: int, want_ctrl: bool, salt_ctrl: int,
                     interpret: bool = False):
    nr = tmax.shape[0]
    grid = (nr // ROWS,)

    def lane(g):
        return (g, 0)

    vm = pltpu.VMEM
    lane_in = pl.BlockSpec((ROWS, LANES), lane, memory_space=vm)
    lane_out = pl.BlockSpec((ROWS, LANES), lane, memory_space=vm)
    return pl.pallas_call(
        _make_profile_kernel(C, n_rows, want_ctrl, salt_ctrl),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # params
            pl.BlockSpec((n_rows, LANES), lambda g: (0, 0),
                         memory_space=vm),           # macro table
        ] + [lane_in] * 8,
        out_shape=(
            jax.ShapeDtypeStruct((nr, LANES), jnp.float32),  # rtot
            jax.ShapeDtypeStruct((nr, LANES), jnp.float32),  # ctot
            jax.ShapeDtypeStruct((nr, LANES), jnp.float32),  # t_ctrl
        ),
        out_specs=(lane_out, lane_out, lane_out),
        scratch_shapes=[
            pltpu.VMEM((40, ROWS, LANES), jnp.float32),  # ctl_scr (+8 pad)
            pltpu.VMEM((32, ROWS, LANES), jnp.float32),  # ccum_scr
        ],
        interpret=interpret,
    )(params, tbl, sx, sy, sz, dx, dy, dz, tmax, seed)


def pw_profile(vol, start, direction, tmax, seed, C: int = 32,
               want_ctrl: bool = False, salt_ctrl: int = 0x165667B1,
               interpret: bool = False):
    """Fused coarse-profile totals for one tracking call.

    start/direction: (N, 3); tmax/seed(u32): (N,).  Returns dict with
    rtot/ctot (N,) and (want_ctrl) t_ctrl (N,) — the control-stream first
    collision distance, 3e38 when the control draw lands beyond the
    segment."""
    assert C == 32, "scratch shapes are sized for C == 32"
    n = tmax.shape[0]
    pad = (-n) % (ROWS * LANES)

    def lanes2d(a):
        a = jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1)) if pad else a
        return a.reshape(-1, LANES) if a.ndim == 1 else a

    mx, my, mz = vol.macro_dims
    X, Y, Z = vol.dims
    sky = vol.sky_size
    params = jnp.concatenate([
        1.0 / sky, jnp.asarray([mx, my, mz, X, Y, Z], jnp.float32),
        vol.density_factor[None], sky, jnp.zeros((3,), jnp.float32)])
    n_rows = -(-vol.macro_packed.shape[0] // LANES)
    n_rows = -(-n_rows // 8) * 8   # 8-row sweep tiles
    tbl = jnp.pad(vol.macro_packed,
                  (0, n_rows * LANES - vol.macro_packed.shape[0]))
    tbl = jax.lax.bitcast_convert_type(
        tbl.reshape(n_rows, LANES), jnp.float32)

    rtot, ctot, t_ctrl = _pw_profile_call(
        params, tbl,
        lanes2d(start[:, 0]), lanes2d(start[:, 1]), lanes2d(start[:, 2]),
        lanes2d(direction[:, 0]), lanes2d(direction[:, 1]),
        lanes2d(direction[:, 2]),
        lanes2d(tmax), lanes2d(seed.astype(jnp.uint32)),
        C=C, n_rows=n_rows, want_ctrl=want_ctrl, salt_ctrl=salt_ctrl,
        interpret=interpret)

    def unlanes(a):
        return a.reshape(-1)[:n]

    return dict(rtot=unlanes(rtot), ctot=unlanes(ctot),
                t_ctrl=unlanes(t_ctrl))


@functools.partial(jax.jit,
                   static_argnames=("C", "S", "n_rows", "salt",
                                    "interpret"))
def _pw_events_call(params, e_base, tbl, sx, sy, sz, dx, dy, dz, tmax,
                    seed, e_last, *, C: int, S: int, n_rows: int,
                    salt: int, interpret: bool = False):
    nr = tmax.shape[0]
    grid = (nr // ROWS,)

    def full(g):
        return (0, g, 0)

    def lane(g):
        return (g, 0)

    vm = pltpu.VMEM
    lane_in = pl.BlockSpec((ROWS, LANES), lane, memory_space=vm)
    ev_out = pl.BlockSpec((S, ROWS, LANES), full, memory_space=vm)
    lane_out = pl.BlockSpec((ROWS, LANES), lane, memory_space=vm)
    return pl.pallas_call(
        _make_kernel(C, S, n_rows, salt),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # params
            pl.BlockSpec(memory_space=pltpu.SMEM),   # e_base
            pl.BlockSpec((n_rows, LANES), lambda g: (0, 0),
                         memory_space=vm),           # macro table
        ] + [lane_in] * 9,
        out_shape=(
            jax.ShapeDtypeStruct((S, nr, LANES), jnp.int32),    # lin
            jax.ShapeDtypeStruct((S, nr, LANES), jnp.float32),  # t
            jax.ShapeDtypeStruct((S, nr, LANES), jnp.float32),  # c_at
            jax.ShapeDtypeStruct((S, nr, LANES), jnp.float32),  # sres
            jax.ShapeDtypeStruct((nr, LANES), jnp.float32),     # e_new
            jax.ShapeDtypeStruct((nr, LANES), jnp.float32),     # rtot
            jax.ShapeDtypeStruct((nr, LANES), jnp.float32),     # ctot
        ),
        out_specs=(ev_out, ev_out, ev_out, ev_out, lane_out, lane_out,
                   lane_out),
        scratch_shapes=[
            pltpu.VMEM((40, ROWS, LANES), jnp.float32),  # sig_scr (+8 pad)
            pltpu.VMEM((40, ROWS, LANES), jnp.float32),  # ctl_scr (+8 pad)
            pltpu.VMEM((32, ROWS, LANES), jnp.float32),  # rcum_scr
        ],
        interpret=interpret,
    )(params, e_base, tbl, sx, sy, sz, dx, dy, dz, tmax, seed, e_last)


def pw_events(vol, start, direction, tmax, seed, e_last, e_base,
              C: int = 32, S: int = 8, salt: int = _SALT_EVENT,
              interpret: bool = False):
    """Fused profile + event generation for one tracking segment.

    start/direction: (N, 3); tmax/seed(u32)/e_last: (N,).
    Returns dict with lin/t/c_at/sres (S, N) [t = -1 marks beyond-events,
    lin = -1 marks no-density positions], e_new/rtot/ctot (N,).
    The caller gathers density as
    ``take(grid.reshape(-1), lin, fill 0) / 255 * density_factor``.
    """
    assert C == 32, "scratch shapes are sized for C == 32"
    n = tmax.shape[0]
    pad = (-n) % (ROWS * LANES)

    def lanes2d(a):
        a = jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1)) if pad else a
        return a.reshape(-1, LANES) if a.ndim == 1 else a

    mx, my, mz = vol.macro_dims
    X, Y, Z = vol.dims
    sky = vol.sky_size
    params = jnp.concatenate([
        1.0 / sky, jnp.asarray([mx, my, mz, X, Y, Z], jnp.float32),
        vol.density_factor[None], sky, jnp.zeros((3,), jnp.float32)])
    n_rows = -(-vol.macro_packed.shape[0] // LANES)
    n_rows = -(-n_rows // 8) * 8   # 8-row sweep tiles
    tbl = jnp.pad(vol.macro_packed,
                  (0, n_rows * LANES - vol.macro_packed.shape[0]))
    tbl = jax.lax.bitcast_convert_type(
        tbl.reshape(n_rows, LANES), jnp.float32)

    outs = _pw_events_call(
        params, jnp.asarray([e_base], jnp.int32), tbl,
        lanes2d(start[:, 0]), lanes2d(start[:, 1]), lanes2d(start[:, 2]),
        lanes2d(direction[:, 0]), lanes2d(direction[:, 1]),
        lanes2d(direction[:, 2]),
        lanes2d(tmax), lanes2d(seed.astype(jnp.uint32)), lanes2d(e_last),
        C=C, S=S, n_rows=n_rows, salt=salt, interpret=interpret)
    lin, t, c_at, sres, e_new, rtot, ctot = outs

    def unlanes_ev(a):
        return a.reshape(S, -1)[:, :n]

    def unlanes(a):
        return a.reshape(-1)[:n]

    return dict(lin=unlanes_ev(lin), t=unlanes_ev(t),
                c_at=unlanes_ev(c_at), sres=unlanes_ev(sres),
                e_new=unlanes(e_new), rtot=unlanes(rtot),
                ctot=unlanes(ctot))
