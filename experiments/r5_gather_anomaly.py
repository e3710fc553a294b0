"""Round-5: isolate the in-context fine-gather anomaly.

The identical gather fusion (same HLO, layouts, scoped VMEM) measures
~300M u8 lookups/s standalone but 123M/s when composed after the
pw_events Pallas kernel (134.5 ms of the 144 ms kernel+gather+fold body,
BASELINE.md round 5).  Variants isolate WHICH dependency poisons it:

  A  kernel -> gather(kernel lin)   the slow production composition
  B  kernel -> gather(param lin)    kernel runs, gather uses parameter
                                    indices (fold still reads kernel outs)
  C  kernel discarded + gather      kernel result summed into output but
                                    gather+fold fully independent
  D  no kernel                      the fast iso baseline
"""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import jax
import jax.numpy as jnp
import numpy as np

from nrc_hpm_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

from timing import chain_timeit


def main():
    from nrc_hpm_tpu.camera import Camera, pixel_rays
    from nrc_hpm_tpu.config import AppConfig
    import nrc_hpm_tpu.transmittance as T
    import nrc_hpm_tpu.ops.pw_kernels as K
    from nrc_hpm_tpu.renderer import _volume_from_config
    from nrc_hpm_tpu.utils import rng
    from nrc_hpm_tpu.volume import find_entry_exit

    print("device:", jax.devices()[0], flush=True)
    cfg = AppConfig()
    W, H = cfg.render_width, cfg.render_height
    N = W * H
    vol = _volume_from_config(cfg)
    cam = Camera.reference_camera(aspect=W / H)
    ro, rd, uv = pixel_rays(cam, W, H)
    frd = jnp.reshape(rd, (N, 3))
    fro = jnp.broadcast_to(ro, frd.shape)
    s0 = rng.init_state(uv, jnp.asarray([0.1, 0.2, 0.3, 0.4])).reshape(N)
    seed, _ = T._track_seed(s0)
    _, exit_pt, _ = find_entry_exit(vol, fro, frd)
    tmax = jnp.linalg.norm(exit_pt - fro, axis=-1)
    M = 1036800
    a, b, t, s = fro[:M], frd[:M], tmax[:M], seed[:M]
    el = jnp.zeros((M,), jnp.float32)
    gf = vol.grid.reshape(-1)
    scale = vol.density_factor * (1.0 / 255.0)
    plin = jnp.asarray(np.random.randint(-1, 1600000, size=(16, M)),
                       jnp.int32)

    def kern(a, b, t, s, e):
        return K.pw_events(vol, a, b, t, s, e, 0, S=16, salt=K._SALT_DELTA)

    def fold(dens, tt, c_at, sres):
        f = jnp.where(tt < 0, 1.0,
                      1.0 - jnp.clip(dens - c_at, 0, None) / sres)
        return jnp.prod(f, axis=0)

    def A(a, b, t, s, e):
        ev = kern(a, b, t, s, e)
        raw = jnp.take(gf, ev["lin"], mode="fill", fill_value=0)
        return fold(raw.astype(jnp.float32) * scale, ev["t"], ev["c_at"],
                    ev["sres"]), ev["e_new"]

    def B(a, b, t, s, e, pl):
        ev = kern(a, b, t, s, e)
        raw = jnp.take(gf, pl, mode="fill", fill_value=0)
        return fold(raw.astype(jnp.float32) * scale, ev["t"], ev["c_at"],
                    ev["sres"]), ev["e_new"]

    def C(a, b, t, s, e, pl):
        ev = kern(a, b, t, s, e)
        raw = jnp.take(gf, pl, mode="fill", fill_value=0)
        ft = jnp.asarray(pl, jnp.float32)
        return (fold(raw.astype(jnp.float32) * scale, ft, ft + 1.0,
                     ft + 2.0),
                ev["e_new"] + ev["rtot"] + ev["ctot"])

    def D(pl):
        raw = jnp.take(gf, pl, mode="fill", fill_value=0)
        ft = jnp.asarray(pl, jnp.float32)
        return fold(raw.astype(jnp.float32) * scale, ft, ft + 1.0,
                    ft + 2.0)

    chain_timeit("A kernel->gather(kernel lin)", A, a, b, t, s, el, n=3)
    chain_timeit("B kernel->gather(param lin)", B, a, b, t, s, el, plin,
                 n=3)
    chain_timeit("C kernel + independent gather", C, a, b, t, s, el, plin,
                 n=3)
    chain_timeit("D gather only", D, plin, n=3)


if __name__ == "__main__":
    main()
