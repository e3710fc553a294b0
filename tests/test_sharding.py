import jax
import numpy as np
import pytest

from nrc_hpm_tpu.camera import Camera
from nrc_hpm_tpu.config import AppConfig, EncodingConfig, SceneConfig


def _cfg(**kw):
    base = dict(
        scene=SceneConfig.preset(4),
        render_width=64, render_height=32,
        nn_width=32, nn_depth=2,
        encoding=EncodingConfig(n_levels=4, log2_hashmap_size=12),
        log2_infer_batch_size=11, log2_train_batch_size=6,
        train_batch_count=2, train_ray_length=4)
    base.update(kw)
    return AppConfig(**base)


@pytest.fixture(scope="module")
def mesh8():
    from nrc_hpm_tpu.parallel.sharding import make_mesh
    assert len(jax.devices()) >= 8, "conftest must provide 8 cpu devices"
    return make_mesh(8)


def test_sharded_step_runs_and_stays_finite(mesh8):
    from nrc_hpm_tpu.parallel.sharding import ShardedNrcRenderer
    r = ShardedNrcRenderer(_cfg(), mesh=mesh8)
    cam = Camera.reference_camera(aspect=2.0)
    state = r.init_state(0)
    for _ in range(2):
        state = r.step(state, cam, train=True)
    img = np.asarray(state.image)
    assert img.shape == (32, 64, 4)
    assert np.isfinite(img).all()
    assert int(state.nrc.step) == 4
    assert np.isfinite(float(state.nrc.loss))
    # per-shard ring cursors advanced
    heads = np.asarray(state.ring.head)
    tails = np.asarray(state.ring.tail)
    assert heads.shape == (8,)
    assert (heads + tails > 0).all()


def test_sharded_matches_single_chip_frozen(mesh8):
    """Frozen-cache frame: the sharded render must reproduce the single-chip
    image. The per-lane RNG streams are identical, but XLA picks different
    reduction algorithms for different batch shapes, so ~1e-6 fp wiggle can
    chaotically flip individual stochastic events — compare statistically:
    nearly every pixel identical, image mean preserved."""
    from nrc_hpm_tpu.parallel.sharding import ShardedNrcRenderer
    from nrc_hpm_tpu.renderer import NrcRenderer
    cfg = _cfg()
    single = NrcRenderer(cfg)
    sharded = ShardedNrcRenderer(cfg, mesh=mesh8)
    cam = Camera.reference_camera(aspect=2.0)
    img_a = np.asarray(
        single.step(single.init_state(7), cam, train=False).image)
    img_b = np.asarray(
        sharded.step(sharded.init_state(7), cam, train=False).image)
    per_px = np.abs(img_a - img_b).max(axis=-1)
    assert (per_px < 1e-4).mean() > 0.97, (per_px < 1e-4).mean()
    assert abs(img_a.mean() - img_b.mean()) < 5e-3


def test_sharded_training_close_to_single_chip(mesh8):
    """One training frame: psum-averaged sharded grads equal the global
    batch gradient up to fp reassociation, so parameters track closely.
    (Ring pops differ — per-shard rings — so later frames may diverge for
    non-scattered train pixels; frame 1 has none popped-trained yet.)"""
    from nrc_hpm_tpu.parallel.sharding import ShardedNrcRenderer
    from nrc_hpm_tpu.renderer import NrcRenderer
    cfg = _cfg()
    single = NrcRenderer(cfg)
    sharded = ShardedNrcRenderer(cfg, mesh=mesh8)
    cam = Camera.reference_camera(aspect=2.0)
    st_a = single.init_state(7)
    st_b = sharded.init_state(7)
    w0 = np.asarray(st_a.nrc.params["mlp"]["layers"][0]).copy()
    sa = single.step(st_a, cam, train=True)
    sb = sharded.step(st_b, cam, train=True)
    wa = np.asarray(sa.nrc.params["mlp"]["layers"][0])
    wb = np.asarray(sb.nrc.params["mlp"]["layers"][0])
    # Adam's first steps are sign-like (v ~ 0), so fp reassociation between
    # the global batch and the psum-of-shard-means amplifies to lr-scale
    # deltas in weights whose gradient is near zero.  Check the UPDATES are
    # strongly correlated instead of bitwise-close.
    da, db = (wa - w0).ravel(), (wb - w0).ravel()
    corr = np.dot(da, db) / (np.linalg.norm(da) * np.linalg.norm(db))
    assert corr > 0.95, corr
    assert np.abs(wa - wb).max() < 5 * 0.01 * cfg.train_batch_count


def test_sharded_frame1_global_batch_exact(mesh8):
    """Tight gradient-equivalence gate (VERDICT r3 item 3): ONE frame at
    n=1 vs n=4 from the same seed must produce the SAME post-frame cache.
    The design claims exact global-batch membership (sharding.py:219-232):
    every shard trains on its sub-range of the same global batches, psum
    reassociates the same per-sample terms.  Frame 1 is before any ring
    divergence (initial ring entries are identical), so:
      - the loss must match to fp-reassociation precision,
      - hash-grid params must match BITWISE (per-entry scatter sums touch
        few terms; untouched entries get exactly zero gradient),
      - MLP params to ~1e-4: Adam's first steps are sign-like
        (update ~ lr * g/(|g|+eps)), amplifying 1e-7-relative gradient
        reassociation noise on near-zero-gradient weights; measured max
        abs deviation at this scale is 4.3e-5 (lr 0.01)."""
    from nrc_hpm_tpu.parallel.sharding import ShardedNrcRenderer, make_mesh
    cfg = _cfg()
    cam = Camera.reference_camera(aspect=2.0)
    out = {}
    for n in (1, 4):
        r = ShardedNrcRenderer(cfg, mesh=make_mesh(n))
        st = r.step(r.init_state(7), cam, train=True)
        out[n] = (float(st.nrc.loss),
                  jax.tree.map(np.asarray, st.nrc.params))
    loss1, p1 = out[1]
    loss4, p4 = out[4]
    assert abs(loss1 - loss4) <= 1e-5 * max(abs(loss1), 1.0), (loss1, loss4)
    for a, b in zip(jax.tree.leaves(p1["encoding"]),
                    jax.tree.leaves(p4["encoding"])):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(jax.tree.leaves(p1["mlp"]), jax.tree.leaves(p4["mlp"])):
        np.testing.assert_allclose(a, b, atol=2e-4)


def test_non_divisible_dims_pad_and_match_single_chip(mesh8):
    """Height 30 over 8 devices (pads to 32 rows) + train batches that
    don't divide the mesh (weight-masked lanes): the cropped sharded frame
    must match the single-chip frame and training must stay equivalent."""
    from nrc_hpm_tpu.parallel.sharding import ShardedNrcRenderer
    from nrc_hpm_tpu.renderer import NrcRenderer
    from nrc_hpm_tpu.parallel.sharding import make_mesh
    # rows: height 30 over 8 devices pads to 32
    cfg = _cfg(render_height=30)
    single = NrcRenderer(cfg)
    sharded = ShardedNrcRenderer(cfg, mesh=mesh8)
    assert sharded.pad_h == 32 and sharded.local_h == 4
    cam = Camera.reference_camera(aspect=64 / 30)

    img_a = np.asarray(
        single.step(single.init_state(7), cam, train=False).image)
    st_b = sharded.step(sharded.init_state(7), cam, train=False)
    img_b = np.asarray(sharded.final_image(st_b))
    assert img_a.shape == img_b.shape == (30, 64, 4)
    per_px = np.abs(img_a - img_b).max(axis=-1)
    assert (per_px < 1e-4).mean() > 0.97, (per_px < 1e-4).mean()

    # train batches: power-of-two batch sizes only pad on non-power-of-two
    # meshes — 64-pixel batches over 3 shards -> 22 lanes/shard, 2 masked
    sharded = ShardedNrcRenderer(cfg, mesh=make_mesh(3))
    assert sharded._padded_train and sharded._bs_l == 22
    st_a = single.init_state(7)
    st_b = sharded.init_state(7)
    w0 = np.asarray(st_a.nrc.params["mlp"]["layers"][0]).copy()
    sa = single.step(st_a, cam, train=True)
    sb = sharded.step(st_b, cam, train=True)
    wa = np.asarray(sa.nrc.params["mlp"]["layers"][0])
    wb = np.asarray(sb.nrc.params["mlp"]["layers"][0])
    da, db = (wa - w0).ravel(), (wb - w0).ravel()
    corr = np.dot(da, db) / (np.linalg.norm(da) * np.linalg.norm(db))
    assert corr > 0.95, corr
    assert np.isfinite(float(sb.nrc.loss))
