"""2-D texture sampling — the vk::Texture2D equivalent.

The reference uploads stb-loaded images as Vulkan textures with a linear
sampler (src/Texture2D.cpp) consumed by Material/ImGui; here a texture is
just an (H, W, C) array and sampling is a bilinear gather, usable from any
jitted code.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_sample(tex: jax.Array, uv: jax.Array,
                    wrap: str = "repeat") -> jax.Array:
    """Sample ``tex`` (H, W, C) at ``uv`` (..., 2) in [0,1]^2 with bilinear
    filtering.  OpenGL/Vulkan convention: v=0 is the TOP row (images load
    top-down), texel centers at (i+0.5)/N.  wrap: 'repeat' | 'clamp'."""
    H, W = tex.shape[0], tex.shape[1]
    u = uv[..., 0] * W - 0.5
    v = uv[..., 1] * H - 0.5
    x0 = jnp.floor(u)
    y0 = jnp.floor(v)
    fx = (u - x0)[..., None]
    fy = (v - y0)[..., None]

    def idx(x, n):
        x = x.astype(jnp.int32)
        if wrap == "repeat":
            return jnp.mod(x, n)
        return jnp.clip(x, 0, n - 1)

    x0i, x1i = idx(x0, W), idx(x0 + 1, W)
    y0i, y1i = idx(y0, H), idx(y0 + 1, H)
    flat = tex.reshape(H * W, -1)

    def at(yy, xx):
        return jnp.take(flat, yy * W + xx, axis=0)

    top = at(y0i, x0i) * (1 - fx) + at(y0i, x1i) * fx
    bot = at(y1i, x0i) * (1 - fx) + at(y1i, x1i) * fx
    return top * (1 - fy) + bot * fy


def bilinear_sample_layered(stack: jax.Array, uv: jax.Array,
                            layer: jax.Array, wrap: str = "repeat",
                            scale: jax.Array | None = None) -> jax.Array:
    """Sample a texture ARRAY ``stack`` (T, H, W, C) at ``uv`` (..., 2)
    from per-sample ``layer`` (...,) int32 — the texture-atlas form the
    model renderer uses (one flat gather space, no cross-layer bleeding).
    ``scale`` (T, 2) rescales uv per layer (for stacks padded to a common
    shape from differently-sized textures).  Negative layers sample layer
    0 (callers mask those out)."""
    T, H, W = stack.shape[0], stack.shape[1], stack.shape[2]
    lay = jnp.clip(layer, 0, T - 1).astype(jnp.int32)
    if scale is not None:
        s = jnp.take(scale, lay, axis=0)
        uv = uv * s
    u = uv[..., 0] * W - 0.5
    v = uv[..., 1] * H - 0.5
    x0 = jnp.floor(u)
    y0 = jnp.floor(v)
    fx = (u - x0)[..., None]
    fy = (v - y0)[..., None]

    def idx(x, n):
        x = x.astype(jnp.int32)
        if wrap == "repeat":
            return jnp.mod(x, n)
        return jnp.clip(x, 0, n - 1)

    x0i, x1i = idx(x0, W), idx(x0 + 1, W)
    y0i, y1i = idx(y0, H), idx(y0 + 1, H)
    flat = stack.reshape(T * H * W, -1)
    base = lay * (H * W)

    def at(yy, xx):
        return jnp.take(flat, base + yy * W + xx, axis=0)

    top = at(y0i, x0i) * (1 - fx) + at(y0i, x1i) * fx
    bot = at(y1i, x0i) * (1 - fx) + at(y1i, x1i) * fx
    return top * (1 - fy) + bot * fy


def load_image(path: str):
    """Load an image file as (H, W, 3) float32 in [0,1] (PNG/EXR/NPY — the
    subset of stb the assets here need)."""
    import numpy as np
    lower = path.lower()
    if lower.endswith(".png"):
        from .png import read_png
        img = read_png(path)  # uint8
        img = np.asarray(img, np.float32) / 255.0
        if img.ndim == 2:
            img = img[..., None]
        if img.shape[-1] == 1:
            img = np.repeat(img, 3, axis=-1)
        return img[..., :3]
    if lower.endswith(".exr"):
        from .exr import read_exr_rgba
        return np.asarray(read_exr_rgba(path), np.float32)[..., :3]
    if lower.endswith(".npy"):
        import numpy as np
        return np.asarray(np.load(path), np.float32)[..., :3]
    raise ValueError(f"unsupported texture format: {path}")
