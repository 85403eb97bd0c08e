"""Counter-based Threefry RNG streams.

TPU-native replacement for the reference's per-pixel curand XORWOW state that
is round-tripped through global memory every sample (deviceCode.cu:53-61, 215).
Here a render is bit-reproducible by construction: every random draw is keyed
by (seed, stream, sample, bounce, draw_id) and the array *lane* provides the
per-pixel decorrelation (Threefry is counter-based, so one key -> one
deterministic stream indexed by output position).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

DEFAULT_SEED = 103033  # the reference's fixed seed (deviceCode.cu:57)


def base_key(seed: int = DEFAULT_SEED, stream: int = 0) -> jax.Array:
    """Root key for a render. `stream` separates logical streams, e.g. the
    BDPT light pass vs eye pass, or per-chip streams in a sharded render."""
    return jax.random.fold_in(jax.random.PRNGKey(seed), stream)


def sample_key(key: jax.Array, sample_idx) -> jax.Array:
    """Derive the key for one progressive sample (spp index)."""
    return jax.random.fold_in(key, sample_idx)


def bounce_key(skey: jax.Array, bounce) -> jax.Array:
    """Derive the key for one bounce within a sample."""
    return jax.random.fold_in(skey, bounce)


def uniform(key: jax.Array, draw_id: int, shape, dtype=jnp.float32) -> jax.Array:
    """One labelled uniform draw in [0,1). draw_id distinguishes the several
    independent uniforms consumed within a single bounce (pick-light, light-uv,
    bsdf-lobe, bsdf-uv, russian-roulette, ...)."""
    return jax.random.uniform(jax.random.fold_in(key, draw_id), shape, dtype=dtype)


def uniform2(key: jax.Array, draw_id: int, shape) -> tuple[jax.Array, jax.Array]:
    """Two independent uniforms (the (u1,u2) pattern for 2D warps)."""
    u = jax.random.uniform(jax.random.fold_in(key, draw_id), shape + (2,))
    return u[..., 0], u[..., 1]
