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


# --- layout-independent per-lane streams -----------------------------------
# The positional streams above key every draw by array LANE, which ties a
# pixel's sample sequence to the wavefront layout: chunk size, straggler
# compaction, and shard topology all change the image. The *_id variants key
# each lane by a STABLE id (pixel / path id) instead, making renders
# bit-identical under any partitioning — the property the reference cannot
# have with per-thread curand state (deviceCode.cu:53-61).

def pixel_ids(px, py) -> jax.Array:
    """Stable sampling ids from pixel coordinates (width-independent)."""
    return (py.astype(jnp.int32) << 14) + px.astype(jnp.int32)


def lane_keys(key: jax.Array, draw_id: int, ids: jax.Array) -> jax.Array:
    """Per-lane keys: fold (draw_id, lane id) into the bounce key."""
    k = jax.random.fold_in(key, draw_id)
    return jax.vmap(lambda i: jax.random.fold_in(k, i))(ids)


def uniform_id(key: jax.Array, draw_id: int, ids: jax.Array,
               dtype=jnp.float32) -> jax.Array:
    """One labelled uniform in [0,1) per lane, keyed by stable ids."""
    ks = lane_keys(key, draw_id, ids)
    return jax.vmap(lambda kk: jax.random.uniform(kk, (), dtype=dtype))(ks)


def uniform2_id(key: jax.Array, draw_id: int, ids: jax.Array):
    """Two independent uniforms per lane, keyed by stable ids."""
    ks = lane_keys(key, draw_id, ids)
    u = jax.vmap(lambda kk: jax.random.uniform(kk, (2,)))(ks)
    return u[..., 0], u[..., 1]


def uniform_any(key: jax.Array, draw_id: int, n: int, ids=None,
                dtype=jnp.float32) -> jax.Array:
    """uniform_id when stable ids are provided, positional uniform
    otherwise (legacy callers)."""
    if ids is None:
        return uniform(key, draw_id, (n,), dtype=dtype)
    return uniform_id(key, draw_id, ids, dtype=dtype)
