#!/usr/bin/env python
"""Microbench the photon-grid build primitives at config6 scale (7M
photons, 14M-bucket table) to cost out the brick-aligned query layout
(docs/ROADMAP.md round-5 item 1):

  a) current build_grid total
  b) a 7M-row [P,8] scatter (the repack's .at[d].set cost)
  c) a 7M-key argsort (the repack's second sort, if gather-based)
  d) a 14M-element cumsum x4 + selects (the qstart tier tables)

Usage: python tools/grid_probe.py [--p 7040000]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))

import jax
import jax.numpy as jnp

from cudapathtracer_tpu.ops import hashgrid


def timeit(name, fn, *args):
    out = fn(*args)
    _ = float(jax.tree.leaves(out)[0].sum())
    best = 1e9
    for _i in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jax.tree.leaves(out)[0].sum())
        best = min(best, time.perf_counter() - t0)
    print(f"{name:>28}: {best*1e3:9.1f} ms", flush=True)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--p", type=int, default=7_040_000)
    args = ap.parse_args()
    p = args.p
    key = jax.random.PRNGKey(0)
    rows = jax.random.uniform(key, (p, 8), jnp.float32)
    valid = jax.random.uniform(key, (p,)) < 0.4
    table = hashgrid.photon_table_size(p)
    print(f"p={p/1e6:.1f}M rows, table={table/1e6:.1f}M", flush=True)

    bg = jax.jit(lambda r, v: hashgrid.build_grid(
        r, v, jnp.zeros((3,)), 0.01, table))
    timeit("build_grid (current)", bg, rows, valid)

    d = jax.random.permutation(key, p)
    qs = int(1.6 * p) + 32

    def scat(r, dd):
        return jnp.zeros((qs, 8), jnp.float32).at[dd].set(r)
    timeit("[P,8] scatter to 1.6P", jax.jit(scat), rows, d)

    keys32 = jax.random.randint(key, (p,), 0, 1 << 30, jnp.int32)
    timeit("argsort 7M keys", jax.jit(jnp.argsort), keys32)

    cnt = jax.random.randint(key, (table + 1,), 0, 12, jnp.int32)

    def qstart_tables(count):
        run = jnp.minimum(count, 8)
        ta, tb = run == 1, run == 2
        tc, td = (run == 3) | (run == 4), run >= 5
        ex = lambda m: jnp.cumsum(m.astype(jnp.int32)) - m
        na = jnp.sum(ta.astype(jnp.int32))
        nb = jnp.sum(tb.astype(jnp.int32))
        nc = jnp.sum(tc.astype(jnp.int32))
        r8 = lambda x: (x + 7) & ~7
        base_b = r8(na)
        base_c = base_b + r8(2 * nb)
        base_d = base_c + r8(4 * nc)
        return jnp.where(
            ta, ex(ta),
            jnp.where(tb, base_b + 2 * ex(tb),
                      jnp.where(tc, base_c + 4 * ex(tc),
                                base_d + 8 * ex(td))))
    timeit("qstart tier tables (14M)", jax.jit(qstart_tables), cnt)

    timeit("gather 11M rows [QS,8]", jax.jit(
        lambda r, dd: r[jnp.concatenate([dd, dd[:qs - p]])]), rows, d)


if __name__ == "__main__":
    main()
