"""Recursive MIS bookkeeping (d_vcm / d_vc / d_vm) shared by BDPT and VCM.

The reference repeats this three-case recursion in four places
(deviceCode.cu:876-917 eye, 1211-1267 light, 2111-2181 VCM light,
2802-2858 VCM eye); here it lives once, vectorized over the wavefront.

Quantities (VCM-style accumulators as used by the reference):
  pdf_fwd_area — area-measure pdf of generating THIS vertex from the previous
  g            — prev_cosine / distance^2 (conversion to area at the PREVIOUS)
  pdf_rev_prev — solid-angle pdf of scattering from this vertex back toward
                 the previous one (computed right after BSDF sampling)

Cases: first bounce (seed values differ between eye/light/VCM variants),
previous-was-delta (d_vcm = 0, only the pdf_rev * d_vc chain survives),
general. The optional d_vm chain and eta_vcm term are the VCM extension; for
pure BDPT they stay zero.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class MisState(NamedTuple):
    """Per-lane [N] carry of the recursion."""
    d_vcm: jax.Array
    d_vc: jax.Array
    d_vm: jax.Array           # used by VCM only; zeros for pure BDPT
    pdf_rev_prev: jax.Array   # reverse solid-angle pdf at the previous vertex
    prev_was_delta: jax.Array

    @staticmethod
    def zeros(n: int) -> "MisState":
        z = jnp.zeros((n,), jnp.float32)
        return MisState(z, z, z, z, jnp.zeros((n,), bool))


def advance(state: MisState, depth_is_first, pdf_fwd_area, g, pdf_rev_sa,
            cur_is_delta, first_d_vcm, first_d_vc, first_d_vm=None,
            eta_vcm=None):
    """One step of the recursion; returns (d_vcm, d_vc, d_vm, new_state).

    depth_is_first: [N] bool or scalar — lanes at their first post-endpoint
    bounce take the seeded (first_*) values.
    eta_vcm: the VCM merge<->connect exchange ratio (n_photons * pi * r^2);
    None disables the d_vm chain and the eta term in d_vc (pure BDPT).
    """
    inv_fwd = 1.0 / jnp.maximum(pdf_fwd_area, 1e-20)
    gof = g * inv_fwd

    eta = 0.0 if eta_vcm is None else eta_vcm

    # general case (deviceCode.cu:905-917; VCM variant 2163-2181 adds the
    # eta_vcm term inside d_vc and the d_vm chain)
    gen_vcm = inv_fwd
    gen_vc = gof * (eta + state.d_vcm + state.pdf_rev_prev * state.d_vc)
    gen_vm = gof * (1.0 + state.d_vcm / jnp.maximum(eta, 1e-30)
                    + state.pdf_rev_prev * state.d_vm) if eta_vcm is not None \
        else jnp.zeros_like(gen_vcm)

    # previous-was-delta (deviceCode.cu:893-903)
    del_vc = gof * (state.pdf_rev_prev * state.d_vc)
    del_vm = gof * (state.pdf_rev_prev * state.d_vm)

    d_vcm = jnp.where(state.prev_was_delta, 0.0, gen_vcm)
    d_vc = jnp.where(state.prev_was_delta, del_vc, gen_vc)
    d_vm = jnp.where(state.prev_was_delta, del_vm, gen_vm)

    d_vcm = jnp.where(depth_is_first, first_d_vcm, d_vcm)
    d_vc = jnp.where(depth_is_first, first_d_vc, d_vc)
    if first_d_vm is None:
        first_d_vm = jnp.zeros_like(d_vm)
    d_vm = jnp.where(depth_is_first, first_d_vm, d_vm)

    new_state = MisState(d_vcm=d_vcm, d_vc=d_vc, d_vm=d_vm,
                         pdf_rev_prev=pdf_rev_sa,
                         prev_was_delta=cur_is_delta)
    return d_vcm, d_vc, d_vm, new_state
