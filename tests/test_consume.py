"""Interpret-mode parity tests of the round-4 fused Pallas kernels:
the rate-deposition consume kernel and the window DMA gather/scatter.
The hardware forms are gated by scripts/validate_tpu.py; these pin the
kernel MATH against the XLA reference paths on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from c2ray_tpu.config import test_problem_config as make_config
from c2ray_tpu.ops.sweep import (SweepScalars, _rate_pass, neutral_density,
                                 roll3)
from c2ray_tpu.ops.tables import build_rad_tables


def _setup(n, b, use_lls=True):
    cfg = make_config(mesh=n, dtype="float32", use_lls=use_lls,
                              type_of_lls=1, cosmological=False,
                              sweep_backend="pallas", source_batch=b)
    tables = build_rad_tables(cfg)
    rng = np.random.default_rng(5)
    srcpos = jnp.asarray(rng.integers(0, n, (b, 3)), jnp.int32)
    nflux = jnp.asarray(10.0 ** rng.uniform(4, 6, b), jnp.float32)
    ndens = jnp.asarray(rng.uniform(1e-4, 3e-4, (n,) * 3).astype(np.float32))
    xh = jnp.asarray(rng.uniform(0.1, 0.9, (n,) * 3).astype(np.float32))
    dr = 2.9e24 / (n / 64)
    sc = SweepScalars(dr=jnp.float32(dr),
                      rate_scale=jnp.float32(cfg.sed.s_star / dr**3),
                      lls_coldens=jnp.float32(1e16 if use_lls else 0.0),
                      rmax2_cells=jnp.float32(0.0))
    return cfg, tables, srcpos, nflux, ndens, xh, sc


def test_consume_kernel_matches_rate_pass_interpret():
    """consume kernel == [vmap(_rate_pass) -> roll3 -> sum] on synthetic
    column cubes (interpret mode; the grid-frame accumulation, loss and
    LLS tallies all line up)."""
    from c2ray_tpu.ops.sweep_pallas import consume_rates_pallas

    n, b = 32, 3
    cfg, tables, srcpos, nflux, ndens, xh, sc = _setup(n, b)
    c = n // 2
    rng = np.random.default_rng(9)
    ndhi = neutral_density(cfg, ndens, xh)
    # synthetic monotone column cubes (what a march would produce)
    cdo_b = jnp.asarray(np.cumsum(
        rng.uniform(1e15, 2e16, (b, n, n, n)), axis=3).astype(np.float32))

    res = jax.vmap(lambda cd, p, f: _rate_pass(
        cfg, tables, cd, roll3(ndhi, c - p), f, sc, sc.lls_coldens,
        c))(cdo_b, srcpos, nflux)
    ph_ref = jnp.sum(jax.vmap(lambda g, p: roll3(g, p - c))(
        res.phih, srcpos), axis=0)

    ph, _, loss_b, lls_b = consume_rates_pallas(
        cfg, tables, cdo_b, ndhi, None, srcpos, nflux, None, sc, c,
        interpret=True)
    np.testing.assert_allclose(np.asarray(ph), np.asarray(ph_ref),
                               rtol=2e-5, atol=0)
    np.testing.assert_allclose(np.asarray(loss_b),
                               np.asarray(res.photon_loss), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(lls_b),
                               np.asarray(res.lls_loss), rtol=2e-5)


def test_consume_kernel_heat_interpret():
    """Non-isothermal consume kernel: the heating deposition matches the
    XLA rate pass (interpret mode)."""
    from c2ray_tpu.ops.sweep_pallas import consume_rates_pallas

    n, b = 32, 2
    cfg = make_config(mesh=n, dtype="float32", use_lls=True,
                      type_of_lls=1, cosmological=False, isothermal=False,
                      sweep_backend="pallas", source_batch=b)
    tables = build_rad_tables(cfg)
    rng = np.random.default_rng(11)
    srcpos = jnp.asarray(rng.integers(0, n, (b, 3)), jnp.int32)
    nflux = jnp.asarray(10.0 ** rng.uniform(4, 6, b), jnp.float32)
    ndens = jnp.asarray(rng.uniform(1e-4, 3e-4, (n,) * 3).astype(np.float32))
    xh = jnp.asarray(rng.uniform(0.1, 0.9, (n,) * 3).astype(np.float32))
    dr = 2.9e24 / (n / 64)
    sc = SweepScalars(dr=jnp.float32(dr),
                      rate_scale=jnp.float32(cfg.sed.s_star / dr**3),
                      lls_coldens=jnp.float32(1e16),
                      rmax2_cells=jnp.float32(0.0))
    c = n // 2
    ndhi = neutral_density(cfg, ndens, xh)
    cdo_b = jnp.asarray(np.cumsum(
        rng.uniform(1e15, 2e16, (b, n, n, n)), axis=3).astype(np.float32))

    res = jax.vmap(lambda cd, p, f: _rate_pass(
        cfg, tables, cd, roll3(ndhi, c - p), f, sc, sc.lls_coldens,
        c))(cdo_b, srcpos, nflux)
    heat_ref = jnp.sum(jax.vmap(lambda g, p: roll3(g, p - c))(
        res.phiheat, srcpos), axis=0)

    _, heat, _, _ = consume_rates_pallas(
        cfg, tables, cdo_b, ndhi, None, srcpos, nflux, None, sc, c,
        interpret=True)
    np.testing.assert_allclose(np.asarray(heat), np.asarray(heat_ref),
                               rtol=2e-5, atol=0)


@pytest.mark.parametrize("n,r", [
    (24, 4),   # n%8==0, r%4==0: covering blocks align with n+2r exactly
    (32, 6),   # r%4!=0: sublane block overruns without the axis-1 margin
    (30, 4),   # n%8!=0: aligned block start overruns without the margin
])
def test_window_dma_kernels_interpret(n, r):
    """window_gather == vmapped dynamic_slice; window_scatter_add +
    fold_padded_acc == the mod-N scatter-add (interpret mode).  The
    misaligned (n, r) cases pin the round-4 advisor finding: covering
    blocks must stay inside the sublane margin for any mesh/radius."""
    from jax import lax

    from c2ray_tpu.ops import window_pallas as wp

    b = 7
    p = 2 * r + 1
    rng = np.random.default_rng(3)
    field = rng.normal(size=(n, n, n)).astype(np.float32)
    fpad = jnp.asarray(np.pad(field, r, mode="wrap"))
    pos = jnp.asarray(rng.integers(0, n, (b, 3)), jnp.int32)
    rates = jnp.asarray(rng.normal(size=(b, p, p, p)).astype(np.float32))

    wins = wp.window_gather(wp.with_lane_margin(fpad, n, r), pos, r,
                            interpret=True)
    ref_wins = jax.vmap(lambda q: lax.dynamic_slice(
        fpad, (q[0], q[1], q[2]), (p, p, p)))(pos)
    np.testing.assert_array_equal(np.asarray(wins), np.asarray(ref_wins))

    acc = wp.window_scatter_add(
        jnp.zeros(wp.padded_acc_shape(n, r), jnp.float32),
        rates, pos, interpret=True)
    got = wp.fold_padded_acc(acc, n, r)

    ar = jnp.arange(p, dtype=jnp.int32)
    ix = (pos[:, 0, None] - r + ar[None, :]) % n
    iy = (pos[:, 1, None] - r + ar[None, :]) % n
    iz = (pos[:, 2, None] - r + ar[None, :]) % n
    idx = (ix[:, :, None, None], iy[:, None, :, None], iz[:, None, None, :])
    ref = jnp.zeros((n, n, n), jnp.float32).at[idx].add(rates)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
