"""Pallas whole-sweep kernel: interpret-mode equivalence with the XLA path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.experimental.pallas import tpu as pltpu

from c2ray_tpu.config import test_problem_config as make_config
from c2ray_tpu.ops.sweep import SweepScalars, compute_columns_facemajor
from c2ray_tpu.ops.sweep_pallas import compute_columns_pallas


@pytest.mark.parametrize("n", [16, 24])
def test_pallas_columns_match_xla(n):
    cfg = make_config(mesh=n, dtype="float32", use_lls=True, type_of_lls=1,
                      cosmological=False)
    dr = 2.9e24
    sc = SweepScalars(jnp.float32(dr), jnp.float32(cfg.sed.s_star / dr**3),
                      jnp.float32(5e16), jnp.float32(0))
    rng = np.random.default_rng(n)
    ndhi_b = jnp.asarray(
        (rng.uniform(0.2, 1.0, (2, n, n, n)) * 2e-4).astype(np.float32))
    ref = jax.vmap(
        lambda x: compute_columns_facemajor(cfg, x, sc, None, n // 2))(ndhi_b)
    with pltpu.force_tpu_interpret_mode():
        out = compute_columns_pallas(cfg, ndhi_b, sc, n // 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def _march_case(n, max_shell, monkeypatch=None, ladder=None, seed=48):
    cfg = make_config(mesh=n, dtype="float32", use_lls=False,
                      cosmological=False)
    dr = 2.9e24
    sc = SweepScalars(jnp.float32(dr), jnp.float32(cfg.sed.s_star / dr**3),
                      jnp.float32(0), jnp.float32(0))
    rng = np.random.default_rng(seed)
    ndhi_b = jnp.asarray(
        (rng.uniform(0.2, 1.0, (2, n, n, n)) * 2e-4).astype(np.float32))
    ref = jax.vmap(lambda x: compute_columns_facemajor(
        cfg, x, sc, None, max_shell))(ndhi_b)
    if ladder is not None:
        from c2ray_tpu.ops import sweep_pallas
        monkeypatch.setattr(sweep_pallas, "_march_ladder",
                            lambda ms, nn: ladder)
    with pltpu.force_tpu_interpret_mode():
        out = compute_columns_pallas(cfg, ndhi_b, sc, max_shell)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_pallas_patch_march_matches_xla():
    """A radius-capped sweep marches on a (2r+1)^2 patch (p=33 < n=48)
    and must be bitwise-equal to the full-plane XLA march."""
    _march_case(48, 13)


def test_pallas_even_radius_patch_matches_xla():
    """A second (even-radius) capped sweep pins the clamped edge-plane
    index maps that replaced the old staging's edge padding."""
    _march_case(48, 12, seed=13)


def test_pallas_multi_bucket_ladder_matches_xla(monkeypatch):
    """The multi-bucket ladder machinery (patch growth + seed carry
    between pallas_calls) stays bitwise-equal to the single-bucket
    march."""
    _march_case(48, 24, monkeypatch,
                ladder=[(1, 8, 17), (9, 16, 33), (17, 24, 48)])


def test_pallas_grid_lls_columns_match_xla():
    """Type-2 LLS grid streamed into the kernel as a second VMEM input."""
    n = 16
    cfg = make_config(mesh=n, dtype="float32", use_lls=True, type_of_lls=2,
                      cosmological=False)
    dr = 2.9e24
    sc = SweepScalars(jnp.float32(dr), jnp.float32(cfg.sed.s_star / dr**3),
                      jnp.float32(0), jnp.float32(0))
    rng = np.random.default_rng(7)
    ndhi_b = jnp.asarray(
        (rng.uniform(0.2, 1.0, (2, n, n, n)) * 2e-4).astype(np.float32))
    lls_b = jnp.asarray(
        (rng.uniform(0.0, 1.0, (2, n, n, n)) * 3e16).astype(np.float32))
    ref = jax.vmap(
        lambda x, l: compute_columns_facemajor(cfg, x, sc, l, n // 2))(
        ndhi_b, lls_b)
    with pltpu.force_tpu_interpret_mode():
        out = compute_columns_pallas(cfg, ndhi_b, sc, n // 2, lls_cb=lls_b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_pallas_partial_radius():
    n = 16
    cfg = make_config(mesh=n, dtype="float32", use_lls=False,
                      cosmological=False)
    dr = 2.9e24
    sc = SweepScalars(jnp.float32(dr), jnp.float32(cfg.sed.s_star / dr**3),
                      jnp.float32(0), jnp.float32(0))
    ndhi_b = jnp.full((1, n, n, n), np.float32(2e-4))
    ref = jax.vmap(
        lambda x: compute_columns_facemajor(cfg, x, sc, None, 3))(ndhi_b)
    with pltpu.force_tpu_interpret_mode():
        out = compute_columns_pallas(cfg, ndhi_b, sc, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_grid_frame_march_matches_centered():
    """compute_columns_pallas_grid (shared grid-frame views + in-kernel
    recentering rotates, round 5) == compute_columns_pallas on centered
    cubes, for arbitrary source positions including boundary wrap."""
    from c2ray_tpu.ops.sweep import roll3
    from c2ray_tpu.ops.sweep_pallas import compute_columns_pallas_grid

    n = 16
    c = n // 2
    cfg = make_config(mesh=n, dtype="float32", use_lls=False,
                      cosmological=False)
    dr = 2.9e24
    sc = SweepScalars(jnp.float32(dr), jnp.float32(cfg.sed.s_star / dr**3),
                      jnp.float32(0), jnp.float32(0))
    rng = np.random.default_rng(5)
    ndhi = jnp.asarray((rng.uniform(0.2, 1.0, (n, n, n)) * 2e-4)
                       .astype(np.float32))
    pos = jnp.asarray([[3, 11, 7], [0, 0, 15], [8, 8, 8], [15, 1, 0]],
                      jnp.int32)
    cubes = jax.vmap(lambda p: roll3(ndhi, c - p))(pos)
    with pltpu.force_tpu_interpret_mode():
        ref = compute_columns_pallas(cfg, cubes, sc, c)
        got = compute_columns_pallas_grid(cfg, ndhi, pos, sc, c)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_grid_frame_march_with_lls_grid():
    """Grid-frame march with a type-2 LLS cube: the LLS face planes ride
    the same shared views + recentering."""
    from c2ray_tpu.ops.sweep import roll3
    from c2ray_tpu.ops.sweep_pallas import compute_columns_pallas_grid

    n = 16
    c = n // 2
    cfg = make_config(mesh=n, dtype="float32", use_lls=True, type_of_lls=2,
                      cosmological=False)
    dr = 2.9e24
    sc = SweepScalars(jnp.float32(dr), jnp.float32(cfg.sed.s_star / dr**3),
                      jnp.float32(0), jnp.float32(0))
    rng = np.random.default_rng(6)
    ndhi = jnp.asarray((rng.uniform(0.2, 1.0, (n, n, n)) * 2e-4)
                       .astype(np.float32))
    lls = jnp.asarray((rng.uniform(0.0, 1.0, (n, n, n)) * 1e16)
                      .astype(np.float32))
    pos = jnp.asarray([[2, 13, 5], [9, 0, 1]], jnp.int32)
    cubes = jax.vmap(lambda p: roll3(ndhi, c - p))(pos)
    lls_c = jax.vmap(lambda p: roll3(lls, c - p))(pos)
    with pltpu.force_tpu_interpret_mode():
        ref = compute_columns_pallas(cfg, cubes, sc, c, lls_cb=lls_c)
        got = compute_columns_pallas_grid(cfg, ndhi, pos, sc, c, lls=lls)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
