"""Experiment: faster window gather/scatter for the 10k-source path.

The windowed sweep's per-batch cost at 256^3/r=8/b=256 is dominated by
the index engine: window gather 15.1 ms + scatter-add 22.0 ms of a
59 ms batch (BENCH_HISTORY round-2 study).  Candidates measured here:

  A. status quo: pointwise 3D mod-N scatter-add (.at[ix,iy,iz].add)
  B. padded accumulator + one lax.scatter_add of whole (p,p,p) blocks
     (update_window_dims=(1,2,3)) — pad-fold cost is amortized per PASS,
     not per batch
  C. padded accumulator + row scatter (contiguous length-p windows)
  D. gather: vmap(dynamic_slice) vs one lax.gather of (p,p,p) blocks
"""

import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def timeit(fn, *a, label="", reps=10):
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*a)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps * 1e3
    print(f"  {label:44s} {dt:8.2f} ms")
    return out


def main(n=256, r=8, b=256):
    p = 2 * r + 1
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.integers(0, n, (b, 3)), jnp.int32)
    upd = jnp.asarray(rng.uniform(size=(b, p, p, p)).astype(np.float32))
    acc = jnp.zeros((n, n, n), jnp.float32)
    acc_pad = jnp.zeros((n + 2 * r, n + 2 * r, n + 2 * r), jnp.float32)
    cube_pad = jnp.asarray(
        rng.uniform(size=(n + 2 * r,) * 3).astype(np.float32))
    ar = jnp.arange(p, dtype=jnp.int32)

    @jax.jit
    def scatter_pointwise(acc, pos, upd):
        ix = (pos[:, 0, None] - r + ar[None, :]) % n
        iy = (pos[:, 1, None] - r + ar[None, :]) % n
        iz = (pos[:, 2, None] - r + ar[None, :]) % n
        idx = (ix[:, :, None, None], iy[:, None, :, None],
               iz[:, None, None, :])
        return acc.at[idx].add(upd, mode="promise_in_bounds")

    @jax.jit
    def scatter_blocks(acc_pad, pos, upd):
        # window corner in padded coords = pos (source at pos + r)
        dn = lax.ScatterDimensionNumbers(
            update_window_dims=(1, 2, 3),
            inserted_window_dims=(),
            scatter_dims_to_operand_dims=(0, 1, 2))
        return lax.scatter_add(acc_pad, pos, upd, dn,
                               indices_are_sorted=False,
                               unique_indices=False,
                               mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)

    @jax.jit
    def scatter_rows(acc_pad, pos, upd):
        # contiguous z-rows: indices (b,p,p,3), updates (b,p,p,p),
        # window dim = last axis (length-p contiguous run)
        ix = pos[:, 0, None, None] + ar[None, :, None]
        iy = pos[:, 1, None, None] + ar[None, None, :]
        iz = jnp.broadcast_to(pos[:, 2, None, None], ix.shape)
        idx = jnp.stack([jnp.broadcast_to(ix, (b, p, p)),
                         jnp.broadcast_to(iy, (b, p, p)), iz], -1)
        dn = lax.ScatterDimensionNumbers(
            update_window_dims=(3,),
            inserted_window_dims=(0, 1),
            scatter_dims_to_operand_dims=(0, 1, 2))
        return lax.scatter_add(acc_pad, idx, upd, dn,
                               indices_are_sorted=False,
                               unique_indices=False,
                               mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)

    @jax.jit
    def fold_pads(acc_pad):
        # wrap the 2r-deep pads back into the core (one op per axis pair)
        a = acc_pad
        core = a[r:-r]
        core = core.at[:r].add(a[-r:]).at[-r:].add(a[:r])
        a = core
        core = a[:, r:-r]
        core = core.at[:, :r].add(a[:, -r:]).at[:, -r:].add(a[:, :r])
        a = core
        core = a[:, :, r:-r]
        core = core.at[:, :, :r].add(a[:, :, -r:]).at[:, :, -r:].add(
            a[:, :, :r])
        return core

    @jax.jit
    def gather_vmap(cube_pad, pos):
        return jax.vmap(lambda q: lax.dynamic_slice(
            cube_pad, (q[0], q[1], q[2]), (p, p, p)))(pos)

    @jax.jit
    def gather_blocks(cube_pad, pos):
        dn = lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(),
            start_index_map=(0, 1, 2))
        return lax.gather(cube_pad, pos, dn, slice_sizes=(p, p, p),
                          mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)

    print(f"n={n} r={r} batch={b} platform={jax.devices()[0].platform}")
    a0 = timeit(scatter_pointwise, acc, pos, upd,
                label="A scatter pointwise mod-N (status quo)")
    a1 = timeit(scatter_blocks, acc_pad, pos, upd,
                label="B scatter whole blocks into padded acc")
    a2 = timeit(scatter_rows, acc_pad, pos, upd,
                label="C scatter contiguous rows into padded acc")
    timeit(fold_pads, a1, label="   fold_pads (once per sweep pass)")
    g0 = timeit(gather_vmap, cube_pad, pos,
                label="D1 gather vmap(dynamic_slice) (status quo)")
    g1 = timeit(gather_blocks, cube_pad, pos,
                label="D2 gather whole blocks (lax.gather)")

    # correctness cross-checks
    ref = np.asarray(a0)
    for name, ap in (("blocks", a1), ("rows", a2)):
        got = np.asarray(fold_pads(ap))
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6,
                                   err_msg=name)
    np.testing.assert_array_equal(np.asarray(g0), np.asarray(g1))
    print("correctness OK (B/C fold to A; D2 == D1)")


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", type=int, default=256)
    ap.add_argument("--radius", type=int, default=8)
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()
    main(args.mesh, args.radius, args.batch)
