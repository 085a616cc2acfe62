"""Microbenchmark: alternatives for the backward cotangent reduction
(L,10) -> (P,10) — the dominant fwd+bwd cost (PARITY.md: ~26 ms at
L=1.6M via XLA's row-serial scatter-add, ops/rasterize_pallas.py
_gather_records_bwd).

Candidates (all produce the identical per-Gaussian sums):
  add     : dfeat at[gid].add — the current path.
  set+seg : carry the expansion-entry id e through the tile sort; the
            inverse permutation is then a unique-indices at[e].set
            followed by a cumsum + segment-boundary diff (expansion order
            is per-Gaussian contiguous).
  sortseg : re-sort dfeat rows by gid (10 f32 payload lanes) + cumsum/diff.
  argsort : argsort(e) (keys-only int sort) + row gather + cumsum/diff.
  sortseg2: sortseg with the f32 precision gate fixed — block-local
            cumsum (magnitude bounded by one block's sum) + a TwoSum-
            compensated lax.scan over the ~L/B block totals; segment sum
            = local-prefix diff + compensated carry diff. Reports max
            segment error vs a float64 host reference.

Run on hardware: python scripts/bench_scatter.py [L] [P]

Decision rule (why these aren't wired into the product yet): the cumsum
variants subtract large prefixes, so at L~1.3M their f32 segment sums
lose ~sqrt(L)·eps of the RUNNING TOTAL's magnitude — potentially >>1e-5
relative to a single Gaussian's gradient. If a cumsum variant wins the
timing here, wiring it requires a two-level reduction (exact f32 block
sums + wider-precision block carries) before it can replace the
scatter-add at training precision. The re-sort variant (sortseg) has the
same issue only in its cumsum stage, not the sort.
"""
from __future__ import annotations

import sys
import time

import numpy as np


def timeit(fn, args, iters=5):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / iters)
    return float(np.median(ts)) * 1e3


def main():
    import jax
    import jax.numpy as jnp

    L = int(sys.argv[1]) if len(sys.argv) > 1 else 1_280_000
    P = int(sys.argv[2]) if len(sys.argv) > 2 else 131_072
    W = 10
    rng = np.random.default_rng(0)

    # synthetic but structurally faithful: counts per gaussian ~ tile_count
    counts = rng.integers(1, 2 * L // P, P).astype(np.int64)
    counts = (counts * (L / counts.sum())).astype(np.int64)
    counts[0] += L - counts.sum()
    gid_exp = np.repeat(np.arange(P, dtype=np.int32), counts)   # expansion
    perm = rng.permutation(L).astype(np.int32)                  # sort order
    gid = gid_exp[perm]               # gid per sorted row
    e = perm                          # expansion id per sorted row... wait
    # row i (sorted) came from expansion entry perm[i]; scattering row i to
    # position perm[i] restores expansion order.
    dfeat = jnp.asarray(rng.normal(0, 1, (L, W)), jnp.float32)
    gid_j = jnp.asarray(gid)
    e_j = jnp.asarray(e)
    offs = jnp.asarray(np.concatenate([[0], np.cumsum(counts)]).astype(np.int32))

    @jax.jit
    def f_add(d, g):
        return jnp.zeros((P, W), jnp.float32).at[g].add(d)

    @jax.jit
    def f_set_seg(d, ee):
        d_exp = jnp.zeros((L, W), jnp.float32).at[ee].set(
            d, unique_indices=True)
        c = jnp.cumsum(d_exp, axis=0)
        c = jnp.concatenate([jnp.zeros((1, W), jnp.float32), c], axis=0)
        return c[offs[1:]] - c[offs[:-1]]

    @jax.jit
    def f_sortseg(d, g):
        op = jax.lax.sort((g,) + tuple(d[:, i] for i in range(W)),
                          num_keys=1, is_stable=False)
        ds = jnp.stack(op[1:], axis=1)
        c = jnp.cumsum(ds, axis=0)
        c = jnp.concatenate([jnp.zeros((1, W), jnp.float32), c], axis=0)
        return c[offs[1:]] - c[offs[:-1]]

    @jax.jit
    def f_argsort(d, ee):
        inv = jax.lax.sort((ee, jnp.arange(L, dtype=jnp.int32)),
                           num_keys=1)[1]
        d_exp = d[inv]
        c = jnp.cumsum(d_exp, axis=0)
        c = jnp.concatenate([jnp.zeros((1, W), jnp.float32), c], axis=0)
        return c[offs[1:]] - c[offs[:-1]]

    BLK = 512
    nb = (L + BLK - 1) // BLK
    Lp = nb * BLK

    @jax.jit
    def f_sortseg2(d, g):
        op = jax.lax.sort((g,) + tuple(d[:, i] for i in range(W)),
                          num_keys=1, is_stable=False)
        ds = jnp.stack(op[1:], axis=1)
        ds = jnp.concatenate(
            [ds, jnp.zeros((Lp - L, W), jnp.float32)], axis=0)
        loc = jnp.cumsum(ds.reshape(nb, BLK, W), axis=1)
        btot = loc[:, -1, :]

        def pair_add(a, b):   # compensated (hi, lo) pair addition (TwoSum)
            ah, al = a
            bh, bl = b
            s = ah + bh
            bp = s - ah
            err = (ah - (s - bp)) + (bh - bp)
            return s, err + al + bl

        hi_i, lo_i = jax.lax.associative_scan(
            pair_add, (btot, jnp.zeros_like(btot)), axis=0)   # inclusive
        z = jnp.zeros((1, W), jnp.float32)
        hi = jnp.concatenate([z, hi_i], axis=0)               # exclusive
        lo = jnp.concatenate([z, lo_i], axis=0)
        loc_flat = loc.reshape(Lp, W)

        def epref(r):     # exclusive prefix split into (local, block idx)
            b = r // BLK
            lp = jnp.where((r % BLK > 0)[:, None],
                           loc_flat[jnp.maximum(r - 1, 0)], 0.0)
            return lp, b

        lp_e, b_e = epref(offs[1:])
        lp_s, b_s = epref(offs[:-1])
        return (lp_e - lp_s) + (hi[b_e] - hi[b_s]) + (lo[b_e] - lo[b_s])

    from gslm_tpu.ops.rasterize_pallas import _segment_reduce_sorted

    @jax.jit
    def f_segscan(d, g):
        # the PRODUCT sortseg path (r4): segmented associative scan, exact
        # to ~eps*|segment content| — no prefix subtraction
        return _segment_reduce_sorted(d, g, offs)

    ref = np.asarray(f_add(dfeat, gid_j))
    # float64 exact segment sums for the precision gate
    d64 = np.asarray(dfeat, np.float64)
    ord64 = np.argsort(gid, kind="stable")
    c64 = np.zeros((L + 1, W))
    np.cumsum(d64[ord64], axis=0, out=c64[1:])
    offs_np = np.asarray(offs)
    ref64 = c64[offs_np[1:]] - c64[offs_np[:-1]]
    scale = np.maximum(np.abs(ref64), 1e-3)
    for name, fn, a in (("add", f_add, (dfeat, gid_j)),
                        ("set+seg", f_set_seg, (dfeat, e_j)),
                        ("sortseg", f_sortseg, (dfeat, gid_j)),
                        ("argsort", f_argsort, (dfeat, e_j)),
                        ("sortseg2", f_sortseg2, (dfeat, gid_j)),
                        ("segscan", f_segscan, (dfeat, gid_j))):
        got = np.asarray(fn(*a))
        ok = np.allclose(got, ref, atol=1e-3)
        relerr = float(np.max(np.abs(got - ref64) / scale))
        print(f"{name:8s} {timeit(fn, a):8.3f} ms  match={ok}"
              f"  max_rel_err_vs_f64={relerr:.3e}", flush=True)
    print("device:", jax.devices()[0], "L:", L, "P:", P)


if __name__ == "__main__":
    main()
