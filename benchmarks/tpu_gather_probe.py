"""Gather-wall mitigation probes (VERDICT r3 item 2).

Round-4 forensics (tpu_sprand_forensics.py) pinned gmres_sprand_100k's
10.7 ms/iter on the SpMV gather itself: ~7.4 ns per gathered element,
linear in element count, orthogonalization method irrelevant.  This probe
measures the candidate primitives that could beat the XLA scalar gather:

  A. Pallas tpu.dynamic_gather via jnp.take_along_axis (the Mosaic lowering
     supports 2-D same-shape take_along_axis): table-width / sublane
     constraints and throughput at SpMV-relevant sizes.  If a VMEM-resident
     lane gather works at VPU pace, an ELL SpMV kernel with x resident in
     VMEM beats the XLA gather by >10x at n = 1e5 (x is only 400 KB).
  B. XLA gather variants (row gathers from narrow/wide tables, static-index
     gather/scatter) — does per-index cost ever amortize?
  C. XLA building blocks for sort-based SpMV: lax.sort, cumsum, sorted
     segment_sum.

NOTE: a jitted fori_loop with a large gather in the body blew past 1 h of
remote compile on this backend (round-4, killed); all timing here uses
small in-jit repeat counts + eager repeat loops.
"""

import json
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fence(x):
    for leaf in jax.tree_util.tree_leaves(x):
        if hasattr(leaf, "dtype"):
            np.asarray(jnp.ravel(leaf)[:1])


def timeit_eager(fn, *args, reps=30):
    """Dispatch-latency-inclusive timing: call fn reps times eagerly; the
    remote dispatch floor (~1 ms) is reported alongside, so only use for
    ops expected >> 1 ms OR compare deltas."""
    out = fn(*args)
    fence(out)
    best = float("inf")
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    fence(out)
    return 1e6 * (time.perf_counter() - t0) / reps


def timeit_loop(fn, x, reps=16):
    """In-jit repeat: chains fn through a value-perturbing loop (small rep
    count keeps remote compile sane)."""

    @jax.jit
    def many(x):
        acc = jnp.float32(0)
        for i in range(reps):
            out = fn(x + acc.astype(x.dtype) * 0)
            acc = acc + jnp.ravel(out)[0].astype(jnp.float32) * jnp.float32(1e-20)
        return acc

    fence(many(x))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        fence(many(x))
        best = min(best, time.perf_counter() - t0)
    return 1e6 * best / reps


def report(name, us, elements=None, **kw):
    out = {"probe": name, "us": round(us, 1), **kw}
    if elements:
        out["ns_per_element"] = round(1e3 * us / elements, 3)
    print(json.dumps(out), flush=True)


def pallas_take_lane(table, idx):
    """out[i, j] = table[i, idx[i, j]] — tpu.dynamic_gather along lanes."""

    def kern(t_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(t_ref[...], i_ref[...], axis=1)

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(idx.shape, table.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(table, idx)


def pallas_take_sub(table, idx):
    """out[i, j] = table[idx[i, j], j] — dynamic_gather along sublanes."""

    def kern(t_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(t_ref[...], i_ref[...], axis=0)

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(idx.shape, table.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(table, idx)


def pallas_probes():
    rng = np.random.default_rng(1)
    # ---- constraint scan: which lane-gather shapes compile + verify? ----
    for rows, width in ((8, 128), (8, 1024), (64, 512), (256, 512),
                        (8, 8192), (8, 100_096), (512, 2048)):
        try:
            tn = rng.standard_normal((rows, width)).astype(np.float32)
            inn = rng.integers(0, width, size=(rows, width)).astype(np.int32)
            t, i = jnp.asarray(tn), jnp.asarray(inn)
            out = np.asarray(pallas_take_lane(t, i))
            ok = bool((out == np.take_along_axis(tn, inn, axis=1)).all())
            us = timeit_loop(lambda ii: pallas_take_lane(t, ii), i)
            report(f"pallas_lane_{rows}x{width}", us, rows * width,
                   ok=ok)
        except Exception as e:
            print(json.dumps({"probe": f"pallas_lane_{rows}x{width}",
                              "error": repr(e)[:140]}), flush=True)

    # ---- sublane variant ----
    for rows, width in ((8, 128), (512, 512), (8192, 512)):
        try:
            tn = rng.standard_normal((rows, width)).astype(np.float32)
            inn = rng.integers(0, rows, size=(rows, width)).astype(np.int32)
            t, i = jnp.asarray(tn), jnp.asarray(inn)
            out = np.asarray(pallas_take_sub(t, i))
            ok = bool((out == np.take_along_axis(tn, inn, axis=0)).all())
            us = timeit_loop(lambda ii: pallas_take_sub(t, ii), i)
            report(f"pallas_sub_{rows}x{width}", us, rows * width, ok=ok)
        except Exception as e:
            print(json.dumps({"probe": f"pallas_sub_{rows}x{width}",
                              "error": repr(e)[:140]}), flush=True)


def xla_probes():
    rng = np.random.default_rng(0)
    n, w = 100_000, 13
    K = n * w
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    cols = jnp.asarray(rng.integers(0, n, size=(n, w)).astype(np.int32))

    report("xla_scalar_gather_nw",
           timeit_loop(lambda v: jnp.sum(v[cols], axis=1), x, reps=8), K)

    # row gathers: (n, w) indices of c-element rows from (T, c) tables
    for c in (8, 128):
        T = n // c
        Xt = jnp.asarray(rng.standard_normal((T, c)).astype(np.float32))
        ids = jnp.asarray(rng.integers(0, T, size=(n, w)).astype(np.int32))
        us = timeit_loop(lambda X: jnp.sum(X[ids], axis=(1, 2)), Xt, reps=4)
        report(f"xla_row_gather_c{c}", us, K, gathered_elements=K * c)

    # static-index permutation gather / scatter at n
    sidx = jnp.asarray(rng.permutation(n).astype(np.int32))
    report("xla_static_perm_gather_n",
           timeit_loop(lambda v: v[sidx], x, reps=8), n)

    # sort-based building blocks at nnz scale
    vals = jnp.asarray(rng.standard_normal(K).astype(np.float32))
    keys = jnp.asarray(rng.integers(0, n, size=K).astype(np.int32))
    report("xla_cumsum_K", timeit_loop(lambda v: jnp.cumsum(v), vals,
                                       reps=8), K)
    report("xla_sort_kv_K",
           timeit_loop(lambda v: jax.lax.sort((keys, v), num_keys=1)[1],
                       vals, reps=2), K)
    seg = jnp.sort(keys)
    report("xla_segsum_sorted_K",
           timeit_loop(lambda v: jax.ops.segment_sum(
               v, seg, num_segments=n, indices_are_sorted=True), vals,
               reps=4), K)


if __name__ == "__main__":
    print(json.dumps({"probe": "devices",
                      "d": str(jax.devices())[:60]}), flush=True)
    pallas_probes()
    xla_probes()
