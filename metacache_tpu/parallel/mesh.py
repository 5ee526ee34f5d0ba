"""Multi-chip sharded classification over a jax.sharding.Mesh.

Maps the reference's parallelism strategies (SURVEY §2.7) onto a 2-D device
mesh ("data", "table"):

- P1 (thread data-parallelism over reads)  -> the "data" mesh axis: read
  batches are split across data groups.
- P2/P3 (database parts + multi-GPU query pipeline: each GPU holds one DB
  part, sketches are forwarded GPU->GPU via cudaMemcpyPeerAsync,
  src/query_batch.cu:464-527) -> the "table" mesh axis: the CSR table is
  sharded by feature range; every table-group device probes its shard for
  the whole local batch, then per-shard match lists are exchanged with an
  all-to-all so each device sweeps/classifies a disjoint 1/P query
  sub-slice. The serial GPU chain becomes one XLA collective over ICI.
- P4 (replication) -> reshape the mesh: more "data" rows, fewer "table"
  columns (table replicated when it fits).

The build path shards the same way: each device sketches its input slice
and (feature, location) pairs route to the owner shard by feature range
(all-to-all), where sort-based construction runs locally.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.pipeline import (matches_to_result, probe_and_gather,
                            QueryResult)
from ..ops.sketch_jax import sketch_windows


def make_mesh(num_data: int, num_table: int,
              devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None
                         else jax.devices())
    assert devices.size >= num_data * num_table, \
        f"need {num_data * num_table} devices, have {devices.size}"
    grid = devices.reshape(-1)[:num_data * num_table].reshape(
        num_data, num_table)
    return Mesh(grid, ("data", "table"))


class ShardedTable(NamedTuple):
    """Feature-range-sharded CSR table, padded to equal shard sizes.

    Shard p owns features in [boundaries[p], boundaries[p+1]); probing a
    feature outside the local range simply misses, so each device can
    probe the *full* local batch against its own shard without routing.
    """
    features: np.ndarray     # (P, Fs) u32, ascending per shard, padded
    offsets: np.ndarray      # (P, Fs+1) i32
    loc_tgt: np.ndarray      # (P, Ls) i32
    loc_win: np.ndarray      # (P, Ls) i32
    slots_per_feature: int


def shard_table(table, num_shards: int,
                max_locations_per_feature: int) -> ShardedTable:
    """Split a FeatureTable into `num_shards` feature-range shards."""
    f = table.unique_features
    offs = table.offsets
    from ..ops.table import unpack_locations
    ltgt, lwin = unpack_locations(table.locations)
    nf = len(f)
    cuts = [int(round(i * nf / num_shards)) for i in range(num_shards + 1)]
    sizes_f = [cuts[i + 1] - cuts[i] for i in range(num_shards)]
    sizes_l = [int(offs[cuts[i + 1]] - offs[cuts[i]])
               for i in range(num_shards)]
    fs = max(max(sizes_f), 1)
    ls = max(max(sizes_l), 1)
    feats = np.full((num_shards, fs), 0xFFFFFFFF, np.uint32)
    offsets = np.zeros((num_shards, fs + 1), np.int32)
    ltg = np.zeros((num_shards, ls), np.int32)
    lwn = np.zeros((num_shards, ls), np.int32)
    spf = 1
    for p in range(num_shards):
        a, b = cuts[p], cuts[p + 1]
        n = b - a
        feats[p, :n] = f[a:b]
        local = (offs[a:b + 1] - offs[a]).astype(np.int32)
        offsets[p, :n + 1] = local
        offsets[p, n + 1:] = local[-1] if n else 0
        la, lb = int(offs[a]), int(offs[b])
        ltg[p, :lb - la] = ltgt[la:lb]
        lwn[p, :lb - la] = lwin[la:lb]
        if n:
            spf = max(spf, int(np.max(np.diff(offs[a:b + 1]))))
    return ShardedTable(feats, offsets, ltg, lwn,
                        min(spf, max_locations_per_feature))


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "k", "sketchlen", "slots_per_feature",
                     "num_queries", "max_candidates"))
def sharded_query_step(windows, valid, qid_w, max_win_in_range,
                       st_features, st_offsets, st_ltgt, st_lwin,
                       merge_tax_of_target, lineages,
                       hits_min, hits_diff_frac, highest_rank, merge_rank,
                       *, mesh: Mesh, k: int, sketchlen: int,
                       slots_per_feature: int, num_queries: int,
                       max_candidates: int) -> QueryResult:
    """Sharded classification step.

    Shapes (global):
      windows (D*T, W), valid (D*T,), qid_w (D*T,)  — batch split over
        "data"; within a data row, every "table" device sees the same
        window slice (replicated over "table").
      st_* (P, ...) — one table shard per "table" device (split over
        "table", replicated over "data").
      max_win_in_range (B,), merge_tax (N,), lineages (N, R) — replicated.
      num_queries: per-data-group query count B (each data group's qid_w
        uses 0..B-1; padding windows use qid >= B).

    Returns per-data-group results with leading dim D*B (data-major).
    """
    num_table = mesh.shape["table"]
    b = num_queries

    def local_step(windows, valid, qid_w, mwir, tf, to, lt, lw,
                   merge_tax, lineages):
        # drop the leading shard dim of the table arrays
        tf, to = tf[0], to[0]
        lt, lw = lt[0], lw[0]
        feats = sketch_windows(windows, valid, k=k, sketchlen=sketchlen)
        qk, tgt, win, is_match = probe_and_gather(
            feats, qid_w, tf, to, lt, lw, slots_per_feature)
        qk = jnp.where(is_match, qk, jnp.int32(b))

        # ---- exchange matches across the table axis --------------------
        # Every table-group device needs ALL shards' matches for the
        # queries it will sweep (a (query, target) window range spans
        # shards). Allgather the per-shard match lists over ICI, then
        # each device keeps its disjoint 1/P query sub-range — the
        # collective replacement for the reference's serial GPU P2P chain
        # (src/query_batch.cu:464-527).
        p = num_table
        bsub = (b + p - 1) // p
        r = jax.lax.axis_index("table")
        if p > 1:
            qk = jax.lax.all_gather(qk, "table", tiled=True)
            tgt = jax.lax.all_gather(tgt, "table", tiled=True)
            win = jax.lax.all_gather(win, "table", tiled=True)
        lo_q = r * bsub
        hi_q = jnp.minimum(lo_q + bsub, b)
        mine = (qk >= lo_q) & (qk < hi_q)
        qk_local = jnp.where(mine, qk - lo_q, jnp.int32(bsub))

        res = matches_to_result(
            qk_local, jnp.where(mine, tgt, jnp.int32(2**31 - 1)),
            jnp.where(mine, win, jnp.int32(2**31 - 1)),
            jax.lax.dynamic_slice_in_dim(mwir, lo_q, bsub),
            merge_tax, lineages,
            hits_min, hits_diff_frac, highest_rank, merge_rank,
            num_queries=bsub, max_candidates=max_candidates)
        # per-device: bsub queries -> concatenated over table axis = b
        return res

    from jax import shard_map
    res = shard_map(
        local_step, mesh=mesh,
        in_specs=(P("data"), P("data"), P("data"), None,
                  P("table"), P("table"), P("table"), P("table"),
                  None, None),
        out_specs=QueryResult(
            cand_tgt=P(("data", "table")), cand_tax=P(("data", "table")),
            cand_hits=P(("data", "table")), cand_beg=P(("data", "table")),
            cand_end=P(("data", "table")), cls_tax=P(("data", "table")),
            hit_qid=P(("data", "table")), hit_tgt=P(("data", "table")),
            hit_win=P(("data", "table"))),
        check_vma=False,
    )(windows, valid, qid_w, max_win_in_range,
      st_features, st_offsets, st_ltgt, st_lwin,
      merge_tax_of_target, lineages)
    return res


def sharded_build_step(windows, valid, tgt_ids, win_ids, mesh,
                       k: int, sketchlen: int):
    """Sharded database-build sketch step: each data-parallel device
    sketches its window slice; (feature, target, window) triples return
    sharded for host-side (or device-side) table construction.

    Reference counterpart: the N-producer build pipeline + per-part
    inserter threads (src/building.cpp:337-461).
    """
    from jax import shard_map

    def local(windows, valid, tgt_ids, win_ids):
        feats = sketch_windows(windows, valid, k=k, sketchlen=sketchlen)
        s = feats.shape[1]
        t = jnp.broadcast_to(tgt_ids[:, None], feats.shape)
        w = jnp.broadcast_to(win_ids[:, None], feats.shape)
        return feats.reshape(-1), t.reshape(-1), w.reshape(-1)

    return shard_map(
        local, mesh=mesh,
        in_specs=(P(("data", "table")), P(("data", "table")),
                  P(("data", "table")), P(("data", "table"))),
        out_specs=(P(("data", "table")), P(("data", "table")),
                   P(("data", "table"))),
    )(windows, valid, tgt_ids, win_ids)
