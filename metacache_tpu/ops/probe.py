"""Feature probing with a prefix index.

Features are uniform 32-bit hashes, so the top `bits` of a feature index a
precomputed prefix table of row offsets into the sorted unique-feature
array: the binary search then only runs inside one small prefix span
(~log2(F / 2^bits) steps instead of log2(F)). This plays the role of the
reference's hash-table bucket addressing (open addressing over
hash(feature), src/hash_multimap.hpp:135-175) for the CSR layout —
data-dependent gathers are the scarce resource on TPU, so fewer probe
steps matter more than anything else.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_BITS = 20


def make_prefix_index(features: np.ndarray, bits: int = DEFAULT_BITS):
    """-> (prefix_starts (2^bits + 1,) i32, search_steps int)."""
    nbuckets = 1 << bits
    bounds = (np.arange(nbuckets, dtype=np.uint64) <<
              np.uint64(32 - bits)).astype(np.uint32)
    starts = np.searchsorted(features, bounds).astype(np.int32)
    starts = np.append(starts, np.int32(len(features)))
    max_span = int(np.max(np.diff(starts))) if len(features) else 0
    # binary search over a span of s elements needs floor(log2(s)) + 1
    # halving steps to fully converge (s.bit_length()); one short silently
    # misses features when the span is an exact power of two
    steps = max(1, int(max_span).bit_length())
    return starts, steps


def probe_features(flat: jax.Array, table_feats: jax.Array,
                   prefix_starts: jax.Array, bits: int, steps: int,
                   check: bool = True):
    """-> (idx i32, found bool): position of each feature in the table.

    With check=False the final membership gather is skipped (callers that
    fetch a fused row containing the feature value verify it themselves;
    `found` is then merely "not a sentinel").
    """
    nf = table_feats.shape[0]
    if nf == 0:
        z = jnp.zeros(flat.shape, jnp.int32)
        return z, jnp.zeros(flat.shape, bool)
    hi_bits = (flat >> (32 - bits)).astype(jnp.int32)
    lo = prefix_starts[hi_bits]
    hi = prefix_starts[hi_bits + 1]
    for _ in range(steps):
        mid = jax.lax.div(lo + hi, jnp.int32(2))
        v = table_feats[jnp.minimum(mid, nf - 1)]
        less = v < flat
        lo = jnp.where(less, mid + 1, lo)
        hi = jnp.where(less, hi, mid)
    idx = jnp.minimum(lo, nf - 1)
    if not check:
        return idx, flat != jnp.uint32(0xFFFFFFFF)
    found = (table_feats[idx] == flat) & (flat != jnp.uint32(0xFFFFFFFF))
    return idx, found
