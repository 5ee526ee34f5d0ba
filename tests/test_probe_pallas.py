"""Parity: Pallas probe-decode kernels vs the XLA decode they replace.

The kernels (ops/probe_pallas.py) run in interpret mode on the CPU
mesh; the reference is the existing XLA decode in ops.probe /
ops.rows with MC_PROBE_PALLAS=0 pinned (the conftest CPU backend
would otherwise already pick the XLA path, but pin it explicitly so
the reference stays the reference if defaults change)."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from metacache_tpu.ops.probe import make_bucket_index, probe_bucket
from metacache_tpu.ops.probe_pallas import (bucket_decode, full_decode,
                                            head_decode)
from metacache_tpu.ops.rows import probe_rows, probe_rows_head

HSL, SPF, F, BITS0 = 61, 254, 16, 12
SB = 18


@pytest.fixture(scope="module")
def layout():
    rng = np.random.default_rng(11)
    nf = 4000
    feats = np.sort(rng.choice(
        np.arange(1, 2**32 - 2, dtype=np.uint64), nf,
        replace=False).astype(np.uint32))
    cnts = rng.integers(1, SPF + 1, nf).astype(np.int32)
    brows_np, bits = make_bucket_index(feats, BITS0)
    assert brows_np.shape[1] == 64
    packed = np.empty((brows_np.shape[0] // 2, 128), np.int32)
    packed[:, :64] = brows_np[0::2]
    packed[:, 64:] = brows_np[1::2]
    brows = jnp.asarray(packed)
    nfp = (nf + 1) // 2 * 2
    hl = np.zeros((nfp, 64), np.int32)
    hl[:nf, 0] = feats.view(np.int32)
    hl[:nf, 1] = cnts
    novf = int((cnts > HSL).sum())
    ovfid = np.zeros(nf, np.int32)
    ovfid[cnts > HSL] = np.arange(1, novf + 1)
    hl[:nf, 2] = ovfid
    hl[:nf, 3:] = rng.integers(0, 2**30, (nf, 61)).astype(np.int32)
    hp = np.empty((nfp // 2, 128), np.int32)
    hp[:, :64] = hl[0::2]
    hp[:, 64:] = hl[1::2]
    head = jnp.asarray(hp)
    ow = SPF - HSL
    ovf_np = np.zeros((novf + 1, 200), np.int32)
    ovf_np[1:, :ow] = rng.integers(0, 2**30,
                                   (novf, ow)).astype(np.int32)
    ovf = jnp.asarray(ovf_np)
    n = 8 * F
    sel = rng.integers(0, nf, n)
    flat_np = feats[sel].copy()
    miss = rng.random(n) < 0.3
    flat_np[miss] = rng.integers(1, 2**31, int(miss.sum()),
                                 dtype=np.uint32)
    flat_np[:3] = 0xFFFFFFFF
    return (jnp.asarray(feats), brows, bits, head, ovf,
            jnp.asarray(flat_np))


def test_bucket_decode_parity(layout):
    _, brows, bits, _, _, flat = layout
    os.environ["MC_PROBE_PALLAS"] = "0"
    try:
        idx_ref, found_ref = probe_bucket(flat, brows, bits)
    finally:
        del os.environ["MC_PROBE_PALLAS"]
    h = (flat >> (32 - bits)).astype(jnp.int32)
    row2 = brows[h >> 1]
    idx_k, found_k = bucket_decode(row2, h & 1, flat, tile=64)
    np.testing.assert_array_equal(np.asarray(idx_k),
                                  np.asarray(idx_ref))
    np.testing.assert_array_equal(np.asarray(found_k),
                                  np.asarray(found_ref))


def test_head_decode_parity(layout):
    _, brows, bits, head, _, flat = layout
    dense = ("two_tier", HSL, True, False, SB)
    os.environ["MC_PROBE_PALLAS"] = "0"
    try:
        idx_ref, _ = probe_bucket(flat, brows, bits)
        idx_c = jnp.clip(idx_ref, 0, None)
        pk_ref, over_ref = probe_rows_head(
            flat.reshape(-1, F), head, brows, bits, dense,
            alt_runs=64, pack_bits=SB, idx_pre=idx_c)
    finally:
        del os.environ["MC_PROBE_PALLAS"]
    r2 = head[idx_c >> 1]
    pk_k, cnt_k = head_decode(r2, idx_c & 1, flat, HSL, 64, F,
                              tile=64)
    over_k = jnp.any(cnt_k.reshape(-1, F) > HSL, axis=1)
    np.testing.assert_array_equal(
        np.asarray(pk_k.reshape(-1, F * 64)), np.asarray(pk_ref))
    np.testing.assert_array_equal(np.asarray(over_k),
                                  np.asarray(over_ref))


def test_full_decode_parity(layout):
    feats, brows, bits, head, ovf, flat = layout
    dense = ("two_tier", HSL, True, False, SB)
    os.environ["MC_PROBE_PALLAS"] = "0"
    try:
        idx_ref, _ = probe_bucket(flat, brows, bits)
        idx_c = jnp.clip(idx_ref, 0, None)
        pk_ref, _ = probe_rows(
            flat.reshape(-1, F), feats, None, head, ovf, SPF,
            prefix_starts=brows, prefix_bits=bits, dense=dense,
            alt_runs=256, pack_bits=SB)
    finally:
        del os.environ["MC_PROBE_PALLAS"]
    r2 = head[idx_c >> 1]
    half = jnp.where(((idx_c & 1) == 1)[:, None], r2[:, 64:],
                     r2[:, :64])
    fnd = ((half[:, 0] == jax.lax.bitcast_convert_type(
        flat, jnp.int32)) & (flat != jnp.uint32(0xFFFFFFFF)))
    oidx = jnp.where(fnd, half[:, 2], 0)
    pk_k = full_decode(r2, ovf[oidx], idx_c & 1, flat, HSL, SPF,
                       256, F, tile=32)
    np.testing.assert_array_equal(
        np.asarray(pk_k.reshape(-1, F * 256)), np.asarray(pk_ref))


def test_oidx_decode_parity(layout):
    _, brows, bits, head, _, flat = layout
    from metacache_tpu.ops.probe_pallas import oidx_decode
    os.environ["MC_PROBE_PALLAS"] = "0"
    try:
        idx_ref, _ = probe_bucket(flat, brows, bits)
    finally:
        del os.environ["MC_PROBE_PALLAS"]
    idx_c = jnp.clip(idx_ref, 0, None)
    r2 = head[idx_c >> 1]
    half = jnp.where(((idx_c & 1) == 1)[:, None], r2[:, 64:],
                     r2[:, :64])
    fnd = ((half[:, 0] == jax.lax.bitcast_convert_type(
        flat, jnp.int32)) & (flat != jnp.uint32(0xFFFFFFFF)))
    oidx_ref = jnp.where(fnd, half[:, 2], 0)
    oidx_k = oidx_decode(r2, idx_c & 1, flat, tile=64)
    np.testing.assert_array_equal(np.asarray(oidx_k),
                                  np.asarray(oidx_ref))


def test_integrated_probe_rows_kernel_path(layout):
    """probe_rows/probe_rows_head with MC_PROBE_PALLAS=1 (interpret on
    CPU) match the MC_PROBE_PALLAS=0 XLA path end to end."""
    feats, brows, bits, head, ovf, flat = layout
    dense = ("two_tier", HSL, True, False, SB)

    def run():
        pk_full, _ = probe_rows(
            flat.reshape(-1, F), feats, None, head, ovf, SPF,
            prefix_starts=brows, prefix_bits=bits, dense=dense,
            alt_runs=256, pack_bits=SB)
        idx, _ = probe_bucket(flat, brows, bits)
        pk_head, over = probe_rows_head(
            flat.reshape(-1, F), head, brows, bits, dense,
            alt_runs=64, pack_bits=SB,
            idx_pre=jnp.clip(idx, 0, None))
        return pk_full, pk_head, over

    os.environ["MC_PROBE_PALLAS"] = "0"
    try:
        ref = run()
    finally:
        os.environ["MC_PROBE_PALLAS"] = "1"
    try:
        ker = run()
    finally:
        del os.environ["MC_PROBE_PALLAS"]
    for r, k in zip(ref, ker):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(k))
