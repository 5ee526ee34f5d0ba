"""Pallas sketch kernel vs the XLA sketcher (bit-exact), interpret mode."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from metacache_tpu.ops.sketch_jax import sketch_windows
from metacache_tpu.ops.sketch_pallas import sketch_windows_pallas


def test_pallas_sketch_matches_xla():
    rng = np.random.default_rng(3)
    n = 256
    codes = rng.integers(0, 4, (n, 128)).astype(np.uint8)
    codes[3, 10:90] = 4            # big ambiguous run
    codes[4, :] = 4                # fully ambiguous
    valid = np.full(n, 127, np.int32)
    valid[7] = 40                  # short window
    valid[9] = 10                  # below kmerlen -> all sentinel
    valid[11] = 16                 # exactly kmerlen -> one kmer
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(sketch_windows_pallas(
            jnp.asarray(codes), jnp.asarray(valid), k=16, sketchlen=16,
            tile=256))
    want = np.asarray(sketch_windows(
        jnp.asarray(codes[:, :127]), jnp.asarray(valid), k=16,
        sketchlen=16))
    np.testing.assert_array_equal(got, want)


def test_pallas_sketch_duplicate_hashes():
    # repeated sequence content -> duplicate features must count once
    codes = np.tile(
        np.frombuffer(b"\x00\x01\x02\x03" * 32, dtype=np.uint8), (64, 1))
    valid = np.full(64, 127, np.int32)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(sketch_windows_pallas(
            jnp.asarray(codes), jnp.asarray(valid), k=16, sketchlen=16,
            tile=64))
    want = np.asarray(sketch_windows(
        jnp.asarray(codes[:, :127]), jnp.asarray(valid), k=16,
        sketchlen=16))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("case", ["random", "dups", "short"])
def test_pallas_sketch_extract_mode(case):
    """mode="extract" (s min-extractions instead of full bitonic sort +
    compaction) is bit-exact with the sort mode — it exists as the
    on-chip A/B alternative for the sketch stage."""
    rng = np.random.default_rng(11)
    n = 128
    if case == "random":
        codes = rng.integers(0, 4, (n, 128)).astype(np.uint8)
        valid = np.full(n, 127, np.int32)
    elif case == "dups":
        codes = np.tile(
            np.frombuffer(b"\x00\x01\x02\x03" * 32, dtype=np.uint8),
            (n, 1))
        valid = np.full(n, 127, np.int32)
    else:
        codes = rng.integers(0, 5, (n, 128)).astype(np.uint8)
        valid = rng.integers(0, 128, n).astype(np.int32)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(sketch_windows_pallas(
            jnp.asarray(codes), jnp.asarray(valid), k=16, sketchlen=16,
            tile=n, mode="extract"))
    want = np.asarray(sketch_windows(
        jnp.asarray(codes[:, :127]), jnp.asarray(valid), k=16,
        sketchlen=16))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("winlen,kk", [(255, 16), (511, 16), (200, 12)])
def test_pallas_sketch_long_windows(winlen, kk):
    """Strided-chunk kernel (winlen > 128, the reference's standard/
    small presets) == XLA sketcher, including ambiguous runs, short
    valid lengths, and chunk-boundary-spanning kmers."""
    from metacache_tpu.ops.sketch_pallas import sketch_windows_pallas_long
    rng = np.random.default_rng(41)
    n = 64
    codes = rng.integers(0, 4, (n, winlen)).astype(np.uint8)
    codes[3, 100:180] = 4             # ambiguous run across chunk cut
    codes[4, :] = 4
    valid = np.full(n, winlen, np.int32)
    valid[7] = 130                    # just past one chunk
    valid[9] = kk - 1                 # below kmerlen -> all sentinel
    valid[11] = 113                   # exactly one chunk of starts
    valid[13] = 250
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(sketch_windows_pallas_long(
            jnp.asarray(codes), jnp.asarray(valid), k=kk, sketchlen=16,
            tile=64))
    want = np.asarray(sketch_windows(
        jnp.asarray(codes), jnp.asarray(valid), k=kk, sketchlen=16))
    np.testing.assert_array_equal(got, want)
