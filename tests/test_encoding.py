"""Bit-exactness tests of the encoding/hash oracle against golden vectors
generated from the reference C++ headers (hash_int.hpp, dna_encoding.hpp)."""
import numpy as np
import pytest

from metacache_tpu.core import encoding

# (input, thomas_mueller_hash(input)) — generated from reference code
TM_GOLDEN = [
    (0, 0), (1, 824515495), (2, 1722258072),
    (0xDEADBEEF, 1398006505), (0x12345678, 89967310),
    (0xFFFFFFFF, 539527247),
]

MM64_GOLDEN = [
    (0, 0), (1, 12994781566227106604),
    (0x123456789ABCDEF, 9785191686031420650),
    (0xFFFFFFFFFFFFFFFF, 7256831767414464289),
]

SM64_GOLDEN = [
    (0, 0), (1, 6238072747940578789),
    (0x123456789ABCDEF, 12880392674509918508),
    (0xFFFFFFFFFFFFFFFF, 13029008266876403067),
]

HS_GOLDEN = [
    (0, 720020139), (1, 357654460),
    (0x123456789ABCDEF, 2918899159),
    (0xFFFFFFFFFFFFFFFF, 532412650),
]


def test_thomas_mueller_hash():
    xs = np.array([x for x, _ in TM_GOLDEN], dtype=np.uint32)
    expect = np.array([h for _, h in TM_GOLDEN], dtype=np.uint32)
    np.testing.assert_array_equal(encoding.thomas_mueller_hash(xs), expect)


def test_murmur3_fmix64():
    xs = np.array([x for x, _ in MM64_GOLDEN], dtype=np.uint64)
    expect = np.array([h for _, h in MM64_GOLDEN], dtype=np.uint64)
    np.testing.assert_array_equal(encoding.murmur3_fmix64(xs), expect)


def test_splitmix64():
    xs = np.array([x for x, _ in SM64_GOLDEN], dtype=np.uint64)
    expect = np.array([h for _, h in SM64_GOLDEN], dtype=np.uint64)
    np.testing.assert_array_equal(encoding.splitmix64_hash(xs), expect)


def test_halve_size_hash():
    xs = np.array([x for x, _ in HS_GOLDEN], dtype=np.uint64)
    expect = np.array([h for _, h in HS_GOLDEN], dtype=np.uint32)
    np.testing.assert_array_equal(encoding.halve_size_hash(xs), expect)


# k-mer iteration over "ACGTACGTACGTACGTTGCANNGGCCTTAAGGCCTTACGT", k=16:
# (kmer, ambig_bits, canonical, revcomp) from reference for_each_kmer_2bit
KMER_GOLDEN = [
    (454761243, 0, 454761243, 454761243),
    (1819044975, 0, 113690310, 113690310),
    (2981212606, 0, 1102164401, 1102164401),
    (3334915833, 0, 2423024748, 2423024748),
    (454761444, 0, 454761444, 3826981659),
    (1819045776, 1, 1819045776, 4177970886),
    (2981215808, 3, 2981215808, 4265718193),
    (3334928642, 6, 2140171372, 2140171372),
    (454812682, 12, 454812682, 1608784667),
    (1819250729, 24, 1819250729, 2549679814),
    (2982035621, 48, 2784903601, 2784903601),
    (3338207895, 96, 696225900, 696225900),
    (467929695, 192, 174056475, 174056475),
    (1871718780, 384, 1871718780, 3264739590),
    (3191907824, 768, 3191907824, 4037410369),
    (4177696706, 1536, 2083094416, 2083094416),
    (3825884938, 3072, 1594515428, 1594515428),
    (2418637865, 6144, 2418637865, 2546112505),
    (1084616869, 12288, 1084616869, 2784011774),
    (43500183, 24576, 43500183, 696002943),
    (174000735, 49152, 174000735, 174000735),
    (696002940, 32768, 696002940, 3264725655),
    (2784011761, 0, 2784011761, 2963665061),
    (2546112454, 0, 1814658089, 1814658089),
    (1594515227, 0, 453664522, 453664522),
]

SEQ = b"ACGTACGTACGTACGTTGCANNGGCCTTAAGGCCTTACGT"


def test_kmers_2bit_golden():
    codes = encoding.encode_ascii(SEQ)
    kmers, ambig = encoding.kmers_2bit(codes, 16)
    assert len(kmers) == len(KMER_GOLDEN)
    np.testing.assert_array_equal(
        kmers, np.array([g[0] for g in KMER_GOLDEN], dtype=np.uint32))
    np.testing.assert_array_equal(
        ambig, np.array([g[1] != 0 for g in KMER_GOLDEN]))


def test_canonical_and_revcomp_golden():
    kmers = np.array([g[0] for g in KMER_GOLDEN], dtype=np.uint32)
    canon = np.array([g[2] for g in KMER_GOLDEN], dtype=np.uint32)
    rc = np.array([g[3] for g in KMER_GOLDEN], dtype=np.uint32)
    np.testing.assert_array_equal(encoding.revcomp_2bit_u32(kmers, 16), rc)
    np.testing.assert_array_equal(encoding.canonical_2bit_u32(kmers, 16),
                                  canon)


def test_revcomp_involution():
    rng = np.random.default_rng(0)
    for k in (4, 8, 11, 16):
        s = rng.integers(0, 1 << (2 * k), size=1000).astype(np.uint32)
        rc = encoding.revcomp_2bit_u32(s, k)
        np.testing.assert_array_equal(encoding.revcomp_2bit_u32(rc, k), s)


def test_encode_ascii_cases():
    codes = encoding.encode_ascii(b"ACGTacgtUuNnRX-")
    np.testing.assert_array_equal(
        codes, [0, 1, 2, 3, 0, 1, 2, 3, 3, 3, 4, 4, 4, 4, 4])
