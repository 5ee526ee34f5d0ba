#!/usr/bin/env python
"""Deterministic test-fixture generator.

Creates synthetic reference genomes and read sets under tests/data/ whose
headers carry NCBI-style accessions plus `taxid|N` annotations resolvable
against the taxonomy bundled with the reference (test/taxonomy.tar.gz):
species 9 (Buchnera aphidicola), 56, 562 (E. coli), 813, 2151.

The same fixture is fed to the reference CPU binary (tests/make_goldens.sh)
to produce golden outputs, and to metacache_tpu's tests for parity checks.
Everything is seeded -> byte-identical across runs.
"""
from __future__ import annotations

import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
DATA = os.path.join(HERE, "data")

ALPHABET = np.frombuffer(b"ACGT", dtype=np.uint8)

# (accession, taxid, genome length)
GENOMES = [
    ("NC_900001.1", 562, 60000),
    ("NC_900002.1", 562, 45000),   # second sequence of the same species
    ("NC_900003.1", 9, 50000),
    ("NC_900004.1", 813, 40000),
    ("NC_900005.1", 2151, 55000),
    ("NC_900006.1", 56, 30000),
]


def _rand_seq(rng: np.random.Generator, n: int, with_ns: bool = True) -> bytes:
    seq = ALPHABET[rng.integers(0, 4, size=n)]
    if with_ns:
        # sprinkle a few ambiguous runs
        for _ in range(max(1, n // 20000)):
            p = int(rng.integers(0, max(1, n - 50)))
            run = int(rng.integers(1, 30))
            seq[p:p + run] = ord("N")
    return seq.tobytes()


def _wrap(seq: bytes, width: int = 80) -> str:
    s = seq.decode()
    return "\n".join(s[i:i + width] for i in range(0, len(s), width))


def make_genomes(rng) -> dict[str, bytes]:
    genomes = {}
    with open(os.path.join(DATA, "genomes.fa"), "w") as f:
        for acc, taxid, n in GENOMES:
            seq = _rand_seq(rng, n)
            genomes[acc] = seq
            f.write(f">{acc} taxid|{taxid}| synthetic genome\n")
            f.write(_wrap(seq) + "\n")
    return genomes


def sample_reads(rng, genomes, n_reads: int, lengths):
    """Sample reads; header encodes source accession for ground truth."""
    accs = [a for a, _, _ in GENOMES]
    reads = []
    for i in range(n_reads):
        acc = accs[int(rng.integers(0, len(accs)))]
        g = genomes[acc]
        ln = int(lengths[int(rng.integers(0, len(lengths)))])
        ln = min(ln, len(g) - 1)
        pos = int(rng.integers(0, len(g) - ln))
        seq = bytearray(g[pos:pos + ln])
        # mutate ~1% of bases to simulate sequencing errors
        nmut = max(0, int(rng.binomial(ln, 0.01)))
        for _ in range(nmut):
            j = int(rng.integers(0, ln))
            seq[j] = ALPHABET[int(rng.integers(0, 4))]
        # reverse-complement half of the reads
        if rng.integers(0, 2) == 1:
            comp = bytes(seq).translate(
                bytes.maketrans(b"ACGTN", b"TGCAN"))[::-1]
            seq = bytearray(comp)
        reads.append((f"{acc}_r{i}", bytes(seq)))
    return reads


def write_fasta(path, reads):
    with open(path, "w") as f:
        for h, s in reads:
            f.write(f">{h}\n{s.decode()}\n")


def write_fastq(path, reads):
    with open(path, "w") as f:
        for h, s in reads:
            f.write(f"@{h}\n{s.decode()}\n+\n{'I' * len(s)}\n")


def main():
    os.makedirs(DATA, exist_ok=True)
    rng = np.random.default_rng(20260816)
    genomes = make_genomes(rng)

    # short single reads (100 bp)
    short = sample_reads(rng, genomes, 200, [100])
    write_fasta(os.path.join(DATA, "reads_single.fa"), short)
    write_fastq(os.path.join(DATA, "reads_single.fq"), short)

    # long reads (mixed 200 bp .. 8 kb)
    long_reads = sample_reads(rng, genomes, 60,
                              [200, 480, 1000, 3000, 8000])
    write_fasta(os.path.join(DATA, "reads_long.fa"), long_reads)

    # paired reads: mate1 / mate2 drawn near each other
    accs = [a for a, _, _ in GENOMES]
    p1, p2, inter = [], [], []
    for i in range(100):
        acc = accs[int(rng.integers(0, len(accs)))]
        g = genomes[acc]
        pos = int(rng.integers(0, len(g) - 600))
        m1 = g[pos:pos + 100]
        frag = g[pos + 400:pos + 500]
        m2 = frag.translate(bytes.maketrans(b"ACGTN", b"TGCAN"))[::-1]
        p1.append((f"{acc}_p{i}/1", m1))
        p2.append((f"{acc}_p{i}/2", m2))
        inter.append((f"{acc}_p{i}/1", m1))
        inter.append((f"{acc}_p{i}/2", m2))
    write_fasta(os.path.join(DATA, "reads_pair1.fa"), p1)
    write_fasta(os.path.join(DATA, "reads_pair2.fa"), p2)
    write_fasta(os.path.join(DATA, "reads_pairseq.fa"), inter)
    write_fastq(os.path.join(DATA, "reads_pair1.fq"), p1)
    write_fastq(os.path.join(DATA, "reads_pair2.fq"), p2)

    print(f"fixture written to {DATA}")


if __name__ == "__main__":
    sys.exit(main())
