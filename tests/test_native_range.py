"""Byte-range parallel readers (-threads): exact partition + e2e parity.

The native reader's range mode (fastx_open_range) must assign every
record to exactly one range (the range holding its first byte), resync
correctly mid-file for FASTA and 4-line FASTQ (including quality lines
starting with '@'/'+'), and the -threads N summary path must produce
the same statistics as a single reader."""
import io
import os

import numpy as np
import pytest

from metacache_tpu import native

HERE = os.path.dirname(os.path.abspath(__file__))
DATA = os.path.join(HERE, "data")

pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="native library unavailable")


def _write_fixture(tmp_path, fastq: bool):
    rng = np.random.default_rng(5)
    b2a = np.frombuffer(b"ACGT", np.uint8)
    path = str(tmp_path / ("rr.fq" if fastq else "rr.fa"))
    with open(path, "wb") as fh:
        for i in range(3000):
            ln = int(rng.integers(30, 200))
            rd = b2a[rng.integers(0, 4, ln)].tobytes()
            if fastq:
                q = bytes([64 if (i % 7 == 0 and j == 0) else
                           (43 if (i % 5 == 0 and j == 0) else
                            70 + int(rng.integers(0, 10)))
                           for j in range(ln)])
                fh.write(b"@read%d\n%s\n+\n%s\n" % (i, rd, q))
            else:
                fh.write(b">read%d extra\n%s\n" % (i, rd))
    return path


@pytest.mark.parametrize("fastq", [False, True])
@pytest.mark.parametrize("nt", [2, 5])
def test_range_partition_exact(tmp_path, fastq, nt):
    path = _write_fixture(tmp_path, fastq)
    full = native.NativeFastxReader(path, max_len=256)
    cs, ls = [], []
    while True:
        c, l, _h = full.read_batch_raw(1024)
        if len(l) == 0:
            break
        cs.append(c.copy())
        ls.append(l.copy())
    full.close()
    allc, alll = np.concatenate(cs), np.concatenate(ls)
    fsz = os.path.getsize(path)
    cuts = [fsz * i // nt for i in range(nt + 1)]
    pc, plv = [], []
    for i in range(nt):
        r = native.NativeFastxReader(path, max_len=256,
                                     start=cuts[i], end=cuts[i + 1])
        while True:
            c, l, _h = r.read_batch_raw(1024)
            if len(l) == 0:
                break
            pc.append(c.copy())
            plv.append(l.copy())
        r.close()
    got_c, got_l = np.concatenate(pc), np.concatenate(plv)
    # ranges concatenated in order == the sequential read: every record
    # exactly once, in file order
    np.testing.assert_array_equal(got_l, alll)
    np.testing.assert_array_equal(got_c, allc)


def test_threads_summary_parity():
    """-threads 4 over the fixture == single-threaded summary output."""
    from metacache_tpu.classify.runner import (ClassificationResults,
                                               map_queries_to_targets)
    from metacache_tpu.cli.main import Args, parse_query_options
    from metacache_tpu.db.build import BuildOptions, build_database
    db = build_database(BuildOptions(
        infiles=[f"{DATA}/genomes.fa"],
        taxonomy_dir=f"{DATA}/taxonomy"))

    def run(threads):
        opt, _, _ = parse_query_options(Args(
            ["-no-map", "-no-query-params", "-threads", str(threads)]))
        out = io.StringIO()
        map_queries_to_targets([f"{DATA}/reads_single.fa"], db, opt,
                               ClassificationResults(out))
        return out.getvalue()

    assert run(4) == run(1)


def test_threads_gz_fallback():
    """-threads on a compressed input cannot byte-range seek: must fall
    back to one reader and produce identical output."""
    import gzip
    import shutil
    import tempfile

    from metacache_tpu.classify.runner import (ClassificationResults,
                                               map_queries_to_targets)
    from metacache_tpu.cli.main import Args, parse_query_options
    from metacache_tpu.db.build import BuildOptions, build_database
    db = build_database(BuildOptions(
        infiles=[f"{DATA}/genomes.fa"],
        taxonomy_dir=f"{DATA}/taxonomy"))
    tmp = tempfile.mkdtemp(prefix="mc_gz_")
    gzpath = os.path.join(tmp, "reads.fa.gz")
    with open(f"{DATA}/reads_single.fa", "rb") as src, \
            gzip.open(gzpath, "wb") as dst:
        shutil.copyfileobj(src, dst)

    def run(path, threads):
        opt, _, _ = parse_query_options(Args(
            ["-no-map", "-no-query-params", "-threads", str(threads)]))
        import io
        out = io.StringIO()
        map_queries_to_targets([path], db, opt,
                               ClassificationResults(out))
        return out.getvalue()

    def strip_paths(t):
        return [l for l in t.splitlines()
                if DATA not in l and "/tmp" not in l]

    plain = strip_paths(run(f"{DATA}/reads_single.fa", 1))
    gz4 = strip_paths(run(gzpath, 4))
    shutil.rmtree(tmp, ignore_errors=True)
    assert gz4 == plain
