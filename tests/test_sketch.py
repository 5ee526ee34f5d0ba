"""Sketcher oracle tests: window spans, golden sketches from reference code."""
import numpy as np

from metacache_tpu.config import SketchingOptions
from metacache_tpu.core import sketch

# 300-char pseudo-sequence used by the reference probe ('N' at position 50)
SEQ = (b"GGGTGACGGCAGGGACGTCACAGTACGGACGGAAGACGCCGGCTTCCTGTNTCTCTCTAA"
       b"TTCGCTTAACTAACAAAGTGGGTTACCCGGGGTTAGAAGCCCAAATTCGTAGCCGGAAGC"
       b"GAACTGTATGCCTCCGGGAACCTGTCGAGGTCACTTAACTCAAATGTAGGATAGCCCCTG"
       b"ATGCCTTACGACAAAAGCCCAACATATCACAGGATCTCTACAACACGCTAAGTCTCGGTA"
       b"CAAAATCCTCTTTCGCGGAGTTATCTTGGCAGGGGCACCCACCACACGTGCACAGTTGCA")

# golden sketches (reference single_function_unique_min_hasher, k16 s16 w127)
GOLDEN_SKETCHES = {
    0: [30256050, 34766043, 51488003, 53971185, 92650645, 141079462,
        171525489, 179330977, 266705221, 366440098, 369876599, 394755194,
        474933189, 590920980, 650072924, 681640630],
    1: [78727589, 153771381, 186933642, 223610753, 252602783, 267670577,
        354679081, 389689545, 399465717, 403751683, 404836478, 417996908,
        529846410, 595505669, 625120564, 660446986],
    2: [147535212, 158968500, 395113397, 427739905, 451007301, 499745756,
        666225655, 715063018, 720662873, 775587030, 855353624, 984984393,
        1013993653, 1073068289, 1105915739, 1319724931],
}

OPT = SketchingOptions(kmerlen=16, sketchlen=16, winlen=127, winstride=112)


def test_window_spans():
    assert sketch.window_spans(100, 127, 112) == [(0, 100)]
    assert sketch.window_spans(127, 127, 112) == [(0, 127)]
    assert sketch.window_spans(300, 127, 112) == [(0, 127), (112, 239),
                                                  (224, 300)]
    # a trailing partial window always exists while first < last
    assert sketch.window_spans(239, 127, 112) == [(0, 127), (112, 239),
                                                  (224, 239)]


def test_num_windows():
    assert sketch.num_windows(300, OPT) == 3
    # trailing window shorter than k gets no window id
    assert sketch.num_windows(239, OPT) == 2       # partial is 15 chars < k
    assert sketch.num_windows(239 + 16, OPT) == 3  # partial is 31 chars
    assert sketch.num_windows(10, OPT) == 0
    assert sketch.num_windows(16, OPT) == 1


def test_golden_sketches():
    got = dict(sketch.for_each_sketch(SEQ, OPT))
    assert set(got) == set(GOLDEN_SKETCHES)
    for w, expect in GOLDEN_SKETCHES.items():
        np.testing.assert_array_equal(got[w],
                                      np.array(expect, dtype=np.uint32))


def test_sketch_all_ambiguous_window():
    # a window with only ambiguous chars yields an empty sketch but still
    # consumes a window id
    s = b"N" * 127
    out = sketch.sketch_sequence(s, OPT)
    assert len(out) == 1
    assert out[0][0] == 0
    assert len(out[0][1]) == 0


def test_sketch_short_window_smaller_s():
    # n - k + 1 < sketchlen limits the sketch size
    s = b"ACGTACGTACGTACGTACG"  # 19 chars -> 4 kmers
    out = sketch.sketch_sequence(s, OPT)
    assert len(out) == 1
    assert len(out[0][1]) <= 4


def test_query_feature_accumulation():
    feats = sketch.all_query_features(SEQ, None, OPT)
    assert len(feats) == 48  # 3 windows x 16
    feats2 = sketch.all_query_features(SEQ, SEQ[:130], OPT)
    assert len(feats2) > 48


def test_u64_sketch_device_matches_oracle():
    """k = 18 (64-bit kmers/features): the XLA sketcher is bit-exact
    with the scalar oracle (murmur3_fmix features, u64 sentinel)."""
    import numpy as np
    from metacache_tpu.utils.platform import ensure_feature_width
    ensure_feature_width(18)
    import jax.numpy as jnp
    from metacache_tpu.config import SketchingOptions
    from metacache_tpu.core import sketch as osk
    from metacache_tpu.ops.sketch_jax import sketch_windows

    rng = np.random.default_rng(21)
    opt = SketchingOptions(kmerlen=18).resolved()
    n, w = 32, 127
    codes = rng.integers(0, 4, (n, w)).astype(np.uint8)
    codes[3, 50] = 4
    vl = np.full(n, w, np.int32)
    vl[5] = 40
    vl[9] = 10   # < k: no sketch
    dev = np.asarray(sketch_windows(jnp.asarray(codes), jnp.asarray(vl),
                                    k=18, sketchlen=16))
    assert dev.dtype == np.uint64
    sent = np.uint64(0xFFFFFFFFFFFFFFFF)
    for i in range(n):
        ref = osk.sketch_codes(codes[i][:vl[i]], opt)
        got = dev[i][dev[i] != sent]
        if ref is None:
            assert len(got) == 0
        else:
            np.testing.assert_array_equal(ref, got)
