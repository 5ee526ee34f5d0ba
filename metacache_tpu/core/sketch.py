"""NumPy oracle for windowed min-hash sketching.

Semantics mirror the reference sketcher exactly
(single_function_unique_min_hasher::for_each_sketch, src/hash_dna.hpp:207-255
and for_each_window, src/hash_dna.hpp:54-90):

- a sequence shorter than/equal to winlen is a single window;
- otherwise windows start at 0, stride, 2*stride, ... while start+winlen <=
  len, plus one final shorter window if characters remain;
- a window shorter than kmerlen produces NO sketch and does NOT advance the
  window counter (consume is never called, src/hash_dna.hpp:222 + the
  ++win-per-consume pattern in host_hashmap::add_target,
  src/host_hashmap.hpp:570-589);
- a window sketch is the s smallest *unique* feature hashes of all
  unambiguous canonical k-mers, s = min(sketchlen, n - k + 1);
- a hash equal to 0xFFFFFFFF never enters a sketch (sentinel trimming,
  src/hash_dna.hpp:233, 244-251).
"""
from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np

from ..config import SketchingOptions
from . import encoding


def window_spans(length: int, winlen: int, stride: int) -> list[tuple[int, int]]:
    """[start, end) spans of all windows, reference for_each_window order."""
    if length <= winlen:
        return [(0, length)]
    spans = []
    start = 0
    while start + winlen <= length:
        spans.append((start, start + winlen))
        start += stride
    if start < length:
        spans.append((start, length))
    return spans


def num_windows(length: int, opt: SketchingOptions) -> int:
    """Number of windows that receive a window id (length >= kmerlen)."""
    opt = opt.resolved()
    return sum(1 for (b, e) in window_spans(length, opt.winlen, opt.winstride)
               if e - b >= opt.kmerlen)


def sketch_codes(codes: np.ndarray, opt: SketchingOptions) -> np.ndarray:
    """Sketch one window of 2-bit codes -> sorted unique smallest features.

    Returns an array of <= min(sketchlen, n-k+1) uint32 features, ascending.
    """
    k = opt.kmerlen
    n = len(codes)
    if n < k:
        return None  # no sketch: too short, no window id either
    s = min(opt.sketchlen, n - k + 1)
    kmers, ambig = encoding.kmers_2bit(codes, k)
    canon = encoding.canonical_2bit(kmers, k)
    feats = encoding.feature_hash(canon)
    feats = feats[~ambig]
    # unique + sort ascending, drop sentinel, keep s smallest
    feats = np.unique(feats)
    sent = feats.dtype.type(np.iinfo(feats.dtype).max)
    feats = feats[feats != sent]
    return feats[:s]


def for_each_sketch(seq, opt: SketchingOptions) -> Iterator[Tuple[int, np.ndarray]]:
    """Yield (window_id, sketch) for every window of `seq`.

    `seq` may be bytes/str or a pre-encoded u8 code array. Window ids
    increment once per consumed window (see module docstring).
    """
    opt = opt.resolved()
    if isinstance(seq, str):
        seq = seq.encode()
    codes = encoding.encode_ascii(seq) if isinstance(
        seq, (bytes, bytearray)) else np.asarray(seq, dtype=np.uint8)
    win = 0
    for (b, e) in window_spans(len(codes), opt.winlen, opt.winstride):
        sk = sketch_codes(codes[b:e], opt)
        if sk is None:
            continue
        yield win, sk
        win += 1


def sketch_sequence(seq, opt: SketchingOptions) -> list[tuple[int, np.ndarray]]:
    return list(for_each_sketch(seq, opt))


def all_query_features(seq1, seq2, opt: SketchingOptions) -> np.ndarray:
    """Concatenated per-window sketches of a (paired) query.

    Mirrors host_hashmap::accumulate_matches (src/host_hashmap.hpp:629-671):
    each window's sketch is appended; duplicate features across windows are
    kept (probed once per occurrence). seq2 is sketched after seq1.
    """
    parts = [sk for (_, sk) in for_each_sketch(seq1, opt)]
    if seq2 is not None and len(seq2) > 0:
        parts += [sk for (_, sk) in for_each_sketch(seq2, opt)]
    if not parts:
        return np.zeros(0, dtype=np.uint32 if opt.kmerlen <= 16
                        else np.uint64)
    return np.concatenate(parts)
