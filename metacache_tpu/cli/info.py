"""Info mode (reference: src/mode_info.cpp:255-287)."""
from __future__ import annotations

import sys


def show_info(argv) -> int:
    from ..db.database import Database
    from ..taxonomy.model import Rank, rank_name, rank_from_name

    if not argv:
        print("usage: info <database> "
              "[targets|lineages|ranks|statistics|featurecounts]",
              file=sys.stderr)
        return 1
    dbfile = argv[0]
    what = argv[1] if len(argv) > 1 else "basic"
    metadata_only = what in ("basic", "targets", "lineages", "ranks",
                             "config")
    db = Database.load(dbfile, metadata_only=metadata_only)

    sk = db.sketching
    print("------------------------------------------------")
    print(f"metacache_tpu database (format {1})")
    print("------------------------------------------------")
    print(f"target id type     uint32 32 bits")
    print(f"window id type     uint32 32 bits")
    print(f"window length      {sk.winlen}")
    print(f"window stride      {sk.winstride}")
    print(f"kmer size          {sk.kmerlen}")
    print(f"sketch size        {sk.sketchlen}")
    print(f"max. locations     {db.max_locations_per_feature}")
    print("------------------------------------------------")
    print(f"targets            {db.target_count}")
    print(f"taxa in tree       {len(db.taxa.taxonomy.taxa)}")
    if not metadata_only:
        print(f"features           {db.feature_count}")
        print(f"locations          {db.location_count}")
        for i, p in enumerate(db.parts):
            mean, std, skew, mx = p.location_list_size_statistics()
            print(f"part {i}: buckets {p.num_features} "
                  f"bucket size max: {mx} mean: {mean:g} +/- {std:g} "
                  f"<> {skew:g}")
    print("------------------------------------------------")

    if what == "targets":
        db.taxa.update()
        for tid, t in enumerate(db.taxa.target_taxa):
            if t is None:
                continue
            src = t.source
            print(f"{t.name}:")
            print(f"    source:     {src.filename} / {src.index}")
            print(f"    windows:    {src.windows}")
            lin = db.taxa.cached_ranks_of_target(tid)
            parts = [f"{rank_name(Rank(r))}:{x.name}"
                     for r, x in enumerate(lin) if x is not None]
            print("    lineage:    " + ", ".join(parts))
    elif what == "ranks":
        from collections import Counter
        db.taxa.update()
        counts = Counter()
        for tid in range(db.target_count):
            lin = db.taxa.cached_ranks_of_target(tid)
            for r in range(1, len(lin)):
                if lin[r] is not None:
                    counts[r] += 1
                    break
        for r, c in sorted(counts.items()):
            print(f"{rank_name(Rank(r))}: {c}")
    elif what == "lineages":
        db.taxa.update()
        for tid in range(db.target_count):
            t = db.taxa.cached_taxon_of_target(tid)
            lin = db.taxa.cached_ranks_of_target(tid)
            ids = "\t".join(str(x.id) if x else "0" for x in lin)
            print(f"{t.name}\t{ids}")
    elif what == "featurecounts":
        for i, p in enumerate(db.parts):
            print(f"# part {i}: {p.num_features} features")
            for f, s in zip(p.unique_features, p.bucket_sizes()):
                print(f"{f} {s}")
    elif what == "featuremap":
        # feature -> location dump (reference: mode_info featuremap)
        from ..ops.table import unpack_locations
        for i, p in enumerate(db.parts):
            print(f"# part {i}: {p.num_features} features")
            tgts, wins = unpack_locations(p.locations)
            for j in range(p.num_features):
                lo, hi = p.offsets[j], p.offsets[j + 1]
                locs = ",".join(f"{tgts[x]}:{wins[x]}"
                                for x in range(lo, hi))
                print(f"{p.unique_features[j]} {hi - lo} {locs}")
    elif what == "statistics":
        pass  # statistics are printed in the property block above
    return 0
