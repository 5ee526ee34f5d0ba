#!/usr/bin/env python
"""Convert `-abundances` output into Krona-compatible text input.

Counterpart of the reference's krona-from-abundances.py: extracts the
abundance table from a result file and emits `count<TAB>lineage...` rows
suitable for `ktImportText` (KronaTools), or a plain TSV when KronaTools
is not installed.

usage: krona-from-abundances.py <resultfile> [-taxonomy <dir>] [-out <f>]
"""
import os
import sys


def parse_abundances(path):
    """-> list of (rank, name, taxid, count)."""
    rows = []
    in_table = False
    with open(path) as f:
        for line in f:
            if line.startswith("#") and "rank:name" in line:
                in_table = True
                continue
            if not in_table:
                continue
            if line.startswith("#") or not line.strip():
                in_table = False
                continue
            cols = [c.strip() for c in line.split("|")]
            if len(cols) < 4 or cols[0].startswith("unclassified"):
                continue
            rank_name = cols[0]
            if ":" not in rank_name:
                continue
            rank, name = rank_name.split(":", 1)
            try:
                taxid = int(cols[1])
                count = float(cols[2])
            except ValueError:
                continue
            rows.append((rank, name, taxid, count))
    return rows


def main():
    args = sys.argv[1:]
    if not args:
        print(__doc__)
        return 1
    taxdir = None
    out = None
    files = []
    i = 0
    while i < len(args):
        if args[i] == "-taxonomy":
            taxdir = args[i + 1]
            i += 2
        elif args[i] == "-out":
            out = args[i + 1]
            i += 2
        else:
            files.append(args[i])
            i += 1

    lineage_of = None
    if taxdir:
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        from metacache_tpu.taxonomy import ncbi
        from metacache_tpu.taxonomy.model import TaxonomyCache, Rank
        tax = ncbi.make_taxonomic_hierarchy(
            os.path.join(taxdir, "nodes.dmp"),
            os.path.join(taxdir, "names.dmp"),
            os.path.join(taxdir, "merged.dmp"))
        cache = TaxonomyCache(tax)

        def lineage_of(taxid):
            t = cache.taxon_with_id(taxid)
            if t is None:
                return []
            lin = cache.cached_ranks(t)
            return [x.name for x in reversed(lin) if x is not None]

    stream = open(out, "w") if out else sys.stdout
    for path in files:
        for (rank, name, taxid, count) in parse_abundances(path):
            if lineage_of:
                lin = lineage_of(taxid) or [name]
            else:
                lin = [name]
            stream.write(f"{count:g}\t" + "\t".join(lin) + "\n")
    if out:
        stream.close()
        print(f"krona text written to {out}; render with: "
              f"ktImportText {out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
