#!/usr/bin/env bash
# Generate golden outputs for the parity tests by running the *reference*
# CPU binary (muellan/metacache) over the synthetic fixture.
#
# Usage:  METACACHE_BIN=/path/to/metacache tests/make_goldens.sh
#
# The goldens are committed; this script only needs to be re-run when the
# fixture generator changes.
set -euo pipefail

HERE="$(cd "$(dirname "$0")" && pwd)"
DATA="$HERE/data"
GOLD="$DATA/golden"
BIN="${METACACHE_BIN:?set METACACHE_BIN to the reference metacache binary}"
TAXDIR="${TAXONOMY_DIR:-$DATA/taxonomy}"
WORK="$(mktemp -d)"
trap 'rm -rf "$WORK"' EXIT

mkdir -p "$GOLD"

DB="$WORK/testdb"

# --- build the database (single part, defaults: k16 s16 w127) -------------
"$BIN" build "$DB" "$DATA/genomes.fa" -taxonomy "$TAXDIR" -parts 1 \
    > "$WORK/build.log" 2>&1

# db info for parity of metadata reporting
"$BIN" info "$DB" > "$GOLD/info_basic.txt" 2>/dev/null || true

strip_variable_lines() {
    # drop timing/speed/threads lines and absolute paths, like test/run_tests
    grep -v -e "# time:" -e "# speed:" -e "threads" -e "$DATA" -e "$WORK"
}

run_query() {  # args: outfile, then query args...
    local out="$1"; shift
    "$BIN" query "$DB" "$@" 2>/dev/null | strip_variable_lines > "$GOLD/$out"
}

# --- classification goldens ----------------------------------------------
COMMON=(-mapped-only)

run_query classified_single_fa.txt "$DATA/reads_single.fa" \
    -precision -ground-truth -tophits -allhits -hits-per-ref \
    -abundances -abundance-per species
run_query classified_single_fq.txt "$DATA/reads_single.fq" \
    -precision -ground-truth -tophits
run_query classified_long_fa.txt "$DATA/reads_long.fa" \
    -precision -ground-truth -tophits
run_query classified_pairfiles.txt \
    "$DATA/reads_pair1.fa" "$DATA/reads_pair2.fa" -pairfiles \
    -precision -ground-truth -tophits
run_query classified_pairseq.txt "$DATA/reads_pairseq.fa" -pairseq \
    -precision -ground-truth -tophits

# --- alignment display (-align): paths tokenized so the golden is
# location-independent (the "aligned to <file>" line embeds them) -------
"$BIN" query "$DB" "$DATA/reads_single.fa" -align -tophits 2>/dev/null \
    | sed "s|$DATA|DATA|g" | strip_variable_lines > "$GOLD/align.txt"

# --- formatting matrix (subset of reference test/run_tests fmt matrix) ----
i=0
while read -r fmt; do
    run_query "fmt_$i.txt" "$DATA/reads_single.fa" $fmt
    i=$((i+1))
done <<'EOF'

-lineage
-taxids
-taxids-only
-taxids-only -omit-ranks
-omit-ranks
-taxids -omit-ranks
-separate-cols
-taxids -separate-cols
-taxids-only -separate-cols -omit-ranks
-queryids
-queryids -lineage
-mapped-only
-separator :::
-lowest species
-lowest genus -taxids
-hitmin 8
-hitdiff 50
-maxcand 4 -tophits
EOF

echo "goldens written to $GOLD"

# --- partitioned query + merge golden -------------------------------------
python - <<'PYEOF'
import sys
sys.path.insert(0, "$HERE/..")
from metacache_tpu.seqio.reader import read_sequences
recs = list(read_sequences("$DATA/genomes.fa"))
for name, rs in [("$WORK/part_a.fa", recs[:3]), ("$WORK/part_b.fa", recs[3:])]:
    with open(name, "w") as f:
        for r in rs:
            f.write(f">{r.header}\n{r.seq.decode()}\n")
PYEOF
"$BIN" build "$WORK/dbA" "$WORK/part_a.fa" -taxonomy "$TAXDIR" -parts 1 >/dev/null 2>&1
"$BIN" build "$WORK/dbB" "$WORK/part_b.fa" -taxonomy "$TAXDIR" -parts 1 >/dev/null 2>&1
"$BIN" query "$WORK/dbA" "$DATA/reads_single.fa" -lowest species -queryids -tophits -no-summary > "$GOLD/partition_resA.txt" 2>/dev/null
"$BIN" query "$WORK/dbB" "$DATA/reads_single.fa" -lowest species -queryids -tophits -no-summary > "$GOLD/partition_resB.txt" 2>/dev/null
(cd "$GOLD" && "$BIN" merge partition_resA.txt partition_resB.txt \
    -taxonomy "$TAXDIR" -lowest species -abundances 2>/dev/null) | \
    strip_variable_lines > "$GOLD/merged.txt"

# --- 64-bit kmer config (k = 18) ------------------------------------------
# Requires a reference binary compiled with -DMC_KMER_TYPE=uint64_t
# (make release MACROS='-DMC_KMER_TYPE=uint64_t'); set METACACHE_BIN64.
if [ -n "${METACACHE_BIN64:-}" ]; then
    DB18="$WORK/db18"
    "$METACACHE_BIN64" build "$DB18" "$DATA/genomes.fa" \
        -taxonomy "$TAXDIR" -parts 1 -kmerlen 18 >/dev/null 2>&1
    "$METACACHE_BIN64" query "$DB18" "$DATA/reads_single.fa" \
        -mapped-only -precision -ground-truth -tophits 2>/dev/null \
        | strip_variable_lines > "$GOLD/k18_single.txt"
    "$METACACHE_BIN64" query "$DB18" "$DATA/reads_long.fa" \
        -precision -ground-truth -tophits 2>/dev/null \
        | strip_variable_lines > "$GOLD/k18_long.txt"
    "$METACACHE_BIN64" query "$DB18" "$DATA/reads_pair1.fa" \
        "$DATA/reads_pair2.fa" -pairfiles -precision -tophits \
        2>/dev/null | strip_variable_lines > "$GOLD/k18_pairfiles.txt"
    "$METACACHE_BIN64" info "$DB18" statistics 2>/dev/null \
        | strip_variable_lines > "$GOLD/k18_info_stats.txt"
fi
