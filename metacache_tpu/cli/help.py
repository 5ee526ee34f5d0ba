"""Per-mode documentation (reference: mode_help.cpp serves docs/*.txt)."""
from __future__ import annotations

MODES = {
    "build": """\
metacache_tpu build — build a new database from reference sequences

USAGE: python -m metacache_tpu build <database> <sequence file/dir>... [OPT]

  -taxonomy <dir>      NCBI taxonomy dump directory (nodes/names/merged.dmp)
  -taxpostmap <f>...   accession->taxid files applied after the build
  -sequence-id-format  smart|ncbi|ncbi_acc|ncbi_acc_ver|filename|
                       leading_word|genbank
  -kmerlen <k>         k-mer length (default 16, max 16)
  -sketchlen <s>       features per window sketch (default 16)
  -winlen <w>          window length (default 127)
  -winstride <l>       window stride (default w-k+1)
  -max-locations-per-feature <n>   cap location lists (default 254)
  -remove-overpopulated-features   drop features at the cap
  -remove-ambig-features / -max-ambig-per-feature <n> / -ambig-rank <r>
  -parts <n>           build/store the table in n parts
  -reset-taxa          clear target taxon assignments first
""",
    "modify": """\
metacache_tpu modify — add reference sequences to an existing database

USAGE: python -m metacache_tpu modify <database> <sequence file/dir>... [OPT]

Same options as build; the database's sketching parameters are kept.
""",
    "query": """\
metacache_tpu query — classify reads against a database

USAGE: python -m metacache_tpu query <database> [<reads file/dir>...] [OPT]

With no input files an interactive session starts: each stdin line is
parsed as `[options] <files>` (the database stays loaded).

classification:
  -lowest/-highest <rank>  rank range (default sequence..domain)
  -hitmin <t>    minimum hits (default: from database sketchlen)
  -hitdiff <p>   candidate inclusion threshold percentage (default 100)
  -maxcand <n>   candidates per query (default 2)
  -insertsize <n>  max paired-end insert size
  -cov-percentile <p>  two-pass coverage filtering
pairing: -pairfiles | -pairseq
output:  -taxids -taxids-only -omit-ranks -separate-cols -lineage
         -queryids -mapped-only -no-map -no-summary -separator <s>
analysis: -tophits -allhits -locations -align -hits-per-ref [<f>]
          -abundances [<f>] -abundance-per <rank>
evaluation: -precision -ground-truth -taxon-coverage
performance: -batch-size <n> -query-limit <n> -threads <n>
database: -part <p> -remove-overpopulated-features
          -max-locations-per-feature <n>
I/O: -out <f> -split-out <f> -min-readlen <n> -max-readlen <n>
""",
    "build+query": """\
metacache_tpu build+query — build a database in memory and query it

USAGE: python -m metacache_tpu build+query -targets <seqs>...
           [-query <reads>...] [build options] [query options]

  -save-db <file>  persist the built database after querying
""",
    "merge": """\
metacache_tpu merge — merge per-partition query results

USAGE: python -m metacache_tpu merge <results file>... -taxonomy <dir> [OPT]

Result files must have been produced with `-tophits -queryids -lowest
species` (or any rank above sequence). Candidate `taxid:hits` lists are
combined and queries re-classified against the given taxonomy.
""",
    "info": """\
metacache_tpu info — show database information

USAGE: python -m metacache_tpu info <database> [WHAT]

WHAT: basic (default) | targets | lineages | ranks | config |
      statistics | featuremap | featurecounts
""",
}


def mode_help(args) -> int:
    if args and args[0] in MODES:
        print(MODES[args[0]])
        return 0
    from .main import HELP
    print(HELP)
    if args:
        print(f"no documentation for '{args[0]}'")
    return 0
