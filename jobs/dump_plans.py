"""Dump .explain('formatted') for declared queries to files (judge
deliverable: plans/r06/<query>_{before,after}.txt).

Usage: python jobs/dump_plans.py <out_dir> <suffix> [query ...]
Runs from the repo root on sys.path[0]'s tree — run it from a git
worktree of the round-start commit for the _before set.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from addresses_importer_spark.operators import components as _components  # noqa: E402
from addresses_importer_spark.operators import signatures as _signatures  # noqa: E402
from addresses_importer_spark.plans import driver_queries as DQ  # noqa: E402
from addresses_importer_spark.session import get_spark  # noqa: E402

def _disable_materialize() -> None:
    """Show FULL lineage: the contract chain cuts lineage with
    localCheckpoint (materialize) at several links, which makes
    .explain() stop at an ExistingRDD scan and hide the part of the
    plan the optimization claims are about. Identity-patching
    materialize in every consuming module keeps the whole logical
    chain in one plan (plans dumped here are for READING; bench.py
    still runs the real materialized chain). Called from main() only —
    importing this module must never alter the engine."""
    for mod in (_signatures, _components, DQ):
        if hasattr(mod, "materialize"):
            mod.materialize = lambda df, eager=True: df

DEFAULT_QUERIES = [
    "minhash_signatures", "lsh_candidates", "verified_pairs",
    "suffix_verified", "doc_fingerprint", "ngram_jaccard_pairs",
    "dedup_rate_curve", "embedding_near_dup_lsh", "dedup_survivors",
]


def main() -> None:
    _disable_materialize()
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or DEFAULT_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="dump_plans", cores=int(
        os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count())
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = DQ.QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
