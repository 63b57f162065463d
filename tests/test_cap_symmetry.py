"""Standing cap-symmetry rule (r14 VERDICT item 2 / r15 item 3).

Eleven catalog rows pin a contract-fixture size with a corpus cap
(``.filter(F.col(key) < N)``) because their oracled property is
corpus-size-independent while their work is deliberately
super-linear — the caps were found and proven by the r14 full-catalog
sf1 sweep. Two invariants must hold for EVERY such cap, forever:

1. **Engine symmetry (enforced here, statically).** The cap must
   appear in BOTH engines: every Spark-side line marked
   ``# contract-corpus cap`` inside a registered row's function must
   have a matching ``key < N`` predicate in that row's DuckDB oracle
   SQL. An asymmetric cap silently shrinks one engine's corpus and
   the differential only catches it at a scale where the cap bites
   (>= sf0.1 for most of these), which the driver never runs.

2. **Cross-engine receipt at a cap-biting scale (procedural; see
   PLANS.md round-close checklist).** A NEW cap ships only with one
   recorded cross-engine differential run at a scale where the cap
   binds (sf1 via tools/gen_sf.py + tools/check_oracle.py). The
   pinned row set below forces any new cap to touch this file — read
   the checklist entry before extending the set.

History: the sf1 symmetry sweep caught ``dedup_minhash_near_dups``
violating its own docstring precondition at 5,000 docs (recall gate
latently red at any sf >= 0.1 since creation); static symmetry alone
would NOT have caught that — hence invariant 2.
"""

from __future__ import annotations

import re
from pathlib import Path

CATALOG_DIR = (
    Path(__file__).resolve().parents[1]
    / "hummingbirddatapipeline_spark"
    / "catalog"
)

MARKER = "contract-corpus cap"

# Pinned registry of capped rows. Adding a cap without extending this
# set fails test_capped_row_set_is_pinned — deliberately, so the
# author reads the standing rule in the module docstring.
EXPECTED_CAPPED_ROWS = {
    "dedup_cluster_cohesion",
    "dedup_incremental_batch",
    "dedup_minhash_near_dups",
    "er_fellegi_sunter_scores",
    "er_fuzzy_join_levenshtein",
    "geo_radius_join_suppliers",
    "similarity_banded_widened_clusters",
    "similarity_near_dup_clusters",
    "similarity_near_dup_embeddings",
    "stream_dedup_incremental",
    "text_jaccard_near_dups",
}

_CAP_RE = re.compile(r'F\.col\(\s*"(\w+)"\s*\)\s*<\s*(\w+)')


def _collect_spark_caps():
    """(row_name, key, bound:int) for every marked cap line, resolved
    against the live module (constants like _WIDENED_FIXTURE_CAP)."""
    import importlib

    caps = []
    for path in sorted(CATALOG_DIR.glob("*_q.py")) + [
        CATALOG_DIR / "relational.py"
    ]:
        lines = path.read_text().splitlines()
        mod = importlib.import_module(
            f"hummingbirddatapipeline_spark.catalog.{path.stem}"
        )
        fn = None
        for ln in lines:
            m = re.match(r"def (\w+)", ln)
            if m:
                fn = m.group(1)
            code = ln.split("#", 1)[0]
            comment = ln[len(code):]
            if MARKER not in comment:
                continue
            found = _CAP_RE.findall(code)
            assert found, (
                f"{path.name}: marked cap line has no parsable "
                f"F.col(...) < bound predicate: {ln.strip()!r}"
            )
            for key, bound in found:
                val = int(bound) if bound.isdigit() else getattr(mod, bound)
                caps.append((fn, key, int(val), path.name))
    return caps


def test_every_spark_cap_has_a_matching_oracle_cap():
    from hummingbirddatapipeline_spark.catalog import ORACLES, QUERIES

    caps = _collect_spark_caps()
    assert caps, "cap scanner found nothing — marker comment drifted?"
    for fn, key, val, fname in caps:
        assert fn in QUERIES, (
            f"{fname}: marked cap in {fn} which is not a registered "
            "row — move the marker into the row function or register it"
        )
        assert fn in ORACLES, f"{fname}: capped row {fn} has no oracle"
        sql = ORACLES[fn]
        pat = re.compile(rf"\b{re.escape(key)}\s*<\s*{val}\b")
        assert pat.search(sql), (
            f"cap asymmetry: {fn} filters {key} < {val} on the Spark "
            f"side but its DuckDB oracle has no matching predicate — "
            "the differential would silently compare different corpora "
            "at any scale where the cap bites"
        )


def test_capped_row_set_is_pinned():
    rows = {fn for fn, _, _, _ in _collect_spark_caps()}
    assert rows == EXPECTED_CAPPED_ROWS, (
        "capped-row set changed: "
        f"added={sorted(rows - EXPECTED_CAPPED_ROWS)}, "
        f"removed={sorted(EXPECTED_CAPPED_ROWS - rows)}. A new cap "
        "must ship with an sf1 cross-engine symmetry receipt (PLANS.md "
        "round-close checklist) — record it, then extend "
        "EXPECTED_CAPPED_ROWS."
    )
