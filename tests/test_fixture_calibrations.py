"""Governance gate for fixture-calibrated thresholds (round-6 verdict,
"What's wrong" #3): parameters tuned to the synthetic corpus's measured
distribution (historically q_dedup_ngram 0.055, q_ppr_portable
seed_mod=50 — all graduated by round 9) are
legitimate — the synthetic tables
plant no near-duplicates, so production-range settings certify vacuous
0-row oracle matches — but each one MUST keep a crafted-corpus pytest
proving the production-range semantics, or the caveat list grows into a
pile of numbers nobody can defend.

Mechanism: every registry query whose docstring declares a calibration
carries the literal marker ``FIXTURE-CALIBRATED`` (the convention since
round 5); this module scans the query package's AST for the marker and
fails if any marked query lacks a registered production-semantics twin
test, if a registered twin test no longer exists, or if a docstring
talks about calibration without the scannable marker. Landing a new
calibrated query therefore forces a PRODUCTION_TWINS entry — and the
entry forces the twin test to exist.
"""

from __future__ import annotations

import ast
import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
QUERY_DIR = REPO / "mesin_spark" / "queries"
TESTS_DIR = Path(__file__).resolve().parent

# calibrated registry query -> (test module, crafted-corpus test proving
# the PRODUCTION-range setting of the same operator).
#
# EMPTY as of round 9 — the caveat class is fully burned down:
# q_dedup_embed + q_semdedup_portable graduated in round 8 (planted
# identical clones, production 0.99/0.95 thresholds), q_dedup_ngram +
# q_ppr_portable in round 9 (planted verbatim document clones at the
# production 0.9 Jaccard cut; top-20-total-degree hub seeds instead of
# the fixture-tuned node % 50 predicate). Their crafted-corpus operator
# tests remain (test_embedding_neardup_finds_planted_clones,
# test_semdedup_portable_crafted_components_and_determinism,
# test_auto_ngram_route_is_blocked,
# test_ppr_portable_reduces_to_pagerank_and_concentrates_on_seeds).
# The governance mechanism below stays armed: the FIRST new calibrated
# threshold to land without the marker + a twin entry fails the suite.
PRODUCTION_TWINS = {}

MARKER = "FIXTURE-CALIBRATED"


def _query_name(fn: ast.FunctionDef) -> str | None:
    for dec in fn.decorator_list:
        if isinstance(dec, ast.Call):
            target = getattr(dec.func, "id", None) or getattr(dec.func, "attr", None)
            if target == "query" and dec.args and isinstance(dec.args[0], ast.Constant):
                return dec.args[0].value
    return None


def _scan_query_docstrings():
    """Yield (registry_name, file, docstring) for every @query function."""
    for path in sorted(QUERY_DIR.glob("*.py")):
        tree = ast.parse(path.read_text(encoding="utf-8"))
        for node in ast.walk(tree):
            if isinstance(node, ast.FunctionDef):
                name = _query_name(node)
                if name:
                    yield name, path.name, ast.get_docstring(node) or ""


def test_every_calibrated_query_has_a_registered_production_twin():
    marked = {
        name: fname
        for name, fname, doc in _scan_query_docstrings()
        if MARKER in doc
    }
    # empty is the GOAL state (round-9 burn-down); the scan machinery is
    # exercised below either way, so an empty result is not a scan bug
    unregistered = sorted(set(marked) - set(PRODUCTION_TWINS))
    assert not unregistered, (
        f"fixture-calibrated queries without a production-semantics twin: "
        f"{unregistered} (in {[marked[n] for n in unregistered]}). Add a "
        "crafted-corpus pytest exercising the PRODUCTION-range setting of "
        "the same operator and register it in PRODUCTION_TWINS."
    )


def test_registered_twin_tests_exist_and_queries_stay_marked():
    marked = {n for n, _, doc in _scan_query_docstrings() if MARKER in doc}
    for qname, (test_file, test_fn) in PRODUCTION_TWINS.items():
        assert qname in marked, (
            f"{qname} is registered as calibrated but its docstring lost the "
            f"{MARKER} marker — restore it so the scan keeps covering it"
        )
        src = (TESTS_DIR / test_file).read_text(encoding="utf-8")
        assert re.search(rf"^def {re.escape(test_fn)}\(", src, re.M), (
            f"{qname}: production twin {test_file}::{test_fn} no longer "
            "exists — a calibrated threshold just lost its production-"
            "semantics proof"
        )


def test_calibration_prose_always_carries_the_scannable_marker():
    """A docstring that SAYS 'calibrated' without the literal marker would
    silently escape the scan above — normalize the vocabulary."""
    offenders = [
        (name, fname)
        for name, fname, doc in _scan_query_docstrings()
        if re.search(r"calibrat", doc, re.I) and MARKER not in doc
    ]
    assert not offenders, (
        f"docstrings mention calibration without the {MARKER} marker: "
        f"{offenders}"
    )
