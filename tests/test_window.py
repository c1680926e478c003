"""The driver grades the first 50 queries() entries — pin the curated
window's invariants so a registration edit can't silently evict a graded
entry or push an oracle-less one into the hash-compared slots."""

from vul_dbgen_spark.queries.catalog import (
    GRADED_WINDOW,
    PLAN_CHANGED_THIS_ROUND,
    REGISTRY,
    queries,
)


def test_window_is_exactly_50_registered_oracle_backed_names():
    assert len(GRADED_WINDOW) == 50
    assert len(set(GRADED_WINDOW)) == 50
    for n in GRADED_WINDOW:
        assert n in REGISTRY, n
        assert REGISTRY[n].oracle is not None, f"{n}: graded slot needs an oracle"


def test_queries_leads_with_window_then_rest_of_registry():
    names = list(queries())
    assert names[:50] == GRADED_WINDOW
    assert sorted(names) == sorted(REGISTRY)


def test_window_keeps_survey_s2_analogs():
    # Round-6 anchor policy (catalog.py GRADED_WINDOW comment): one rep
    # per reference family stays pinned; the other §2 analogs (q3, j4,
    # a1, a6, f2, f3) rotated out in round 6 holding green driver rows
    # from rounds 1-5 — rotation may not evict a FAMILY, only a member
    # whose green row is already on record.
    must = {
        "q1_pricing_summary", "q5_region_revenue",   # TPC-H scan/join reps
        "j1_enrich_coalesce",                        # enrichment joins
        "a9_keyed_upsert_latest",                    # upsert/merge family
        "f1_year_gate",                              # filter-gate family
        "k1_bucket_split",                           # sink family
        "u1_union_dedup",                            # union-dedup family
        "w1_running_total",                          # window family
        "pipeline_e2e",                              # flagship composition
    }
    assert must <= set(GRADED_WINDOW)


def test_plan_changed_operators_stay_under_driver_grading():
    # Anchor policy as code (round-6 VERDICT directive #8): round 6
    # changed LPA's physical plan without keeping it in the graded
    # window — local parity covered it, but the policy exists precisely
    # so a plan change always earns a driver CORRECTNESS row. The list
    # is maintained in catalog.py in the same commit that changes an
    # operator; this test turns the omission into a CI failure.
    assert set(PLAN_CHANGED_THIS_ROUND) <= set(GRADED_WINDOW), (
        set(PLAN_CHANGED_THIS_ROUND) - set(GRADED_WINDOW)
    )
    for n in PLAN_CHANGED_THIS_ROUND:
        assert n in REGISTRY, n
