"""The driver grades the first 50 queries() entries — pin the curated
window's invariants so a registration edit can't silently evict a graded
entry or push an oracle-less one into the hash-compared slots."""

from vul_dbgen_spark.queries.catalog import GRADED_WINDOW, REGISTRY, queries


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
    must = {
        "q1_pricing_summary", "q3_shipping_priority", "q5_region_revenue",
        "j1_enrich_coalesce", "j4_anti_join_culling", "a1_regroup_order",
        "a6_merge_per_customer", "a9_keyed_upsert_latest", "f1_year_gate",
        "f2_severity_gate", "f3_marker_filter", "k1_bucket_split",
        "u1_union_dedup", "w1_running_total",
    }
    assert must <= set(GRADED_WINDOW)
