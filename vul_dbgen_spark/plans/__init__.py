"""Mid-pipeline dataflow plans (SURVEY.md §2.4/§2.5): namespacing
regroup, NVD enrichment, affected-version backfill, keyed upserts."""
