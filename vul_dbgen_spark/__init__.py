"""vul_dbgen_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of neuvector/vul-dbgen.

Layout
------
- ``functions``  : scalar semantics (dpkg version order, severity calibration,
                   opcode version-range mini-language, text analysis).
- ``sources``    : one reader per vulnerability feed (explicit StructType
                   schemas, Catalyst-native parse).
- ``operators``  : source-agnostic dataflow operators (enrichment joins,
                   namespacing regroup, keyed upsert, dedup, similarity,
                   as-of join).
- ``sinks``      : partitioned dual-projection NDJSON writes + the
                   tar/gzip/AES-GCM container packager.
- ``plans``      : end-to-end pipelines (the reference's ``main``).
- ``streaming``  : Structured Streaming variants of the batch operators.
- ``queries``    : the graded query catalog over the synthetic star schema
                   (driver correctness/bench harness).

Everything is DataFrame/SQL-first: Catalyst handles pushdown, pruning and
join strategy; Python/pandas UDFs appear only where semantics are genuinely
non-standard (dpkg version comparison, OVAL DNF expansion).
"""

__version__ = "0.1.0"
