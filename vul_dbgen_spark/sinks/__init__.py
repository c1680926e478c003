"""Sinks (SURVEY.md §2.2): namespace-partitioned NDJSON ``.tb`` buffers
and the tar→gzip→AES-GCM database container."""
