"""Document chunking: fixed-size overlapping windows over text.

The step between RAW documents and model-ready samples in an LLM data
pipeline: long documents split into bounded chunks (embedding models and
context windows have hard limits), with overlap so no semantic boundary
is lost to a hard cut.

Shape: pure column expressions — per-doc chunk index via ``sequence`` +
``explode``, slices via ``substring`` with column offsets; no UDF, no
shuffle at all (chunking is embarrassingly row-local; the output
partitioning inherits the scan's). Character-addressed and deterministic,
so the DuckDB oracle mirrors it with generate_series + substr.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    size: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """Split each document into ``size``-char chunks starting every
    ``size - overlap`` chars (chunk i covers [i·step, i·step + size)).

    Empty documents produce zero chunks; the final chunk may be shorter
    than ``size``. Returns (id, chunk_idx, chunk, chunk_len).
    """
    if not 0 <= overlap < size:
        raise ValueError("require 0 <= overlap < size")
    step = size - overlap
    n_chunks = F.ceil(F.length(text_col) / F.lit(step)).cast("int")
    chunk = F.substring(
        F.col(text_col), F.col("chunk_idx") * step + 1, F.lit(size)
    )
    return (
        df.filter(F.length(text_col) > 0)
        .select(
            F.col(id_col),
            F.col(text_col),
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
        )
        .select(
            id_col,
            "chunk_idx",
            chunk.alias("chunk"),
            F.length(chunk).alias("chunk_len"),
        )
    )
