"""Document chunking and sequence packing for training pipelines.

`chunk_text` splits long documents into overlapping ~max_tokens
windows (the pretraining / RAG-ingest chunker) as pure array
expressions: tokenize once, slide with sequence()+slice() — no
explode of individual tokens, no Python. One row in, ceil(n/stride)
rows out, all computed inside the scan stage.

`pack_docs` assigns documents to fixed-capacity bins (context
windows) by contiguous prefix-sum packing: bin = floor(exclusive
cumulative token count / capacity) within each group, ordered by a
deterministic key. This is concat-then-split packing (what training
data loaders actually do), not bin-packing optimization — and it's
one window pass, parallel across groups. The window is keyed by the
group column (e.g. source shard): never a global single-partition
cumsum at 100 TB.

Frames ref: none (no text pipeline in Frames); scale extension
surface (SURVEY.md §2b).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from frames_spark.functions.text import tokens


def chunk_text(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 256,
    overlap: int = 32,
) -> DataFrame:
    """(id, chunk_idx, chunk_text, n_chunk_tokens); stride =
    max_tokens - overlap. Empty docs produce no chunks."""
    if not 0 <= overlap < max_tokens:
        raise ValueError("need 0 <= overlap < max_tokens")
    stride = max_tokens - overlap
    from frames_spark.functions.binding import let

    # token array LET-BOUND (r15): the chunk lambda captures it, and
    # interpreted HOF eval re-tokenized the document once per chunk.
    def with_toks(toks):
        starts = F.sequence(
            F.lit(1), F.greatest(F.size(toks), F.lit(1)), F.lit(stride)
        )
        return F.transform(starts, lambda s: F.slice(toks, s, max_tokens))

    chunks = let(tokens(F.col(text_col)), with_toks)
    exploded = df.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "__ctoks")
    ).filter(F.size("__ctoks") > 0)
    return exploded.select(
        id_col,
        "chunk_idx",
        F.array_join(F.col("__ctoks"), " ").alias("chunk_text"),
        F.size("__ctoks").cast("long").alias("n_chunk_tokens"),
    )


def pack_docs(
    df: DataFrame,
    group: str,
    order: str,
    n_tokens: str,
    capacity: int,
) -> DataFrame:
    """(group, order, n_tokens, bin, bin_offset): contiguous packing
    into ``capacity``-token bins per group. bin_offset is the doc's
    start position inside its bin's token stream."""
    w = (
        Window.partitionBy(group)
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = F.coalesce(F.sum(n_tokens).over(w), F.lit(0))
    return df.select(
        group, order, n_tokens,
        F.floor(prefix / capacity).cast("long").alias("bin"),
        (prefix % capacity).cast("long").alias("bin_offset"),
    )
