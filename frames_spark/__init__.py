"""frames_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of acowley/Frames, re-expressed Spark-first
and extended with large-scale training-data pipeline operators.

See SURVEY.md for the reference mapping and architecture, USAGE.md for
the Frames -> frames_spark migration table. The flat namespace below
re-exports the operators a Frames user reaches for first; submodules
(`dedup`, `similarity`, `streaming`, `pipelines`, ...) hold the
extended surface.
"""

from frames_spark.dedup.cluster import (
    attach_components,
    connected_components,
    connected_components_star,
)
from frames_spark.dedup.editdist import edit1_pairs
from frames_spark.operators.aggregate import argmax, column_means, group_fold, mean_ratio
from frames_spark.operators.asof import asof_join
from frames_spark.operators.categorical import categories, encode, one_hot
from frames_spark.operators.expectations import (
    duplicate_keys,
    null_violations,
    orphans,
    out_of_range,
    profile,
)
from frames_spark.operators.diff import schema_diff, table_diff
from frames_spark.operators.funnel import funnel_counts, funnel_stages
from frames_spark.operators.grouped import ewma_per_key
from frames_spark.operators.scd import scd2_collapse
from frames_spark.functions.redact import redact
from frames_spark.pipelines.chunking import chunk_text, pack_docs
from frames_spark.dedup.contamination import contaminated_docs
from frames_spark.operators.core import (
    chunked,
    stack_frames,
    drop_rows,
    filter_rows,
    mutate,
    preview,
    project,
    rename,
    spread,
    take_rows,
    zip_frames,
)
from frames_spark.dedup.substring import excise_repeated_ngrams
from frames_spark.operators.joins import (
    anti_join,
    dim_join,
    inner_join,
    join,
    left_join,
    outer_join,
    right_join,
    semi_join,
)
from frames_spark.sources.feather import read_feather, write_feather_shards
from frames_spark.operators.melt import melt, pivot
from frames_spark.operators.missing import drop_missing, fill_defaults, keep_missing
from frames_spark.operators.rangejoin import interval_concurrency, range_join
from frames_spark.operators.sampling import (
    hash_sample,
    stratified_hash_sample,
    train_test_split,
    weighted_sample,
    weighted_sample_stratified,
)
from frames_spark.operators.skew import salted_join, salted_sum_count
from frames_spark.operators.window import running_sum, sessionize, topk_per_group
from frames_spark.session import get_spark
from frames_spark.similarity.centroid import centroids, component_means
from frames_spark.sources.binaryfiles import read_binary_dir
from frames_spark.sources.csv import infer_schema, read_csv, write_csv
from frames_spark.sources.jsonl import read_jsonl, write_jsonl
from frames_spark.sources.sink import (
    append_rollup_increment,
    compact,
    read_rollup,
    write_bucketed,
    write_clustered,
    write_partitioned,
)
from frames_spark.sources.tables import load_table, load_tables

__all__ = [
    "get_spark",
    # sources
    "read_csv", "write_csv", "infer_schema", "read_jsonl", "write_jsonl",
    "write_partitioned", "write_bucketed", "load_table", "load_tables",
    # row/column algebra
    "project", "filter_rows", "mutate", "rename", "take_rows", "drop_rows",
    "zip_frames", "stack_frames", "chunked", "spread", "preview",
    # aggregation
    "group_fold", "column_means", "mean_ratio", "argmax",
    # joins
    "join", "inner_join", "left_join", "right_join", "outer_join",
    "semi_join", "anti_join", "asof_join", "range_join",
    "salted_join", "salted_sum_count", "dim_join",
    # reshape / categorical / missing
    "melt", "pivot", "categories", "encode", "one_hot",
    "fill_defaults", "drop_missing", "keep_missing",
    # window analytics
    "topk_per_group", "running_sum", "sessionize",
    # deterministic sampling
    "hash_sample", "train_test_split", "stratified_hash_sample",
    "weighted_sample", "weighted_sample_stratified",
    # data quality
    "profile", "duplicate_keys", "orphans", "out_of_range",
    "null_violations",
    # dedup / similarity
    "connected_components", "connected_components_star", "attach_components", "edit1_pairs",
    "centroids", "component_means",
    # event analytics
    "funnel_stages", "funnel_counts", "interval_concurrency",
    "scd2_collapse", "ewma_per_key",
    # scale sinks / sources
    "read_binary_dir", "append_rollup_increment", "read_rollup",
    "write_clustered", "compact", "read_feather", "write_feather_shards",
    # training-corpus mechanics
    "chunk_text", "pack_docs", "contaminated_docs", "redact",
    "excise_repeated_ngrams",
    # dataset regression testing
    "table_diff", "schema_diff",
]
__version__ = "0.2.0"
