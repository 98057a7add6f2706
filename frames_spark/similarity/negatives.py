"""Hard-negative mining for contrastive / embedding training.

For every anchor vector, find the k most-similar vectors carrying a
DIFFERENT label — the negatives that actually move a contrastive
loss (Schroff et al. 2015 FaceNet "semi-hard" mining; the standard
prep step before training a retrieval or dedup embedding model).

Scale shape (the 100 TB posture):
- candidates come from multi-table hyperplane LSH — the
  dedup/embedding.py shared sign-array pass (one scan computes every
  table's bucket), never an all-pairs join;
- the label filter runs inside the bucket self-join, before the
  cross-table dedupe, so pairs failing the label predicate never
  reach the exact cosine — and the join carries LIGHT (id, label)
  rows only, the vectors joining back once per side after the
  distinct;
- ``max_bucket`` drops degenerate buckets ahead of the quadratic
  expansion (mirrored in the oracle), exactly like near_dup_pairs_lsh;
- the exact fixed-point cosine runs once per deduped (anchor,
  candidate) pair; top-k per anchor is one window over the
  candidate set (anchor-partitioned — the shuffle key is the anchor
  id, unskewed by construction since every anchor emits O(bucket)
  candidates).

Recall is the LSH AND-OR curve, not 1.0 — for mining that is the
point (any sufficiently-similar negative is a useful negative); the
deterministic md5 planes make the candidate set reproducible across
engines, which is what lets q_hard_negatives carry a full value
oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from frames_spark.dedup.embedding import table_buckets
from frames_spark.functions.vectors import (
    cosine_from_fixed,
    dot_fixed,
    norm2_fixed,
    to_fixed,
)

__all__ = ["hard_negatives_lsh", "hard_positives_lsh", "mine_triplets"]


def _banded_relation(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    num_planes: int,
    num_tables: int,
    dim: int,
) -> tuple[DataFrame, DataFrame]:
    """(base, banded): the fixed-point base relation and the
    PERSISTED light (vid, lbl, tbl, bucket) banding — one sign pass
    computes every table's bucket. Shared by the single-direction
    miners and the fused triplet miner."""
    from frames_spark.operators.core import spread

    base = (
        spread(df)
        .select(
            F.col(id_col).alias("vid"),
            to_fixed(F.col(vec_col)).alias("fvec"),
            F.col(label_col).alias("lbl"),
        )
        .withColumn("n2", norm2_fixed(F.col("fvec")))
    )
    tables = table_buckets(num_tables, num_planes, dim)
    # LIGHT bucket rows only — (vid, lbl, tbl, bucket); the 64-dim
    # vectors never enter the quadratic expansion (see _mined_topk_lsh
    # scale note).
    banded = (
        base.select("vid", "lbl", F.explode(tables).alias("b"))
        .select(
            "vid", "lbl",
            F.col("b.tbl").alias("tbl"), F.col("b.bucket").alias("bucket"),
        )
        .persist()
    )
    return base, banded


def _ok_buckets(
    banded: DataFrame, num_planes: int, max_bucket: int, guard: str
) -> DataFrame:
    """Non-degenerate buckets (2 <= n <= max_bucket), after the
    dropped-mass guard (r10 verdict #1): if the max_bucket filter
    would drop more than HALF the directed candidate-pair mass,
    'raise' (default) fails loudly with the measured ppm, 'warn'
    proceeds with a warning, 'off' skips the check. One tiny
    aggregate over the persisted banding the candidate join re-reads
    anyway."""
    sizes = banded.groupBy("tbl", "bucket").agg(
        F.count(F.lit(1)).alias("n")
    )
    if guard not in ("raise", "warn", "off"):
        raise ValueError(f"guard must be raise|warn|off, got {guard!r}")
    if guard != "off":
        pair_mass = F.col("n") * (F.col("n") - 1)
        m = sizes.agg(
            F.sum(pair_mass).alias("tot"),
            F.sum(
                F.when(F.col("n") > max_bucket, pair_mass).otherwise(
                    F.lit(0)
                )
            ).alias("dropped"),
        ).first()
        tot = m["tot"] or 0
        dropped = m["dropped"] or 0
        if tot and dropped * 2 > tot:
            ppm = dropped * 1_000_000 // tot
            msg = (
                f"max_bucket={max_bucket} drops {ppm} ppm of the "
                f"candidate-pair mass ({dropped} of {tot} directed "
                f"pairs) — num_planes={num_planes} is too few for "
                "this corpus; raise it (see dedup.embedding."
                "suggest_num_planes) or pass guard='warn'/'off'"
            )
            if guard == "raise":
                raise ValueError(msg)
            import warnings

            warnings.warn(msg, stacklevel=4)
    return sizes.filter(F.col("n").between(2, max_bucket)).select(
        "tbl", "bucket"
    )


def _mined_topk_lsh(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    k: int,
    same_label: bool,
    ascending: bool,
    num_planes: int,
    num_tables: int,
    dim: int,
    max_bucket: int,
    guard: str = "raise",
) -> DataFrame:
    """Shared miner: per anchor, the k hardest bucket-mates under the
    label predicate — most-similar different-label (negatives) or
    least-similar same-label (positives), FaceNet's two "hardest"
    directions. (anchor_id, cand_id, cosine, rank).

    ``guard`` governs the dropped-mass check (r10 verdict #1): the
    max_bucket filter exists to skip DEGENERATE buckets, but with too
    few planes for the corpus size it can drop EVERY bucket and the
    miner "succeeds" with zero candidates. Before the quadratic
    expansion, one tiny aggregate over the (persisted) bucket-size
    relation measures the directed-pair mass the guard would drop;
    if that exceeds HALF the total mass, 'raise' (default) fails
    loudly with the measured ppm, 'warn' proceeds with a warning,
    'off' skips the check. The size relation is persisted either
    way, so the check re-reads a cache the candidate join needs
    anyway — the sign pass over the vectors runs once, not three
    times (agg side + both join probe sides).

    Scale note on the LIGHT banding (see _banded_relation): the
    64-dim vectors never enter the quadratic expansion — pairs dedupe
    as bare id pairs and the vectors join back ONCE per side after
    the distinct. At sf0.1 this is a modest win (~7% — the time is
    the exact cosines on the ~40%-of-all-pairs candidate set the
    recall-oriented 4-plane/8-table parameters produce), but the
    asymptotics matter: a collect_list(struct(fvec)) bucket would
    materialize every vector once per bucket-mate, i.e. O(bucket^2)
    vector copies per bucket as sizes approach max_bucket, where
    this form stays O(bucket) until the post-distinct join."""
    base, banded = _banded_relation(
        df, id_col, vec_col, label_col, num_planes, num_tables, dim
    )
    ok = _ok_buckets(banded, num_planes, max_bucket, guard)
    lbl_pred = (
        (F.col("a.lbl") == F.col("b.lbl"))
        if same_label
        else (F.col("a.lbl") != F.col("b.lbl"))
    )
    cand = (
        banded.alias("a")
        .join(ok, ["tbl", "bucket"])
        .join(
            banded.alias("b"),
            ["tbl", "bucket"],
        )
        .filter((F.col("a.vid") != F.col("b.vid")) & lbl_pred)
        .select(
            F.col("a.vid").alias("anchor_id"),
            F.col("b.vid").alias("cand_id"),
        )
        .distinct()
    )
    # UN-HINTED vec join-backs (dim_join doctrine / BROADCAST_SCALED):
    # the vec relation is n input rows — SF-scaled — so a forced hint
    # would OOM at the 100 TB target. AQE broadcasts it whenever the
    # runtime size fits (every bench SF: the same payload-free
    # hash-join plan the r14 sf10 fix needs) and demotes to a
    # distributed shuffle join past the threshold, where the sort is
    # spread across executors instead of one box's disk.
    vecs = base.select("vid", "fvec", "n2")
    scored = (
        cand.join(
            vecs.select(
                F.col("vid").alias("anchor_id"),
                F.col("fvec").alias("va"),
                F.col("n2").alias("na2"),
            ),
            "anchor_id",
        )
        .join(
            vecs.select(
                F.col("vid").alias("cand_id"),
                F.col("fvec").alias("vb"),
                F.col("n2").alias("nb2"),
            ),
            "cand_id",
        )
        .withColumn(
            "cosine",
            cosine_from_fixed(
                dot_fixed(F.col("va"), F.col("vb")), F.col("na2"), F.col("nb2")
            ),
        )
    )
    order = F.col("cosine").asc() if ascending else F.col("cosine").desc()
    w = Window.partitionBy("anchor_id").orderBy(order, F.col("cand_id"))
    from frames_spark.operators.caching import tie_cache

    return tie_cache(
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "anchor_id",
            "cand_id",
            "cosine",
            F.col("rank").cast("long").alias("rank"),
        ),
        banded,
    )


def hard_negatives_lsh(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    k: int = 3,
    num_planes: int | None = None,
    num_tables: int = 8,
    dim: int = 64,
    max_bucket: int = 4000,
    guard: str = "raise",
) -> DataFrame:
    """(anchor_id, neg_id, cosine, rank) — per anchor, the k
    MOST-similar DIFFERENT-label bucket mates (the negatives a
    contrastive loss actually learns from).

    ``num_planes=None`` (default) derives the plane count from a
    one-aggregate corpus-size pre-flight via suggest_num_planes, so
    the defaults keep working as the corpus grows past the point
    where a fixed plane count puts every bucket over ``max_bucket``;
    pass an explicit value to pin the LSH geometry (the oracled
    queries do). ``guard`` (raise|warn|off) is the dropped-mass
    check — see _mined_topk_lsh."""
    if num_planes is None:
        from frames_spark.dedup.embedding import suggest_num_planes

        num_planes = suggest_num_planes(df.count(), max_bucket)
    out = _mined_topk_lsh(
        df, id_col, vec_col, label_col, k,
        same_label=False, ascending=False,
        num_planes=num_planes, num_tables=num_tables,
        dim=dim, max_bucket=max_bucket, guard=guard,
    )
    from frames_spark.operators.caching import retie

    # the rename is a derivation — without retie the banded cache
    # releases before the caller's action (caching.retie docstring)
    return retie(out.withColumnRenamed("cand_id", "neg_id"), out)


def hard_positives_lsh(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    k: int = 3,
    num_planes: int | None = None,
    num_tables: int = 8,
    dim: int = 64,
    max_bucket: int = 4000,
    guard: str = "raise",
) -> DataFrame:
    """(anchor_id, pos_id, cosine, rank) — per anchor, the k
    LEAST-similar SAME-label bucket mates (FaceNet's hardest
    positives: the pairs the embedding must pull together).
    Parameter governing and the dropped-mass guard match
    hard_negatives_lsh."""
    if num_planes is None:
        from frames_spark.dedup.embedding import suggest_num_planes

        num_planes = suggest_num_planes(df.count(), max_bucket)
    out = _mined_topk_lsh(
        df, id_col, vec_col, label_col, k,
        same_label=True, ascending=True,
        num_planes=num_planes, num_tables=num_tables,
        dim=dim, max_bucket=max_bucket, guard=guard,
    )
    from frames_spark.operators.caching import retie

    return retie(out.withColumnRenamed("cand_id", "pos_id"), out)


def mine_triplets(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    k: int = 1,
    num_planes: int | None = None,
    num_tables: int = 8,
    dim: int = 64,
    max_bucket: int = 4000,
    guard: str = "raise",
) -> DataFrame:
    """(anchor_id, pos_id, pos_cosine, neg_id, neg_cosine) — the full
    FaceNet triplet prep in ONE pass: per anchor the k hardest
    positives joined with the k hardest negatives (a k x k cross per
    anchor for k > 1, matching the two-call composition).

    Identical results to hard_positives_lsh + hard_negatives_lsh, at
    roughly half the index cost: the sign pass, the persisted
    banding, the dropped-mass guard, the candidate expansion, and the
    exact-cosine vector join each run ONCE — the label predicate
    moves from inside the bucket self-join to a partition of the
    single scored candidate set (same-label pairs rank ascending =
    positives; different-label descending = negatives), so the two
    directions' disjoint cosine work shares every upstream stage."""
    if num_planes is None:
        from frames_spark.dedup.embedding import suggest_num_planes

        num_planes = suggest_num_planes(df.count(), max_bucket)
    base, banded = _banded_relation(
        df, id_col, vec_col, label_col, num_planes, num_tables, dim
    )
    ok = _ok_buckets(banded, num_planes, max_bucket, guard)
    cand = (
        banded.alias("a")
        .join(ok, ["tbl", "bucket"])
        .join(banded.alias("b"), ["tbl", "bucket"])
        .filter(F.col("a.vid") != F.col("b.vid"))
        .select(
            F.col("a.vid").alias("anchor_id"),
            F.col("b.vid").alias("cand_id"),
            (F.col("a.lbl") == F.col("b.lbl")).alias("same_lbl"),
        )
        .distinct()
    )
    # un-hinted vec join-backs: see _mined_topk_lsh (dim_join doctrine)
    vecs = base.select("vid", "fvec", "n2")
    scored = (
        cand.join(
            vecs.select(
                F.col("vid").alias("anchor_id"),
                F.col("fvec").alias("va"),
                F.col("n2").alias("na2"),
            ),
            "anchor_id",
        )
        .join(
            vecs.select(
                F.col("vid").alias("cand_id"),
                F.col("fvec").alias("vb"),
                F.col("n2").alias("nb2"),
            ),
            "cand_id",
        )
        .select(
            "anchor_id",
            "cand_id",
            "same_lbl",
            cosine_from_fixed(
                dot_fixed(F.col("va"), F.col("vb")),
                F.col("na2"),
                F.col("nb2"),
            ).alias("cosine"),
        )
        .persist()  # both direction windows consume this once each
    )

    def _topk(rows: DataFrame, ascending: bool, out_id: str, out_cos: str):
        order = F.col("cosine").asc() if ascending else F.col("cosine").desc()
        w = Window.partitionBy("anchor_id").orderBy(order, F.col("cand_id"))
        return (
            rows.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(
                "anchor_id",
                F.col("cand_id").alias(out_id),
                F.col("cosine").alias(out_cos),
            )
        )

    pos = _topk(
        scored.filter(F.col("same_lbl")), True, "pos_id", "pos_cosine"
    )
    neg = _topk(
        scored.filter(~F.col("same_lbl")), False, "neg_id", "neg_cosine"
    )
    from frames_spark.operators.caching import tie_cache

    return tie_cache(pos.join(neg, "anchor_id"), banded, scored)
