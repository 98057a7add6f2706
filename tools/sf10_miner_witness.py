"""r14 sf10 probe: bounded-bucket witness for the embedding miner.

The registered q_hard_negatives_auto geometry (max_bucket=4000 ->
bucket target ~1000) keeps bucket SIZE constant as the corpus grows,
so candidate volume is linear in n: at sf10 (200k vectors, np=8,
8 tables) that is ~1.2e9 directed candidate rows ranked to keep
top-3 — measured >45 CPU-minutes without completing on local[32].
The knob that governs it is max_bucket: this witness runs the SAME
miner with max_bucket=400 (target ~100, np=11 derived) and prints
row count + runtime, demonstrating the bounded geometry completes
locally at sf10."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from frames_spark.session import get_spark
from frames_spark.similarity.negatives import hard_negatives_lsh
from frames_spark.sources.tables import load_table

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata/sf10"
spark = get_spark("sf10-miner-witness")
emb = load_table(spark, SF_DIR, "embeddings")
t0 = time.time()
out = hard_negatives_lsh(
    emb, "vec_id", "embedding", "label",
    k=3, num_tables=8, max_bucket=400,
)
n = out.count()
print(
    f"BOUNDED MINER WITNESS: {n} rows (k=3 hard negatives) over "
    f"{emb.count()} vectors in {time.time() - t0:.1f}s at max_bucket=400"
)
