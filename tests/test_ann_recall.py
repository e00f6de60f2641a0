"""ann_recall sanity: probing every cell makes IVF exhaustive
(recall exactly 1), fewer probes can only lose candidates, and the
gate fixture sits strictly between broken and perfect."""

from pyspark.sql import functions as F

from pdal_spark.gate import _t
from pdal_spark.gates.gate_ext78 import RECALL_Q, q_ann_recall


def _recall(spark, nlist, nprobe, k=3):
    from pdal_spark.operators import similarity as ops_sim

    emb = _t(spark, "/root/testdata/sf0.001", "embeddings")
    qs = emb.where(F.col("vec_id") < 10)
    exact = ops_sim.cosine_topk(qs, emb, k=k).select(
        "query_id", "nb_id")
    approx = ops_sim.ivf_trained_topk(
        qs, emb, k=k, nlist=nlist, nprobe=nprobe
    ).select("query_id", "nb_id")
    hit = exact.join(approx, on=["query_id", "nb_id"]).count()
    return hit / exact.count()


def test_full_probe_is_exhaustive(spark):
    assert _recall(spark, nlist=4, nprobe=4) == 1.0


def test_fewer_probes_weakly_lower(spark):
    r1 = _recall(spark, nlist=8, nprobe=1)
    r4 = _recall(spark, nlist=8, nprobe=4)
    r8 = _recall(spark, nlist=8, nprobe=8)
    assert r1 <= r4 <= r8 == 1.0


def test_gate_recall_is_meaningful(spark):
    rows = q_ann_recall(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 20
    for r in rows:
        assert 0 <= r.recall_q <= RECALL_Q
        assert r.n_exact == 3
    mean = sum(r.recall_q for r in rows) / (len(rows) * RECALL_Q)
    assert mean > 0.3  # the index is not broken
