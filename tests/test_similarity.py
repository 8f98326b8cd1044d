"""Similarity operators: brute-force correctness + LSH bucket sanity."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def qvec(spark, emb):
    return emb.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qvec")
    )


def test_bruteforce_matches_numpy(spark, emb, qvec):
    from doc_parser_spark.operators.similarity import cosine_scores

    got = (
        cosine_scores(emb, "vec_id", "embedding", qvec)
        .orderBy("vec_id")
        .toPandas()
    )
    pdf = emb.orderBy("vec_id").toPandas()
    mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    q = mat[0]
    expected = mat @ q / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    assert np.allclose(got["score"].to_numpy(), np.round(expected, 4), atol=2e-4)


def test_ann_results_subset_of_bucket_and_exact(spark, emb, qvec):
    from doc_parser_spark.operators.similarity import (
        ann_lsh_topk,
        cosine_scores,
        lsh_bucket_expr,
    )

    ann = ann_lsh_topk(emb, "vec_id", "embedding", qvec, k=10, planes=6).toPandas()
    # query itself is in its own bucket with score 1.0
    assert ann.iloc[0]["vec_id"] == 0
    assert ann.iloc[0]["score"] == pytest.approx(1.0)

    # every ANN hit shares the query's bucket, and its score is the exact one
    bucketed = emb.withColumn(
        "bucket", F.expr(lsh_bucket_expr("embedding", 6))
    ).toPandas()
    qbucket = bucketed.loc[bucketed["vec_id"] == 0, "bucket"].iloc[0]
    in_bucket = set(bucketed.loc[bucketed["bucket"] == qbucket, "vec_id"])
    assert set(ann["vec_id"]) <= in_bucket

    exact = (
        cosine_scores(emb, "vec_id", "embedding", qvec)
        .toPandas()
        .set_index("vec_id")["score"]
    )
    for _, row in ann.iterrows():
        assert row["score"] == pytest.approx(exact[row["vec_id"]], abs=1e-4)


def test_ann_recall_vs_bucket_bruteforce(spark, emb, qvec):
    """ANN top-k == brute-force top-k restricted to the bucket (by design);
    bucket recall of the global top-10 is reported, not asserted — random
    hyperplanes on random data give partial recall, the scale path trades
    recall for a single-partition probe."""
    from doc_parser_spark.operators.similarity import ann_lsh_topk, topk

    ann = ann_lsh_topk(emb, "vec_id", "embedding", qvec, k=10, planes=6).toPandas()
    brute = topk(emb, "vec_id", "embedding", qvec, k=10).toPandas()
    overlap = len(set(ann["vec_id"]) & set(brute["vec_id"]))
    assert overlap >= 1  # the query vector itself at minimum


# ---------------------------------------------------------------------------
# k-means-trained IVF centroids
# ---------------------------------------------------------------------------
from pyspark.sql import Row  # noqa: E402

from doc_parser_spark.operators.similarity import (  # noqa: E402
    ivf_assignments,
    ivf_train_kmeans,
)


class TestIvfKmeans:
    def _planted(self, spark, per_cluster=30, dim=8):
        """Three well-separated direction clusters (axis-aligned cones)."""
        rows = []
        for axis in range(3):
            for j in range(per_cluster):
                v = [0.05 * ((i * 7 + j) % 5) for i in range(dim)]
                v[axis] = 10.0 + (j % 3)  # dominant axis => cosine cluster
                rows.append(Row(vec_id=axis * per_cluster + j, embedding=v))
        return spark.createDataFrame(rows)

    def test_recovers_planted_clusters(self, spark):
        df = self._planted(spark)
        cents = ivf_train_kmeans(df, "vec_id", "embedding", k=3,
                                 iterations=2, dim=8)
        assigned = ivf_assignments(df, "vec_id", "embedding", cents)
        got = {r["vec_id"]: r["centroid_id"] for r in assigned.collect()}
        # every planted cluster maps to exactly one centroid, all three used
        groups = [
            {got[i] for i in range(a * 30, (a + 1) * 30)} for a in range(3)
        ]
        assert all(len(g) == 1 for g in groups)
        assert len(set().union(*groups)) == 3

    def test_deterministic_across_runs(self, spark):
        df = self._planted(spark)
        a = ivf_train_kmeans(df, "vec_id", "embedding", k=3, iterations=2,
                             dim=8).collect()
        b = ivf_train_kmeans(df, "vec_id", "embedding", k=3, iterations=2,
                             dim=8).collect()
        assert sorted(map(str, a)) == sorted(map(str, b))


class TestEmbeddingInfra:
    def _emb(self, spark, n=40, dim=32):
        import numpy as np

        rng = np.random.default_rng(7)
        rows = [
            (i, [float(v) for v in rng.normal(size=dim)]) for i in range(n)
        ]
        return spark.createDataFrame(rows, ["vec_id", "embedding"])

    def test_jl_preserves_distances(self, spark):
        import numpy as np

        from doc_parser_spark.operators.similarity import random_projection

        df = self._emb(spark, n=30, dim=64)
        out = {
            r["vec_id"]: np.array(r["proj"])
            for r in random_projection(
                df, "vec_id", "embedding", out_dim=16
            ).collect()
        }
        src = {r["vec_id"]: np.array(r["embedding"]) for r in df.collect()}
        # JL guarantee is statistical: check the MEDIAN pairwise distance
        # ratio is near 1 and no ratio is wildly off
        ratios = []
        ids = sorted(src)
        for i in ids[:12]:
            for j in ids[:12]:
                if i < j:
                    d0 = np.linalg.norm(src[i] - src[j])
                    d1 = np.linalg.norm(out[i] - out[j])
                    ratios.append(d1 / d0)
        med = sorted(ratios)[len(ratios) // 2]
        assert 0.7 < med < 1.3
        assert all(0.3 < r < 2.5 for r in ratios)

    def test_jl_deterministic(self, spark):
        from doc_parser_spark.operators.similarity import random_projection

        df = self._emb(spark, n=5)
        a = random_projection(df, "vec_id", "embedding", 8).collect()
        b = random_projection(df, "vec_id", "embedding", 8).collect()
        assert sorted(map(str, a)) == sorted(map(str, b))

    def test_quantize_roundtrip_bound(self, spark):
        import numpy as np

        from doc_parser_spark.operators.similarity import quantize_int8

        df = self._emb(spark, n=20, dim=48)
        for r in quantize_int8(df, "vec_id", "embedding").collect():
            x = np.array(r["embedding"], dtype=np.float64)
            assert all(0 <= q <= 255 for q in r["q"])
            scale = (r["q_max"] - r["q_min"]) / 255
            deq = r["q_min"] + np.array(r["q"]) * scale
            # nearest-code quantization: every element within scale/2
            assert np.abs(deq - x).max() <= scale / 2 + 1e-12
            assert r["recon_mse"] <= (scale / 2) ** 2 + 1e-12

    def test_quantize_constant_vector(self, spark):
        from doc_parser_spark.operators.similarity import quantize_int8

        df = spark.createDataFrame([(1, [2.5, 2.5, 2.5])],
                                   ["vec_id", "embedding"])
        r = quantize_int8(df, "vec_id", "embedding").collect()[0]
        assert r["q"] == [0, 0, 0]
        assert r["recon_mse"] == 0.0

    def test_row_local_plans(self, spark):
        import io
        from contextlib import redirect_stdout

        from doc_parser_spark.operators.similarity import (
            quantize_int8,
            random_projection,
        )

        df = self._emb(spark, n=5)
        for op in (
            lambda d: random_projection(d, "vec_id", "embedding", 4),
            lambda d: quantize_int8(d, "vec_id", "embedding"),
        ):
            buf = io.StringIO()
            with redirect_stdout(buf):
                op(df).explain("formatted")
            assert "Exchange" not in buf.getvalue()
