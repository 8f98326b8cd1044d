"""Graph kernels (operators/graph.py): triangle counting and PageRank on
known graphs, plus a pure-python PageRank differential."""

from __future__ import annotations

import pytest

from doc_parser_spark.operators.graph import pagerank, triangle_count


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["a_id", "b_id"])


class TestTriangles:
    def test_known_graphs(self, spark):
        # K4 has 4 triangles
        k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
        assert triangle_count(_edges(spark, k4)).collect()[0][0] == 4
        # a path has none
        path = [(i, i + 1) for i in range(6)]
        assert triangle_count(_edges(spark, path)).collect()[0][0] == 0
        # one closed wedge
        assert (
            triangle_count(_edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4)]))
            .collect()[0][0]
            == 1
        )

    def test_orientation_and_duplicates_tolerated(self, spark):
        # same triangle given with mixed orientations and repeats: still 1
        e = [(2, 1), (1, 2), (3, 2), (1, 3), (3, 1)]
        assert triangle_count(_edges(spark, e)).collect()[0][0] == 1


class TestPagerank:
    def _reference(self, pairs, iters=3, d=0.85):
        sym = set()
        for a, b in pairs:
            sym.add((a, b))
            sym.add((b, a))
        nodes = sorted({x for e in sym for x in e})
        out = {u: [v for (s, v) in sym if s == u] for u in nodes}
        n = len(nodes)
        r = {u: 1.0 / n for u in nodes}
        for _ in range(iters):
            nxt = {u: (1 - d) / n for u in nodes}
            for u in nodes:
                share = r[u] / len(out[u])
                for v in out[u]:
                    nxt[v] += d * share
            r = nxt
        return {u: round(v, 8) for u, v in r.items()}

    def test_matches_pure_python_reference(self, spark):
        pairs = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 4),
                 (2, 7)]
        got = {
            r["id"]: r["rank"]
            for r in pagerank(_edges(spark, pairs), iters=3).collect()
        }
        exp = self._reference(pairs)
        assert set(got) == set(exp)
        for k in exp:
            assert got[k] == pytest.approx(exp[k], abs=1e-8)

    def test_hub_outranks_leaf(self, spark):
        star = [(0, i) for i in range(1, 8)]
        got = {
            r["id"]: r["rank"]
            for r in pagerank(_edges(spark, star), iters=3).collect()
        }
        assert got[0] > max(got[i] for i in range(1, 8)) * 2

    def test_mass_conserved(self, spark):
        pairs = [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)]
        got = pagerank(_edges(spark, pairs), iters=3).collect()
        assert sum(r["rank"] for r in got) == pytest.approx(1.0, abs=1e-6)
