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

    def test_star_hub_materializes_no_wedge_explosion(self, spark):
        """Round-7 verdict #3: a power-law hub with a SMALL id must not
        generate C(d, 2) wedge rows. Under (degree, id) orientation every
        star edge points AT the hub (leaves have degree 1), so the hub has
        out-degree 0 and the wedge row count is bounded by the planted
        triangles, not the hub degree."""
        from doc_parser_spark.operators.graph import _oriented_wedges

        d = 60
        star = [(0, i) for i in range(1, d + 1)]  # hub id 0: worst case
        # plus one triangle away from the hub
        extra = [(1, 2)]
        edges = _edges(spark, star + extra)
        _oriented, wedges = _oriented_wedges(edges)
        n_wedges = wedges.count()
        # id orientation would give C(60, 2) = 1770 wedges from the hub;
        # degree orientation: only the two triangle-participating leaves
        # (degree 2) can emit wedges
        assert n_wedges <= 4, n_wedges
        assert triangle_count(edges).collect()[0][0] == 1

    def test_high_degree_triangle_correct(self, spark):
        # triangles THROUGH the hub still counted once under the new
        # orientation: hub 0 + ring edges among leaves
        star = [(0, i) for i in range(1, 11)]
        ring = [(i, i + 1) for i in range(1, 10)]
        got = triangle_count(_edges(spark, star + ring)).collect()[0][0]
        assert got == 9  # each ring edge closes one triangle with the hub


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

    def test_iters_20_bounded_plan_and_matches_reference(self, spark):
        """Round-7 verdict #4: per-round lazy localCheckpoint + persisted
        sym/deg/nodes — 20 iterations must neither nest 20 rounds of
        lineage into one plan nor blow up; values still match the pure
        python reference."""
        import io
        from contextlib import redirect_stdout

        pairs = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 4),
                 (2, 7)]
        out = pagerank(_edges(spark, pairs), iters=20)
        buf = io.StringIO()
        with redirect_stdout(buf):
            out.explain("formatted")
        assert len(buf.getvalue()) < 20_000
        got = {r["id"]: r["rank"] for r in out.collect()}
        exp = self._reference(pairs, iters=20)
        for k in exp:
            assert got[k] == pytest.approx(exp[k], abs=1e-8)


class TestEmptyGraphs:
    """Round-8 review: the driver-scalar n in pagerank must not divide
    by zero on an empty edge frame (the pre-round-8 per-row division
    never evaluated there)."""

    def test_pagerank_empty_edges(self, spark):
        from doc_parser_spark.operators.graph import pagerank

        empty = spark.createDataFrame([], "a_id long, b_id long")
        assert pagerank(empty).collect() == []

    def test_triangles_empty_edges(self, spark):
        from doc_parser_spark.operators.graph import triangle_count

        empty = spark.createDataFrame([], "a_id long, b_id long")
        rows = triangle_count(empty).collect()
        assert len(rows) == 1 and rows[0]["n_triangles"] == 0
