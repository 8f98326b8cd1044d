"""2-D bbox fixpoint merge (genos_utils.py:114-160 port) — kernel semantics
including the chain-growth case SQL cannot express, plus the Spark operator.
"""

from __future__ import annotations

from doc_parser_spark.functions.bbox import merge_overlapping_bboxes


def box(l, t, r, b, page=1, btype="text"):
    return {"page": page, "type": btype, "bbox": {"l": l, "t": t, "r": r, "b": b}}


class TestKernel:
    def test_disjoint_stay_apart(self):
        out = merge_overlapping_bboxes([box(0, 0, 1, 1), box(10, 10, 11, 11)])
        assert len(out) == 2

    def test_overlap_merges_to_hull(self):
        out = merge_overlapping_bboxes([box(0, 0, 5, 5), box(4, 4, 9, 9)])
        assert len(out) == 1
        assert out[0]["bbox"] == {"l": 0, "t": 0, "r": 9, "b": 9}

    def test_tolerance_bridges_gap(self):
        # 0.5 apart on x: within the default tolerance of 1
        out = merge_overlapping_bboxes([box(0, 0, 5, 5), box(5.5, 0, 9, 5)])
        assert len(out) == 1

    def test_chain_growth_fixpoint(self):
        """A and B overlap; their union reaches C, which neither A nor B
        overlapped directly — the fixpoint must join all three (a static
        transitive closure over original pairs would not)."""
        a = box(0, 0, 4, 10)
        b = box(3, 0, 8, 2)  # overlaps A only near the top
        c = box(8.5, 8, 12, 10)  # x within tol of union(A,B).r=8; y only fits A
        # direct pairs: a-c don't overlap on x (8.5 > 4+1); b-c overlap on x
        # (8.5 <= 8+1) but not y (b.b=2 < c.t-1=7)
        assert len(merge_overlapping_bboxes([a, c])) == 2
        assert len(merge_overlapping_bboxes([b, c])) == 2
        out = merge_overlapping_bboxes([a, b, c])
        assert len(out) == 1
        assert out[0]["bbox"] == {"l": 0, "t": 0, "r": 12, "b": 10}

    def test_pages_never_merge(self):
        out = merge_overlapping_bboxes(
            [box(0, 0, 5, 5, page=1), box(0, 0, 5, 5, page=2)]
        )
        assert len(out) == 2

    def test_non_text_passthrough(self):
        # a non-text CURRENT box is never folded...
        pic = box(20, 20, 25, 25, btype="picture")
        out = merge_overlapping_bboxes([box(0, 0, 5, 5), pic])
        assert len(out) == 2
        assert {o["type"] for o in out} == {"picture", "text"}

    def test_text_folds_into_earlier_non_text(self):
        # ...but the reference's is_overlap ignores the EXISTING box's type:
        # a text box overlapping an already-placed picture folds into it and
        # the union comes out type 'text' (genos_utils.py:146-157 —
        # bug-compatible port, kept as-is)
        pic = box(0, 0, 5, 5, btype="picture")
        out = merge_overlapping_bboxes([pic, box(0, 0, 5, 5)])
        assert len(out) == 1
        assert out[0]["type"] == "text"


class TestOperator:
    def test_spark_matches_kernel(self, spark):
        import pandas as pd

        from doc_parser_spark.operators.spans import merge_bboxes_2d

        rows = []
        for g in range(6):
            rows += [
                {"gid": g, "page": 1, "btype": "text",
                 "l": 0.0 + g, "t": 0.0, "r": 4.0 + g, "b": 10.0},
                {"gid": g, "page": 1, "btype": "text",
                 "l": 3.0 + g, "t": 0.0, "r": 8.0 + g, "b": 2.0},
                {"gid": g, "page": 1, "btype": "text",
                 "l": 8.5 + g, "t": 8.0, "r": 12.0 + g, "b": 10.0},
                {"gid": g, "page": 2, "btype": "text",
                 "l": 0.0, "t": 0.0, "r": 1.0, "b": 1.0},
                {"gid": g, "page": 1, "btype": "picture",
                 "l": 50.0, "t": 50.0, "r": 60.0, "b": 60.0},
            ]
        df = spark.createDataFrame(pd.DataFrame(rows))
        out = merge_bboxes_2d(df, ["gid"]).toPandas()
        for g, grp in out.groupby("gid"):
            texts = grp[grp["btype"] == "text"]
            assert len(texts) == 2  # chain-merged page-1 hull + page-2 box
            hull = texts[texts["page"] == 1].iloc[0]
            assert (hull["l"], hull["t"], hull["r"], hull["b"]) == (
                0.0 + g, 0.0, 12.0 + g, 10.0,
            )
            assert (grp["btype"] == "picture").sum() == 1
