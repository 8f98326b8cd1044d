"""Search layer (operators/search.py): inverted index stop-list/postings
semantics and BM25 ranking properties (idf discrimination, tf saturation,
length normalization) on hand-built corpora."""

from __future__ import annotations

import math

from doc_parser_spark.operators.search import (
    bm25_topk,
    build_inverted_index,
)


def _corpus(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestInvertedIndex:
    def test_postings_and_stop_list(self, spark):
        docs = _corpus(
            spark,
            [
                (1, "the cat sat"),
                (2, "the dog ran"),
                (3, "the cat ran fast"),
                (4, "the the the"),
            ],
        )
        idx = {
            r["term"]: (r["df"], [(p["doc"], p["tf"]) for p in r["postings"]])
            for r in build_inverted_index(
                docs, "doc_id", "text", max_df_ratio=0.8
            ).collect()
        }
        assert "the" not in idx          # df 4/4 > 0.8 → stop-listed
        assert idx["cat"] == (2, [(1, 1), (3, 1)])   # sorted postings
        assert idx["ran"] == (2, [(2, 1), (3, 1)])
        assert idx["fast"] == (1, [(3, 1)])

    def test_tf_counted(self, spark):
        docs = _corpus(spark, [(7, "echo echo echo other")])
        idx = {
            r["term"]: r["postings"]
            for r in build_inverted_index(
                docs, "doc_id", "text", max_df_ratio=2.0
            ).collect()
        }
        assert idx["echo"][0]["tf"] == 3


class TestBm25:
    def test_rare_term_outranks_common(self, spark):
        # 'zebra' appears once in doc 1; 'common' is everywhere — a query
        # for both must rank the zebra doc first on idf alone
        docs = _corpus(
            spark,
            [(1, "common zebra words here")]
            + [(i, "common words here again") for i in range(2, 12)],
        )
        out = bm25_topk(docs, "doc_id", "text", ["zebra", "common"], k=3)
        rows = out.collect()
        assert rows[0]["doc_id"] == 1
        assert rows[0]["score"] > rows[1]["score"]

    def test_tf_saturates(self, spark):
        # BM25's tf term is bounded by k1+1: a 10x tf must NOT give 10x
        # score (that's the whole point vs raw tf-idf)
        docs = _corpus(
            spark,
            [(1, " ".join(["term"] * 10) + " pad"),
             (2, "term pad pad pad pad pad pad pad pad pad pad"),
             (3, "none of these words")],
        )
        out = {
            r["doc_id"]: r["score"]
            for r in bm25_topk(docs, "doc_id", "text", ["term"], k=3)
            .collect()
        }
        assert out[1] > out[2]
        assert out[1] / out[2] < 3  # saturation: nowhere near the 10x tf

    def test_shorter_doc_wins_at_equal_tf(self, spark):
        # length normalization: same tf, shorter doc scores higher
        docs = _corpus(
            spark,
            [(1, "term short"),
             (2, "term " + " ".join(f"w{i}" for i in range(30))),
             (3, "unrelated filler text")],
        )
        out = {
            r["doc_id"]: r["score"]
            for r in bm25_topk(docs, "doc_id", "text", ["term"], k=3)
            .collect()
        }
        assert out[1] > out[2]

    def test_score_matches_closed_form(self, spark):
        # single term, hand-computed Lucene-variant BM25
        docs = _corpus(
            spark,
            [(1, "x a b c"), (2, "a b c d"), (3, "a b x x")],
        )
        out = {
            r["doc_id"]: r["score"]
            for r in bm25_topk(docs, "doc_id", "text", ["x"], k=3)
            .collect()
        }
        n, avgdl = 3.0, 4.0
        idf = math.log((n - 2 + 0.5) / (2 + 0.5) + 1)

        def s(tf, dl):
            return idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))

        assert out[1] == round(s(1, 4), 4)
        assert out[3] == round(s(2, 4), 4)
        assert 2 not in out
