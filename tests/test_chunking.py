"""Chunking kernel + operator tests (HybridChunker semantics)."""

from __future__ import annotations

import pytest

from doc_parser_spark.functions.chunking import (
    chunk_items,
    count_tokens,
    greedy_chunks,
    with_heading_context,
)


class TestKernel:
    def test_count_tokens(self):
        assert count_tokens("") == 0
        assert count_tokens("one two three") == int(3 * 1.3)

    def test_heading_context(self):
        items = [
            ("title", "T"),
            ("text", "a"),
            ("section_header", "S1"),
            ("text", "b"),
            ("section_header", "S2"),
            ("text", "c"),
        ]
        ann = with_heading_context(items)
        assert ann[1].headers == {0: "T"}
        assert ann[3].headers == {0: "T", 1: "S1"}
        assert ann[5].headers == {0: "T", 1: "S2"}

    def test_single_small_doc_one_chunk(self):
        chunks = chunk_items([("title", "T"), ("text", "hello world")], 2000)
        assert len(chunks) == 1
        assert "T" in chunks[0].text and "hello world" in chunks[0].text
        assert chunks[0].headings == ["T"]

    def test_table_gets_own_chunk_before_merge(self):
        # a big text then a table then big text: table chunk is separate
        big = " ".join(["word"] * 600)  # 780 tokens > min_size(666)
        chunks = chunk_items(
            [("text", big), ("table", "| a | b |"), ("text", big)], 2000
        )
        table_chunks = [c for c in chunks if "| a | b |" in c.text]
        assert len(table_chunks) == 1
        # the table chunk is small → merged with a neighbor by merge-small
        assert len(chunks) == 2

    def test_budget_split(self):
        para = " ".join(["tok"] * 600)  # 780 tokens
        chunks = chunk_items([("text", para), ("text", para), ("text", para)], 1000)
        # each pair would be 1560 > 1000 → one chunk per paragraph
        assert len(chunks) == 3
        assert all(c.n_tokens <= 1000 for c in chunks)

    def test_oversize_single_item_kept_whole(self):
        para = " ".join(["tok"] * 2000)  # 2600 tokens > max
        chunks = chunk_items([("text", para)], 1000)
        assert len(chunks) == 1
        assert chunks[0].n_tokens > 1000

    def test_merge_small_chunks(self):
        # many small paragraphs pack greedily into one chunk
        items = [("text", "small paragraph here")] * 5
        chunks = chunk_items(items, 2000)
        assert len(chunks) == 1

    def test_headers_reemitted_on_section_change(self):
        items = [
            ("title", "Doc"),
            ("section_header", "S1"),
            ("text", "body one"),
            ("section_header", "S2"),
            ("text", "body two"),
        ]
        chunks = chunk_items(items, 2000)
        assert len(chunks) == 1
        text = chunks[0].text
        # headings appear as context lines, section headers not duplicated
        assert text.count("S1") == 1 and text.count("S2") == 1
        assert chunks[0].headings == ["Doc", "S1", "S2"]

    def test_empty(self):
        assert greedy_chunks([], 2000) == []

    def test_oversize_table_splits_at_4096(self):
        """intelligent_processor.py:626-653: a table chunk over max_tokens
        splits at the fixed 4096-token budget; every piece keeps the heading
        context and the pieces carry the full table content."""
        from doc_parser_spark.functions.chunking import TABLE_SPLIT_TOKENS

        rows = "\n".join(
            "| " + " | ".join(f"cell{r}c{c}" for c in range(20)) + " |"
            for r in range(400)
        )
        items = with_heading_context(
            [("title", "Big Tables"), ("table", rows), ("text", "after")]
        )
        assert count_tokens(rows) > TABLE_SPLIT_TOKENS
        chunks = greedy_chunks(items, max_tokens=2000)
        table_chunks = [c for c in chunks if "cell0c0" in c.text or "cell" in c.text]
        assert len(table_chunks) >= 2
        for c in table_chunks:
            assert "Big Tables" in c.headings
            # each piece respects the fixed split budget (headings add a bit)
            assert c.n_tokens <= TABLE_SPLIT_TOKENS + count_tokens("Big Tables") + 2
        # no content lost: concatenated pieces contain every row marker
        joined = "\n".join(c.text for c in chunks)
        assert all(f"cell{r}c0" in joined for r in range(0, 400, 97))

    def test_small_table_untouched(self):
        items = with_heading_context([("table", "| a | b |")])
        chunks = greedy_chunks(items, max_tokens=2000)
        assert len(chunks) == 1 and chunks[0].text == "| a | b |"

    def test_incremental_packing_equals_rerender(self):
        """The O(item) incremental word accounting must reproduce the
        re-render-the-buffer packing decision exactly, on streams mixing
        titles, section changes, header drops, empty items, and tables."""
        import random

        from doc_parser_spark.functions.chunking import (
            _mk_chunk,
            _render,
            with_heading_context,
        )
        from doc_parser_spark.functions.chunking import (
            _merge_small,
            LABEL_TABLE,
        )

        def reference_greedy(items, max_tokens):
            if not items:
                return []
            chunks, buf = [], []
            for item in items:
                if item.label == LABEL_TABLE:
                    if buf:
                        chunks.append(_mk_chunk(buf))
                        buf = []
                    chunks.append(_mk_chunk([item]))
                    continue
                test = buf + [item]
                text, _ = _render(test)
                if count_tokens(text) <= max_tokens:
                    buf = test
                else:
                    if buf:
                        chunks.append(_mk_chunk(buf))
                        buf = [item]
                    else:
                        chunks.append(_mk_chunk([item]))
                        buf = []
            if buf:
                chunks.append(_mk_chunk(buf))
            return _merge_small(chunks, max_tokens)

        rng = random.Random(7)
        labels = ["title", "section_header", "text", "text", "text", "table"]
        for trial in range(30):
            stream = []
            for _ in range(rng.randint(1, 60)):
                label = rng.choice(labels)
                nwords = rng.choice([0, 1, 3, 8, 40])
                stream.append(
                    (label, " ".join(f"w{rng.randint(0, 5)}" for _ in range(nwords)))
                )
            items = with_heading_context(stream)
            for budget in (10, 40, 2000):
                got = greedy_chunks(items, budget)
                want = reference_greedy(items, budget)
                assert [c.text for c in got] == [c.text for c in want], (
                    trial, budget,
                )
                assert [c.headings for c in got] == [c.headings for c in want]

    def test_item_indices_tracked_through_merge(self):
        items = with_heading_context(
            [("title", "T"), ("text", "a b c"), ("text", "d e f")]
        )
        chunks = greedy_chunks(items, max_tokens=2000)
        assert len(chunks) == 1
        assert chunks[0].item_indices == [0, 1, 2]


class TestOperator:
    def test_chunk_and_compose(self, spark, transcripts_pdf):
        from doc_parser_spark.operators.chunking import chunk_turns, compose_vectors
        from doc_parser_spark.operators.extract import extract_turns

        df = spark.createDataFrame(transcripts_pdf.head(120))
        extracted = extract_turns(df)
        chunks = chunk_turns(extracted, max_tokens=200)
        vectors = compose_vectors(chunks).toPandas()

        assert len(vectors) > 0
        assert (vectors["n_char"] == vectors["text"].str.len()).all()
        # index invariants per conversation
        for conv, grp in vectors.groupby("conv_id"):
            grp = grp.sort_values(["turn_idx", "i_chunk_on_doc"])
            assert grp["i_chunk_on_doc"].tolist() == list(range(len(grp)))
            assert (grp["n_chunk_of_doc"] == len(grp)).all()
        for (_, _), grp in vectors.groupby(["conv_id", "turn_idx"]):
            assert sorted(grp["i_chunk_on_page"]) == list(range(len(grp)))
            assert (grp["n_chunk_of_page"] == len(grp)).all()

    def test_chunk_budget_respected(self, spark, transcripts_pdf):
        from doc_parser_spark.operators.chunking import chunk_turns
        from doc_parser_spark.operators.extract import extract_turns

        df = spark.createDataFrame(transcripts_pdf.head(60))
        chunks = chunk_turns(extract_turns(df), max_tokens=100).toPandas()
        # items are small in the corpus → no oversize single items expected
        assert (chunks["n_tokens"] <= 130).all()

    def test_per_chunk_page_bounds(self, spark):
        """A multi-page turn's chunks get page bounds from their OWN items
        (preprocessor.py:294-331), not the turn-wide min/max."""
        import pandas as pd

        from doc_parser_spark.datamodel import EXTRACTED_SCHEMA
        from doc_parser_spark.operators.chunking import chunk_turns

        p1 = "page one words " * 20
        p2 = "page two words " * 20
        text = p1 + "\n\n" + p2
        row = {
            "conv_id": "c0",
            "turn_idx": 0,
            "content_type": "pdf",
            "extracted_text": text,
            "spans": [
                {"start": 0, "end": len(p1), "label": "paragraph", "page": 1},
                {"start": len(p1) + 2, "end": len(text), "label": "paragraph",
                 "page": 2},
            ],
            "parse_status": "success",
            "parse_score": 1.0,
            "n_char": len(text),
            "n_word": 80,
            "n_line": 3,
        }
        extracted = spark.createDataFrame(
            pd.DataFrame([row]), schema=EXTRACTED_SCHEMA
        )
        # budget forces one chunk per paragraph
        out = chunk_turns(extracted, max_tokens=30).toPandas()
        assert len(out) == 2
        out = out.sort_values("chunk_idx")
        assert out["i_page"].tolist() == [1, 2]
        assert out["e_page"].tolist() == [1, 2]
