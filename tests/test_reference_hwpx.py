"""HWPX backend (B14) parity with the reference's OWN regression baseline.

The only HWPX groundtruth the reference ships is the genon regression
baseline (tests/regression/baselines/hwpx_sample.json ==
hwpx_hwpx_sample.json): per-chunk vectors with a chunk_bboxes list carrying
one entry per document item. Item-level truth is recovered by collapsing
chunk-boundary duplicates: an item whose serialization SPLITS across two
chunks (here: the 46×12 '결혼생활 지속기간' table, vectors 66/67) carries
its bbox in both chunks, so label_distribution counts it twice. After that
collapse, our flat item stream matches the baseline's item sequence
EXACTLY — 587 items, labels and order identical, including:

- all four section-header heuristic families (88 headers)
- the CMYK-JPEG picture drop (the reference's ImageRef.from_pil PNG
  re-encode fails on 4-component JPEGs → the 통계청-BI image is absent
  from the baseline; we mirror by SOF component sniffing)
- caption/comment cells (5), tables (59 items), pictures (57)
"""

from __future__ import annotations

import json
from collections import Counter
from pathlib import Path

import pytest

from doc_parser_spark.functions.docx_extract import flat_items
from doc_parser_spark.functions.hwpx_extract import extract_hwpx, parse_hwpx

SAMPLE = Path("/root/reference/genon/preprocessor/sample_files/hwpx_sample.hwpx")
BASELINE = Path(
    "/root/reference/genon/preprocessor/tests/regression/baselines/hwpx_sample.json"
)

pytestmark = pytest.mark.skipif(
    not SAMPLE.exists(), reason="reference fixtures not present"
)


def _baseline_item_seq() -> list[str]:
    """Baseline chunk_bboxes → item-label sequence with chunk-boundary
    duplicates collapsed (a split item repeats as the last bbox of chunk i
    and the first bbox of chunk i+1; only tables split — they are the only
    items whose serialization exceeds a chunk)."""
    bl = json.loads(BASELINE.read_text())
    per_chunk = [
        [bb["type"] for bb in json.loads(v["chunk_bboxes"])] for v in bl["vectors"]
    ]
    seq: list[str] = []
    for i, bbs in enumerate(per_chunk):
        start = 0
        if (
            seq
            and bbs
            and bbs[0] == "table"
            and seq[-1] == "table"
            and len(per_chunk[i - 1]) == 1
            and len(bbs) == 1
        ):
            start = 1  # continuation of the same split table
        seq.extend(bbs[start:])
    return seq


@pytest.fixture(scope="module")
def items():
    return list(flat_items(parse_hwpx(SAMPLE.read_bytes())))


def test_item_label_sequence_exact(items):
    bl_seq = _baseline_item_seq()
    my_seq = [n.label for n in items]
    assert Counter(my_seq) == Counter(bl_seq)
    assert my_seq == bl_seq  # order too
    assert len(my_seq) == 587


# Heading text surfaces in a genon vector ONLY via the chunk-start heading
# context ladder (docling chunkers keep headings in meta, not body text), so
# a header that never begins a chunk — or is immediately shadowed by the
# next same-level header — is absent from every vector text. These eight
# headers of hwpx_sample are in that blind spot; the label SEQUENCE test
# above still pins their existence, position and label.
_UNSERIALIZED_HEADERS = {
    "다문화 출생(16,421명)은 전년대비 8.5%(1,518명) 감소",
    "2020년 다문화 혼인은 16,177건으로 전년보다 34.6%(8,544건) 감소",
    "2020년 다문화 이혼은 8,685건으로 전년보다 12.0%(1,183건) 감소",
    "외국인 아내(48.1%), 귀화자(36.7%), 외국인 남편(15.2%) 순으로 많음",
    "평균 이혼 연령은 남편 49.9세, 아내 40.1세",
    "다문화 출생 중 첫째아의 비중은 57.5%로 전년대비 0.7%p 상승",
    "Ⅰ. 다문화 혼인",
    "Ⅱ. 다문화 이혼",
}


def test_header_texts_in_baseline(items):
    bl = json.loads(BASELINE.read_text())
    bl_text = "\n".join(v["text"] for v in bl["vectors"])
    headers = [n.text for n in items if n.label == "section_header"]
    assert len(headers) == 88
    bl_norm = " ".join(bl_text.split())
    missing = {
        " ".join(h.split())
        for h in headers
        if " ".join(h.split()) not in bl_norm
    }
    assert missing <= _UNSERIALIZED_HEADERS, missing - _UNSERIALIZED_HEADERS


def test_paragraph_texts_in_baseline(items):
    bl = json.loads(BASELINE.read_text())
    bl_text = "\n".join(v["text"] for v in bl["vectors"])
    paras = [n.text for n in items if n.label in ("paragraph", "caption")]
    missing = [p for p in paras if p not in bl_text]
    # whitespace-collapse tolerance: the chunker may reflow interior spaces
    missing = [
        p for p in missing if " ".join(p.split()) not in " ".join(bl_text.split())
    ]
    assert len(missing) <= len(paras) * 0.02, missing[:5]


def test_extract_hwpx_surface():
    text, spans = extract_hwpx(SAMPLE.read_bytes())
    assert len(text) > 30000
    assert spans and spans[0][2] == "table"  # the 보도자료 banner grid
    labels = {s[2] for s in spans}
    assert "section_header" in labels and "table" in labels
    # spans index the text exactly
    for start, end, label, page in spans[:50]:
        assert 0 <= start <= end <= len(text)
