"""Document-metadata parsing — GenOSVectorMeta field ports.

Exact ports of the reference's metadata parsers
(/root/reference/genon/preprocessor/facade/intelligent_processor.py):

- ``parse_created_date`` (:1088-1136): YYYY-MM-DD / YYYY-MM / YYYY text →
  YYYYMMDD int with calendar validation, 0 on anything else.
- ``parse_authors`` (:1138-1189): author names from a delimited string or a
  list of dicts/strings; names are deduplicated. ONE deliberate divergence:
  the reference returns ``list(set(names))`` whose order is interpreter-hash
  dependent — this port sorts the deduplicated names so the output is
  deterministic across runs and engines.

Both are row-local and run inside Arrow batches (vectorized pandas UDF) —
metadata parsing is once-per-document, not a hot extraction path.
"""

from __future__ import annotations

import json
import re
from datetime import datetime

_FULL_RE = re.compile(r"^(\d{4})-(\d{1,2})-(\d{1,2})$")
_MONTH_RE = re.compile(r"^(\d{4})-(\d{1,2})$")
_YEAR_RE = re.compile(r"^(\d{4})$")

# separator priority (intelligent_processor.py:1177): the FIRST one present
# in the string wins
AUTHOR_SEPARATORS = [",", ";", "/", "\n", "·", "•"]


def parse_created_date(date_text) -> int:
    """작성일 text → YYYYMMDD int; 0 when unparseable (reference-exact)."""
    if not date_text or not isinstance(date_text, str) or date_text == "None":
        return 0
    date_text = date_text.strip()

    m = _FULL_RE.match(date_text)
    if m:
        year, month, day = m.groups()
        try:
            datetime(int(year), int(month), int(day))
            return int(f"{year}{month.zfill(2)}{day.zfill(2)}")
        except ValueError:
            pass

    m = _MONTH_RE.match(date_text)
    if m:
        year, month = m.groups()
        try:
            datetime(int(year), int(month), 1)
            return int(f"{year}{month.zfill(2)}01")
        except ValueError:
            pass

    m = _YEAR_RE.match(date_text)
    if m:
        year = m.group(1)
        try:
            datetime(int(year), 1, 1)
            return int(f"{year}0101")
        except ValueError:
            pass

    return 0


def parse_authors(authors_data) -> list[str]:
    """Author names from list-of-dicts / list-of-strings / delimited string.

    Dict entries yield their '이름' or 'name' value; strings split on the
    first present separator. Deduplicated and SORTED (see module note).
    """
    if not authors_data:
        return []

    if isinstance(authors_data, list):
        names = []
        for author in authors_data:
            if isinstance(author, dict):
                for key in ("이름", "name"):
                    if key in author:
                        name = author[key].strip()
                        if name:
                            names.append(name)
                        break
            elif isinstance(author, str):
                name = author.strip()
                if name:
                    names.append(name)
        return sorted(set(names))

    if isinstance(authors_data, str):
        for sep in AUTHOR_SEPARATORS:
            if sep in authors_data:
                names = [
                    name.strip()
                    for name in authors_data.split(sep)
                    if name.strip()
                ]
                return sorted(set(names))
        name = authors_data.strip()
        return [name] if name else []

    return []


def authors_json(authors_data) -> str:
    """json.dumps(parse_authors(...)) — the GenOSVectorMeta wire format
    (intelligent_processor.py:1251), compact separators so the string equals
    Spark's to_json / DuckDB's JSON rendering of the same array."""
    return json.dumps(
        parse_authors(authors_data), ensure_ascii=False, separators=(",", ":")
    )
