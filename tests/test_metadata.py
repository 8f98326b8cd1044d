"""parse_created_date / parse_authors ports (intelligent_processor.py:1088-1189)."""

from __future__ import annotations

from doc_parser_spark.functions.metadata import (
    authors_json,
    parse_authors,
    parse_created_date,
)


class TestCreatedDate:
    def test_full_date(self):
        assert parse_created_date("2023-05-07") == 20230507
        assert parse_created_date("2023-5-7") == 20230507
        assert parse_created_date(" 2023-12-31 ") == 20231231

    def test_month_only(self):
        assert parse_created_date("2023-12") == 20231201
        assert parse_created_date("2023-2") == 20230201

    def test_year_only(self):
        assert parse_created_date("1999") == 19990101

    def test_invalid_calendar_dates(self):
        assert parse_created_date("2023-02-30") == 0
        assert parse_created_date("2023-13-01") == 0
        assert parse_created_date("2023-13") == 0
        assert parse_created_date("0000") == 0

    def test_garbage(self):
        assert parse_created_date(None) == 0
        assert parse_created_date("") == 0
        assert parse_created_date("None") == 0
        assert parse_created_date("May 7, 2023") == 0
        assert parse_created_date(20230507) == 0  # non-string


class TestAuthors:
    def test_comma(self):
        assert parse_authors("Alice, Bob") == ["Alice", "Bob"]

    def test_dedup(self):
        assert parse_authors("Eve,Eve,Frank") == ["Eve", "Frank"]

    def test_first_separator_wins(self):
        # ',' is checked before ';' — a string with both splits on ','
        assert parse_authors("A;B, C") == ["A;B", "C"]

    def test_semicolon_slash_newline(self):
        assert parse_authors("Carol;Dave; Alice") == ["Alice", "Carol", "Dave"]
        assert parse_authors("X/Y") == ["X", "Y"]
        assert parse_authors("X\nY") == ["X", "Y"]

    def test_single_name(self):
        assert parse_authors("Single Author") == ["Single Author"]
        assert parse_authors("   ") == []
        assert parse_authors("") == []
        assert parse_authors(None) == []

    def test_dict_list(self):
        assert parse_authors([{"이름": "김"}, {"name": "Lee"}, "Park"]) == [
            "Lee", "Park", "김",
        ]

    def test_json_wire_format(self):
        assert authors_json("Alice, Bob") == '["Alice","Bob"]'
        assert authors_json("") == "[]"
        assert authors_json("김철수") == '["김철수"]'
