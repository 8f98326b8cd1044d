"""Zip access for UNTRUSTED payloads.

stdlib ``zipfile`` raises a bare ``RuntimeError`` when a member's flag bits
claim encryption — one corrupt bit in a web-crawled OOXML file would
surface as a programming-error class instead of the data-shaped failure
the extract envelope maps to a ``failure`` status row (found by the
decoder corruption-fuzz sweep, tests/test_decoder_robustness.py).
"""

from __future__ import annotations

import zipfile
from io import BytesIO


class SafeZipFile(zipfile.ZipFile):
    def read(self, name, pwd=None):  # type: ignore[override]
        try:
            return super().read(name, pwd)
        except RuntimeError as ex:  # encrypted member / unsupported crypt
            raise ValueError(f"unreadable zip member {name!r}: {ex}") from ex


def open_zip(payload: bytes) -> SafeZipFile:
    return SafeZipFile(BytesIO(payload))
