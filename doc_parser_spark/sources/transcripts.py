"""Deterministic synthetic transcript corpus (FIXTURES.md §1).

Schema is exactly the BASELINE.json input_hint:
    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string, ts:timestamp

Payload mix: ~35% HTML, ~27% plain text, ~10% markdown, ~5% CSV, ~3%
asciidoc, ~15% pdf-ish cell dumps, ~5% empty/garbage. A configurable fraction of conversations are "whales" with
100× the median turn count (exercises salting). Content derives only from a
seeded PRNG — no external data.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import pandas as pd

ROLES = ("user", "assistant", "system", "tool")
TOOLS = (None, "browser", "pdf_reader", "search", None, None)

_WORDS = (
    "spark arrow batch shuffle partition executor driver catalyst tungsten "
    "column row schema parquet iceberg transcript extraction boilerplate "
    "heading paragraph table anchor density score furniture body span offset "
    "token chunk window salt skew merge join scan filter project aggregate"
).split()

_UNICODE_TRIGGERS = ("’", "“", "”", "•", "⁄", "‘")


def _sentence(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n))


def _plain_payload(rng: random.Random) -> str:
    paras = []
    for _ in range(rng.randint(1, 5)):
        lines = []
        for _ in range(rng.randint(1, 4)):
            line = _sentence(rng, rng.randint(4, 12))
            if rng.random() < 0.15:
                line = "  " + line + "  "  # leading/trailing whitespace
            if rng.random() < 0.1:
                line += rng.choice(_UNICODE_TRIGGERS)
            lines.append(line)
        if rng.random() < 0.15 and len(lines) >= 2:
            # hyphen-wrapped line pair
            lines[0] = lines[0] + " exam-"
            lines[1] = "ple " + lines[1]
        paras.append("\n".join(lines))
    sep = ["\n\n", "\n \n", "\n\n\n"]
    return rng.choice(sep).join(paras)


def _html_payload(rng: random.Random) -> str:
    title = _sentence(rng, 3).title()
    parts = ["<html><body>"]
    if rng.random() < 0.6:
        # boilerplate before the first heading → FURNITURE per reference rule
        parts.append(
            "<nav><ul>"
            + "".join(
                f'<li><a href="#s{i}">{_sentence(rng, 2)}</a></li>'
                for i in range(rng.randint(2, 4))
            )
            + "</ul></nav>"
        )
    if rng.random() < 0.3:
        parts.append(f"<div>{_sentence(rng, 5)}<p>{_sentence(rng, 6)}</p></div>")
    parts.append(f"<h1>{title}</h1>")
    for si in range(rng.randint(1, 3)):
        parts.append(f"<h2>{_sentence(rng, 2).title()}</h2>")
        for _ in range(rng.randint(1, 3)):
            parts.append(f"<p>{_sentence(rng, rng.randint(8, 20))}.</p>")
        r = rng.random()
        if r < 0.25:
            start = f' start="{rng.randint(2, 5)}"' if rng.random() < 0.5 else ""
            tag = "ol" if start or rng.random() < 0.5 else "ul"
            parts.append(
                f"<{tag}{start if tag == 'ol' else ''}>"
                + "".join(f"<li>{_sentence(rng, 4)}</li>" for _ in range(3))
                + f"</{tag}>"
            )
        elif r < 0.4:
            rows = "".join(
                "<tr>"
                + "".join(f"<td>{_sentence(rng, 2)}</td>" for _ in range(3))
                + "</tr>"
                for _ in range(2)
            )
            head = "<tr>" + "".join(f"<th>c{i}</th>" for i in range(3)) + "</tr>"
            parts.append(f"<table>{head}{rows}</table>")
        elif r < 0.5:
            parts.append(f"<pre>{_sentence(rng, 6)}</pre>")
        elif r < 0.55:
            parts.append(
                f"<p>line one of {si}<br>line two after break</p>"
            )
    parts.append("</body></html>")
    return "".join(parts)


def _pdfish_payload(rng: random.Random) -> str:
    lines = ["%PDF-SIM"]
    n_pages = rng.randint(1, 2)
    for page in range(1, n_pages + 1):
        lines.append(f"#page {page} 612.0 792.0")
        # header band
        if rng.random() < 0.7:
            lines.append(f"72.0 20.0 300.0 32.0 Confidential Report p{page}")
        if rng.random() < 0.25:
            # two-column page: left/right bands, ≥2 lines each
            y = 80.0
            for _ in range(rng.randint(2, 4)):
                lines.append(
                    f"50.0 {y:.1f} 280.0 {y + 12:.1f} {_sentence(rng, 4)}"
                )
                lines.append(
                    f"320.0 {y:.1f} 560.0 {y + 12:.1f} {_sentence(rng, 4)}"
                )
                y += 14.0
            continue
        y = 80.0
        for _ in range(rng.randint(2, 5)):
            n_lines = rng.randint(1, 4)
            for li in range(n_lines):
                text = _sentence(rng, rng.randint(4, 9))
                if rng.random() < 0.2 and li < n_lines - 1:
                    text += " frag-"
                # sometimes split a line into two fragmented cells
                if rng.random() < 0.3:
                    words = text.split()
                    mid = len(words) // 2
                    left, right = " ".join(words[:mid]), " ".join(words[mid:])
                    lines.append(f"72.0 {y:.1f} 250.0 {y + 12:.1f} {left}")
                    lines.append(f"255.0 {y:.1f} 480.0 {y + 12:.1f} {right}")
                else:
                    lines.append(f"72.0 {y:.1f} 480.0 {y + 12:.1f} {text}")
                y += 14.0
            y += 30.0  # paragraph gap > 1.5 * line height
        if rng.random() < 0.7:
            lines.append(f"72.0 770.0 300.0 782.0 Page {page} of {n_pages}")
    return "\n".join(lines)


def _garbage_payload(rng: random.Random) -> str:
    r = rng.random()
    if r < 0.3:
        return ""
    if r < 0.5:
        return "   \n  \n "
    if r < 0.7:
        return "GLYPH<1a>GLYPH<2b> " + _sentence(rng, 3)
    if r < 0.85:
        return "/G12/G34/G56 " + _sentence(rng, 2)
    return "�� " + _sentence(rng, 3)


def _md_payload(rng: random.Random) -> str:
    parts = [f"# {_sentence(rng, 3).title()}"]
    if rng.random() < 0.4:
        parts.insert(0, _sentence(rng, 6))  # pre-heading furniture
    for _ in range(rng.randint(1, 3)):
        parts.append(f"## {_sentence(rng, 2).title()}")
        parts.append(_sentence(rng, rng.randint(8, 16)) + ".")
        r = rng.random()
        if r < 0.25:
            parts.append("\n".join(f"- {_sentence(rng, 4)}" for _ in range(3)))
        elif r < 0.4:
            parts.append(f"```\n{_sentence(rng, 5)}\n{_sentence(rng, 4)}\n```")
        elif r < 0.5:
            parts.append(
                "| c0 | c1 |\n|---|---|\n"
                + "\n".join(
                    f"| {_sentence(rng, 2)} | {_sentence(rng, 2)} |"
                    for _ in range(2)
                )
            )
    return "\n\n".join(parts)


def _csv_payload(rng: random.Random) -> str:
    cols = rng.randint(2, 4)
    header = ",".join(f"col{i}" for i in range(cols))
    rows = [
        ",".join(_sentence(rng, 1).replace(",", " ") for _ in range(cols))
        for _ in range(rng.randint(2, 6))
    ]
    return "\n".join([header] + rows)


def _asciidoc_payload(rng: random.Random) -> str:
    parts = [f"= {_sentence(rng, 3).title()}", "", _sentence(rng, 8) + "."]
    for _ in range(rng.randint(1, 2)):
        parts += ["", f"== {_sentence(rng, 2).title()}", "",
                  _sentence(rng, rng.randint(8, 14)) + "."]
        r = rng.random()
        if r < 0.3:
            parts += [""] + [f"* {_sentence(rng, 4)}" for _ in range(3)]
        elif r < 0.45:
            parts += ["", "|===",
                      "|" + "|".join(f"h{i}" for i in range(3)) + "|",
                      "|" + "|".join(_sentence(rng, 1) for _ in range(3)) + "|",
                      "|==="]
    return "\n".join(parts)


def payload_for(rng: random.Random) -> str:
    r = rng.random()
    if r < 0.35:
        return _html_payload(rng)
    if r < 0.62:
        return _plain_payload(rng)
    if r < 0.72:
        return _md_payload(rng)
    if r < 0.77:
        return _csv_payload(rng)
    if r < 0.80:
        return _asciidoc_payload(rng)
    if r < 0.95:
        return _pdfish_payload(rng)
    return _garbage_payload(rng)


def generate_transcripts(
    n_convs: int = 100,
    turns_mean: int = 10,
    seed: int = 42,
    whale_fraction: float = 0.02,
    whale_factor: int = 100,
) -> pd.DataFrame:
    """Deterministic transcript corpus as a pandas DataFrame."""
    rng = random.Random(seed)
    rows = []
    base_ts = datetime(2026, 1, 1)
    n_whales = max(1, int(n_convs * whale_fraction)) if whale_fraction > 0 else 0
    for ci in range(n_convs):
        conv_id = f"conv-{seed}-{ci:06d}"
        if ci < n_whales:
            n_turns = turns_mean * whale_factor
        else:
            n_turns = max(1, int(rng.gauss(turns_mean, turns_mean / 3)))
        ts = base_ts + timedelta(hours=ci)
        for ti in range(n_turns):
            role = ROLES[ti % 2] if rng.random() < 0.8 else rng.choice(ROLES)
            rows.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": ti,
                    "role": role,
                    "text": payload_for(rng),
                    "tool": rng.choice(TOOLS),
                    "ts": ts + timedelta(seconds=30 * ti),
                }
            )
    df = pd.DataFrame(rows)
    df["turn_idx"] = df["turn_idx"].astype("int32")
    return df


def write_transcripts_parquet(
    path: str,
    n_convs: int = 100,
    turns_mean: int = 10,
    seed: int = 42,
    **kwargs,
) -> str:
    df = generate_transcripts(n_convs, turns_mean, seed, **kwargs)
    # Spark rejects TIMESTAMP(NANOS) parquet columns — write microseconds.
    # Small row groups keep the single bench file splittable so the scan
    # stage parallelizes like a real many-file Iceberg table would.
    df.to_parquet(
        path,
        index=False,
        coerce_timestamps="us",
        allow_truncated_timestamps=True,
        row_group_size=2048,
    )
    return path
