"""Heatmap scorer/highlighter — reference ``ck-core/src/heatmap.rs:64-148``.

Per-token similarity against the raw query text, mapped into 8 gradient
buckets with the reference's exact thresholds, RGB values and bold rule.
``split_into_tokens`` preserves whitespace and punctuation as discrete
tokens so coloured output lines up with the original text; a batch-level
``heatmap_batch`` scores whole result previews inside ``map_batches``
(per-line max bucket — the "which lines are hot" signal the reference's
TUI renders).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_PUNCT = set("()[]{},;:.!?")
_WS = set(" \t\n")

# bucket -> (threshold, rgb, bold); reference heatmap.rs:17-60
_BUCKETS = (
    (0.875, (0, 255, 100), True),    # Step8
    (0.75, (0, 180, 80), False),     # Step7
    (0.625, (0, 160, 70), False),    # Step6
    (0.5, (0, 140, 60), False),      # Step5
    (0.375, (50, 120, 80), False),   # Step4
    (0.25, (100, 130, 100), False),  # Step3
    (0.125, (140, 140, 140), False), # Step2
    (0.0, (180, 180, 180), False),   # Step1 (score > 0)
)


def bucket_of(score: float) -> int:
    """0 = None, 1..8 = Step1..Step8 (reference ``from_score`` ladder)."""
    if score >= 0.875:
        return 8
    if score >= 0.75:
        return 7
    if score >= 0.625:
        return 6
    if score >= 0.5:
        return 5
    if score >= 0.375:
        return 4
    if score >= 0.25:
        return 3
    if score >= 0.125:
        return 2
    if score > 0.0:
        return 1
    return 0


def bucket_rgb(bucket: int) -> tuple[int, int, int] | None:
    if bucket <= 0:
        return None
    return _BUCKETS[8 - bucket][1]


def bucket_is_bold(bucket: int) -> bool:
    return bucket == 8


def split_into_tokens(text: str) -> list[str]:
    """Whitespace and listed punctuation become their own tokens; spacing
    is preserved (reference ``split_into_tokens``)."""
    out: list[str] = []
    cur: list[str] = []
    for ch in text:
        if ch in _WS or ch in _PUNCT:
            if cur:
                out.append("".join(cur))
                cur = []
            out.append(ch)
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out


def _fuzzy(s1: str, s2: str) -> float:
    if len(s1) < 3 or len(s2) < 3:
        return 0.0
    common = len(set(s1) & set(s2))
    return common / max(len(s1), len(s2))


def token_similarity(token: str, pattern: str) -> float:
    """Reference ``calculate_token_similarity`` verbatim semantics."""
    if not token.strip() or not any(c.isalnum() for c in token):
        return 0.0
    tl = token.lower()
    pl = pattern.lower()
    if tl == pl:
        return 1.0
    best = 0.0
    for word in pl.split():
        if len(word) < 3:
            continue
        if tl == word:
            best = max(best, 0.9)
        elif word in tl:
            best = max(best, 0.6 * (len(word) / len(tl)))
        elif tl in word and len(tl) >= 3:
            best = max(best, 0.5 * (len(tl) / len(word)))
        else:
            best = max(best, _fuzzy(tl, word) * 0.4)
    return best


def line_heat(line: str, pattern: str) -> tuple[float, int]:
    """(max token score, bucket) of one line."""
    best = 0.0
    for tok in split_into_tokens(line):
        s = token_similarity(tok, pattern)
        if s > best:
            best = s
            if best >= 1.0:
                break
    return best, bucket_of(best)


def heatmap_batch(t: pa.Table, pattern: str, text_col: str = "text") -> pa.Table:
    """map_batches stage: per row, the hottest line's score/bucket plus
    the per-line bucket vector (the TUI's gradient input)."""
    scores, buckets, line_buckets = [], [], []
    for text in t[text_col].to_pylist():
        per_line = [line_heat(ln, pattern) for ln in text.splitlines()]
        if per_line:
            s, b = max(per_line, key=lambda x: x[0])
        else:
            s, b = 0.0, 0
        scores.append(round(float(s), 6))
        buckets.append(b)
        line_buckets.append([pb for _, pb in per_line])
    return t.append_column(
        "heat_score", pa.array(scores, pa.float64())
    ).append_column(
        "heat_bucket", pa.array(buckets, pa.int32())
    ).append_column(
        "line_buckets", pa.array(line_buckets, pa.list_(pa.int32()))
    )


def highlight_ansi(text: str, pattern: str) -> str:
    """ANSI-coloured rendering (the reference highlighter's terminal
    output): each token wrapped in its bucket's 24-bit colour."""
    out = []
    for tok in split_into_tokens(text):
        b = bucket_of(token_similarity(tok, pattern))
        rgb = bucket_rgb(b)
        if rgb is None:
            out.append(tok)
        else:
            r, g, bl = rgb
            bold = "\x1b[1m" if bucket_is_bold(b) else ""
            out.append(f"{bold}\x1b[38;2;{r};{g};{bl}m{tok}\x1b[0m")
    return "".join(out)
