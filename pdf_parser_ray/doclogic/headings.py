"""Heading detection (reference: parsers/heading_strategies.py).

The reference models this as a Strategy-pattern class hierarchy with
per-instance match counters; here each strategy is a pure confidence
function over a line, and the composite detector takes the max-confidence
winner. Counters (heading_strategies.py:26-52) are dropped — they feed no
output — with per-partition metrics handled by the pipeline's metrics rows
instead.

Registry-based so user strategies can be plugged in (the reference's
``HeadingDetector.add_strategy``, heading_strategies.py:211-217).
"""

from __future__ import annotations

import re
from typing import Callable, Optional

_NUMBERED_RE = re.compile(r"^\d+(\.\d+)*\s+\S+")
_ALLCAPS_RE = re.compile(r"^[A-Z0-9\s\-\(\/]{4,}$")


def numbered_heading_confidence(line: str) -> float:
    """'1.2.3 Title' style headings: 0.6 + 0.2/dot, capped at 1.

    Reference: heading_strategies.py:64-87 (dot count over the whole line).
    """
    if not line or not _NUMBERED_RE.match(line.strip()):
        return 0.0
    return min(1.0, 0.6 + line.count(".") * 0.2)


def allcaps_heading_confidence(line: str) -> float:
    """ALL-CAPS headings; confidence = uppercase ratio among alpha chars.

    Reference: heading_strategies.py:89-137 (pattern + >=2 uppercase alphas).
    """
    if not line:
        return 0.0
    stripped = line.strip()
    if not _ALLCAPS_RE.match(stripped):
        return 0.0
    upper = sum(1 for c in stripped if c.isalpha() and c.isupper())
    if upper < 2:
        return 0.0
    alpha = sum(1 for c in line if c.isalpha())
    if alpha == 0:
        return 0.0
    return min(1.0, sum(1 for c in line if c.isalpha() and c.isupper()) / alpha)


def mixedcap_heading_confidence(line: str) -> float:
    """Title-Case-ish headings; confidence = capitalized-word ratio.

    A word counts as capitalized when its first char is upper or a digit;
    needs >=2 words and capitalized count >= max(1, n_words // 2).
    Reference: heading_strategies.py:140-193.
    """
    if not line:
        return 0.0
    words = line.split()
    if len(words) < 2:
        return 0.0
    capitalized = sum(1 for w in words if w and (w[0].isupper() or w[0].isdigit()))
    if capitalized < max(1, len(words) // 2):
        return 0.0
    return capitalized / len(words)


HeadingStrategy = Callable[[str], float]

DEFAULT_STRATEGIES: tuple[HeadingStrategy, ...] = (
    numbered_heading_confidence,
    allcaps_heading_confidence,
    mixedcap_heading_confidence,
)


def detect_heading(
    line: Optional[str], strategies: tuple[HeadingStrategy, ...] = DEFAULT_STRATEGIES
) -> Optional[str]:
    """Return the stripped line when any strategy gives confidence > 0.

    Reference: heading_strategies.py:219-255 — the detector returns the line
    itself (not the strategy name), keyed on the best strictly-positive
    confidence. Strategies see the stripped line, as in detect_heading's
    ``clean_line``.
    """
    if not line:
        return None
    clean_line = line.strip()
    best = 0.0
    for strategy in strategies:
        confidence = strategy(clean_line)
        if confidence > best:
            best = confidence
    return clean_line if best > 0 else None


def winning_strategy(
    line: Optional[str], strategies: tuple[HeadingStrategy, ...] = DEFAULT_STRATEGIES
) -> Optional[str]:
    """Name of the strategy that wins :func:`detect_heading`'s strict-max
    contest for this line, or None when no strategy fires.

    This is the reference's per-strategy match counter surface
    (heading_strategies.py:26-52) re-expressed as a pure attribution
    function — counts become a distributed groupby over winners
    (ops/text_analysis.heading_strategy_stats) instead of actor-local
    mutable state."""
    if not line:
        return None
    clean_line = line.strip()
    best, name = 0.0, None
    for strategy in strategies:
        confidence = strategy(clean_line)
        if confidence > best:
            best, name = confidence, getattr(strategy, "__name__", str(strategy))
    return name if best > 0 else None
