"""PII / toxicity scrubbing with Python-``re`` byte parity.

The north rule requires byte-identical scrubbed text versus the reference
implementation, whose patterns are Python ``re`` regexes
(pii_scanner_pack/pack_conf.json:4-13).  Java regex (Spark
``regexp_replace``) differs from Python ``re`` in enough corners (\\b
around unicode, alternation tie-breaks) that the scrub hot path runs
Python ``re.sub`` inside an Arrow-batched pandas UDF — the only Python in
the whole pipeline, vectorized at the batch level via ``pd.Series.str``.

Pattern application order is fixed (email → ipv4 → ipv6 → ssn →
blocklist) and must match the oracle's order exactly: scrubbing is not
commutative when patterns overlap.
"""

from __future__ import annotations

import re
from functools import lru_cache

import pandas as pd

from packs_spark.functions.patterns import SCRUB_PATTERNS
from packs_spark.ml.corpora import BLOCKLIST_TERMS

REPLACEMENT = {
    "email": "<EMAIL>",
    "ipv4": "<IP>",
    "ipv6": "<IP6>",
    "usa_ssn": "<SSN>",
}
BLOCKLIST_REPLACEMENT = "<REDACTED>"


@lru_cache(maxsize=1)
def compiled_patterns() -> list[tuple[str, "re.Pattern[str]", str]]:
    """(key, compiled pattern, replacement) in application order — compiled
    once per Python worker process (the pandas-UDF analogue of a broadcast
    model's lazy per-executor init)."""
    pats = [(k, re.compile(rx), REPLACEMENT[k]) for k, rx in SCRUB_PATTERNS]
    if BLOCKLIST_TERMS:
        block_rx = re.compile(
            r"\b(?:" + "|".join(re.escape(t) for t in BLOCKLIST_TERMS) + r")\b",
            re.IGNORECASE,
        )
        pats.append(("blocklist", block_rx, BLOCKLIST_REPLACEMENT))
    return pats


def scrub_series(texts: pd.Series) -> pd.Series:
    """Batch scrub: sequential ``str.replace`` (vectorized C loop over the
    batch per pattern) — semantics identical to per-string ``re.sub``."""
    out = texts
    for _key, pattern, repl in compiled_patterns():
        out = out.str.replace(pattern, repl, regex=True)
    return out


def scrub_spans(text: str | None) -> list[tuple[str, int, int]]:
    """(key, start, end) spans on the ORIGINAL text, per pattern, in
    application order.  Used for the lineage/span side-output; spans of
    later patterns are positions in the original, not the partially
    scrubbed, text (documented deviation: simpler to audit)."""
    if text is None:
        return []
    spans = []
    for key, pattern, _repl in compiled_patterns():
        for m in pattern.finditer(text):
            spans.append((key, m.start(), m.end()))
    return spans


def scrub_text(text: str | None) -> str | None:
    """Single-string reference implementation (the pandas oracle calls this;
    byte-parity with scrub_series is asserted in tests/test_pipeline.py)."""
    if text is None:
        return None
    out = text
    for _key, pattern, repl in compiled_patterns():
        out = pattern.sub(repl, out)
    return out
