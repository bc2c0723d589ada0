"""HTML/JSON profile report sink (SURVEY §2 S7).

The reference writes a ydata-profiling HTML + JSON report per dataset
(profiling_pack/main.py:272-289).  The engine-side equivalent renders the
*distributed* profiling query results (per-column metric frames — tiny by
construction) into one standalone HTML file and one JSON file, driver-side,
with zero extra dependencies.  The data passes stay in Spark; only the
few-hundred-row result frames are collected.
"""

from __future__ import annotations

import html
import json
import os
from typing import Mapping

from pyspark.sql import DataFrame

_CSS = (
    "body{font-family:sans-serif;margin:2em;color:#222}"
    "h1{font-size:1.4em}h2{font-size:1.1em;margin-top:1.5em}"
    "table{border-collapse:collapse;margin:0.5em 0}"
    "th,td{border:1px solid #ccc;padding:4px 10px;text-align:left;"
    "font-size:0.9em}th{background:#f0f0f0}"
)


def _section_html(name: str, df: DataFrame, max_rows: int) -> tuple[str, list]:
    rows = df.limit(max_rows).collect()
    cols = df.columns
    head = "".join(f"<th>{html.escape(c)}</th>" for c in cols)
    body = "".join(
        "<tr>"
        + "".join(
            f"<td>{html.escape('' if v is None else str(v))}</td>" for v in r
        )
        + "</tr>"
        for r in rows
    )
    section = (
        f"<h2>{html.escape(name)}</h2>"
        f"<table><thead><tr>{head}</tr></thead><tbody>{body}</tbody></table>"
    )
    records = [dict(zip(cols, [None if v is None else v for v in r])) for r in rows]
    return section, records


def profile_report(
    sections: Mapping[str, DataFrame],
    html_path: str,
    json_path: str | None = None,
    title: str = "profile report",
    max_rows_per_section: int = 1000,
) -> str:
    """Write ``sections`` (name → small result DataFrame, e.g. the
    profiling / text-validation / timeliness query outputs) as a
    standalone HTML report, plus a JSON twin when ``json_path`` is given
    (the reference emits both, profiling_pack/main.py:272-289).

    Each section is capped at ``max_rows_per_section`` — reports are
    human artifacts; exports of full offending rows belong to
    :mod:`packs_spark.io.export`.
    """
    parts = [
        "<!doctype html><html><head><meta charset='utf-8'>"
        f"<title>{html.escape(title)}</title><style>{_CSS}</style></head>"
        f"<body><h1>{html.escape(title)}</h1>"
    ]
    blob: dict[str, list] = {}
    for name, df in sections.items():
        section, records = _section_html(name, df, max_rows_per_section)
        parts.append(section)
        blob[name] = records
    parts.append("</body></html>")
    os.makedirs(os.path.dirname(html_path) or ".", exist_ok=True)
    with open(html_path, "w", encoding="utf-8") as f:
        f.write("".join(parts))
    if json_path:
        with open(json_path, "w", encoding="utf-8") as f:
            json.dump(blob, f, indent=1, default=str)
    return html_path
