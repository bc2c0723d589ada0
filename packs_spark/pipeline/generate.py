"""Deterministic synthetic Common-Crawl-style web-pages table.

Schema per BASELINE.json input_hint:
    url: string, warc_ts: timestamp, html: binary, text: string, lang: string

Content mix (fractions configurable, seed fixed):
* per-language prose sampled from WORD_POOLS (in-distribution for the
  langid/perplexity models) — the "keep" population;
* injected drop populations: empty / whitespace-only docs, too-short docs,
  repeated-ngram spam, high-symbol gibberish, random-letter gibberish
  (high perplexity);
* PII strings (emails, IPs, SSNs) and blocklist terms spliced into a
  fraction of docs — exercised by the scrub stage;
* hosts drawn from a Zipf-ish distribution so a few hosts are hot
  (exercises the salting path).

Everything is numpy-vectorized; 1M docs generate in ~tens of seconds.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from packs_spark.ml.corpora import BLOCKLIST_TERMS, WORD_POOLS

LANGS = list(WORD_POOLS)

PII_SAMPLES = [
    "contact me at john.doe{i}@example.com for details",
    "server address 192.168.{i}.42 responded",
    "ssn on file 123-45-6789 do not share",
]


def generate_pages(n_docs: int, seed: int = 42, n_hosts: int = 1000) -> pd.DataFrame:
    rng = np.random.default_rng(seed)

    # --- hosts: Zipf-ish (host k gets weight 1/(k+1)) -----------------
    ranks = np.arange(1, n_hosts + 1)
    host_p = (1.0 / ranks) / (1.0 / ranks).sum()
    hosts = rng.choice(n_hosts, size=n_docs, p=host_p)

    # --- language + doc class -----------------------------------------
    lang_idx = rng.integers(0, len(LANGS), size=n_docs)
    # classes: 0 good, 1 empty, 2 whitespace, 3 short, 4 repeat-spam,
    #          5 symbol-gibberish, 6 letter-gibberish
    classes = rng.choice(
        [0, 1, 2, 3, 4, 5, 6],
        size=n_docs,
        p=[0.70, 0.03, 0.02, 0.08, 0.06, 0.05, 0.06],
    )

    # --- good prose: sample word matrix then join ----------------------
    doc_len = rng.integers(30, 120, size=n_docs)
    texts: list[str] = [""] * n_docs
    for li, lang in enumerate(LANGS):
        pool = np.array(WORD_POOLS[lang])
        mask = (classes == 0) & (lang_idx == li)
        idxs = np.nonzero(mask)[0]
        if len(idxs) == 0:
            continue
        total_words = int(doc_len[idxs].sum())
        words = pool[rng.integers(0, len(pool), size=total_words)]
        offs = np.cumsum(doc_len[idxs])[:-1]
        for j, chunk in zip(idxs, np.split(words, offs)):
            texts[j] = " ".join(chunk)

    # --- drop populations ----------------------------------------------
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    symbols = np.array(list("#$%&*@!^~|\\/<>[]{}()=+"))
    for j in np.nonzero(classes == 1)[0]:
        texts[j] = ""
    for j in np.nonzero(classes == 2)[0]:
        texts[j] = "   \t  "
    short_idx = np.nonzero(classes == 3)[0]
    for j in short_idx:
        pool = WORD_POOLS[LANGS[lang_idx[j]]]
        texts[j] = " ".join(pool[: int(rng.integers(1, 5))])
    for j in np.nonzero(classes == 4)[0]:
        pool = WORD_POOLS[LANGS[lang_idx[j]]]
        phrase = " ".join(pool[:3])
        texts[j] = " ".join([phrase] * int(rng.integers(15, 40)))
    for j in np.nonzero(classes == 5)[0]:
        n = int(rng.integers(80, 300))
        texts[j] = "".join(rng.choice(symbols, size=n))
    for j in np.nonzero(classes == 6)[0]:
        n = int(rng.integers(200, 600))
        chars = rng.choice(letters, size=n)
        sp = rng.random(n) < 0.15
        texts[j] = "".join(np.where(sp, " ", chars))

    # --- PII / blocklist injection (into good docs only) ----------------
    good_idx = np.nonzero(classes == 0)[0]
    pii_pick = rng.random(len(good_idx)) < 0.10
    for j, inject in zip(good_idx, pii_pick):
        if inject:
            tmpl = PII_SAMPLES[int(rng.integers(0, len(PII_SAMPLES)))]
            texts[j] = texts[j] + " " + tmpl.format(i=int(rng.integers(0, 250)))
    block_pick = rng.random(len(good_idx)) < 0.05
    for j, inject in zip(good_idx, block_pick):
        if inject:
            term = BLOCKLIST_TERMS[int(rng.integers(0, len(BLOCKLIST_TERMS)))]
            words = texts[j].split()
            pos = int(rng.integers(0, max(len(words), 1)))
            words.insert(pos, term)
            texts[j] = " ".join(words)

    # --- assemble -------------------------------------------------------
    doc_ids = np.arange(n_docs)
    urls = [
        f"https://host{h}.example.org/page/{i}" for h, i in zip(hosts, doc_ids)
    ]
    base_ts = np.datetime64("2025-01-01T00:00:00")
    warc_ts = base_ts + rng.integers(0, 2 * 365 * 24 * 3600, size=n_docs).astype(
        "timedelta64[s]"
    )
    langs = [LANGS[i] for i in lang_idx]
    html = [
        f"<html><body><p>{t}</p></body></html>".encode("utf-8") for t in texts
    ]
    return pd.DataFrame(
        {
            "url": urls,
            "warc_ts": warc_ts.astype("datetime64[us]"),
            "html": html,
            "text": texts,
            "lang": langs,
        }
    )


def write_pages_parquet(path: str, n_docs: int, seed: int = 42, n_hosts: int = 1000):
    """Write the table as parquet (chunked to bound generator memory)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    chunk = 250_000
    writer = None
    for start in range(0, n_docs, chunk):
        n = min(chunk, n_docs - start)
        pdf = generate_pages(n, seed=seed + start, n_hosts=n_hosts)
        table = pa.Table.from_pandas(pdf, preserve_index=False)
        if writer is None:
            writer = pq.ParquetWriter(path, table.schema)
        # bounded row groups: Spark's parquet split unit is the row group —
        # one giant group would serialize the whole downstream pipeline
        writer.write_table(table, row_group_size=10_000)
    if writer:
        writer.close()
    return path
