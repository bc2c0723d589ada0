"""Dedup operators vs exact pandas/python oracles.

The SQL-expressible tiers (exact, n-gram Jaccard) are gated by the DuckDB
oracle in __spark_entry__; these tests cover the hash-based tiers the
oracle can't express (MinHash estimate quality, LSH recall, SimHash).
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from packs_spark.operators import dedup


def _shingles(text: str, k: int = 5) -> set[str]:
    if text is None or len(text) < k:
        return set()
    return {text[i : i + k] for i in range(len(text) - k + 1)}


def _jaccard(a: set, b: set) -> float:
    if not a or not b:
        return 0.0
    return len(a & b) / len(a | b)


def test_char_shingles_match_python(spark, documents, documents_pd):
    got = {
        r["doc_id"]: set(r["sh"])
        for r in documents.select(
            "doc_id", dedup.char_shingles(F.col("text"), 5).alias("sh")
        ).collect()
    }
    for _, row in documents_pd.head(50).iterrows():
        assert got[row.doc_id] == _shingles(row.text, 5), row.doc_id


def test_minhash_estimates_jaccard(spark, documents, documents_pd):
    """Signature-agreement estimate within ±0.2 of exact Jaccard for the
    highest-overlap pairs (64 hashes → s.e. ≈ sqrt(s(1-s)/64) ≈ 0.06)."""
    sub = documents.limit(60)
    sigs = {
        r["id"]: r["sig"]
        for r in dedup.minhash_signatures(sub, "doc_id", "text", 5, 64).collect()
    }
    pdf = documents_pd.set_index("doc_id")
    ids = sorted(sigs)
    checked = 0
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = ids[i], ids[j]
            exact = _jaccard(_shingles(pdf.loc[a].text), _shingles(pdf.loc[b].text))
            est = sum(x == y for x, y in zip(sigs[a], sigs[b])) / 64
            assert abs(est - exact) <= 0.2, (a, b, exact, est)
            checked += 1
    assert checked > 100


def test_lsh_recall_of_true_near_dups(spark, sf_dir):
    """Docs with true Jaccard >= 0.7 must surface as LSH candidates
    (b=16, r=4 → P(candidate | s=0.7) ≈ 1-(1-0.24)^16 ≈ 0.99).
    Build planted near-dups since the corpus has none."""
    base = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(30)
    orig = base.select("doc_id", "text")
    # planted: append a short suffix → high char-5-gram overlap
    mutated = base.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz")).alias("text"),
    )
    df = orig.unionByName(mutated)
    sigs = dedup.minhash_signatures(df, "doc_id", "text", 5, 64)
    cand = dedup.lsh_candidate_pairs(sigs, bands=16, rows_per_band=4)
    pairs = {(r["id_a"], r["id_b"]) for r in cand.collect()}
    planted = {(i, i + 100000) for i in [r["doc_id"] for r in orig.collect()]}
    found = sum(1 for p in planted if p in pairs)
    assert found / len(planted) >= 0.9, f"LSH recall {found}/{len(planted)}"


def _simhash_py(text: str) -> int | None:
    """Pure-python oracle replicating the Spark plan: xxhash64 per token is
    not replicable without the JVM, so the oracle checks *structure*: the
    Spark fingerprint must equal the bit-majority of the Spark token hashes."""
    return None


def test_simhash_is_bit_majority_of_token_hashes(spark, documents):
    sub = documents.limit(40)
    fp = {r["id"]: r["simhash"] for r in dedup.simhash(sub, "doc_id", "text").collect()}
    toks = (
        sub.select(
            F.col("doc_id").alias("id"),
            F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"),
        )
        .where(F.col("tok") != "")
        .select("id", F.xxhash64("tok").alias("h"))
        .collect()
    )
    by_doc: dict[int, list[int]] = {}
    for r in toks:
        by_doc.setdefault(r["id"], []).append(r["h"])
    for doc, hashes in by_doc.items():
        expected = 0
        for b in range(64):
            s = sum(1 if (h >> b) & 1 else -1 for h in hashes)
            if s > 0:
                expected |= 1 << b
        # Python ints are unbounded; Spark bigint is two's-complement 64-bit
        if expected >= 1 << 63:
            expected -= 1 << 64
        assert fp[doc] == expected, doc


def test_simhash_near_identical_docs_have_small_hamming(spark, documents):
    base = documents.limit(20).select("doc_id", "text")
    mutated = base.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra")).alias("text"),
    )
    fp = dedup.simhash(base.unionByName(mutated), "doc_id", "text")
    rows = {r["id"]: r["simhash"] for r in fp.collect()}
    for i in [r["doc_id"] for r in base.collect()]:
        d = bin((rows[i] ^ rows[i + 100000]) & ((1 << 64) - 1)).count("1")
        assert d <= 8, (i, d)


def test_exact_dup_summary_counts(spark, documents):
    doubled = documents.unionByName(documents)
    row = dedup.exact_dup_summary(doubled).collect()[0]
    n = documents.count()
    uniq = documents.select("text").distinct().count()
    assert row["n_docs"] == 2 * n
    assert row["n_unique_texts"] == uniq
    assert row["dup_docs"] == 2 * n - uniq


def test_jaccard_max_df_drops_boilerplate_and_keeps_sizes_consistent(spark):
    """A planted boilerplate shingle shared by EVERY doc must be capped out
    of BOTH the intersection and the set sizes: the surviving pairs carry
    the exact jaccard of the capped shingle space (a cap applied to the
    numerator only would underestimate and miss threshold pairs)."""
    from packs_spark.operators.dedup import char_shingles, jaccard_pairs

    boiler = "COOKIE-BANNER"  # 13 chars -> 9 distinct 5-shingles
    docs = [
        (1, boiler + " alpha beta gamma delta"),
        (2, boiler + " alpha beta gamma delts"),  # near-dup of 1
        (3, boiler + " something else entirely here"),
        (4, boiler + " fourth unrelated document text"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])

    # cap at 3: the boilerplate shingles (df=4) are dropped, the rest stay
    got = {
        (r.id_a, r.id_b): (r.inter, r.size_a, r.size_b, r.jaccard)
        for r in jaccard_pairs(df, k=5, threshold=0.0, max_df=3).collect()
    }

    # python oracle over the capped shingle space
    def shingles(t):
        return {t[i : i + 5] for i in range(len(t) - 4)}

    sets = {i: shingles(t) for i, t in docs}
    from collections import Counter

    dfreq = Counter(s for ss in sets.values() for s in ss)
    capped = {i: {s for s in ss if dfreq[s] <= 3} for i, ss in sets.items()}
    for (a, b), (inter, sa, sb, jac) in got.items():
        ia = capped[a] & capped[b]
        assert inter == len(ia)
        assert sa == len(capped[a]) and sb == len(capped[b])
        expected = round(len(ia) / len(capped[a] | capped[b]), 6)
        assert abs(jac - expected) < 1e-9
    # the near-dup pair must survive with a HIGH jaccard despite the cap
    assert got[(1, 2)][3] > 0.5
    # every capped-space pair with any overlap appears
    expected_pairs = {
        (a, b)
        for a in capped
        for b in capped
        if a < b and capped[a] & capped[b]
    }
    assert set(got) == expected_pairs


def test_connected_components_labels(spark):
    """Chain (1-2-3), clique (10,11,12), isolated pair (20,21): every node
    must get the min id of its component."""
    from packs_spark.operators.dedup import cluster_summary, connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 12), (10, 12), (20, 21)],
        ["id_a", "id_b"],
    )
    labels = {r.node: r.label for r in connected_components(pairs).collect()}
    assert labels == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}

    s = cluster_summary(connected_components(pairs)).first()
    assert (s.n_nodes, s.n_clusters, s.max_cluster_size) == (8, 3, 3)


def test_connected_components_long_chain_converges(spark):
    """A 12-node path needs ~diameter rounds — checks the iteration loop
    actually propagates beyond one hop."""
    from packs_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(100, 112)], ["id_a", "id_b"]
    )
    labels = {r.node: r.label for r in connected_components(pairs).collect()}
    assert set(labels.values()) == {100} and len(labels) == 13


def test_embedding_lsh_recall_vs_bruteforce(spark):
    """Planted near-dups (tiny noise around base vectors) must be found by
    the LSH tier with high recall; every reported pair must be a true pair
    (exact cosine verification makes precision 1.0 by construction)."""
    import numpy as np

    from packs_spark.operators.dedup import (
        embedding_near_dups,
        embedding_near_dups_lsh,
    )

    rng = np.random.default_rng(11)
    dim, n_base = 16, 40
    base = rng.normal(size=(n_base, dim))
    rows = []
    vid = 0
    for i in range(n_base):
        for _ in range(2):  # two noisy copies of each base -> 40 true pairs
            v = base[i] + rng.normal(scale=0.02, size=dim)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])

    true_pairs = {
        (r.id_a, r.id_b)
        for r in embedding_near_dups(df, "vec_id", "embedding", 0.95).collect()
    }
    got_pairs = {
        (r.id_a, r.id_b)
        for r in embedding_near_dups_lsh(
            df, "vec_id", "embedding", 0.95, dim=dim, n_planes=8, n_tables=8
        ).collect()
    }
    assert true_pairs, "fixture must plant near-dup pairs"
    assert got_pairs <= true_pairs  # exact verification => no false positives
    recall = len(got_pairs) / len(true_pairs)
    assert recall >= 0.9, f"recall {recall:.2f}"


def test_dedup_decisions_keep_one_per_cluster(spark):
    from packs_spark.operators.dedup import connected_components, dedup_decisions

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(8)], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame([(1, 2), (2, 5), (6, 7)], ["id_a", "id_b"])
    labels = connected_components(pairs)
    out = {r.doc_id: r.keep for r in dedup_decisions(docs, labels).collect()}
    # cluster {1,2,5} keeps 1; cluster {6,7} keeps 6; 0,3,4 untouched
    assert out == {0: True, 1: True, 2: False, 3: True, 4: True,
                   5: False, 6: True, 7: False}


def test_connected_components_distributed_path_matches_fast_path(spark):
    """driver_cap=0 forces the hash-min loop; labels must equal the
    union-find fast path on the same graph."""
    from packs_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 12), (10, 12), (20, 21)]
        + [(i, i + 1) for i in range(100, 112)],
        ["id_a", "id_b"],
    )
    fast = {r.node: r.label for r in connected_components(pairs).collect()}
    dist = {
        r.node: r.label
        for r in connected_components(pairs, driver_cap=0).collect()
    }
    assert fast == dist
    assert dist[112] == 100 and dist[3] == 1 and dist[21] == 20
