"""Property tests for the near-dup ladder against brute-force ground truth.

Oracle parity proves Spark matches DuckDB running the SAME algorithm;
these tests check the algorithms against per-pair brute force on small
random corpora — LSH false-positive-freedom, the SimHash pigeonhole
exactness guarantee, and sampling determinism.
"""

from __future__ import annotations

import hashlib
import itertools
import random

from data_engineering_datawarehousingandetlpipeline_spark.operators import dedup as dd

VOCAB = [f"w{i}" for i in range(40)]


def _random_corpus(seed: int, n_docs: int = 60) -> list[tuple[int, str]]:
    """Duplicate-heavy corpus: base docs + mutated near-copies."""
    rng = random.Random(seed)
    docs: list[tuple[int, str]] = []
    doc_id = 0
    while doc_id < n_docs:
        base = rng.sample(VOCAB, rng.randint(8, 20))
        copies = rng.randint(1, 4)
        for _ in range(min(copies, n_docs - doc_id)):
            words = list(base)
            for _ in range(rng.randint(0, 2)):  # light mutation
                words[rng.randrange(len(words))] = rng.choice(VOCAB)
            docs.append((doc_id, " ".join(words)))
            doc_id += 1
    return docs


def _true_jaccard(a: str, b: str) -> float:
    sa, sb = set(a.split()), set(b.split())
    return len(sa & sb) / len(sa | sb)


def test_minhash_pairs_have_no_false_positives_and_high_recall(spark):
    docs = _random_corpus(seed=7)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dd.minhash_near_dup_pairs(df, threshold=0.9).collect()
    }
    text = dict(docs)
    truth = {
        (a, b): _true_jaccard(text[a], text[b])
        for a, b in itertools.combinations(sorted(text), 2)
        if _true_jaccard(text[a], text[b]) >= 0.9
    }
    # no false positives: every reported jaccard is the true set jaccard
    for (a, b), j in out.items():
        assert abs(j - _true_jaccard(text[a], text[b])) < 1e-12
        assert j >= 0.9
    # recall: the 16x8 s-curve misses a J>=0.9 pair with p ~ 1e-4
    assert len(out) >= 0.95 * len(truth), (len(out), len(truth))


def test_jaccard_doc_freq_cap_bounds_hot_shingle_fanout(spark):
    """One ultra-hot shingle must not fan the self-join out quadratically.

    40 docs all share the token "hot" (plus one unique token each), and 3
    docs additionally share the rare token "rare". Uncapped, the hot
    posting list alone emits C(40,2) = 780 candidate pairs, every one
    passing the 0.2 threshold (J = 1/3). With max_doc_freq below the hot
    frequency, "hot" leaves the index BEFORE the join: candidates are
    bounded by the surviving posting lists (only "rare", df = 3), and set
    sizes are recomputed over the capped vocabulary — the rare-pair
    Jaccard is 1.0, not 1/3.
    """
    n = 40
    docs = [(i, f"hot uniq{i}") for i in range(n)]
    docs += [(n + i, "hot rare") for i in range(3)]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    uncapped = dd.jaccard_pairs(df, threshold=0.2, shingle_width=1).collect()
    assert len(uncapped) == (n + 3) * (n + 2) // 2  # every pair shares "hot"

    capped = dd.jaccard_pairs(
        df, threshold=0.2, shingle_width=1, max_doc_freq=10
    ).collect()
    expected = {(n, n + 1), (n, n + 2), (n + 1, n + 2)}
    assert {(r.doc_a, r.doc_b) for r in capped} == expected
    for r in capped:
        assert r.jaccard == 1.0  # capped-vocab sets are both exactly {"rare"}


def test_jaccard_cap_matches_brute_force_on_capped_vocab(spark):
    """Capped Jaccard == brute-force Jaccard over the doc-freq-filtered
    vocabulary, on a random duplicate-heavy corpus (pair set AND values)."""
    docs = _random_corpus(seed=13)
    cap = 4
    text = dict(docs)
    freq: dict[str, int] = {}
    for t in text.values():
        for tok in set(t.split()):
            freq[tok] = freq.get(tok, 0) + 1
    keep = {tok for tok, c in freq.items() if c <= cap}
    capped_sets = {i: set(t.split()) & keep for i, t in text.items()}
    truth = {}
    for a, b in itertools.combinations(sorted(text), 2):
        union = capped_sets[a] | capped_sets[b]
        if not union:
            continue
        j = len(capped_sets[a] & capped_sets[b]) / len(union)
        if j >= 0.2:
            truth[(a, b)] = j
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dd.jaccard_pairs(
            df, threshold=0.2, shingle_width=1, max_doc_freq=cap
        ).collect()
    }
    assert set(out) == set(truth)
    for pair, j in out.items():
        assert abs(j - truth[pair]) < 1e-12


def _union_find_components(n_docs: int, edges: list[tuple[int, int]]) -> dict[int, int]:
    """Ground truth: min doc id of each node's connected component."""
    parent = list(range(n_docs))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in range(n_docs)}


def test_near_dup_clusters_shuffle_path_matches_broadcast_path(spark, monkeypatch):
    """r17: rounds run broadcast-frontier once the frontier count is under
    FRONTIER_BROADCAST_MAX_ROWS, with the pre-r17 shuffle rounds as the
    at-scale fallback. Both paths must produce identical components (the
    fallback is otherwise dead code locally — every test frontier is tiny),
    and the shuffle path must still converge within the logarithmic round
    budget."""
    n = 64
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(n)], "doc_id long, text string"
    )
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    stats_b: dict = {}
    broadcast = {
        r.doc_id: r.cluster_id
        for r in dd.near_dup_clusters(docs, chain, stats=stats_b).collect()
    }
    monkeypatch.setattr(dd, "FRONTIER_BROADCAST_MAX_ROWS", 0)
    stats_s: dict = {}
    shuffled = {
        r.doc_id: r.cluster_id
        for r in dd.near_dup_clusters(docs, chain, stats=stats_s).collect()
    }
    assert broadcast == shuffled == {i: 0 for i in range(n)}
    assert stats_s["rounds"] <= 10, stats_s  # shuffle jump stays ~log(diameter)


def test_near_dup_clusters_matches_union_find(spark):
    """The delta-frontier label propagation (r12 rework: only improved
    labels push, convergence probe fused into the round checkpoint) must
    assign exactly the union-find component minimum — on random sparse
    graphs, dense near-dup-like graphs, and chain graphs whose diameter
    forces many propagation rounds."""
    cases = []
    rng = random.Random(5)
    # random sparse graph
    cases.append((40, [(rng.randrange(40), rng.randrange(40)) for _ in range(25)]))
    # dense clique-ish components (the near-dup shape)
    clique_edges = [
        (a, b) for base in (0, 10, 20) for a, b in
        itertools.combinations(range(base, base + 8), 2)
    ]
    cases.append((30, clique_edges))
    # a 15-hop chain: worst-case diameter for propagation
    cases.append((16, [(i, i + 1) for i in range(15)]))
    for n_docs, edges in cases:
        docs = spark.createDataFrame(
            [(i, f"doc {i}") for i in range(n_docs)], "doc_id long, text string"
        )
        pairs = spark.createDataFrame(
            [(a, b) for a, b in edges if a != b] or [(0, 0)],
            "doc_a long, doc_b long",
        )
        stats: dict = {}
        got = {
            r.doc_id: r.cluster_id
            for r in dd.near_dup_clusters(docs, pairs, stats=stats).collect()
        }
        assert got == _union_find_components(n_docs, edges)
        assert stats["rounds"] >= 1


def test_near_dup_clusters_converges_in_eccentricity_rounds(spark):
    """Convergence-rounds plan gate (r11 verdict order 7): on a star
    graph centered at the min id, every label improves in round 1 and
    the frontier empties in round 2 — the round count must not regress
    past eccentricity + 1, the bound the 100 TB cost model assumes."""
    n = 20
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(n)], "doc_id long, text string"
    )
    star = spark.createDataFrame(
        [(0, i) for i in range(1, n)], "doc_a long, doc_b long"
    )
    stats: dict = {}
    got = {r.doc_id: r.cluster_id for r in dd.near_dup_clusters(docs, star, stats=stats).collect()}
    assert got == {i: 0 for i in range(n)}
    assert stats["rounds"] <= 2, stats
    # two disjoint 4-cliques: same bound, independent components in parallel
    cliques = spark.createDataFrame(
        [(a, b) for base in (0, 10) for a, b in itertools.combinations(range(base, base + 4), 2)],
        "doc_a long, doc_b long",
    )
    stats = {}
    dd.near_dup_clusters(docs, cliques, stats=stats).collect()
    assert stats["rounds"] <= 2, stats


def test_near_dup_clusters_rounds_are_logarithmic_in_diameter(spark):
    """The pointer jump must keep round count ~log(diameter), not linear:
    a 256-node chain (diameter 255) has to converge in ~log2 rounds —
    the property that bounds shuffle-barrier count on a real cluster
    (and the reason max_iterations=25 covers any realistic component)."""
    n = 256
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(n)], "doc_id long, text string"
    )
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    stats: dict = {}
    got = {r.doc_id: r.cluster_id for r in dd.near_dup_clusters(docs, chain, stats=stats).collect()}
    assert got == {i: 0 for i in range(n)}
    assert stats["rounds"] <= 10, stats  # measured 9; linear would be 256


def _brute_simhash(text: str, bits: int = 32) -> int:
    votes = [0] * bits
    for tok in dict.fromkeys(text.split()):
        h = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16)
        for i in range(bits):
            votes[i] += 1 if (h >> i) & 1 else -1
    return sum(1 << i for i in range(bits) if votes[i] >= 0)


def test_simhash_pairs_exact_by_pigeonhole(spark):
    """With max_hamming < bands the banded join is EXACT: the output must
    equal brute-force Hamming over all pairs, not approximate it."""
    docs = _random_corpus(seed=11)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in dd.simhash_near_dup_pairs(df, max_hamming=3).collect()
    }
    fp = {i: _brute_simhash(t) for i, t in docs}
    expected = {
        (a, b): bin(fp[a] ^ fp[b]).count("1")
        for a, b in itertools.combinations(sorted(fp), 2)
        if bin(fp[a] ^ fp[b]).count("1") <= 3
    }
    assert got == expected


def test_simhash_rejects_unsafe_hamming_bound():
    import pytest

    with pytest.raises(ValueError):
        dd.simhash_near_dup_pairs(None, max_hamming=4, bands=4)


def test_kmeans_centroids_deterministic_across_runs(spark):
    """Same corpus, two independent plans → bit-identical centroids (the
    decimal-anchored update makes order of aggregation irrelevant)."""
    from data_engineering_datawarehousingandetlpipeline_spark.operators.similarity import (
        kmeans_centroids,
    )

    rng = random.Random(3)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    a = {r.cid: r.cvec for r in kmeans_centroids(df.repartition(7), n_centroids=4).collect()}
    b = {r.cid: r.cvec for r in kmeans_centroids(df.repartition(13), n_centroids=4).collect()}
    assert a == b


def test_pack_bins_matches_brute_force_packer(spark):
    """Sequence packing vs a literal sequential packer: walk each shard in
    doc_id order keeping a running token total; offset = total before the
    doc, bin = offset // capacity. Sparse/duplicate ids, zero-token docs,
    and docs larger than a whole bin must all lay out identically."""
    from data_engineering_datawarehousingandetlpipeline_spark.operators.text import (
        pack_token_bins,
    )

    capacity, shard_docs = 50, 16
    for seed in (3, 11):
        rng = random.Random(seed)
        ids = sorted(rng.sample(range(200), 80))
        rows = [(i, rng.choice([0, 1, 7, 23, 49, 50, 120])) for i in ids]

        expect = {}
        running: dict[int, int] = {}
        for doc_id, n in rows:  # already in doc_id order
            shard = doc_id // shard_docs
            off = running.get(shard, 0)
            expect[doc_id] = (shard, n, off // capacity, off)
            running[shard] = off + n

        df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
        got = {
            r.doc_id: (r.shard, r.n_tokens, r.bin_in_shard, r.offset_tokens)
            for r in pack_token_bins(df, capacity, shard_docs).collect()
        }
        assert got == expect


def test_chunking_matches_brute_force_chunker(spark):
    """chunk_documents vs a literal Python chunker over randomized token
    counts (0 .. several windows, exact-boundary and off-by-one sizes):
    identical chunk counts, token slices, and truncation of the final
    window. Tokens are distinct so any slice misalignment is visible."""
    from data_engineering_datawarehousingandetlpipeline_spark.operators.text import (
        chunk_documents,
    )

    chunk, stride = 6, 4
    rng = random.Random(7)
    sizes = [0, 1, chunk - 1, chunk, chunk + 1, chunk + stride,
             chunk + stride + 1] + [rng.randrange(0, 40) for _ in range(20)]
    rows = [(i, " ".join(f"w{i}_{j}" for j in range(n))) for i, n in enumerate(sizes)]

    expect = {}
    for doc_id, text in rows:
        toks = text.lower().strip().split() if text else [""]
        n = len(toks)
        n_chunks = 1 + max(0, -(-(n - chunk) // stride))
        expect[doc_id] = [
            " ".join(toks[k * stride : k * stride + chunk])
            for k in range(n_chunks)
        ]

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got: dict[int, list[str]] = {}
    for r in chunk_documents(df, chunk_size=chunk, stride=stride).collect():
        got.setdefault(r.doc_id, []).append((r.chunk_id, r.chunk_text))
    got_texts = {k: [t for _, t in sorted(v)] for k, v in got.items()}
    assert got_texts == expect


def test_binding_df_cap_cluster_graph_matches_duckdb_end_to_end(spark):
    """CLUSTER_MAX_DOC_FREQ never binds on the driver corpus (measured df
    bands sit below it — see the constant's docstring), so the family's
    plan gates pin the prune's physical PRESENCE but nothing exercises
    its binding SEMANTICS detector-through-components. This test does: a
    corpus where a hot token exceeds a small cap, run through the exact
    code path the family uses (jaccard_pairs(width=1, max_doc_freq=K) →
    near_dup_clusters) against DuckDB running the registered oracle CTE
    chain (extensions.sql_cluster_ctes) at the same K — and the cap
    provably CHANGES the graph (the uncapped run pairs docs the capped
    run must not)."""
    import duckdb

    from data_engineering_datawarehousingandetlpipeline_spark.operators import (
        dedup as dd,
    )
    from data_engineering_datawarehousingandetlpipeline_spark.plans.extensions import (
        sql_cluster_ctes,
    )

    cap, threshold = 2, 0.3
    rows = [
        (1, "hot aa bb"),   # (1,2): exact twins — pair with or without cap
        (2, "hot aa bb"),
        (3, "hot cc dd"),   # (3,4): twins
        (4, "hot cc dd"),
        (5, "hot ee"),      # (5,6): j=1/3 uncapped (via "hot"), 0 capped
        (6, "hot ff"),
        (7, "hot"),         # all tokens pruned: must survive as a singleton
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    # the cap binds AND matters: uncapped, "hot" (df=7 > 2) glues 5 and 6
    uncapped = {
        (r.doc_a, r.doc_b)
        for r in dd.jaccard_pairs(
            docs, threshold=threshold, shingle_width=1
        ).select("doc_a", "doc_b").collect()
    }
    assert (5, 6) in uncapped

    pairs = dd.jaccard_pairs(
        docs, threshold=threshold, shingle_width=1, max_doc_freq=cap
    )
    got_pairs = {(r.doc_a, r.doc_b) for r in pairs.select("doc_a", "doc_b").collect()}
    assert got_pairs == {(1, 2), (3, 4)}  # the hot-token pair is gone

    labels = dd.near_dup_clusters(docs, pairs)
    got = sorted((r.doc_id, r.cluster_id) for r in labels.collect())

    con = duckdb.connect()
    try:
        con.register(
            "documents",
            __import__("pandas").DataFrame(rows, columns=["doc_id", "text"]),
        )
        expect = sorted(
            tuple(r)
            for r in con.execute(
                sql_cluster_ctes(max_doc_freq=cap, threshold=threshold)
                + " SELECT doc_id, cluster_id FROM clusters"
            ).fetchall()
        )
    finally:
        con.close()

    assert got == expect
    assert (7, 7) in dict(got).items()  # fully-pruned doc stays a singleton
