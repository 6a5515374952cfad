"""Property-based tests (hypothesis) for the dedup operators: for ANY
generated dataset, latest-wins keeps exactly one row per key — the max
order value with the deterministic tiebreak — and exact dedup groups
partition the input. Complements the fixed-corpus oracle checks."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.operators.dedup import (
    exact_dedup_groups,
    jaccard_pairs,
    latest_wins,
    prefix_filtered_candidates,
)

_KEYS = st.sampled_from(["k1", "k2", "k3", "k4"])
_ORDERS = st.one_of(st.none(), st.integers(min_value=0, max_value=9))
_ROWS = st.lists(
    st.tuples(_KEYS, _ORDERS, st.integers(min_value=0, max_value=99)),
    min_size=1,
    max_size=30,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=_ROWS)
def test_latest_wins_properties(spark, rows):
    df = spark.createDataFrame(
        [(k, o, f"{k}-{o}-{t}") for k, o, t in rows],
        "key string, ord int, tie string",
    )
    out = latest_wins(df, "key", "ord", "tie").collect()
    # exactly one survivor per distinct key
    assert sorted(r["key"] for r in out) == sorted({k for k, _, _ in rows})
    by_key: dict[str, list[tuple]] = {}
    for k, o, t in rows:
        by_key.setdefault(k, []).append((k, o, f"{k}-{o}-{t}"))
    for r in out:
        cands = by_key[r["key"]]
        # survivor has the max non-null order (nulls last) …
        orders = [o for _, o, _ in cands if o is not None]
        if orders:
            assert r["ord"] == max(orders)
            # … and among ties, the max tiebreak string
            best_tie = max(t for _, o, t in cands if o == max(orders))
        else:
            assert r["ord"] is None
            best_tie = max(t for _, _, t in cands)
        assert r["tie"] == best_tie


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    texts=st.lists(
        st.text(alphabet="ab c", min_size=0, max_size=12), min_size=1, max_size=20
    )
)
def test_exact_dedup_partitions_input(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    groups = exact_dedup_groups(df, "doc_id", "text").collect()
    assert sum(r["n_docs"] for r in groups) == len(texts)
    # keep_doc_id is the min id of its group, and ids are valid
    keeps = [r["keep_doc_id"] for r in groups]
    assert len(set(keeps)) == len(keeps)
    assert all(0 <= k < len(texts) for k in keeps)


# ---------------------------------------------------------------------------
# prefix filtering (r5): lossless at the threshold, and bounded on hot keys
# ---------------------------------------------------------------------------


def _brute_force_jaccard(shingle_sets: dict[int, set], threshold: float):
    out = set()
    ids = sorted(shingle_sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            sa, sb = shingle_sets[a], shingle_sets[b]
            if not sa or not sb:
                continue
            j = len(sa & sb) / len(sa | sb)
            if j >= threshold:
                out.add((a, b))
    return out


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    texts=st.lists(
        st.text(alphabet="abc xyz", min_size=2, max_size=24), min_size=2, max_size=16
    ),
    threshold=st.sampled_from([0.3, 0.5, 0.8]),
)
def test_prefix_filtered_jaccard_is_exact(spark, texts, threshold):
    """The prefix-filtered inverted index loses NO pair at the threshold:
    jaccard_pairs == brute-force all-pairs Jaccard over 1-word shingles."""
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {
        (r["doc_a"], r["doc_b"])
        for r in jaccard_pairs(df, "doc_id", "text", k=1, threshold=threshold).collect()
    }
    sets = {i: set(t.split()) - {""} for i, t in enumerate(texts)}
    assert got == _brute_force_jaccard(sets, threshold)


def test_prefix_filter_excludes_universal_hot_shingle(spark):
    """A shingle shared by ALL docs (the stop-word-bigram hazard: df = n,
    naive posting-list self-join = n² rows) must fall outside every doc's
    prefix — the candidate join sees ZERO pairs through it, so the join
    input stays o(n²)."""
    n, uniq = 40, 9  # sz=10, t=0.8 -> prefix = ceil(0.2*10)+1 = 3 rarest
    rows = [
        (i, g) for i in range(n) for g in [f"u{i}_{j}" for j in range(uniq)] + ["hot"]
    ]
    sh = spark.createDataFrame(rows, ["doc", "g"])
    cands = prefix_filtered_candidates(sh, threshold=0.8)
    # every doc's unique shingles have df=1 < df(hot)=n, so all prefixes
    # consist of unique shingles only -> no candidate pairs at all,
    # versus n(n-1)/2 = 780 through the hot posting list naively
    assert cands.count() == 0


def test_prefix_filter_still_joins_on_shared_rare_shingles(spark):
    """Sanity inverse: docs that really are near-dups (share most rare
    shingles) DO surface as candidates despite the hot shingle."""
    rows = []
    for i in range(6):
        shared = [f"s{j}" for j in range(9)]  # same 9 rare-ish shingles
        rows += [(i, g) for g in shared + [f"only{i}", "hot" * 1]]
    # plus 20 unrelated docs carrying 'hot' to make it globally frequent
    for i in range(100, 120):
        rows += [(i, g) for g in [f"x{i}_{j}" for j in range(10)] + ["hot"]]
    sh = spark.createDataFrame(rows, ["doc", "g"]).distinct()
    cands = prefix_filtered_candidates(sh, threshold=0.5)
    got = {(r["doc_a"], r["doc_b"]) for r in cands.collect()}
    expected = {(a, b) for a in range(6) for b in range(a + 1, 6)}
    assert expected <= got


# ---------------------------------------------------------------------------
# capped SemDeDup (r6): one mega-cluster must not re-introduce the quadratic
# ---------------------------------------------------------------------------


def test_semdedup_capped_hot_cluster_bounded(spark):
    """r5 verdict's last scale-killer: plant ONE cluster holding most
    docs (180 identical boilerplate vectors + 10 diverse) and assert the
    capped pipeline's pair-join input volume is o(n²): the SRP
    representative screen kills the identical mass linearly, and the
    stage-B candidate join sees only survivor pairs."""
    import math

    from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.operators import (
        similarity as S,
    )

    fam = [1.0, 0.0] + [0.0] * 6
    n_fam = 180
    diverse = []
    for k in range(2, 12):  # directions 60°..330°: pairwise cos <= cos(30°) < 0.9
        th = math.radians(30 * k)
        diverse.append([math.cos(th), math.sin(th)] + [0.0] * 6)
    rows = [(i, fam) for i in range(n_fam)] + [
        (1000 + j, v) for j, v in enumerate(diverse)
    ]
    n = len(rows)
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame([(0, fam)], "vec_id long, embedding array<double>")

    assigned = S.assign_centroids(emb, cents)
    frames = S.semdedup_capped_frames(
        assigned, threshold=0.9, max_cluster_size=50,
        nbits=16, dim=8, max_hamming=3,
    )
    # stage A: the identical family collapses onto its min-id rep —
    # exactly n_fam-1 drops from n_fam-1 comparisons (linear)
    assert frames["drop_a"].count() == n_fam - 1
    assert frames["survivors"].count() == n - (n_fam - 1)
    # stage B: candidate volume bounded by survivor pairs, never n²
    cand = frames["candidates"].count()
    assert cand <= 11 * 10 // 2, f"{cand} candidates vs bound 55"
    assert cand < n * (n - 1) // 2 * 0.01  # o(n²): <1% of all-pairs

    # on this corpus the capped rule loses NOTHING vs the exact rule
    # (every true near-dup pair lives inside one signature group)
    kw = dict(threshold=0.9, max_cluster_size=50, nbits=16, dim=8, max_hamming=3)
    capped = {(r.vec_id, r.keep) for r in S.semdedup_keep(emb, cents, **kw).collect()}
    exact = {
        (r.vec_id, r.keep)
        for r in S.semdedup_keep(emb, cents, threshold=0.9).collect()
    }
    assert capped == exact
    kept = {i for i, k in capped if k}
    assert kept == {0} | {1000 + j for j in range(10)}


def test_prefix_join_volume_bounded_under_hot_key(spark):
    """Plan-level pin for the r4 verdict's scale hazard: with a universal
    hot shingle, the rows entering the candidate equi-join (the pruned
    prefix frames) exclude the hot posting list entirely."""
    n = 30
    rows = [
        (i, g) for i in range(n) for g in [f"u{i}_{j}" for j in range(9)] + ["hot"]
    ]
    sh = spark.createDataFrame(rows, ["doc", "g"])
    dfreq = sh.groupBy("g").agg(F.count("*").alias("_gdf"))
    # reproduce the operator's prefix frame and measure what would join
    from pyspark.sql.window import Window

    w_doc = Window.partitionBy("doc").orderBy(F.col("_gdf").asc(), F.col("g").asc())
    ranked = sh.join(dfreq, "g").select(
        "doc", "g",
        F.row_number().over(w_doc).alias("_pos"),
        F.count("*").over(Window.partitionBy("doc")).alias("_sz"),
    )
    prefix = ranked.filter(F.col("_pos") <= F.ceil(F.lit(1.0 - 0.8) * F.col("_sz")) + 1)
    hot_rows = prefix.filter(F.col("g") == "hot").count()
    assert hot_rows == 0  # the n²-risk posting list never enters the join
    assert prefix.count() == n * 3  # ceil(0.2*10)+1 = 3 per doc


def test_winnowing_shared_run_guarantee(spark):
    """Schleimer et al. guarantee: two documents sharing a run of
    >= w + k - 1 tokens must share at least one winnowing fingerprint,
    regardless of the surrounding text."""
    from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.plans.llm_ops import (
        _WINNOW_K,
        _WINNOW_W,
        _winnow_fp_rows,
    )

    run = " ".join(f"shared{i}" for i in range(_WINNOW_W + _WINNOW_K - 1))
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta gamma {run} delta epsilon zeta"),
            (2, f"one two three four five {run} six seven"),
            (3, "totally unrelated words nothing in common here at all"),
        ],
        "doc_id long, text string",
    )
    fps = {
        doc: {r.wmin for r in rows}
        for doc, rows in __import__("itertools").groupby(
            sorted(
                _winnow_fp_rows(docs).select("doc_id", "wmin").collect(),
                key=lambda r: r.doc_id,
            ),
            key=lambda r: r.doc_id,
        )
    }
    assert fps[1] & fps[2], "shared run produced no shared fingerprint"
    assert not (fps[1] & fps[3]) and not (fps[2] & fps[3])


def test_winnowing_density_bound(spark):
    """Winnowing selects at most one fingerprint per window start, and
    every window contributes — so 1 <= |fps| <= n_windows, and for a
    random-ish document the density is near 2/(w+1)."""
    from e_commerce_data_warehouse_power_bi_analytics_dashboard_spark.plans.llm_ops import (
        _winnow_fp_rows,
    )

    text = " ".join(f"w{(i * 7919) % 997}" for i in range(200))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = _winnow_fp_rows(docs).collect()
    n_sh = rows[0].n_sh
    fps = {r.wmin for r in rows}
    assert 1 <= len(fps) <= n_sh
    # 200 distinct-ish tokens: expect density well below 1 (window minima
    # repeat across adjacent windows) but above the degenerate floor
    assert 0.1 < len(fps) / n_sh < 0.8
