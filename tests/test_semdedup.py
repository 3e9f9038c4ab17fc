"""SemDeDup: deterministic k-means + within-cluster semantic prune
(operators/semdedup.py) vs a pure-numpy replica of the same contract.

Reference role: the FAISS-clustered pairwise dedup stage
(src/dedup.py:152-166) — here the clustering that bounds the O(n²)
pairwise work is Lloyd's k-means with the oracle-determinism contract
(seeded init, 6dp rounding, lowest-index/lowest-id ties)."""

import numpy as np
import pytest

from k2_18_spark.operators.semdedup import kmeans, semdedup


def _vec_df(spark, X):
    return spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(X)],
        "vec_id long, embedding array<double>",
    )


def _np_kmeans(X, k, n_iter, dp=6):
    """Driver-side replica of the documented contract."""
    C = np.round(X[:k].astype(np.float64), dp)
    for _ in range(n_iter):
        d = np.round(
            np.sqrt(((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)), dp
        )
        a = d.argmin(1)
        nxt = C.copy()
        for j in range(k):
            if (a == j).any():
                nxt[j] = np.round(X[a == j].mean(0), dp)
        C = nxt
    d = np.round(np.sqrt(((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)), dp)
    return d.argmin(1), d[np.arange(len(X)), d.argmin(1)]


@pytest.fixture(scope="module")
def blobs():
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(3, 8)) * 5.0
    X = np.vstack([c + rng.normal(size=(20, 8)) * 0.3 for c in centers])
    # the seeding contract takes the k lowest ids as initial centroids,
    # so give it one member of each blob up front (Lloyd's from k
    # same-blob seeds converges to a split blob — correct algorithm
    # behavior, wrong fixture for a recovery test); the rest shuffled
    order = np.concatenate([[0, 20, 40], rng.permutation(
        [i for i in range(60) if i not in (0, 20, 40)])])
    return X[order]


def test_kmeans_matches_numpy_replica(spark, blobs):
    got = {
        r["vec_id"]: (r["cluster"], r["dist"])
        for r in kmeans(spark, _vec_df(spark, blobs), k=3, n_iter=3).collect()
    }
    want_a, want_d = _np_kmeans(blobs, 3, 3)
    assert len(got) == len(blobs)
    for i in range(len(blobs)):
        assert got[i][0] == want_a[i], f"vec {i} cluster"
        assert got[i][1] == pytest.approx(want_d[i], abs=1e-9)


def test_kmeans_recovers_planted_blobs(spark, blobs):
    res = kmeans(spark, _vec_df(spark, blobs), k=3, n_iter=3).collect()
    by_cluster = {}
    for r in res:
        by_cluster.setdefault(r["cluster"], []).append(r["vec_id"])
    # three planted blobs of 20 → perfectly recovered sizes
    assert sorted(len(v) for v in by_cluster.values()) == [20, 20, 20]


def test_kmeans_deterministic(spark, blobs):
    df = _vec_df(spark, blobs)
    a = sorted(map(tuple, kmeans(spark, df, k=3, n_iter=2).collect()))
    b = sorted(map(tuple, kmeans(spark, df, k=3, n_iter=2).collect()))
    assert a == b


def test_kmeans_empty_cluster_keeps_previous_centroid(spark):
    # k=3 over two tight far-apart groups: the seed taken from inside
    # group one loses all members in round 1; the run must not crash
    # and every vector still lands in some cluster
    X = np.array(
        [[0.0, 0.0], [0.1, 0.0], [0.05, 0.02], [50.0, 50.0], [50.1, 49.9]]
    )
    res = kmeans(spark, _vec_df(spark, X), k=3, n_iter=3).collect()
    assert len(res) == 5
    assert {r["cluster"] for r in res} <= {0, 1, 2}


def test_semdedup_drops_planted_near_duplicates(spark):
    rng = np.random.default_rng(11)
    base = rng.normal(size=(2, 16)) * 4.0
    rows = []
    for c in base:
        rows.append(c)
        rows.append(c * 1.0001)  # near-exact duplicate (cos ≈ 1)
        rows.append(c + rng.normal(size=16) * 3.0)  # distinct member
    X = np.stack(rows)
    df = _vec_df(spark, X)
    assign = kmeans(spark, df, k=2, n_iter=3)
    res = {r["vec_id"]: r["keep"] for r in semdedup(df, assign, 0.999).collect()}
    assert len(res) == 6
    # exactly one of each duplicate pair (0,1) and (3,4) is dropped
    assert sorted([res[0], res[1]]) == [False, True]
    assert sorted([res[3], res[4]]) == [False, True]
    assert res[2] and res[5]  # distinct members survive


def test_semdedup_prune_is_within_cluster_only(spark):
    # identical vectors planted in DIFFERENT blobs' neighborhoods stay:
    # the prune never compares across clusters
    X = np.array(
        [[0.0, 1.0], [0.0, 1.01], [100.0, 1.0], [100.0, 1.01]],
        dtype=np.float64,
    )
    df = _vec_df(spark, X)
    assign = kmeans(spark, df, k=2, n_iter=2)
    clusters = {r["vec_id"]: r["cluster"] for r in assign.collect()}
    assert clusters[0] == clusters[1] != clusters[2]
    res = {r["vec_id"]: r["keep"] for r in semdedup(df, assign, 0.999).collect()}
    # one drop per cluster-local duplicate pair, none across
    assert sum(res.values()) == 2


def test_semdedup_max_cluster_size_bounds_giant_cluster(spark):
    # planted degenerate cluster: 240 near-identical vectors all land in
    # one k-means cluster. With max_cluster_size=40 the pair stage keys
    # on (cluster, subcluster) so the self-join is ~n·cap, not n², and
    # the result stays precision-safe: everything dropped has a genuine
    # near-dup neighbor, and ≥1 survivor remains per subcluster.
    rng = np.random.default_rng(23)
    base = rng.normal(size=16)
    X = np.stack([base * (1.0 + 1e-6 * i) for i in range(240)])
    df = _vec_df(spark, X)
    assign = kmeans(spark, df, k=1, n_iter=1)

    capped = semdedup(df, assign, 0.999, max_cluster_size=40)
    res = {r["vec_id"]: r["keep"] for r in capped.collect()}
    assert len(res) == 240
    survivors = sum(res.values())
    # ceil(240/40) = 6 subclusters → exactly one survivor per non-empty
    # subcluster; hash splitting may leave some empty, so bound loosely
    assert 1 <= survivors <= 12
    # uncapped run on the same input keeps exactly 1 — the cap only
    # loses recall (more survivors), never precision (fewer)
    un = {r["vec_id"]: r["keep"]
          for r in semdedup(df, assign, 0.999).collect()}
    assert sum(un.values()) == 1
    assert survivors >= sum(un.values())


def test_semdedup_cap_noop_on_small_clusters(spark):
    # clusters under the cap: identical output with and without it
    rng = np.random.default_rng(31)
    base = rng.normal(size=(2, 16)) * 4.0
    rows = []
    for c in base:
        rows.extend([c, c * 1.0001, c + rng.normal(size=16) * 3.0])
    df = _vec_df(spark, np.stack(rows))
    assign = kmeans(spark, df, k=2, n_iter=2)
    a = sorted(map(tuple, semdedup(df, assign, 0.999).collect()))
    b = sorted(
        map(
            tuple,
            semdedup(df, assign, 0.999, max_cluster_size=50).collect(),
        )
    )
    assert a == b


def test_semdedup_tie_keeps_lower_id(spark):
    # two copies equidistant from the centroid: lower id survives
    X = np.array([[1.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    df = _vec_df(spark, X)
    assign = kmeans(spark, df, k=1, n_iter=1)
    res = {r["vec_id"]: r["keep"] for r in semdedup(df, assign, 0.999).collect()}
    assert res[0] is True and res[1] is False
