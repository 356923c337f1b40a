"""SemDeDup composition: planted paraphrase-style embedding
duplicates collapse to one representative per group; python
brute-force oracle defines the expected kept set."""
import numpy as np
import pytest

from trefoil_spark.operators.dedup import semdedup


def _vecs():
    rng = np.random.RandomState(5)
    base = rng.randn(12, 16)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        if i % 3 == 0:
            # two planted near-dups of every third vector
            for k in (1, 2):
                w = v + 0.001 * k * rng.randn(16)
                rows.append((100 * (k + 1) + i, [float(x) for x in w]))
    return rows


def _brute_groups(rows, threshold):
    ids = [i for i, _ in rows]
    V = np.array([v for _, v in rows])
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    sim = Vn @ Vn.T
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            if sim[a, b] >= threshold:
                ra, rb = find(ids[a]), find(ids[b])
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    keep = {i for i in ids if find(i) == i}
    return keep


def test_semdedup_keeps_one_per_group(spark):
    rows = _vecs()
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    kept = {
        r["vec_id"]
        for r in semdedup(df, n_clusters=4, threshold=0.999).collect()
    }
    want = _brute_groups(rows, 0.999)
    # the cluster-candidate rule can only MISS pairs (recall < 1 by
    # contract), never merge non-dups: kept ⊇ brute-force kept, and
    # every brute group contributes at least its min representative
    assert want <= kept
    # with 4 clusters over 12 well-separated bases the planted triples
    # (cos ≈ 0.9999+) almost always co-cluster; require full agreement
    assert kept == want


def test_semdedup_no_dups_is_identity(spark):
    rng = np.random.RandomState(9)
    V = rng.randn(10, 16)
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(V)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    kept = {r["vec_id"] for r in semdedup(df, n_clusters=3,
                                          threshold=0.999).collect()}
    assert kept == set(range(10))
