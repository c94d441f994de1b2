"""Dedup + similarity operators on small corpora with known structure."""

import pytest
from pyspark.sql import functions as F

from go_data_publisher_spark.operators import similarity as S
from go_data_publisher_spark.operators import textdedup as D


@pytest.fixture(scope="module")
def corpus(spark):
    base = "the quick brown fox jumps over the lazy dog while spark shuffles data across many partitions"
    near = base.replace("lazy", "sleepy")
    rows = [
        (0, base),
        (1, base),                      # exact dup of 0
        (2, "The  QUICK brown fox jumps over the lazy dog while spark shuffles data across many partitions"),  # normalized dup of 0
        (3, near),                      # near dup of 0
        (4, "completely different text about merge manifests checkpoints lineage and exactly once commits"),
        (5, "another unrelated document mentioning embeddings vectors buckets and cosine similarity search"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").persist()


def test_exact_duplicates(spark, corpus):
    groups = D.exact_duplicates(corpus).collect()
    sizes = sorted(g["n_docs"] for g in groups)
    assert sizes == [1, 1, 1, 3]
    kept = D.drop_exact_duplicates(corpus)
    assert kept.count() == 4
    assert {r["doc_id"] for r in kept.collect()} == {0, 3, 4, 5}


def test_ngram_jaccard(spark, corpus):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in D.ngram_jaccard_pairs(corpus, threshold=0.5).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    assert (0, 3) in pairs and 0.5 <= pairs[(0, 3)] < 1.0
    assert (0, 4) not in pairs


def test_minhash_lsh(spark, corpus):
    pairs = {(r["id_a"], r["id_b"]) for r in
             D.minhash_lsh_pairs(corpus, n_hashes=16, n_bands=8, verify_threshold=0.5).collect()}
    assert (0, 1) in pairs and (0, 2) in pairs and (1, 2) in pairs
    assert all(a not in (4, 5) and b not in (4, 5) for a, b in pairs)


def test_simhash_near_duplicates(spark, corpus):
    pairs = {(r["id_a"], r["id_b"]) for r in
             D.simhash_near_duplicates(corpus, max_hamming=10).collect()}
    assert (0, 1) in pairs
    assert (0, 4) not in pairs and (4, 5) not in pairs


@pytest.fixture(scope="module")
def vectors(spark):
    import numpy as np

    rng = np.random.default_rng(5)
    base = rng.standard_normal(16)
    rows = []
    for i in range(50):
        v = rng.standard_normal(16)
        rows.append((i, [float(x) for x in v / np.linalg.norm(v)]))
    # 100 = near-dup of 0; 101 = exact dup of 0
    v0 = np.array(rows[0][1])
    near = v0 + 0.01 * rng.standard_normal(16)
    rows.append((100, [float(x) for x in near / np.linalg.norm(near)]))
    rows.append((101, rows[0][1]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>").persist()


def test_brute_force_topk_exact_and_pandas_agree(spark, vectors):
    q = vectors.where("vec_id = 0").first()["embedding"]
    a = S.brute_force_topk(vectors, q, k=3).collect()
    b = S.brute_force_topk_pandas(vectors, q, k=3).collect()
    assert [r["vec_id"] for r in a] == [r["vec_id"] for r in b]
    assert {r["vec_id"] for r in a} == {0, 101, 100}
    for x, y in zip(a, b):
        assert abs(x["cosine"] - y["cosine"]) < 1e-6


def test_ann_topk_finds_near_neighbors(spark, vectors):
    q = vectors.where("vec_id = 0").first()["embedding"]
    got = S.ann_topk_lsh(vectors, q, k=3, n_planes=6, multiprobe_hamming=1).collect()
    ids = {r["vec_id"] for r in got}
    # identical + near-identical vectors hash to the query's bucket
    assert {0, 101}.issubset(ids)


def test_ivf_index_prunes_partitions(spark, vectors, tmpdir_path):
    S.write_ivf_index(vectors, f"{tmpdir_path}/ivf", n_planes=4)
    q = vectors.where("vec_id = 0").first()["embedding"]
    got = S.ann_topk_ivf(spark, f"{tmpdir_path}/ivf", q, k=3, n_planes=4).collect()
    assert {0, 101}.issubset({r["vec_id"] for r in got})
    # partition pruning: the probed-bucket filter appears as a partition filter
    df = spark.read.parquet(f"{tmpdir_path}/ivf").where(F.col("bucket") == 3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_embedding_near_duplicates(spark, vectors):
    pairs = {(r["id_a"], r["id_b"]) for r in
             D.embedding_near_duplicates(vectors, threshold=0.98, n_planes=8).collect()}
    assert (0, 100) in pairs and (0, 101) in pairs
