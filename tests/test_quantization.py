"""Product quantization: encode determinism against a Python model,
compression/shape contracts, ADC ranking recall vs the exact baseline,
and the trained-codebook recall win over the hash sample."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from py_data_pipeline_app_spark.operators.quantization import (
    pq_codebooks,
    pq_encode,
    pq_topk,
    train_pq_codebooks,
)
from py_data_pipeline_app_spark.operators.similarity import brute_force_topk

SF_DIR = "/root/testdata/sf0.001"
M, KSUB, DIM = 8, 16, 64


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    df.cache().count()
    return df


@pytest.fixture(scope="module")
def cb(emb):
    df = pq_codebooks(emb, m=M, ksub=KSUB, dim=DIM)
    df.cache().count()
    return df


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def test_codebook_shape(cb):
    rows = cb.collect()
    assert len(rows) == M * KSUB
    assert {(r.sub_id, r.code_id) for r in rows} == {
        (s, j) for s in range(M) for j in range(KSUB)
    }
    assert all(len(r.codeword) == DIM // M for r in rows)


def test_codebook_slices_same_sample(cb):
    # All m codebooks slice the SAME ksub sample vectors: code j's
    # codewords concatenated across subspaces rebuild sample vector j.
    by_code: dict[int, dict[int, list[float]]] = {}
    for r in cb.collect():
        by_code.setdefault(r.code_id, {})[r.sub_id] = list(r.codeword)
    for code_id, subs in by_code.items():
        assert sorted(subs) == list(range(M))


def test_encode_matches_python_model(emb, cb):
    """Per-subspace argmin with lowest-code tie-break, recomputed in
    plain Python over a sample of rows."""
    table: dict[tuple[int, int], list[float]] = {
        (r.sub_id, r.code_id): [float(x) for x in r.codeword] for r in cb.collect()
    }
    enc = {
        r.vec_id: (list(r.codes), r.approx_norm)
        for r in pq_encode(emb, cb).filter(F.col("vec_id") < 50).collect()
    }
    sample = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in emb.filter(F.col("vec_id") < 50).collect()
    }
    dsub = DIM // M
    for vid, vec in sample.items():
        want_codes = []
        for s in range(M):
            sub = vec[s * dsub : (s + 1) * dsub]
            dists = [
                (sum((p - q) * (p - q) for p, q in zip(sub, table[(s, j)])), j)
                for j in range(KSUB)
            ]
            want_codes.append(min(dists)[1])
        got_codes, got_norm = enc[vid]
        assert got_codes == want_codes, vid
        approx = [x for s in range(M) for x in table[(s, want_codes[s])]]
        assert abs(got_norm - math.sqrt(sum(x * x for x in approx))) < 1e-9


def test_encoded_is_compressed(emb, cb):
    enc = pq_encode(emb, cb)
    assert enc.columns == ["vec_id", "codes", "approx_norm"]
    row = enc.first()
    assert len(row.codes) == M
    assert all(0 <= c < KSUB for c in row.codes)


def test_pq_topk_recall_floor(emb, cb, queries):
    """Random unit vectors are PQ's hardest case (no cluster
    structure); the sampled codebook must still beat chance by a wide
    margin and keep each query's own corpus row in its top-10."""
    pq = pq_topk(emb, queries, m=M, ksub=KSUB, dim=DIM, k=10, codebooks=cb)
    bf = brute_force_topk(emb, queries, k=10)
    p = {(r.query_id, r.vec_id) for r in pq.collect()}
    b = {(r.query_id, r.vec_id) for r in bf.collect()}
    n = emb.count()
    recall = len(p & b) / len(b)
    # chance level is ~10/n; measured ~0.3 on this data
    assert recall >= 0.15, recall
    assert recall > 50 / n
    # self-retrieval: the query vector is a corpus member
    for qid in range(10):
        assert (qid, qid) in p, f"query {qid} lost its own row"


def test_pq_topk_precomputed_encoding_identical(emb, cb, queries):
    on_the_fly = pq_topk(
        emb, queries, m=M, ksub=KSUB, dim=DIM, k=5, codebooks=cb
    )
    enc = pq_encode(emb, cb)
    reused = pq_topk(
        emb, queries, m=M, ksub=KSUB, dim=DIM, k=5, codebooks=cb, encoded=enc
    )
    assert sorted(map(tuple, on_the_fly.collect())) == sorted(
        map(tuple, reused.collect())
    )


@pytest.mark.oracle
def test_trained_codebooks_beat_sample(emb, cb, queries):
    """Per-subspace k-means tracks the data distribution, so its mean
    quantization error must be lower and recall at least as good."""
    trained = train_pq_codebooks(emb, m=M, ksub=KSUB, dim=DIM, max_iter=10)
    bf = {(r.query_id, r.vec_id) for r in brute_force_topk(emb, queries, k=10).collect()}

    def recall(codebooks):
        got = {
            (r.query_id, r.vec_id)
            for r in pq_topk(
                emb, queries, m=M, ksub=KSUB, dim=DIM, k=10, codebooks=codebooks
            ).collect()
        }
        return len(got & bf) / len(bf)

    def mean_err(codebooks):
        # reconstruction error proxy: 1 - approx_norm-weighted self-score
        enc = pq_encode(emb, codebooks)
        self_q = emb.select(F.col("vec_id").alias("query_id"), "embedding")
        scored = pq_topk(
            emb,
            self_q.limit(50),
            m=M,
            ksub=KSUB,
            dim=DIM,
            k=1,
            codebooks=codebooks,
            encoded=enc,
        )
        return scored.agg(F.avg("score")).first()[0]

    r_t, r_s = recall(trained), recall(cb)
    assert r_t >= r_s - 0.05, (r_t, r_s)
    assert mean_err(trained) >= mean_err(cb) - 0.02


def test_dim_must_divide(emb):
    with pytest.raises(ValueError):
        pq_codebooks(emb, m=7, ksub=8, dim=64)


@pytest.fixture(scope="module")
def ivfpq_index(emb, tmp_path_factory):
    from py_data_pipeline_app_spark.operators.quantization import build_ivfpq_index

    path = str(tmp_path_factory.mktemp("ivfpq"))
    build_ivfpq_index(emb, path, n_centroids=16, m=M, ksub=KSUB, dim=DIM)
    return path


@pytest.fixture(scope="module")
def ivfpq_trained_index(spark, emb, tmp_path_factory):
    """The PRODUCTION configuration: k-means coarse centroids and
    k-means codebooks trained on the RESIDUALS — the combination where
    IVFADC's residual encoding pays off (on random unit vectors the
    md5-sample centroids only absorb ~0.2 cosine, so residuals come
    out LARGER than the vectors and sampled-residual codes measure
    recall 0.14 vs raw 0.30; with trained quantizers the residual
    design measures 0.44 — strictly above every raw variant)."""
    from py_data_pipeline_app_spark.operators.quantization import (
        _with_residual,
        build_ivfpq_index,
    )
    from py_data_pipeline_app_spark.operators.similarity import (
        _assign_to_centroids,
        _centroid_rows,
        train_centroids,
    )

    cent_rows = _centroid_rows(train_centroids(emb, n_centroids=16))
    resid = _with_residual(
        # fan_out_input=False: KMeans codebook training is sensitive to
        # the input PARTITIONING (k-means|| init samples per
        # partition); the builder pins the un-fanned layout so trained
        # codebooks are reproducible (build_ivfpq_index_trained's note)
        _assign_to_centroids(
            emb, cent_rows, id_col="vec_id", vec_col="embedding",
            fan_out_input=False,
        ),
        cent_rows,
        vec_col="embedding",
    )
    tcb = train_pq_codebooks(resid, m=M, ksub=KSUB, dim=DIM, vec_col="_rvec")
    path = str(tmp_path_factory.mktemp("ivfpq_trained"))
    build_ivfpq_index(
        emb, path, n_centroids=16, m=M, ksub=KSUB, dim=DIM,
        cents=cent_rows, codebooks=tcb,
    )
    return path


def test_ivfpq_full_probe_matches_python_model(spark, emb, queries, ivfpq_index):
    """The ENTIRE residual (IVFADC) pipeline recomputed in plain
    Python — cosine-argmax coarse assignment, residual, md5-sampled
    residual codebooks, per-subspace argmin encode, reconstruction
    norm ‖q1(x)+q2(r)‖, and the decomposed score
    (q·q1(x) + Σ qtab) / (‖q‖·approx_norm) — must reproduce the
    full-probe index scores to 9dp (the in-container twin of the
    DuckDB oracle)."""
    import hashlib

    from py_data_pipeline_app_spark.operators.quantization import ivfpq_topk

    rows = sorted(emb.collect(), key=lambda r: r.vec_id)
    X = {r.vec_id: [float(x) for x in r.embedding] for r in rows}
    hk = sorted(
        (int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16), v) for v in X
    )

    def dot(a, b):
        s = 0.0
        for p, q in zip(a, b):
            s += p * q
        return s

    def norm(a):
        return math.sqrt(dot(a, a))

    cents = [X[v] for _, v in hk[:16]]
    assign = {
        v: max(
            range(16), key=lambda c: (dot(x, cents[c]) / (norm(x) * norm(cents[c])), -c)
        )
        for v, x in X.items()
    }
    resid = {v: [p - q for p, q in zip(x, cents[assign[v]])] for v, x in X.items()}
    cb = [resid[v] for _, v in hk[:KSUB]]
    dsub = DIM // M

    def encode(r):
        codes = []
        for s in range(M):
            sl = r[s * dsub : (s + 1) * dsub]
            codes.append(
                min(
                    range(KSUB),
                    key=lambda j: (
                        sum(
                            (p - q) * (p - q)
                            for p, q in zip(sl, cb[j][s * dsub : (s + 1) * dsub])
                        ),
                        j,
                    ),
                )
            )
        return codes

    want = {}
    for r in queries.collect():
        q, qn = list(map(float, r.embedding)), norm(list(map(float, r.embedding)))
        scores = []
        for v, x in X.items():
            codes = encode(resid[v])
            recon = [
                c + w
                for c, w in zip(
                    cents[assign[v]],
                    [w for s in range(M) for w in cb[codes[s]][s * dsub : (s + 1) * dsub]],
                )
            ]
            num = dot(q, cents[assign[v]]) + sum(
                dot(q[s * dsub : (s + 1) * dsub], cb[codes[s]][s * dsub : (s + 1) * dsub])
                for s in range(M)
            )
            scores.append((round(num / (qn * norm(recon)), 9), v))
        top = sorted(scores, key=lambda t: (-t[0], t[1]))[:5]
        want[r.query_id] = [(v, s) for s, v in top]

    got = ivfpq_topk(spark, ivfpq_index, queries, k=5, nprobe=16).collect()
    by_q: dict[int, list] = {}
    for r in sorted(got, key=lambda r: (r.query_id, r.rank)):
        by_q.setdefault(r.query_id, []).append((r.vec_id, r.score))
    for qid, pairs in by_q.items():
        for (gv, gs), (wv, ws) in zip(pairs, want[qid]):
            assert gv == wv and abs(gs - ws) < 1e-8, (qid, pairs, want[qid])


@pytest.mark.oracle
def test_residual_encoding_beats_raw_adc(spark, emb, cb, queries, ivfpq_trained_index):
    """The point of IVFADC's residual codes (Jégou et al. 2011 §V):
    with trained quantizers, full-probe residual ADC must strictly
    beat the raw-vector PQ scan's recall (measured 0.44 vs 0.30 on
    this data — random unit vectors, PQ's hardest case)."""
    from py_data_pipeline_app_spark.operators.quantization import ivfpq_topk

    bf = {
        (r.query_id, r.vec_id)
        for r in brute_force_topk(emb, queries, k=10).collect()
    }
    raw = {
        (r.query_id, r.vec_id)
        for r in pq_topk(
            emb, queries, m=M, ksub=KSUB, dim=DIM, k=10, codebooks=cb
        ).collect()
    }
    res = {
        (r.query_id, r.vec_id)
        for r in ivfpq_topk(
            spark, ivfpq_trained_index, queries, k=10, nprobe=16
        ).collect()
    }
    assert len(res & bf) > len(raw & bf), (len(res & bf), len(raw & bf))
    assert len(res & bf) / len(bf) >= 0.4, len(res & bf) / len(bf)


def test_ivfpq_prunes_partitions(spark, queries, ivfpq_index):
    """The probed-centroid IN filter must reach the parquet scan as a
    PartitionFilter — un-probed buckets are never read."""
    from py_data_pipeline_app_spark.operators.quantization import ivfpq_topk

    one_query = queries.limit(1)
    plan = ivfpq_topk(
        spark, ivfpq_index, one_query, k=5, nprobe=2
    )._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [centroid_id" in plan
    assert "INSET" in plan or " IN (" in plan


def test_ivfpq_index_stores_codes_not_vectors(spark, ivfpq_index):
    df = spark.read.parquet(f"{ivfpq_index}/assigned")
    assert set(df.columns) == {"vec_id", "codes", "approx_norm", "centroid_id"}
    assert "embedding" not in df.columns  # the compression IS the point


def test_ivfpq_checksum_drift_fails_loudly(spark, emb, queries, tmp_path):
    from py_data_pipeline_app_spark.operators.quantization import (
        build_ivfpq_index,
        ivfpq_topk,
    )

    path = str(tmp_path / "idx")
    build_ivfpq_index(emb, path, n_centroids=8, m=M, ksub=8, dim=DIM)
    # corrupt the centroid table (rewrite from a different sample)
    spark.read.parquet(f"{path}/centroids").limit(7).write.mode(
        "overwrite"
    ).parquet(f"{path}/centroids")
    with pytest.raises(ValueError, match="checksum"):
        ivfpq_topk(spark, path, queries, k=5, nprobe=2)


def test_ivfpq_recall_not_worse_than_halved_probe(spark, emb, cb, queries, ivfpq_index):
    """More probes can only add candidates: top-k at nprobe=8 must
    contain at least as many true (brute-force) hits as nprobe=2."""
    from py_data_pipeline_app_spark.operators.quantization import ivfpq_topk

    bf = {(r.query_id, r.vec_id) for r in brute_force_topk(emb, queries, k=10).collect()}

    def hits(nprobe):
        got = {
            (r.query_id, r.vec_id)
            for r in ivfpq_topk(spark, ivfpq_index, queries, k=10, nprobe=nprobe).collect()
        }
        return len(got & bf)

    assert hits(8) >= hits(2)


@pytest.mark.oracle
def test_ivfpq_append_parity_with_full_rebuild(spark, emb, queries, tmp_path):
    """build(evens) + append(odds) must probe bit-identically to one
    build over everything with the same centroids + codebooks."""
    from py_data_pipeline_app_spark.operators.quantization import (
        build_ivfpq_index,
        ivfpq_index_append,
        ivfpq_topk,
    )

    incr = str(tmp_path / "incr")
    even = emb.filter(F.col("vec_id") % 2 == 0)
    odd = emb.filter(F.col("vec_id") % 2 == 1)
    build_ivfpq_index(even, incr, n_centroids=16, m=M, ksub=KSUB, dim=DIM)
    ivfpq_index_append(spark, incr, odd, batch_token="odds")
    got = sorted(
        map(tuple, ivfpq_topk(spark, incr, queries, k=5, nprobe=4).collect())
    )

    full = str(tmp_path / "full")
    cents = spark.read.parquet(f"{incr}/centroids")
    cbs = spark.read.parquet(f"{incr}/codebooks")
    build_ivfpq_index(emb, full, cents=cents, codebooks=cbs)
    want = sorted(
        map(tuple, ivfpq_topk(spark, full, queries, k=5, nprobe=4).collect())
    )
    assert got == want


def test_ivfpq_rebuild_with_appends_fails(spark, emb, tmp_path):
    from py_data_pipeline_app_spark.operators.quantization import (
        build_ivfpq_index,
        ivfpq_index_append,
    )

    path = str(tmp_path / "idx")
    build_ivfpq_index(
        emb.filter(F.col("vec_id") % 2 == 0), path, n_centroids=8, m=M, ksub=8, dim=DIM
    )
    ivfpq_index_append(
        spark, path, emb.filter(F.col("vec_id") % 2 == 1), batch_token="b"
    )
    with pytest.raises(ValueError, match="appended batches"):
        build_ivfpq_index(emb, path, n_centroids=8, m=M, ksub=8, dim=DIM)


def test_pq_encode_plan_is_zero_shuffle(emb, cb):
    """Encoding must be a pure projection over the scan — no Exchange:
    at corpus scale the encode pass IS the scan, and a shuffle would
    be pure waste (nothing is keyed). An input already at cluster
    parallelism passes through the encoder's fan_out untouched; only
    the local one-task testdata pays its round-robin repartition."""
    wide = emb.repartition(emb.sparkSession.sparkContext.defaultParallelism)
    plan = (
        pq_encode(wide, cb)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one Exchange: the explicit repartition above — fan_out adds none
    assert plan.count("Exchange") == 1, plan


def test_index_mutators_respect_lock(spark, emb, tmp_path):
    """A held index lock must make appends and compactions fail loudly
    (the LSH index's serialization contract, now shared by IVF/IVF-PQ)."""
    from py_data_pipeline_app_spark.operators.dedup_incremental import (
        _acquire_index_lock,
    )
    from py_data_pipeline_app_spark.operators.quantization import (
        build_ivfpq_index,
        ivfpq_index_append,
    )
    from py_data_pipeline_app_spark.operators.similarity import (
        build_ivf_index,
        ivf_index_append,
        ivf_index_compact,
    )

    half = emb.filter(F.col("vec_id") % 2 == 0)
    rest = emb.filter(F.col("vec_id") % 2 == 1)

    ivf = str(tmp_path / "ivf")
    build_ivf_index(half, ivf, n_centroids=8)
    fs, lock = _acquire_index_lock(spark, ivf, "test")
    try:
        with pytest.raises(RuntimeError, match="locked"):
            ivf_index_append(spark, ivf, rest, batch_token="x")
        with pytest.raises(RuntimeError, match="locked"):
            ivf_index_compact(spark, ivf)
    finally:
        fs.delete(lock, False)

    pq = str(tmp_path / "pq")
    build_ivfpq_index(half, pq, n_centroids=8, m=M, ksub=8, dim=DIM)
    fs, lock = _acquire_index_lock(spark, pq, "test")
    try:
        with pytest.raises(RuntimeError, match="locked"):
            ivfpq_index_append(spark, pq, rest, batch_token="x")
    finally:
        fs.delete(lock, False)


@pytest.mark.oracle
def test_ivfpq_compact_preserves_probes(spark, emb, queries, tmp_path):
    """Compaction merges code appends into the base with identical
    probe results and removes the append directories."""
    import os

    from py_data_pipeline_app_spark.operators.quantization import (
        build_ivfpq_index,
        ivfpq_index_append,
        ivfpq_index_compact,
        ivfpq_topk,
    )

    path = str(tmp_path / "idx")
    build_ivfpq_index(
        emb.filter(F.col("vec_id") % 2 == 0), path, n_centroids=16, m=M, ksub=KSUB, dim=DIM
    )
    ivfpq_index_append(
        spark, path, emb.filter(F.col("vec_id") % 2 == 1), batch_token="b"
    )
    before = sorted(
        map(tuple, ivfpq_topk(spark, path, queries, k=5, nprobe=4).collect())
    )
    assert ivfpq_index_compact(spark, path) == 1
    after = sorted(
        map(tuple, ivfpq_topk(spark, path, queries, k=5, nprobe=4).collect())
    )
    assert before == after
    assert not os.path.isdir(os.path.join(path, "appends"))


@pytest.mark.oracle
def test_ivfpq_empty_append_does_not_poison_probes(spark, emb, queries, tmp_path):
    """Zero-row appends (empty replayed micro-batches) must leave the
    IVF-PQ index probeable — same contract as the raw IVF layout."""
    from py_data_pipeline_app_spark.operators.quantization import (
        build_ivfpq_index,
        ivfpq_index_append,
        ivfpq_topk,
    )

    path = str(tmp_path / "idx_empty")
    build_ivfpq_index(emb, path, n_centroids=8, m=M, ksub=8, dim=DIM)
    before = ivfpq_topk(spark, path, queries, k=5, nprobe=3).collect()
    ivfpq_index_append(spark, path, emb.limit(0), batch_token="empty")
    after = ivfpq_topk(spark, path, queries, k=5, nprobe=3).collect()
    assert sorted(map(tuple, before)) == sorted(map(tuple, after))


@pytest.mark.oracle
def test_ivfpq_delete_parity_and_compaction(spark, emb, queries, tmp_path):
    """Tombstones on the compressed layout: probing A∪B with B deleted
    equals probing an index built over A with the same centroids and
    codebooks (delete shares the IVF implementation — the layouts
    differ only in what a row holds); full compaction applies and
    consumes them."""
    import os

    from py_data_pipeline_app_spark.operators.quantization import (
        build_ivfpq_index,
        ivfpq_index_compact,
        ivfpq_index_delete,
        ivfpq_topk,
        pq_codebooks,
    )
    from py_data_pipeline_app_spark.operators.similarity import (
        _md5_sample_centroids,
    )

    a = emb.filter(F.col("vec_id") % 3 != 0)
    b = emb.filter(F.col("vec_id") % 3 == 0)
    both = a.unionByName(b)
    cents = _md5_sample_centroids(
        both, n_centroids=16, id_col="vec_id", vec_col="embedding"
    )
    cb = pq_codebooks(both, m=M, ksub=KSUB, dim=DIM)

    full = str(tmp_path / "full")
    ref = str(tmp_path / "ref")
    build_ivfpq_index(both, full, cents=cents, codebooks=cb, m=M, ksub=KSUB, dim=DIM)
    build_ivfpq_index(a, ref, cents=cents, codebooks=cb, m=M, ksub=KSUB, dim=DIM)
    want = sorted(
        map(tuple, ivfpq_topk(spark, ref, queries, k=5, nprobe=4).collect())
    )
    assert ivfpq_index_delete(spark, full, b.select("vec_id")) is not None
    got = sorted(
        map(tuple, ivfpq_topk(spark, full, queries, k=5, nprobe=4).collect())
    )
    assert got == want  # immediate, before any rewrite
    assert ivfpq_index_compact(spark, full) == 1  # consumes the tombstones
    assert not os.path.isdir(os.path.join(full, "deletes"))
    got2 = sorted(
        map(tuple, ivfpq_topk(spark, full, queries, k=5, nprobe=4).collect())
    )
    assert got2 == want


@pytest.mark.oracle
def test_rerank_improves_recall_over_raw_adc(
    spark, emb, queries, ivfpq_trained_index
):
    """The re-ranking stage's whole point: at equal k, exact-cosine
    re-scoring of the ADC shortlist must recover true (brute-force)
    neighbors that ADC's lossy ordering misplaced. With full probing
    the shortlist superset always contains the truth ADC had, so
    recall can only go up; we assert it strictly improves on the
    production (trained-quantizer, residual-code) index — measured
    here: ADC 0.44 → re-ranked 0.77 at k_factor=4 on random unit
    vectors, PQ's hardest case (the pre-residual raw design measured
    0.30 → 0.48 on the same data)."""
    from py_data_pipeline_app_spark.operators.quantization import (
        ivfpq_topk,
        ivfpq_topk_rerank,
    )

    k, nprobe = 10, 16  # full probe: isolates ADC error from probe misses
    bf = {
        (r.query_id, r.vec_id)
        for r in brute_force_topk(emb, queries, k=k).collect()
    }
    adc = {
        (r.query_id, r.vec_id)
        for r in ivfpq_topk(
            spark, ivfpq_trained_index, queries, k=k, nprobe=nprobe
        ).collect()
    }
    rr = {
        (r.query_id, r.vec_id)
        for r in ivfpq_topk_rerank(
            spark,
            ivfpq_trained_index,
            emb,
            queries,
            k=k,
            k_factor=4,
            nprobe=nprobe,
        ).collect()
    }
    assert len(rr & bf) > len(adc & bf), (len(rr & bf), len(adc & bf))
    assert len(rr & bf) / len(bf) >= 0.6, len(rr & bf) / len(bf)


def test_rerank_exact_scores_and_self_retrieval(spark, emb, queries, ivfpq_index):
    """Re-ranked scores are EXACT cosines (each query retrieves its own
    corpus twin at score 1.0, rank 1) — ADC scores are approximations
    and generally cannot do this."""
    from py_data_pipeline_app_spark.operators.quantization import ivfpq_topk_rerank

    rr = ivfpq_topk_rerank(
        spark, ivfpq_index, emb, queries, k=5, k_factor=4, nprobe=16
    )
    top1 = {r.query_id: r for r in rr.filter(F.col("rank") == 1).collect()}
    for qid, row in top1.items():
        assert row.vec_id == qid, (qid, row)
        assert abs(row.score - 1.0) < 1e-9


def test_rerank_vector_fetch_is_shortlist_sized(spark, emb, queries, ivfpq_index):
    """The exact pass must fetch vectors via a BROADCAST of the tiny
    shortlist against the corpus scan — no shuffle (Exchange) of the
    corpus, no corpus-sized re-rank input."""
    from py_data_pipeline_app_spark.operators.quantization import ivfpq_topk_rerank

    plan = (
        ivfpq_topk_rerank(spark, ivfpq_index, emb, queries, k=5, nprobe=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the corpus joins appear only as broadcast hash joins; the only
    # Exchanges allowed are the per-query ranking windows' hash
    # partitionings and broadcast distributions
    import re

    assert "BroadcastHashJoin" in plan
    bad = [
        ln
        for ln in plan.splitlines()
        if "Exchange" in ln
        and "BroadcastExchange" not in ln
        and "hashpartitioning(query_id" not in ln
    ]
    assert bad == [], bad


def test_rotation_matrix_is_orthonormal():
    """The OPQ rotation must be a true isometry (R·Rᵀ = I), and
    bit-deterministic (pure-Python Gram-Schmidt over md5 uniforms —
    no LAPACK variance across platforms)."""
    from py_data_pipeline_app_spark.operators.quantization import (
        rotation_matrix,
    )

    R = rotation_matrix(7, 16)
    assert R == rotation_matrix(7, 16)  # bit-deterministic
    for i in range(16):
        for j in range(16):
            d = sum(R[i][k] * R[j][k] for k in range(16))
            assert abs(d - (1.0 if i == j else 0.0)) < 1e-12, (i, j, d)
    assert rotation_matrix(8, 16) != R  # seed actually matters


@pytest.mark.oracle
def test_rotated_index_append_parity(spark, emb, queries, tmp_path):
    """build(A, rotation)+append(B) must probe identically to
    build(A∪B) with the same frozen tables and rotation — the batch
    encode replays the rotation from the persisted matrix."""
    from py_data_pipeline_app_spark.operators.quantization import (
        build_ivfpq_index,
        ivfpq_index_append,
        ivfpq_topk,
    )

    even = emb.filter(F.col("vec_id") % 2 == 0)
    odd = emb.filter(F.col("vec_id") % 2 == 1)
    i1 = str(tmp_path / "rot_append")
    build_ivfpq_index(
        even, i1, n_centroids=16, m=M, ksub=KSUB, dim=DIM, rotation_seed=7
    )
    ivfpq_index_append(spark, i1, odd, batch_token="odd")
    cents = spark.read.parquet(f"{i1}/centroids")
    cbs = spark.read.parquet(f"{i1}/codebooks")
    i2 = str(tmp_path / "rot_full")
    build_ivfpq_index(emb, i2, cents=cents, codebooks=cbs, rotation_seed=7)
    got = sorted(map(tuple, ivfpq_topk(spark, i1, queries, k=5, nprobe=4).collect()))
    want = sorted(map(tuple, ivfpq_topk(spark, i2, queries, k=5, nprobe=4).collect()))
    assert got == want


@pytest.mark.oracle
def test_rotation_checksum_drift_fails_loudly(spark, emb, queries, tmp_path):
    """Codes live in the rotated space: probing through a drifted
    rotation matrix must refuse, not score garbage."""
    from py_data_pipeline_app_spark.operators.quantization import (
        build_ivfpq_index,
        ivfpq_topk,
    )

    path = str(tmp_path / "rot_drift")
    build_ivfpq_index(
        emb, path, n_centroids=8, m=M, ksub=8, dim=DIM, rotation_seed=7
    )
    from py_data_pipeline_app_spark.functions.frames import local_rows_df

    rows = spark.read.parquet(f"{path}/rotation").collect()
    local_rows_df(
        spark,
        "row_id int, coeffs array<double>",
        [
            (int(r.row_id), [float(x) * 1.0000001 for x in r.coeffs])
            for r in rows
        ],
    ).write.mode("overwrite").parquet(f"{path}/rotation")
    with pytest.raises(ValueError, match="rotation"):
        ivfpq_topk(spark, path, queries, k=5, nprobe=2)


@pytest.mark.oracle
def test_rotation_improves_trained_recall_on_correlated_data(spark, tmp_path):
    """The OPQ-style rotation's measured win: on data whose
    coordinates correlate ACROSS subspaces (second half of every
    vector is a noisy copy of the first half — plain PQ slicing pays
    twice for the same information), trained residual codebooks in the
    ROTATED space recall strictly more than in the plain space
    (measured here: 0.44 → 0.52; at 600 rows/20 iters: 0.47 → 0.58).
    On isotropic or merely scale-anisotropic data with SAMPLED
    codebooks the rotation measures neutral (twice, both shapes) —
    sample-quantizer error is linear in per-subspace variance, so
    rebalancing it is a wash; the knob is for trained production
    indexes over real (correlated) embeddings."""
    import hashlib
    import struct

    from py_data_pipeline_app_spark.functions.frames import local_rows_df
    from py_data_pipeline_app_spark.operators.quantization import (
        _matvec,
        _with_residual,
        build_ivfpq_index,
        ivfpq_topk,
        rotation_matrix,
    )
    from py_data_pipeline_app_spark.operators.similarity import (
        _assign_to_centroids,
        _centroid_rows,
        float_matrix_lit,
        train_centroids,
    )

    def u(tag, i):
        h = hashlib.md5(f"{tag}:{i}".encode()).digest()
        return struct.unpack(">Q", h[:8])[0] / 2**63 - 1.0

    rows = []
    for v in range(600):
        base = [u(v, j) for j in range(DIM // 2)]
        rows.append(
            (v, base + [b + 0.05 * u(f"n{v}", j) for j, b in enumerate(base)])
        )
    emb2 = local_rows_df(
        spark, "vec_id long, embedding array<double>", rows
    ).localCheckpoint()
    queries2 = emb2.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    bf = {
        (r.query_id, r.vec_id)
        for r in brute_force_topk(emb2, queries2, k=10).collect()
    }
    tc = _centroid_rows(train_centroids(emb2, n_centroids=8))
    resid = _with_residual(
        _assign_to_centroids(emb2, tc, id_col="vec_id", vec_col="embedding"),
        tc,
        vec_col="embedding",
    ).localCheckpoint()

    def recall(seed, name):
        r, vc = resid, "_rvec"
        if seed is not None:
            R = rotation_matrix(seed, DIM)
            r = r.withColumn(
                "_rvec_rot", _matvec(float_matrix_lit(R), F.col("_rvec"), DIM)
            ).localCheckpoint()
            vc = "_rvec_rot"
        cb = train_pq_codebooks(r, m=M, ksub=KSUB, dim=DIM, vec_col=vc, max_iter=10)
        idx = str(tmp_path / name)
        build_ivfpq_index(
            emb2, idx, n_centroids=8, m=M, ksub=KSUB, dim=DIM,
            cents=tc, codebooks=cb, rotation_seed=seed,
        )
        got = {
            (x.query_id, x.vec_id)
            for x in ivfpq_topk(spark, idx, queries2, k=10, nprobe=8).collect()
        }
        return len(got & bf) / len(bf)

    plain, rotated = recall(None, "plain"), recall(7, "rotated")
    assert rotated > plain, (plain, rotated)


@pytest.mark.oracle
def test_trained_builder_one_call(spark, emb, queries, tmp_path):
    """build_ivfpq_index_trained assembles the production recall
    configuration in one call: probes must beat the sampled-table
    recall floor, and a rotated build must replay through appends
    (the rotation space cannot be mismatched by construction)."""
    from py_data_pipeline_app_spark.operators.quantization import (
        build_ivfpq_index_trained,
        ivfpq_index_append,
        ivfpq_topk,
    )

    bf = {
        (r.query_id, r.vec_id)
        for r in brute_force_topk(emb, queries, k=10).collect()
    }
    path = str(tmp_path / "trained")
    build_ivfpq_index_trained(
        emb, path, n_centroids=16, m=M, ksub=KSUB, dim=DIM
    )
    got = {
        (r.query_id, r.vec_id)
        for r in ivfpq_topk(spark, path, queries, k=10, nprobe=16).collect()
    }
    assert len(got & bf) / len(bf) >= 0.35  # measured 0.44; sampled is 0.14
    # rotated variant: build over half, append the rest, probes work
    rot = str(tmp_path / "trained_rot")
    even = emb.filter(F.col("vec_id") % 2 == 0)
    build_ivfpq_index_trained(
        even, rot, n_centroids=8, m=M, ksub=8, dim=DIM, rotation_seed=7
    )
    ivfpq_index_append(
        spark, rot, emb.filter(F.col("vec_id") % 2 == 1), batch_token="odd"
    )
    out = ivfpq_topk(spark, rot, queries, k=5, nprobe=8).collect()
    assert {r.query_id for r in out} == set(range(10))


@pytest.mark.oracle
def test_trained_opq_rotation_beats_fixed_rr(spark, tmp_path):
    """Round-11: the TRAINED alternating-optimization rotation (Ge et
    al. 2014 Algorithm 1, train_opq_rotation) must strictly beat the
    fixed random-rotation baseline it initializes from, on the same
    cross-subspace-correlated fixture the RR test uses — and the
    persisted matrix must be the trained one (≠ the seed-derived RR),
    orthonormal, replayed from disk by the probe."""
    import hashlib
    import struct

    from py_data_pipeline_app_spark.functions.frames import local_rows_df
    from py_data_pipeline_app_spark.operators.quantization import (
        build_ivfpq_index_trained,
        ivfpq_topk,
        rotation_matrix,
    )

    def u(tag, i):
        h = hashlib.md5(f"{tag}:{i}".encode()).digest()
        return struct.unpack(">Q", h[:8])[0] / 2**63 - 1.0

    rows = []
    for v in range(600):
        base = [u(v, j) for j in range(DIM // 2)]
        rows.append(
            (v, base + [b + 0.05 * u(f"n{v}", j) for j, b in enumerate(base)])
        )
    emb2 = local_rows_df(
        spark, "vec_id long, embedding array<double>", rows
    ).localCheckpoint()
    queries2 = emb2.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    bf = {
        (r.query_id, r.vec_id)
        for r in brute_force_topk(emb2, queries2, k=10).collect()
    }

    def recall(name, **kw):
        idx = str(tmp_path / name)
        build_ivfpq_index_trained(
            emb2, idx, n_centroids=8, m=M, ksub=KSUB, dim=DIM,
            rotation_seed=7, max_iter=10, **kw,
        )
        got = {
            (x.query_id, x.vec_id)
            for x in ivfpq_topk(spark, idx, queries2, k=10, nprobe=8).collect()
        }
        return len(got & bf) / len(bf)

    fixed = recall("rr")
    trained = recall("opq", opq_iters=8)
    assert trained > fixed, (fixed, trained)
    # the persisted rotation is the trained one, not the RR init
    persisted = [
        [float(x) for x in r.coeffs]
        for r in sorted(
            spark.read.parquet(str(tmp_path / "opq" / "rotation")).collect(),
            key=lambda r: r.row_id,
        )
    ]
    assert persisted != rotation_matrix(7, DIM)
    for i, row in enumerate(persisted):  # orthonormality
        for j, other in enumerate(persisted):
            dot = sum(a * b for a, b in zip(row, other))
            assert abs(dot - (1.0 if i == j else 0.0)) < 1e-9


@pytest.mark.oracle
def test_opq_alternation_reduces_quantization_error(spark):
    """train_opq_rotation's alternation must END with lower sample
    quantization error than its RR initialization (each codebook fit
    and each Procrustes step is a coordinate descent on the same
    objective; tiny re-init jitter between rounds is allowed, the
    endpoint is not)."""
    import hashlib
    import struct

    import numpy as np

    from py_data_pipeline_app_spark.functions.frames import local_rows_df
    from py_data_pipeline_app_spark.operators.quantization import (
        _np_lloyd,
        rotation_matrix,
        train_opq_rotation,
    )

    def u(tag, i):
        h = hashlib.md5(f"{tag}:{i}".encode()).digest()
        return struct.unpack(">Q", h[:8])[0] / 2**63 - 1.0

    dim, m, ksub = 16, 4, 8
    rows = []
    for v in range(300):
        base = [u(v, j) for j in range(dim // 2)]
        rows.append(
            (v, base + [b + 0.05 * u(f"n{v}", j) for j, b in enumerate(base)])
        )
    resid = local_rows_df(
        spark, "vec_id long, _rvec array<double>", rows
    )
    X = np.array([r[1] for r in rows])

    def qerr(R):
        Xr = X @ np.array(R).T
        dsub = dim // m
        e = 0.0
        for s in range(m):
            S = Xr[:, s * dsub : (s + 1) * dsub]
            C, a = _np_lloyd(S, ksub)
            e += ((S - C[a]) ** 2).sum()
        return e

    # the full driver sample == X here (300 < sample_size), so qerr is
    # computed over exactly the rows the trainer saw
    trained = train_opq_rotation(
        resid, m=m, ksub=ksub, dim=dim, n_iter=8, seed=7
    )
    assert qerr(trained) < qerr(rotation_matrix(7, dim))
