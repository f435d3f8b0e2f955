"""Training-data operator tests: DuckDB oracle parity for SQL-expressible
ops (the driver's correctness gate, run here at sf0.001) and semantic
checks for the rest."""

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"

TABLES = ["documents", "embeddings", "events", "lineitem", "orders", "customer"]


@pytest.fixture(scope="module")
def entry(ray_session):
    import __ray_entry__ as E

    return E


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return c


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object and len(df) and not isinstance(df[c].iloc[0], str):
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def _to_pandas(x):
    import pyarrow as pa
    import ray.data

    if isinstance(x, ray.data.Dataset):
        return x.to_pandas()
    if isinstance(x, pa.Table):
        return x.to_pandas()
    return x


SQL_CHECKED = [
    "events_sessionize",
    "term_df",
    "postings",
    "top_terms",
    "doc_stats",
    "language_id",
    "exact_dedup",
    "events_hourly",
    "lineitem_agg",
    "orders_by_segment",
    "knn_cosine",
    "token_count_bpe",
    "quality_score",
    "repetition_stats",
    "language_id_trigram",
    "ngram_jaccard",
    "fingerprint",
    "minhash_dedup",
    "clean_corpus",
    "simhash_dedup",
]


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_sql_parity(entry, con, name):
    got = _canon(_to_pandas(entry.queries()[name](SF)))
    want = _canon(con.execute(entry.oracle_sql()[name]).fetchdf())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_every_oracle_key_has_query(entry):
    qs = entry.queries()
    for name in entry.oracle_sql():
        assert name in qs, name


def test_minhash_dedup_finds_planted_dup(entry, ray_session, tmp_path):
    """Plant an exact duplicate pair in a copy of documents; MinHash-LSH
    must prune the higher doc_id of the pair."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/documents.parquet")
    rows = t.to_pylist()
    dup = dict(rows[3])
    dup["doc_id"] = 100000
    rows.append(dup)
    import pyarrow as pa

    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.Table.from_pylist(rows, schema=t.schema), d / "documents.parquet")

    from searchengine_ray.pipelines import ops

    pruned = {r["doc_id"]: r["kept_by"] for r in ops.minhash_dedup(str(d)).take_all()}
    assert pruned.get(100000) == rows[3]["doc_id"]


def test_embedding_neardup_finds_planted_dup(entry, ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/embeddings.parquet")
    rows = t.to_pylist()
    dup = dict(rows[7])
    dup["vec_id"] = 200000
    rows.append(dup)
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.Table.from_pylist(rows, schema=t.schema), d / "embeddings.parquet")

    from searchengine_ray.pipelines import ops

    pruned = {
        r["vec_id"]: r["kept_by"] for r in ops.embedding_neardup(str(d)).take_all()
    }
    assert pruned.get(200000) == rows[7]["vec_id"]


def test_knn_self_is_top1(entry, ray_session):
    from searchengine_ray.pipelines import ops

    rows = ops.knn_cosine(SF, k=3).take_all()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], {})[r["rank"]] = r["neighbor_id"]
    for q, ranks in by_q.items():
        assert ranks[1] == q  # self-similarity = 1.0


def test_media_features_deterministic(entry, ray_session):
    from searchengine_ray.stages import media

    a = media.media_features(media.media_from_documents(SF)).take(5)
    b = media.media_features(media.media_from_documents(SF)).take(5)
    assert [r["feature"] for r in a] == [r["feature"] for r in b]
    assert all(len(r["feature"]) == media.FEATURE_DIM for r in a)
    assert all(r["n_bytes"] > 0 for r in a)


def test_media_real_decode_raises():
    from searchengine_ray.stages import media

    with pytest.raises(NotImplementedError):
        media.DecodeMedia(fake=False)._decode_real(b"x", "image")


def test_fingerprint_shift_invariance(entry, ray_session, tmp_path):
    """Winnowing property: fingerprints of a doc are stable under a prefix
    shift (most selected hashes survive)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/documents.parquet")
    base = t["text"][0].as_py()
    rows = [
        {"doc_id": 1, "text": base, "lang": "en", "source": "s", "n_chars": len(base)},
        {
            "doc_id": 2,
            "text": "prefix words here " + base,
            "lang": "en",
            "source": "s",
            "n_chars": len(base) + 18,
        },
    ]
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.Table.from_pylist(rows, schema=t.schema), d / "documents.parquet")

    from searchengine_ray.pipelines import ops

    out = {r["doc_id"]: r for r in ops.fingerprint(str(d)).take_all()}
    assert out[1]["n_fp"] > 0
    # shared suffix ⇒ overlapping fingerprint ranges
    assert out[1]["min_fp"] <= out[2]["max_fp"]


def test_knn_ivf_recall(entry, ray_session):
    """IVF with nprobe=4/16 centroids must recover most of the brute-force
    top-10 (exact on this small table is common but not guaranteed)."""
    from searchengine_ray.pipelines import ops

    brute = {}
    for r in ops.knn_cosine(SF, k=10).take_all():
        brute.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    ivf = {}
    for r in ops.knn_ivf(SF, k=10).take_all():
        ivf.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert set(ivf) == set(brute)
    recalls = [len(ivf[q] & brute[q]) / len(brute[q]) for q in brute]
    assert sum(recalls) / len(recalls) >= 0.6, recalls
    # self-vector always lands in its own probed cluster
    for q, ns in ivf.items():
        assert q in ns


def test_token_count_bpe(entry, ray_session):
    from searchengine_ray.pipelines import ops

    rows = {r["doc_id"]: r for r in ops.token_count_bpe(SF).take_all()}
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    for doc_id, text in zip(t["doc_id"].to_pylist()[:20], t["text"].to_pylist()[:20]):
        assert rows[doc_id]["n_ws_tokens"] == len(text.split())
        assert rows[doc_id]["n_bpe_tokens"] >= rows[doc_id]["n_ws_tokens"]


def test_language_id_trigram(entry, ray_session):
    from searchengine_ray.pipelines import ops

    rows = ops.language_id_trigram(SF).take_all()
    langs = {r["pred_lang"] for r in rows}
    assert langs <= {"en", "de", "fr", "es", "und"}
    assert len(rows) == 500
    # the synthetic docs are English-ish data vocabulary
    en = sum(1 for r in rows if r["pred_lang"] == "en")
    assert en > len(rows) * 0.5


def test_sessionize_sorted_equals_grouped(entry, ray_session):
    """The sorted two-pass sessionize (boundary stitch) must equal the
    per-group reference on the fixture."""
    from searchengine_ray.pipelines import ops

    a = sorted(
        (r["user_id"], r["session_id"], r["n_events"])
        for r in ops.events_sessionize(SF).take_all()
    )
    b = sorted(
        (r["user_id"], r["session_id"], r["n_events"])
        for r in ops.events_sessionize_grouped(SF).take_all()
    )
    assert a == b
    assert len(a) > 100


def test_sessionize_sorted_multiblock(entry, ray_session, tmp_path):
    """Force many tiny sorted blocks so user runs AND sessions span block
    boundaries — the adversarial case for the stitch — and compare with
    the per-group reference."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    rng = np.random.RandomState(7)
    rows = []
    eid = 0
    base = 1_700_000_000_000_000  # µs epoch
    for user in range(6):
        t = base + user * 10**9
        for _ in range(400):
            # mix sub-gap and super-gap steps so sessions break mid-run
            t += int(rng.choice([60, 600, 2400, 3600]) * 1e6)
            rows.append({"user_id": user, "ts": t, "event_id": eid})
            eid += 1
    d = tmp_path / "sf"
    d.mkdir()
    t = pa.Table.from_pylist(rows)
    t = t.set_column(
        t.schema.get_field_index("ts"),
        "ts",
        t["ts"].cast(pa.timestamp("us")),
    )
    pq.write_table(t, d / "events.parquet")

    from ray.data import DataContext
    from searchengine_ray.pipelines import ops

    ctx = DataContext.get_current()
    old = ctx.target_max_block_size
    try:
        ctx.target_max_block_size = 4096  # ~tens of rows per sorted block
        a = sorted(
            (r["user_id"], r["session_id"], r["n_events"])
            for r in ops.events_sessionize(str(d), gap_minutes=30).take_all()
        )
    finally:
        ctx.target_max_block_size = old
    b = sorted(
        (r["user_id"], r["session_id"], r["n_events"])
        for r in ops.events_sessionize_grouped(str(d), gap_minutes=30).take_all()
    )
    assert a == b
    assert len(a) > 50  # sessions actually broke


def test_repetition_stats_flags_planted_spam(entry, ray_session, tmp_path):
    """A doc that repeats one line 50× must fail the duplicate-line gates;
    a doc dominated by one bigram must fail the bigram gate; normal prose
    passes."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/documents.parquet")
    prose = t["text"][0].as_py()
    rows = [
        {"doc_id": 1, "text": prose, "lang": "en", "source": "s",
         "n_chars": len(prose)},
        {"doc_id": 2, "text": "buy cheap pills now\n" * 50, "lang": "en",
         "source": "s", "n_chars": 1000},
        {"doc_id": 3, "text": "click here " * 40, "lang": "en", "source": "s",
         "n_chars": 440},
    ]
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.Table.from_pylist(rows, schema=t.schema),
                   d / "documents.parquet")

    from searchengine_ray.pipelines import ops

    out = {r["doc_id"]: r for r in ops.repetition_stats(str(d)).take_all()}
    assert out[1]["keep_rep"]
    assert not out[2]["keep_rep"]
    assert out[2]["n_dup_lines"] == 49
    assert not out[3]["keep_rep"]
    assert out[3]["max_2gram_count"] >= 39


def test_verified_prune_join_matches_driver(entry, ray_session, monkeypatch):
    """The gated driver-vectorized verify path and the distributed
    hash-join fallback must produce identical prune maps (mirrors the
    D1/D2 driver-vs-groupby equivalence test in test_scale_paths)."""
    from searchengine_ray.pipelines import ops

    driver = {
        (r["doc_id"], r["kept_by"]) for r in ops.minhash_dedup(SF).take_all()
    }
    monkeypatch.setattr(ops, "_DRIVER_VERIFY_PAIR_LIMIT", -1)  # force join path
    joined = {
        (r["doc_id"], r["kept_by"]) for r in ops.minhash_dedup(SF).take_all()
    }
    assert driver == joined
    assert driver  # non-vacuous: sf0.001 has real near-dup pairs


def test_ngram_jaccard_join_matches_driver(entry, ray_session, monkeypatch):
    from searchengine_ray.pipelines import ops

    driver = {
        (r["a"], r["b"], r["inter"], r["uni"])
        for r in ops.ngram_jaccard_pairs(SF).take_all()
    }
    monkeypatch.setattr(ops, "_DRIVER_VERIFY_PAIR_LIMIT", -1)
    joined = {
        (r["a"], r["b"], r["inter"], r["uni"])
        for r in ops.ngram_jaccard_pairs(SF).take_all()
    }
    assert driver == joined
    assert driver


def test_knn_ivf_stride_sample_matches_oracle(entry, ray_session, tmp_path):
    """Above the full-sample bound (>1024 vectors) the train sample is a
    deterministic vec_id stride, replayed exactly by the SQL oracle —
    pins the round-5 fix (random_sample broke the oracle at sf0.1)."""
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(3)
    n, dim = 1400, 8
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    d = tmp_path / "sfivf"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32())),
            }
        ),
        str(d / "embeddings.parquet"),
    )
    from searchengine_ray.pipelines import ops

    got = ops.knn_ivf(str(d), k=10).to_pandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{d}/embeddings.parquet')"
    )
    want = con.execute(entry.oracle_sql()["knn_ivf"]).df()
    key = ["query_id", "rank"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["query_id", "neighbor_id", "rank"]],
                                  want[["query_id", "neighbor_id", "rank"]],
                                  check_dtype=False)
