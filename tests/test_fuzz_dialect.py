"""Cross-dialect fuzz: seeded adversarial documents through each shared
Spark expression AND its DuckDB oracle twin. The per-row expression ops
(tokenize, regex, list math, rounding) are exactly where a dialect
divergence would silently skew results at scale while the uniform fixture
stays green — so hammer them with text shapes the fixture never contains:
empty strings, punctuation-only, unicode (incl. astral-plane emoji — Spark
and DuckDB both count code points, verified), single tokens, exact
3-token boundaries, pathological repetition, and long random word soup."""

from __future__ import annotations

import random

import duckdb
import pytest

FUZZ_QUERIES = [
    "curation_filter",
    "text_quality",
    "doc_repetition",
    "token_counts",
    "doc_splits",
    "mixture_sample",
    "source_mixture",
    "dedup_exact",
    # md5-sketch / winnowing surface
    "doc_fingerprints",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "train_eval_contamination",
    # stemmer + DF/TF-IDF surface (the deepest shared SQL expression)
    "doc_freq_top100",
    "tfidf",
    "top_terms_per_doc",
    "bigram_pmi",
    # misc per-row / window
    "lang_id_confusion",
    "stratified_sample",
    "vocab_coverage",
]

_EDGE_TEXTS = [
    "",
    " ",
    "   \t\n  ",
    "123 456 !!! ???",
    "🙂 café 北京 — naïve façade",
    "word",
    "one two three",
    "a b c a b c a b c a b c",           # pure trigram repetition
    "the of and to in is it a an or",    # all stopwords
    "The QUICK brown FOX jumps",
    "x" * 300,                            # one enormous token
    "tab\tsep\tand\nnew\nlines",
    "ALLCAPS SHOUTING TEXT HERE",
    "punct,comma.dot;semi:colon-dash",
    "mixed123digits456inside789words",
]


def _fuzz_rows(n: int = 120, seed: int = 20260813):
    rng = random.Random(seed)
    vocab = ["alpha", "beta", "gamma", "delta", "the", "of", "zz", "qx",
             "lorem", "ipsum", "dolor", "sit", "amet", "kappa", "omega"]
    rows = []
    for i, t in enumerate(_EDGE_TEXTS):
        rows.append((i, t, "en", f"src{i % 20}", len(t)))
    # nullable columns are the norm in real data lakes; Spark and DuckDB
    # propagate NULL through the shared expressions identically (verified)
    rows.append((len(rows), None, "en", "src0", 0))
    rows.append((len(rows), "plain words here", None, "src1", 16))
    for i in range(len(_EDGE_TEXTS), n):
        k = rng.randint(0, 60)
        text = " ".join(rng.choice(vocab) for _ in range(k))
        if rng.random() < 0.2:  # splice punctuation/digit noise mid-text
            text = text + " 42! " + text[: rng.randint(0, len(text))]
        rows.append((i, text, rng.choice(["en", "de", "zh"]),
                     f"src{rng.randint(0, 19)}", len(text)))
    return rows


@pytest.fixture(scope="module")
def fuzz_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("fuzz"))
    spark.createDataFrame(
        _fuzz_rows(),
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")
    return d


@pytest.mark.parametrize("name", FUZZ_QUERIES)
def test_dialect_parity_on_adversarial_docs(spark, fuzz_dir, name):
    import __spark_entry__ as e
    from tools.canon import canon_rows

    spdf = e.queries()[name](spark, fuzz_dir).toPandas()
    con = duckdb.connect()
    # Spark writes a parquet DIRECTORY; DuckDB reads it via glob
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{fuzz_dir}/documents.parquet/*.parquet')"
    )
    ddf = con.sql(e.oracle_sql()[name]).df()
    con.close()
    assert sorted(spdf.columns) == sorted(ddf.columns), name
    assert len(spdf) == len(ddf), f"{name}: {len(spdf)} != {len(ddf)}"
    s_norm, d_norm = canon_rows(spdf), canon_rows(ddf)
    assert s_norm == d_norm, f"{name}: first diff " + str(
        next(((a, b) for a, b in zip(s_norm, d_norm) if a != b), None)
    )


# --------------------------------------------------------------------------- #
# events fuzz: boundary-exact timestamps through windows / range joins /
# REAL streams and their SQL oracles
# --------------------------------------------------------------------------- #

EVENTS_FUZZ_QUERIES = [
    "events_hourly_tumbling",
    "events_sliding_windows",
    "events_time_rollup",
    "sessionize_events",
    "asof_purchase_prior_click",
    "clicks_before_purchase_5min",
    "user_event_pivot",
    "user_event_unpivot",
    "events_json_stats",
    "events_json_schema_stats",
    # REAL Structured Streaming runs against the same SQL oracles
    "events_hourly_streaming",
    "events_stream_dedup",
    "events_stream_stream_join",
    "events_user_running_totals",
    "events_session_stream",
]


def _fuzz_events(n: int = 300, seed: int = 20260813):
    """Adversarial event stream: timestamps EXACTLY on hour/half-hour/minute
    boundaries (window edge semantics), click-purchase gaps exactly at the
    300 s range-join boundary, session gaps exactly 30 min, duplicate
    (user, type, minute) keys, zero/negative/huge values, and degenerate
    JSON props."""
    import datetime as dt

    rng = random.Random(seed)
    base = dt.datetime(2024, 1, 10, 0, 0, 0)
    rows = []
    eid = 0

    def add(ts, user, etype, value, props):
        nonlocal eid
        rows.append((eid, ts, user, etype, float(value), props))
        eid += 1

    # exact boundaries: hour, half-hour, minute, and ±1 microsecond
    for h in range(6):
        t0 = base + dt.timedelta(hours=h)
        add(t0, 1, "click", 1.0, '{"k": 1}')
        add(t0 + dt.timedelta(minutes=30), 1, "view", 0.0, '{"k": 0}')
        add(t0 - dt.timedelta(microseconds=1), 2, "click", -1.5, '{"k": -5}')
        # 1e6, not 1e15: huge magnitudes expose float-summation ORDER
        # (non-associativity), which is not a dialect defect
        add(t0 + dt.timedelta(microseconds=1), 2, "view", 1e6, '{"k": 999999}')
    # range-join boundary: clicks exactly 300 s before, at, and 1 us around
    for i in range(8):
        p = base + dt.timedelta(hours=8, minutes=13 * i, seconds=7)
        add(p, 3, "purchase", 10.0, '{"k": 3}')
        add(p - dt.timedelta(seconds=300), 3, "click", 1.0, '{"k": 3}')  # excluded (> p-300)
        add(p - dt.timedelta(seconds=300) + dt.timedelta(microseconds=1), 3, "click", 1.0, '{"k": 3}')
        add(p, 3, "click", 1.0, '{"k": 3}')                              # included (<= p)
        add(p + dt.timedelta(microseconds=1), 3, "click", 1.0, '{"k": 3}')  # excluded
    # session gaps exactly 30 min and 30 min ± 1 s for one user
    t = base + dt.timedelta(days=1)
    for gap_s in (1799, 1800, 1801, 60, 1800, 7200):
        add(t, 4, "view", 0.5, '{"k": 4}')
        t += dt.timedelta(seconds=gap_s)
    # duplicate (user, type, minute) bursts for stream dedup
    burst = base + dt.timedelta(days=2, hours=3, minutes=7)
    for s in (0, 5, 5, 30, 59):
        add(burst + dt.timedelta(seconds=s), 5, "click", 2.0, '{"k": 5}')
    # degenerate props (regexp and from_json must agree on these)
    for j, props in enumerate(['{"k": 0}', '{"k": 100}', '{"k": 7}']):
        add(base + dt.timedelta(days=3, minutes=j), 6, "error", 0.0, props)
    # random fill across all types/users
    types = ["click", "view", "purchase", "signup", "error"]
    while len(rows) < n:
        add(base + dt.timedelta(seconds=rng.randint(0, 6 * 86400)),
            rng.randint(1, 25), rng.choice(types),
            round(rng.uniform(-100, 100), 3), f'{{"k": {rng.randint(0, 100)}}}')
    return rows


@pytest.fixture(scope="module")
def fuzz_events_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path_factory.mktemp("fuzz_ev"))
    rows = _fuzz_events()
    table = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array([r[5] for r in rows], pa.string()),
    })
    # single FILE (not a directory): the streaming reader's pathGlobFilter
    # matches leaf file names, and DuckDB reads it directly
    pq.write_table(table, f"{d}/events.parquet")
    return d


@pytest.mark.parametrize("name", EVENTS_FUZZ_QUERIES)
def test_dialect_parity_on_adversarial_events(spark, fuzz_events_dir, name):
    import __spark_entry__ as e
    from tools.canon import canon_rows

    spdf = e.queries()[name](spark, fuzz_events_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{fuzz_events_dir}/events.parquet')"
    )
    ddf = con.sql(e.oracle_sql()[name]).df()
    con.close()
    assert sorted(spdf.columns) == sorted(ddf.columns), name
    assert len(spdf) == len(ddf), f"{name}: {len(spdf)} != {len(ddf)}"
    s_norm, d_norm = canon_rows(spdf), canon_rows(ddf)
    assert s_norm == d_norm, f"{name}: first diff " + str(
        next(((a, b) for a, b in zip(s_norm, d_norm) if a != b), None)
    )


# --------------------------------------------------------------------------- #
# embeddings fuzz: zero-norm / duplicate / adversarial vectors through the
# cosine similarity and ANN operators
# --------------------------------------------------------------------------- #

EMBED_FUZZ_QUERIES = [
    "dedup_embedding_cosine",
    "dedup_embedding_ivf",
    "ann_topk_bruteforce",
    "ann_topk_lsh",
    "ann_topk_ivf",
    "embedding_topk_pairs",
]


def _fuzz_embeddings(n: int = 200, dim: int = 64, seed: int = 20260813):
    """Adversarial vectors: the all-zero vector (zero norm — division
    hazard in cosine), exact duplicates (cos=1 ties), negated pairs
    (cos=-1), one-hot axes, tiny-magnitude vectors, plus random fill."""
    rng = random.Random(seed)
    rows = []

    def add(vec, label):
        rows.append((len(rows), [float(x) for x in vec], label))

    add([0.0] * dim, 0)                                   # zero norm
    add([1e-20] * dim, 0)                                 # near-zero norm
    base = [rng.gauss(0, 1) for _ in range(dim)]
    add(base, 1)
    add(base, 1)                                          # exact duplicate
    add([-x for x in base], 1)                            # negation, cos=-1
    add([x * 1e-6 for x in base], 1)                      # same direction, tiny
    for a in range(4):                                    # one-hot axes
        v = [0.0] * dim
        v[a] = 1.0
        add(v, 2)
    while len(rows) < n:
        add([rng.gauss(0, 1) for _ in range(dim)], rng.randint(0, 9))
    return rows


@pytest.fixture(scope="module")
def fuzz_embed_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path_factory.mktemp("fuzz_emb"))
    rows = _fuzz_embeddings()
    table = pa.table({
        "vec_id": pa.array([r[0] for r in rows], pa.int64()),
        "embedding": pa.array([r[1] for r in rows], pa.list_(pa.float32())),
        "label": pa.array([r[2] for r in rows], pa.int32()),
    })
    pq.write_table(table, f"{d}/embeddings.parquet")
    return d


@pytest.mark.parametrize("name", EMBED_FUZZ_QUERIES)
def test_dialect_parity_on_adversarial_embeddings(spark, fuzz_embed_dir, name):
    import __spark_entry__ as e
    from tools.canon import canon_rows

    q = e.queries()[name]
    sql = e.oracle_sql().get(name)
    spdf = q(spark, fuzz_embed_dir).toPandas()
    if sql is None:
        return  # rows-only op: executed without error is the contract
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{fuzz_embed_dir}/embeddings.parquet')"
    )
    ddf = con.sql(sql).df()
    con.close()
    assert sorted(spdf.columns) == sorted(ddf.columns), name
    assert len(spdf) == len(ddf), f"{name}: {len(spdf)} != {len(ddf)}"
    s_norm, d_norm = canon_rows(spdf), canon_rows(ddf)
    assert s_norm == d_norm, f"{name}: first diff " + str(
        next(((a, b) for a, b in zip(s_norm, d_norm) if a != b), None)
    )
