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
    "dedup_containment",
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
    # packing (map-only chunking + distributed prefix-sum packing)
    "doc_chunks",
    "pack_sequences",
    # round-5 text analysis (bigram-LM scoring + per-lang length profile)
    "doc_lm_score",
    "lang_length_quantiles",
    # round-7 DSIR importance ratio (same bigram-LM surface, two models)
    "dsir_importance",
    # round-7 snapshot drift monitor (top-K conditional counts + JS terms)
    "token_drift",
    # round-7 per-doc novelty share (distinct-shingle marginal)
    "ngram_novelty",
    # round-5 redaction / shuffle / Zipf tier (PII shapes live in _EDGE_TEXTS)
    "pii_redaction",
    "corpus_shuffle",
    "token_zipf",
    "zipf_slope",
    "quality_classifier",
    "source_dup_matrix",
    "length_bucket_batches",
    # the full composed pipeline: on THIS corpus the PII stage really
    # rewrites text, so the manifest token counts check the scrub end-to-end
    "pretraining_manifest",
    "corpus_stats",
    # round-6 dataset-release tier: content-hash split (NULL/empty/unicode
    # texts), LSH leakage audit, token-budget recipe (zero-token sources),
    # composed per-source datasheet
    "train_val_test_split",
    "split_leakage",
    "mixture_plan",
    "dataset_card",
    # round-6 NFC + control/whitespace cleanup — the unicode edge texts are
    # the real exercise (the uniform fixture is clean ascii)
    "text_normalize",
    # round-6 script histogram (CJK/latin edge texts, astral emoji)
    "script_mix",
    # round-6 composed curate→dedup→split census
    "release_manifest",
    # round-8 BM25 retrieval — its pinned query terms are in the fuzz vocab
    # and one edge text, so postings are non-empty AND some docs miss terms
    "bm25_topk",
    # round-10 ExactSubstr family: positional shingles, span islands, the
    # token-excision apply, and the boilerplate census over the same
    # adversarial texts (empty/NULL/punct-only/repetition edge shapes)
    "dedup_substring",
    "dedup_substring_apply",
    "dedup_substring_incremental",
    "substring_boilerplate_census",
    # round-11 second half: the bloom pre-filter must stay exactly
    # transparent on NULL texts / duplicate edge shapes; the chunk scrub's
    # array_distinct-order contract meets repetition + unicode; the rollup
    # composes quality + hash census over NULL text and NULL lang; the BPE
    # mixture plan pushes OOV/unicode/emoji words through the recursive
    # segmentation CTE (byte-level fallback) before the recipe arithmetic
    "dedup_incremental_bloom",
    "doc_chunk_dedup",
    "source_quality_rollup",
    "mixture_plan_bpe",
    # round-12: the dedup-adjusted mixture census meets the duplicate-id /
    # duplicate-text / NULL-source shapes; the per-source fertility rollup
    # pushes OOV/unicode words through the recursive segmentation per
    # source group (incl. the NULL-source group)
    "mixture_plan_dedup",
    "bpe_source_fertility",
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
    # PII shapes for the redaction surface: emails (plus a bare @ and a
    # trailing-dot near-miss), IPv4s (plus a version-number lookalike and
    # an overlong octet), digit runs straddling the 7-digit threshold
    "contact me at jane.doe+spam@mail.example.org or admin@host.io today",
    "not-an-email @ example. com but v1.2.3.4000 looks like an ip",
    "server 10.0.255.1 and 192.168.1.1, phone 5551234567, short 123456",
    "card 4111111111111111 ip.in.text 8.8.8.8end no-space",
    # BM25 query-term shapes: heavy tf saturation on one term, all four
    # terms once, and case/punctuation variants of the pinned terms
    "dup dup dup dup dup dup dup dup dup dup",
    "dup join scan spark",
    "DUP Join. scan,spark-dup JOIN!",
]


def _fuzz_rows(n: int = 120, seed: int = 20260813):
    rng = random.Random(seed)
    vocab = ["alpha", "beta", "gamma", "delta", "the", "of", "zz", "qx",
             "lorem", "ipsum", "dolor", "sit", "amet", "kappa", "omega",
             # the pinned BM25 query terms, so retrieval postings are
             # non-empty on the fuzz corpus (df spread emerges from rng)
             "dup", "join", "scan", "spark"]
    rows = []
    for i, t in enumerate(_EDGE_TEXTS):
        rows.append((i, t, "en", f"src{i % 20}", len(t)))
    # nullable columns are the norm in real data lakes; Spark and DuckDB
    # propagate NULL through the shared expressions identically (verified)
    rows.append((len(rows), None, "en", "src0", 0))
    rows.append((len(rows), "plain words here", None, "src1", 16))
    # NULL source (r11 advice): a real group in every source-grouped census —
    # pins that engine and oracle agree on NULL grouping keys AND that the
    # BPE mixture plan's census join is null-safe (a plain equi-join would
    # silently drop this group and re-weight every unnamed source). id 1000
    # sits above the loop's id range so this row adds NO new dup-id shape.
    rows.append((1000, "null source words alpha beta", "en", None, 28))
    # NOTE (load-bearing): the loop below restarts ids at len(_EDGE_TEXTS),
    # so the two appended rows' ids (22, 23) are DUPLICATED with different
    # texts — dirty-data shape that real lakes have and the uniform fixture
    # doesn't. It caught doc_chunk_dedup's oracle grouping per doc_id where
    # the engine scrubs per ROW (round 11). Keep the collision. The fully
    # identical row (same id AND text) below covers the other dirty shape —
    # it caught the fixed oracle double-counting chunks inside the shared
    # (doc_id, text) agg group (round-11 review).
    rows.append((7, _EDGE_TEXTS[7], "en", "src7", len(_EDGE_TEXTS[7])))
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
    "user_funnel",
    "user_retention_cohorts",
    "events_hourly_anomalies",
    "events_time_rollup",
    "sessionize_events",
    "sessionize_events_scalable",
    "asof_purchase_prior_click",
    "asof_purchase_prior_click_scalable",
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
    "embedding_outliers",
    "ann_topk_bruteforce",
    "ann_topk_lsh",
    "ann_topk_ivf",
    "embedding_topk_pairs",
    # round-6: exact 1-NN agreement — duplicate vectors (cos=1 ties with
    # min-id break) and zero-norm exclusions go through the tile argmax
    "knn_label_agreement",
    # round-7: the LSH scale route through the same adversarial vectors
    "knn_label_agreement_lsh",
    # round-7: per-label snapshot centroid drift (one-sided labels,
    # zero-norm exclusions, duplicate vectors)
    "embedding_centroid_shift",
    # round-10 SemDeDup: exact-duplicate groups (cos=1 election ties),
    # negated pairs, zero-norm exclusions through quantizer + CC + election
    "semdedup_prune",
    # round-11: coverage sampler through the same adversarial vectors —
    # duplicate-vector affinity ties must elect identically in both engines
    "diverse_sample_ivf",
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


# --------------------------------------------------------------------------- #
# TPC-H star-schema fuzz: predicate-boundary rows, rank ties, childless
# parents — through the 31 relational queries and their SQL oracles
# --------------------------------------------------------------------------- #

TPCH_FUZZ_QUERIES = [
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
    "q7_nation_trade_volume", "q13_customer_order_distribution",
    "q2_cheapest_supplier", "q6_forecast_revenue", "q8_market_share",
    "q9_product_profit", "q10_returned_items", "q14_promo_revenue",
    "q15_top_supplier", "q16_supplier_part_counts", "q17_small_quantity_revenue",
    "q18_large_volume_customers", "q19_disjunctive_revenue", "q22_idle_customers",
    "q4_order_priority", "q11_important_parts", "q12_priority_by_returnflag",
    "q20_dominant_suppliers", "q21_waiting_suppliers",
    "topk_orders", "rollup_customer_geo", "cube_lineitem_flags",
    "grouping_sets_revenue", "orders_with_returns_exists",
    "customers_above_avg_balance", "parts_never_ordered",
    "customers_without_orders", "order_status_symmetric_difference",
    "suppliers_intersect_customer_nations", "monthly_order_revenue",
    "customer_order_cadence", "lineitem_price_stats", "running_customer_spend",
    "top3_orders_per_customer",
    # round-11: the Morton layout over the adversarial key distribution
    # (clustered + boundary + sparse keys — grid math must agree exactly)
    "zorder_layout",
]

# the date constants the query predicates compare against (grep'd from
# operators/relational.py + tpch_extra.py); boundary rows land exactly on
# each and one day to either side
_PRED_DATES = ["1996-01-01", "1997-01-01", "1997-03-01", "1997-04-01",
               "1997-07-01", "1997-12-31", "1998-01-01", "1998-09-01"]


def _fuzz_tpch(seed: int = 20260813):
    import datetime as dt

    rng = random.Random(seed)
    regions = [(i, n) for i, n in enumerate(
        ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"])]
    nations = [(i, f"NATION_{i}", i % 5) for i in range(25)]

    segs = ["MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "BUILDING", "FURNITURE"]
    customers = []
    for c in range(60):
        # acctbal edges: exactly 0, negative, and exact duplicates (ties for
        # the above-average-balance scalar subquery)
        bal = [0.0, -999.99, 500.0, 500.0][c % 4] if c < 8 else round(rng.uniform(-1000, 10000), 2)
        customers.append((c, f"Customer#{c:09d}", c % 25, bal, segs[c % 5]))
        # customers 50..59 get no orders (q13 zero-bucket, q22, anti-joins)

    suppliers = []
    for s in range(20):
        # suppliers 0/1 in NATION_20 and NATION_11 (q7 pair), 2 in NATION_2
        # (q8 market share); 18/19 get no lineitems
        nk = {0: 20, 1: 11, 2: 2}.get(s, s % 25)
        suppliers.append((s, f"Supplier#{s:09d}", nk, round(rng.uniform(-100, 5000), 2)))

    types = ["ECONOMY", "MEDIUM", "SMALL", "PROMO", "LARGE", "STANDARD"]
    parts = []
    for p in range(30):
        # p_size 14/15/16 straddle the q2/q16 `p_size < 15` boundary;
        # Brand#1 parts feed q17/q19; parts 28/29 are never ordered
        size = [14, 15, 16][p % 3]
        brand = "Brand#1" if p % 5 == 0 else f"Brand#{p % 25}"
        parts.append((p, f"part {p}", brand, types[p % 6], size,
                      round(rng.uniform(900, 2000), 2)))

    statuses = ["P", "O", "F"]
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    orders, lineitems = [], []
    ok = 0

    def add_order(cust, date_str, price, status=None, prio=None):
        nonlocal ok
        d = dt.datetime.strptime(date_str, "%Y-%m-%d")
        orders.append((ok, cust, status or statuses[ok % 3], price, d, prio or prios[ok % 5]))
        ok += 1
        return ok - 1

    def add_line(okey, part, supp, ln, qty, price, disc, tax, rf, ls, ship_str):
        lineitems.append((okey, part, supp, ln, float(qty), float(price),
                          float(disc), float(tax), rf, ls,
                          dt.datetime.strptime(ship_str, "%Y-%m-%d")))

    # boundary orders: one exactly ON each predicate date, one the day
    # before, one the day after — with lineitems shipping the same days
    for i, ds in enumerate(_PRED_DATES):
        d = dt.datetime.strptime(ds, "%Y-%m-%d")
        for delta in (-1, 0, 1):
            day = (d + dt.timedelta(days=delta)).strftime("%Y-%m-%d")
            o = add_order(i % 50, day, round(1000 + 100 * i + delta, 2))
            # quantity 23/24/25 straddles `l_quantity < 24`; discount
            # 0.05/0.06/0.07 are the classic q6 band edges
            add_line(o, i % 28, i % 18, 1, 23 + delta + 1, 1000.0,
                     [0.05, 0.06, 0.07][i % 3], 0.04,
                     ["A", "N", "R"][i % 3], ["O", "F"][i % 2], day)
            add_line(o, (i + 5) % 28, (i + 3) % 18, 2, 0, 0.0, 0.0, 0.0,
                     "N", "O", day)  # zero-qty/zero-price degenerate line
    # exact-tie orders for topk/top3 tie-breaks: same customer, same price
    for j in range(6):
        o = add_order(7, "1997-05-05", 5000.0)
        add_line(o, j % 28, j % 18, 1, 10, 2500.0, 0.1, 0.05, "R", "F", "1997-05-06")
    # same-date order pairs (cadence datediff=0, monthly grouping)
    for j in range(4):
        add_order(9, "1997-06-15", round(100.0 * (j + 1), 2))
    # q15 revenue tie: suppliers 10 and 11 each get one identical lineitem
    for s in (10, 11):
        o = add_order(11, "1997-02-10", 3333.0)
        add_line(o, 3, s, 1, 5, 1234.56, 0.0, 0.0, "N", "O", "1997-02-11")
    # random fill
    while ok < 150:
        day = (dt.datetime(1995, 1, 1) +
               dt.timedelta(days=rng.randint(0, 2100))).strftime("%Y-%m-%d")
        o = add_order(rng.randint(0, 49), day, round(rng.uniform(10, 20000), 2))
        for ln in range(rng.randint(0, 4)):  # some orders keep NO lineitems
            ship = (dt.datetime.strptime(day, "%Y-%m-%d") +
                    dt.timedelta(days=rng.randint(0, 90))).strftime("%Y-%m-%d")
            add_line(o, rng.randint(0, 27), rng.randint(0, 17), ln + 1,
                     rng.randint(1, 50), round(rng.uniform(1, 5000), 2),
                     round(rng.choice([0.0, 0.02, 0.05, 0.07, 0.1]), 2),
                     round(rng.uniform(0, 0.08), 2),
                     rng.choice(["A", "N", "R"]), rng.choice(["O", "F"]), ship)
    return regions, nations, customers, suppliers, parts, orders, lineitems


@pytest.fixture(scope="module")
def fuzz_tpch_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path_factory.mktemp("fuzz_tpch"))
    regions, nations, customers, suppliers, parts, orders, lineitems = _fuzz_tpch()

    def write(name, cols):
        pq.write_table(pa.table(cols), f"{d}/{name}.parquet")

    write("region", {"r_regionkey": pa.array([r[0] for r in regions], pa.int32()),
                     "r_name": [r[1] for r in regions]})
    write("nation", {"n_nationkey": pa.array([n[0] for n in nations], pa.int32()),
                     "n_name": [n[1] for n in nations],
                     "n_regionkey": pa.array([n[2] for n in nations], pa.int32())})
    write("customer", {"c_custkey": pa.array([c[0] for c in customers], pa.int64()),
                       "c_name": [c[1] for c in customers],
                       "c_nationkey": pa.array([c[2] for c in customers], pa.int32()),
                       "c_acctbal": pa.array([c[3] for c in customers], pa.float64()),
                       "c_mktsegment": [c[4] for c in customers]})
    write("supplier", {"s_suppkey": pa.array([s[0] for s in suppliers], pa.int64()),
                       "s_name": [s[1] for s in suppliers],
                       "s_nationkey": pa.array([s[2] for s in suppliers], pa.int32()),
                       "s_acctbal": pa.array([s[3] for s in suppliers], pa.float64())})
    write("part", {"p_partkey": pa.array([p[0] for p in parts], pa.int64()),
                   "p_name": [p[1] for p in parts],
                   "p_brand": [p[2] for p in parts],
                   "p_type": [p[3] for p in parts],
                   "p_size": pa.array([p[4] for p in parts], pa.int32()),
                   "p_retailprice": pa.array([p[5] for p in parts], pa.float64())})
    write("orders", {"o_orderkey": pa.array([o[0] for o in orders], pa.int64()),
                     "o_custkey": pa.array([o[1] for o in orders], pa.int64()),
                     "o_orderstatus": [o[2] for o in orders],
                     "o_totalprice": pa.array([o[3] for o in orders], pa.float64()),
                     "o_orderdate": pa.array([o[4] for o in orders], pa.timestamp("us")),
                     "o_orderpriority": [o[5] for o in orders]})
    write("lineitem", {"l_orderkey": pa.array([l[0] for l in lineitems], pa.int64()),
                       "l_partkey": pa.array([l[1] for l in lineitems], pa.int64()),
                       "l_suppkey": pa.array([l[2] for l in lineitems], pa.int64()),
                       "l_linenumber": pa.array([l[3] for l in lineitems], pa.int32()),
                       "l_quantity": pa.array([l[4] for l in lineitems], pa.float64()),
                       "l_extendedprice": pa.array([l[5] for l in lineitems], pa.float64()),
                       "l_discount": pa.array([l[6] for l in lineitems], pa.float64()),
                       "l_tax": pa.array([l[7] for l in lineitems], pa.float64()),
                       "l_returnflag": [l[8] for l in lineitems],
                       "l_linestatus": [l[9] for l in lineitems],
                       "l_shipdate": pa.array([l[10] for l in lineitems], pa.timestamp("us"))})
    return d


@pytest.mark.parametrize("name", TPCH_FUZZ_QUERIES)
def test_dialect_parity_on_adversarial_tpch(spark, fuzz_tpch_dir, name):
    import __spark_entry__ as e
    from tools.canon import canon_rows

    spdf = e.queries()[name](spark, fuzz_tpch_dir).toPandas()
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{fuzz_tpch_dir}/{t}.parquet')"
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
# tri-modal fuzz (r10): rrf_fusion_topk consumes BOTH fuzz surfaces at once —
# the adversarial documents feed its two lexical legs (BM25 + VSM share one
# tokenize pass) and the adversarial embeddings feed the semantic leg (which
# joins documents on vec_id = doc_id; partial coverage is in-contract).
# Two corpora: one where the pinned query vector (vec 0) is the ZERO vector
# (zero norm ⇒ the semantic leg is declared empty and fusion degrades to
# bi-modal), one where vec 0 is a real direction with exact-duplicate and
# negated companions (cos = 1 ties broken by doc_id, cos = −1 tail).
# --------------------------------------------------------------------------- #

def _write_trimodal_dir(tmp_path_factory, spark, name: str, query_vec_real: bool) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path_factory.mktemp(name))
    spark.createDataFrame(
        _fuzz_rows(),
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")
    rows = _fuzz_embeddings()
    if query_vec_real:
        # vec 0 becomes the duplicated gaussian direction: the semantic leg
        # then sees cos=1 exact ties (rows 2,3), a cos=-1 negation (row 4),
        # and the zero vector excluded by the norm guard (swapped to id 2)
        rows[0], rows[2] = (0, rows[2][1], rows[2][2]), (2, rows[0][1], rows[0][2])
    table = pa.table({
        "vec_id": pa.array([r[0] for r in rows], pa.int64()),
        "embedding": pa.array([r[1] for r in rows], pa.list_(pa.float32())),
        "label": pa.array([r[2] for r in rows], pa.int32()),
    })
    pq.write_table(table, f"{d}/embeddings.parquet")
    return d


@pytest.mark.parametrize("query_vec_real", [False, True],
                         ids=["zero_query_vec", "real_query_vec"])
def test_rrf_fusion_dialect_parity_trimodal_fuzz(spark, tmp_path_factory, query_vec_real):
    import __spark_entry__ as e
    from tools.canon import canon_rows

    d = _write_trimodal_dir(tmp_path_factory, spark,
                            f"fuzz_rrf_{int(query_vec_real)}", query_vec_real)
    spdf = e.queries()["rrf_fusion_topk"](spark, d).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet/*.parquet')"
    )
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{d}/embeddings.parquet')"
    )
    ddf = con.sql(e.oracle_sql()["rrf_fusion_topk"]).df()
    con.close()
    assert len(spdf) > 0, "fusion must rank documents on the fuzz corpus"
    if query_vec_real:
        assert spdf["rank_sem"].notna().any(), "semantic leg must contribute"
    else:
        assert spdf["rank_sem"].isna().all(), "zero-norm query vec ⇒ no semantic leg"
    assert sorted(spdf.columns) == sorted(ddf.columns)
    assert len(spdf) == len(ddf), f"{len(spdf)} != {len(ddf)}"
    s_norm, d_norm = canon_rows(spdf), canon_rows(ddf)
    assert s_norm == d_norm, "first diff " + str(
        next(((a, b) for a, b in zip(s_norm, d_norm) if a != b), None)
    )
