"""Deterministic sampling operators for training-data mix curation.

A 100 TB corpus is never trained on whole: pipelines sample per-language /
per-source rates ("mix weights"), carve fixed quotas, and split train/val/
test. Random sampling (``df.sample``/``TABLESAMPLE``) is non-reproducible
across engines and retries; every operator here instead derives inclusion
from the cross-engine md5-60 hash of the row key ([[functions/hashing.py]]),
so the sample is a pure function of the data — retry-stable, incrementally
consistent (a doc's fate never changes when the corpus grows), and
bit-identical between Spark and the DuckDB oracle.

All three operators are single-pass column expressions at scan speed:
- sample_stratified: per-stratum KEEP RATE (hash-mod gate, no shuffle at all)
- sample_quota_per_stratum: per-stratum EXACT QUOTA (top-k by hash)
- split_train_test: hash-bucket assignment to train/val/test (no shuffle)
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from hls_payer_mrf_sparkstreaming_spark.functions.hashing import (
    md5u60,
    md5u60_sql,
)
from hls_payer_mrf_sparkstreaming_spark.operators.suite import (
    load,
    query,
    scratch_persist,
)

# training-mix keep rates per language, in permille (English downsampled,
# low-resource languages kept whole — the classic rebalancing shape)
_MIX_PERMILLE = {"en": 300, "es": 700, "fr": 700, "de": 700, "zh": 1000}

# salt distinguishes this sampling decision from any other use of the same
# key hash (e.g. the split assignment below must be independent of the gate)
_GATE_SALT = "mix-v1:"
_SPLIT_SALT = "split-v1:"


def _mix_case_sql() -> str:
    return (
        "CASE lang "
        + " ".join(f"WHEN '{k}' THEN {v}" for k, v in _MIX_PERMILLE.items())
        + " ELSE 0 END"
    )


def _mix_case() -> F.Column:
    expr = F.lit(0)
    for k, v in _MIX_PERMILLE.items():
        expr = F.when(F.col("lang") == k, F.lit(v)).otherwise(expr)
    return expr


@query(
    "sample_stratified",
    oracle=f"""
        SELECT doc_id, lang
        FROM documents
        WHERE ({md5u60_sql(f"'{_GATE_SALT}' || CAST(doc_id AS VARCHAR)")}
               % 1000) < ({_mix_case_sql()})
    """,
    description="deterministic stratified sampling by language mix weight: "
    "keep a doc iff md5-60(salt || doc_id) mod 1000 < permille[lang] — a "
    "pure scan-time filter (no shuffle, no RNG), so the sample is "
    "reproducible across engines, retries, and corpus growth; the salt "
    "makes the gate independent of any other hash decision on doc_id",
)
def sample_stratified(spark, sf_dir):
    gate = (
        F.pmod(
            md5u60(F.concat(F.lit(_GATE_SALT), F.col("doc_id").cast("string"))),
            F.lit(1000),
        )
        < _mix_case()
    )
    return load(spark, sf_dir, "documents").filter(gate).select("doc_id", "lang")


@query(
    "sample_quota_per_stratum",
    oracle=f"""
        SELECT doc_id, lang FROM (
            SELECT doc_id, lang,
                   row_number() OVER (
                       PARTITION BY lang
                       ORDER BY {md5u60_sql(f"'{_GATE_SALT}' || CAST(doc_id AS VARCHAR)")},
                                doc_id
                   ) AS rn
            FROM documents
        ) WHERE rn <= 50
    """,
    description="exact per-stratum quota: the 50 docs per language with the "
    "smallest salted key hash — a uniform without-replacement sample whose "
    "membership is stable under reruns. Shuffles only (doc_id, lang, hash); "
    "at extreme scale replace the rank with a two-pass hash-threshold "
    "(approx_percentile on the hash, then a scan-time filter) to avoid the "
    "per-stratum sort entirely",
)
def sample_quota_per_stratum(spark, sf_dir):
    h = md5u60(F.concat(F.lit(_GATE_SALT), F.col("doc_id").cast("string")))
    w = Window.partitionBy("lang").orderBy(F.asc("h"), F.asc("doc_id"))
    return (
        load(spark, sf_dir, "documents")
        .select("doc_id", "lang", h.alias("h"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 50)
        .select("doc_id", "lang")
    )


@query(
    "split_train_test",
    oracle=f"""
        WITH assigned AS (
            SELECT lang,
                   CASE
                       WHEN b < 980 THEN 'train'
                       WHEN b < 990 THEN 'val'
                       ELSE 'test'
                   END AS split
            FROM (
                SELECT lang,
                       {md5u60_sql(f"'{_SPLIT_SALT}' || CAST(doc_id AS VARCHAR)")}
                       % 1000 AS b
                FROM documents
            )
        )
        SELECT lang, split, count(*) AS n_docs
        FROM assigned GROUP BY lang, split
    """,
    description="deterministic train/val/test split (98/1/1) by hash bucket "
    "of the salted doc key: assignment is scan-time codegen with no RNG and "
    "no shuffle (the count here is just the verification view); a doc never "
    "migrates between splits when the corpus is re-ingested or extended, "
    "which leakage-free eval requires",
)
def split_train_test(spark, sf_dir):
    b = F.pmod(
        md5u60(F.concat(F.lit(_SPLIT_SALT), F.col("doc_id").cast("string"))),
        F.lit(1000),
    )
    split = (
        F.when(b < 980, F.lit("train"))
        .when(b < 990, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        load(spark, sf_dir, "documents")
        .select("lang", split.alias("split"))
        .groupBy("lang", "split")
        .agg(F.count("*").alias("n_docs"))
    )


@query(
    "class_weights",
    oracle="""
        WITH c AS (
            SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
            FROM documents GROUP BY lang
        ),
        t AS (
            SELECT CAST(sum(n_docs) AS BIGINT) AS total,
                   CAST(count(*) AS BIGINT) AS k
            FROM c
        )
        SELECT c.lang AS lang, c.n_docs AS n_docs,
               CAST((t.total * 1000000) // (t.k * c.n_docs) AS BIGINT)
                   AS weight_ppm
        FROM c CROSS JOIN t
    """,
    description="inverse-frequency class weights for training-mix "
    "rebalancing: weight_ppm = total/(k*count) in exact integer parts-per-"
    "million (integer division — no float ratios to drift between "
    "engines). A uniformly-weighted sampler multiplies per-class sampling "
    "odds by this to flatten a skewed language/source mix. Plan: one "
    "groupBy for the K class counts, then total and k come from an "
    "unpartitioned window over those K rows — NOT a second aggregate "
    "branch, which Catalyst would plan as a second full corpus scan. The "
    "single-partition window holds K = #classes rows, trivially safe at "
    "any corpus scale; the corpus itself is scanned exactly once",
)
def class_weights(spark, sf_dir):
    wall = Window.partitionBy()
    c = load(spark, sf_dir, "documents").groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs")
    )
    return c.select(
        "lang",
        "n_docs",
        F.sum("n_docs").over(wall).alias("total"),
        F.count("*").over(wall).alias("k"),
    ).select(
        "lang",
        "n_docs",
        F.expr("(total * 1000000) DIV (k * n_docs)")
        .cast("long")
        .alias("weight_ppm"),
    )


_DOMAIN_CAP = 15  # max docs kept per source (binds on the 500-doc table)


@query(
    "domain_cap",
    oracle=f"""
        SELECT doc_id, source FROM (
            SELECT doc_id, source,
                   ROW_NUMBER() OVER (
                       PARTITION BY source
                       ORDER BY n_chars DESC, doc_id
                   ) AS rn
            FROM documents
        ) WHERE rn <= {_DOMAIN_CAP}
    """,
    description="per-domain document cap — the standard pretraining-mix "
    "guard against a single crawl domain dominating the corpus: keep at "
    "most K docs per source, preferring longer documents, with doc_id as "
    "the deterministic tiebreak (no engine-dependent row order). One "
    "shuffle on source + a row_number window whose state is a single "
    "counter per key; output is bounded by K x #domains regardless of "
    "corpus size. Heavy-hitter domains make the window partition large "
    "but never wide (the counter short-circuits after K at emit time); "
    "with AQE skew handling on, even a billion-doc domain splits cleanly "
    "because the frame is row-based and needs no cross-partition state "
    "beyond the sort",
)
def domain_cap(spark, sf_dir):
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    return (
        load(spark, sf_dir, "documents")
        .select("doc_id", "source", "n_chars")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _DOMAIN_CAP)
        .select("doc_id", "source")
    )


_QSALT = "qsample-v1:"  # independent of the mix gate and the split hash


@query(
    "sample_weighted_by_score",
    oracle=f"""
        WITH scored AS (
            SELECT doc_id, lang,
                   least(1000, greatest(100, n_chars * 1000 // 400))
                       AS keep_permille
            FROM documents
        )
        SELECT doc_id, lang, CAST(keep_permille AS BIGINT) AS keep_permille
        FROM scored
        WHERE ({md5u60_sql(f"'{_QSALT}' || CAST(doc_id AS VARCHAR)")}
               % 1000) < keep_permille
    """,
    description="quality-weighted importance sampling: each document's "
    "keep probability is PROPORTIONAL to its quality score (here length "
    "as the stand-in, clamped to [10%, 100%]) and the keep decision is "
    "the salted-hash gate md5-60(salt||doc_id) mod 1000 < permille — "
    "score-aware downsampling (keep the good, thin the bad) that is a "
    "pure scan-time codegen filter: no RNG, no shuffle, reproducible "
    "across engines/retries/corpus growth, and independent of the "
    "stratified-mix and train-test-split hash decisions via the salt. "
    "The per-doc permille rides along so downstream reweighting "
    "(1/p importance weights) needs no second scan",
)
def sample_weighted_by_score(spark, sf_dir):
    keep = F.least(
        F.lit(1000),
        F.greatest(F.lit(100), F.expr("n_chars * 1000 div 400")),
    )
    gate = (
        F.pmod(
            md5u60(
                F.concat(F.lit(_QSALT), F.col("doc_id").cast("string"))
            ),
            F.lit(1000),
        )
        < keep
    )
    return (
        load(spark, sf_dir, "documents")
        .select(
            "doc_id", "lang", keep.cast("long").alias("keep_permille")
        )
        .filter(gate)
    )


# ---------------------------------------------------------------------------
# Quantile normalization: replace a raw per-document score with its rank
# position inside its stratum, so scores become comparable ACROSS strata
# (a 2000-char Chinese doc and a 2000-char English doc sit at different
# quality quantiles; curation thresholds like "keep top 30%" need the
# quantile, not the raw score).
# ---------------------------------------------------------------------------

_QNORM_PPM = 1_000_000


@query(
    "quantile_normalize_scores",
    oracle=f"""
        SELECT doc_id, lang,
               CAST(n_chars AS BIGINT) AS n_chars,
               CAST(floor(percent_rank() OVER (
                        PARTITION BY lang ORDER BY n_chars, doc_id)
                        * {_QNORM_PPM}) AS BIGINT) AS qnorm_ppm
        FROM documents
    """,
    description="per-stratum quantile normalization of a document score "
    "(n_chars as the stand-in quality signal): percent_rank over "
    "(lang, score, doc_id) floored to exact integer ppm — the "
    "cross-strata-comparable form curation thresholds need. The "
    "doc_id tiebreaker makes ranks total and deterministic. Plan: one "
    "hash-partition per lang + in-partition sort, no joins; at 100 TB "
    "the exact twin is this window, and the sketch path is "
    "approx_percentile bucketing (approx_percentile_summary) when a "
    "full per-stratum sort is too hot",
)
def quantile_normalize_scores(spark, sf_dir):
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.floor(F.percent_rank().over(w) * _QNORM_PPM)
        .cast("long")
        .alias("qnorm_ppm"),
    )


_KFOLD_K = 5
_KFOLD_SALT = "kfold-v1:"


@query(
    "stratified_kfold",
    oracle=f"""
        WITH f AS (
            SELECT lang,
                   {md5u60_sql(f"'{_KFOLD_SALT}' || CAST(doc_id AS VARCHAR)")}
                       % {_KFOLD_K} AS fold
            FROM documents
        )
        SELECT lang, CAST(fold AS BIGINT) AS fold,
               CAST(count(*) AS BIGINT) AS n_docs
        FROM f GROUP BY 1, 2
    """,
    description=f"deterministic {_KFOLD_K}-fold cross-validation "
    "assignment: fold = md5-60(salt || doc_id) mod k, reported as per-"
    "(lang, fold) counts — the CV-split contract (every doc in exactly "
    "one fold, assignment reproducible across engines/retries/corpus "
    "growth, folds statistically balanced within each stratum). Same "
    "scan-time hash-gate family as sample_stratified/split_train_test "
    "with its own salt, so fold membership is independent of every "
    "other sampling decision; one partial-agg groupBy, no shuffle of "
    "document rows",
)
def stratified_kfold(spark, sf_dir):
    fold = (
        md5u60(F.concat(F.lit(_KFOLD_SALT), F.col("doc_id").cast("string")))
        % _KFOLD_K
    )
    return (
        load(spark, sf_dir, "documents")
        .select("lang", fold.cast("long").alias("fold"))
        .groupBy("lang", "fold")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# DSIR-shaped importance selection (Xie et al. 2023, "Data Selection for
# Language Models via Importance Resampling"): score every raw document by
# the log-ratio of a TARGET unigram LM to the RAW-corpus unigram LM over a
# shared feature vocabulary, then keep the top quota. The target here is the
# corpus's own English slice (the usual "select web data that looks like the
# curated set" setup, with the curated set stood in by lang='en'). Gumbel
# resampling is replaced by a deterministic (score desc, doc_id) top-k so
# the selected set is a pure function of the data — same rationale as every
# other sampler in this module.
# ---------------------------------------------------------------------------

_DSIR_V = 256  # shared feature vocabulary (top tokens of the raw corpus)
_DSIR_QUOTA = 100  # selected documents
_DSIR_NANO = 1_000_000_000


def _dsir_sql_ctes() -> str:
    """Shared oracle CTE chain (tokens -> vocab -> totals -> log-ratio
    table) for both DSIR operators — one definition so the sampler's and
    the threshold gate's scoring can never silently diverge."""
    return f"""t AS (
            SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
            FROM documents
        ),
        v AS (
            SELECT tok, CAST(count(*) AS BIGINT) AS c_r,
                   CAST(count(*) FILTER (lang = 'en') AS BIGINT) AS c_t
            FROM t GROUP BY tok
            ORDER BY c_r DESC, tok LIMIT {_DSIR_V}
        ),
        tot AS (
            SELECT CAST(sum(c_r) AS BIGINT) AS t_r,
                   CAST(sum(c_t) AS BIGINT) AS t_t
            FROM v
        ),
        lr AS (
            SELECT tok,
                   CAST(floor((ln((CAST(c_t AS DOUBLE) + 0.5)
                                  / (t_t + {_DSIR_V * 0.5}))
                             - ln((CAST(c_r AS DOUBLE) + 0.5)
                                  / (t_r + {_DSIR_V * 0.5})))
                              * {_DSIR_NANO}) AS BIGINT) AS lr_nano
            FROM v CROSS JOIN tot
        )"""


def dsir_log_ratio_table(t: "DataFrame") -> "DataFrame":
    """Frozen reference log-ratio table from a (lang, tok) relation.

    Returns the per-token ``(tok, lr_nano)`` table the DSIR score sums —
    factored out so the streaming corpus gate
    ([[streaming/corpus_gate.py]]) can score incoming drops against a
    reference LM built ONCE from a static corpus.
    """
    v = (
        t.groupBy("tok")
        .agg(
            F.count("*").cast("long").alias("c_r"),
            # when(...).otherwise(0), not a bare cast of the comparison: a
            # NULL lang makes the comparison NULL, and a token seen only
            # in NULL-lang rows would sum to NULL where the oracle's
            # count(*) FILTER yields 0
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
            .cast("long")
            .alias("c_t"),
        )
        .orderBy(F.desc("c_r"), "tok")
        .limit(_DSIR_V)
    )
    tot = v.agg(
        F.sum("c_r").cast("long").alias("t_r"),
        F.sum("c_t").cast("long").alias("t_t"),
    )
    half_v = _DSIR_V * 0.5
    return v.crossJoin(F.broadcast(tot)).select(
        "tok",
        F.floor(
            (
                F.log(
                    (F.col("c_t").cast("double") + 0.5)
                    / (F.col("t_t") + half_v)
                )
                - F.log(
                    (F.col("c_r").cast("double") + 0.5)
                    / (F.col("t_r") + half_v)
                )
            )
            * _DSIR_NANO
        )
        .cast("long")
        .alias("lr_nano"),
    )



@query(
    "dsir_importance_sample",
    oracle=f"""
        WITH {_dsir_sql_ctes()},
        s AS (
            SELECT t.doc_id, t.lang,
                   CAST(count(*) AS BIGINT) AS n_vocab_tokens,
                   CAST(sum(lr_nano) AS BIGINT) AS sum_lr_nano,
                   CAST(floor(CAST(sum(lr_nano) AS DOUBLE) / count(*))
                        AS BIGINT) AS avg_lr_nano
            FROM t JOIN lr ON t.tok = lr.tok
            GROUP BY t.doc_id, t.lang
        )
        SELECT * FROM s
        ORDER BY avg_lr_nano DESC, doc_id LIMIT {_DSIR_QUOTA}
    """,
    description="DSIR-shaped importance selection: per-document log-ratio "
    f"of target (lang='en') vs raw unigram LMs over the raw corpus's "
    f"top-{_DSIR_V} feature vocabulary, smoothed +0.5, keep the top "
    f"{_DSIR_QUOTA} by length-normalized score with a deterministic "
    "(score desc, doc_id) order instead of Gumbel resampling. Scale "
    "shape: ONE token aggregate computes both LMs' counts (partial agg, "
    "vocab-sized result), log-ratios are floored into integer nano-units "
    "inside the 256-row vocabulary table which joins the corpus "
    "BROADCAST, and the per-doc re-aggregation plus a "
    "TakeOrderedAndProject are the only wide ops — no shuffle ever "
    "carries document text",
)
def dsir_importance_sample(spark, sf_dir):
    t = (
        load(spark, sf_dir, "documents")
        .select(
            "doc_id", "lang", F.explode(F.split("text", " ")).alias("tok")
        )
        .transform(scratch_persist)
    )
    lr = dsir_log_ratio_table(t)
    s = (
        t.join(F.broadcast(lr), "tok")
        .groupBy("doc_id", "lang")
        .agg(
            F.count("*").cast("long").alias("n_vocab_tokens"),
            F.sum("lr_nano").cast("long").alias("sum_lr_nano"),
            F.floor(F.sum("lr_nano").cast("double") / F.count("*"))
            .cast("long")
            .alias("avg_lr_nano"),
        )
    )
    return s.orderBy(F.desc("avg_lr_nano"), "doc_id").limit(_DSIR_QUOTA)


@query(
    "dsir_threshold_gate",
    oracle=f"""
        WITH {_dsir_sql_ctes()}
        SELECT t.doc_id,
               CAST(floor(CAST(sum(lr_nano) AS DOUBLE) / count(*))
                    AS BIGINT) AS avg_lr_nano
        FROM t JOIN lr ON t.tok = lr.tok
        GROUP BY t.doc_id
        HAVING avg_lr_nano >= 0
    """,
    description="DSIR threshold gate — the batch twin of the streaming "
    "corpus gate ([[streaming/corpus_gate.py]]): admit every document "
    "whose length-normalized target-vs-raw log-ratio clears 0, rather "
    "than taking a fixed quota. Same frozen 256-row broadcast log-ratio "
    "table and integer nano-unit scoring as dsir_importance_sample, so "
    "the admitted set is a pure function of the data; this oracle row is "
    "what certifies the micro-batch gate's scoring semantics",
)
def dsir_threshold_gate(spark, sf_dir):
    from hls_payer_mrf_sparkstreaming_spark.streaming.corpus_gate import (
        dsir_gate_batch,
    )

    docs = load(spark, sf_dir, "documents")
    # persisted: dsir_log_ratio_table consumes the explode twice (vocab +
    # totals) and the gate scores against it again — same discipline as
    # dsir_importance_sample
    t = docs.select(
        "lang", F.explode(F.split("text", " ")).alias("tok")
    ).transform(scratch_persist)
    lr = dsir_log_ratio_table(t)
    return dsir_gate_batch(
        docs.select("doc_id", "text"), lr, min_avg_nano=0
    ).select("doc_id", "avg_lr_nano")
