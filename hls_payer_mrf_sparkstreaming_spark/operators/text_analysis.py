"""Text-analysis operators: language ID, quality scoring, token counting,
document fingerprinting. All built-in column expressions (regex/array/hash
functions) — zero Python in the hot path, so they run at scan speed over
100 TB of documents.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hls_payer_mrf_sparkstreaming_spark.operators.suite import (
    load,
    query,
    rebalance,
    scratch_persist,
)

# fixed stopword lists for the n-gram-free language-ID heuristic
_STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "on", "for", "as"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "una", "por", "con"],
    "fr": ["le", "la", "de", "et", "un", "une", "des", "en", "du", "pour"],
    "de": ["der", "die", "das", "und", "ein", "eine", "zu", "von", "mit", "ist"],
}


def _sw_array_sql(lang: str) -> str:
    return "[" + ", ".join(f"'{w}'" for w in _STOPWORDS[lang]) + "]"


def _sw_array(lang: str) -> F.Column:
    return F.array(*[F.lit(w) for w in _STOPWORDS[lang]])


def _is_stopword(lang: str):
    # 1-arg lambda factory: a second lambda param would be interpreted by
    # pyspark as the array index
    arr = _sw_array(lang)
    return lambda x: F.array_contains(arr, x)


@query(
    "text_token_count",
    oracle="""
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tokens,
               length(text) AS n_chars_measured,
               n_chars
        FROM documents
    """,
    description="whitespace token counting + char length",
)
def text_token_count(spark, sf_dir):
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.length("text").alias("n_chars_measured"),
        "n_chars",
    )


# BPE-ish pre-tokenizer classes: letter runs, digit runs, single
# non-alnum marks — the coarse split GPT-2-style BPE applies before
# merges; identical semantics in Java regex (Spark) and RE2 (DuckDB)
_BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


@query(
    "text_token_count_bpe",
    oracle=f"""
        SELECT doc_id,
               len(regexp_extract_all(text, '{_BPE_PATTERN}')) AS n_bpe_tokens,
               len(string_split(text, ' ')) AS n_ws_tokens
        FROM documents
    """,
    description="BPE-style pre-tokenizer count (letter/digit/punct runs) "
    "next to the whitespace count — the token-budget estimator for an LLM "
    "data pipeline, pure regexp in codegen",
)
def text_token_count_bpe(spark, sf_dir):
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(
            F.regexp_extract_all("text", F.lit(_BPE_PATTERN), F.lit(0))
        ).alias("n_bpe_tokens"),
        F.size(F.split("text", " ")).alias("n_ws_tokens"),
    )


@query(
    "text_quality",
    oracle="""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS toks, text FROM documents
        )
        SELECT doc_id,
               len(toks) AS n_tokens,
               round(CAST(length(text) AS DOUBLE) / len(toks), 6) AS avg_token_len,
               round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6)
                   AS uniq_ratio,
               round(CAST(len(list_filter(toks,
                     x -> list_contains({en_sw}, x))) AS DOUBLE) / len(toks), 6)
                   AS stopword_ratio
        FROM t WHERE len(toks) > 0
    """.format(en_sw=_sw_array_sql("en")),
    description="quality scoring: token stats, uniqueness, stopword ratio "
    "(the C4/Gopher-style quality-filter feature set)",
)
def text_quality(spark, sf_dir):
    toks = F.split("text", " ")
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "text", toks.alias("toks")
    )
    n = F.size("toks")
    return d.filter(n > 0).select(
        "doc_id",
        n.alias("n_tokens"),
        F.round(F.length("text").cast("double") / n, 6).alias("avg_token_len"),
        F.round(F.size(F.array_distinct("toks")).cast("double") / n, 6).alias(
            "uniq_ratio"
        ),
        F.round(
            F.size(F.filter(F.col("toks"), _is_stopword("en"))).cast("double")
            / n,
            6,
        ).alias("stopword_ratio"),
    )


@query(
    "text_lang_id",
    oracle="""
        WITH scored AS (
            SELECT doc_id, lang,
                   CAST(len(list_filter(string_split(text, ' '),
                        x -> list_contains({en}, x))) AS DOUBLE)
                       / len(string_split(text, ' ')) AS en_score,
                   CAST(len(list_filter(string_split(text, ' '),
                        x -> list_contains({es}, x))) AS DOUBLE)
                       / len(string_split(text, ' ')) AS es_score
            FROM documents
        )
        SELECT doc_id, lang,
               CASE WHEN en_score >= 0.05 AND en_score >= es_score THEN 'en'
                    WHEN es_score >= 0.05 THEN 'es'
                    ELSE 'other' END AS predicted_lang
        FROM scored
    """.format(en=_sw_array_sql("en"), es=_sw_array_sql("es")),
    description="stopword-ratio language-ID heuristic (fastText-free "
    "baseline; per-language score columns, argmax via CASE)",
)
def text_lang_id(spark, sf_dir):
    toks = F.split("text", " ")
    n = F.size(toks)

    def score(lang):
        return F.size(F.filter(toks, _is_stopword(lang))).cast("double") / n

    en, es = score("en"), score("es")
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.when((en >= 0.05) & (en >= es), "en")
        .when(es >= 0.05, "es")
        .otherwise("other")
        .alias("predicted_lang"),
    )


@query(
    "text_fingerprint",
    oracle="""
        SELECT doc_id,
               md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fingerprint
        FROM documents
    """,
    description="normalization fingerprint (lowercase + whitespace collapse "
    "+ md5) for cross-corpus document identity",
)
def text_fingerprint(spark, sf_dir):
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(F.lower(F.regexp_replace("text", r"\s+", " "))).alias(
            "fingerprint"
        ),
    )


def _rolling_oracle() -> str:
    from hls_payer_mrf_sparkstreaming_spark.functions.hashing import (
        M31,
        ROLL_A,
        md5u60_sql,
    )

    return f"""
        SELECT doc_id,
               list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_transform(string_split(text, ' '),
                                      t -> ({md5u60_sql('t')} % {M31}))),
                   (acc, h) -> (acc * {ROLL_A} + h) % {M31}
               ) AS rolling_hash
        FROM documents
    """


@query(
    "text_rolling_hash",
    oracle=_rolling_oracle(),
    description="order-sensitive rolling fingerprint over tokens: "
    "polynomial left fold (acc*A + md5u60(token)) mod M31 — overflow-free "
    "under ANSI mode, position-sensitive unlike a token-set hash, and "
    "bit-identical in the DuckDB oracle",
)
def text_rolling_hash(spark, sf_dir):
    from hls_payer_mrf_sparkstreaming_spark.functions.hashing import (
        M31,
        ROLL_A,
        md5u60,
    )

    rolled = F.aggregate(
        F.transform(F.split("text", " "), lambda t: F.pmod(md5u60(t), F.lit(M31))),
        F.lit(0).cast("long"),
        lambda acc, h: F.pmod(acc * F.lit(ROLL_A) + h, F.lit(M31)),
    )
    return load(spark, sf_dir, "documents").select(
        "doc_id", rolled.alias("rolling_hash")
    )


@query(
    "tfidf_top_terms",
    oracle="""
        WITH toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents
        ),
        tf AS (
            SELECT doc_id, term, count(*) AS tf FROM toks
            GROUP BY doc_id, term
        ),
        df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        nd AS (SELECT count(*) AS n_docs FROM documents),
        ranked AS (
            SELECT t.doc_id, t.term, t.tf, d.df,
                   round(t.tf * ln(CAST(nd.n_docs AS DOUBLE)
                                   / CAST(d.df AS DOUBLE)), 6) AS tfidf,
                   row_number() OVER (
                       PARTITION BY t.doc_id
                       ORDER BY t.tf DESC, d.df ASC, t.term
                   ) AS rn
            FROM tf t JOIN df d USING (term) CROSS JOIN nd
        )
        SELECT doc_id, term, tf, df, tfidf FROM ranked WHERE rn <= 3
    """,
    description="top-3 terms per document by tf-idf: tf groupBy "
    "(doc_id, term), document-frequency groupBy term, corpus size as a "
    "broadcast scalar — the ranking key is integer-only (tf desc, df asc, "
    "term) so row selection is hash-exact; the per-doc top-k window "
    "shuffles skinny (doc, term, tf, df) rows, never text",
)
def tfidf_top_terms(spark, sf_dir):
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    nd = docs.agg(F.count("*").alias("n_docs"))
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tf"), F.asc("df"), "term"
    )
    return (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(nd))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * F.log(
                    F.col("n_docs").cast("double") / F.col("df").cast("double")
                ),
                6,
            ),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tf", "df", "tfidf")
    )


@query(
    "quality_filter_pipeline",
    oracle="""
        WITH t AS (
            SELECT doc_id, text, string_split(text, ' ') AS toks
            FROM documents
        ),
        q AS (
            SELECT doc_id,
                   len(toks) AS n_tokens,
                   CAST(len(list_filter(toks,
                        x -> list_contains({en_sw}, x))) AS DOUBLE)
                       / len(toks) AS sw_ratio,
                   CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
                       AS uniq_ratio
            FROM t WHERE len(toks) > 0
        ),
        surv AS (
            SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
        )
        SELECT q.doc_id, q.n_tokens,
               round(q.sw_ratio, 6) AS sw_ratio,
               round(q.uniq_ratio, 6) AS uniq_ratio
        FROM q JOIN surv ON q.doc_id = surv.doc_id
        WHERE q.n_tokens >= 20 AND q.sw_ratio >= 0.05
          AND q.uniq_ratio >= 0.5
    """.format(en_sw=_sw_array_sql("en")),
    description="end-to-end training-data curation filter: Gopher-style "
    "quality gates (length, stopword ratio, uniqueness) AND exact-dedup "
    "survivorship (min doc_id per md5 fingerprint) composed in one plan — "
    "all gates evaluate in codegen at scan time; the only shuffles are the "
    "16-byte fingerprint groupBy and the survivor semi-join",
)
def quality_filter_pipeline(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n = F.size("toks")
    q = (
        docs.select("doc_id", toks.alias("toks"))
        .filter(n > 0)
        .select(
            "doc_id",
            n.alias("n_tokens"),
            (
                F.size(F.filter(F.col("toks"), _is_stopword("en"))).cast(
                    "double"
                )
                / n
            ).alias("sw_ratio"),
            (F.size(F.array_distinct("toks")).cast("double") / n).alias(
                "uniq_ratio"
            ),
        )
    )
    surv = docs.groupBy(F.md5("text")).agg(F.min("doc_id").alias("doc_id"))
    return (
        q.join(surv.select("doc_id"), "doc_id")
        .filter(
            (F.col("n_tokens") >= 20)
            & (F.col("sw_ratio") >= 0.05)
            & (F.col("uniq_ratio") >= 0.5)
        )
        .select(
            "doc_id",
            "n_tokens",
            F.round("sw_ratio", 6).alias("sw_ratio"),
            F.round("uniq_ratio", 6).alias("uniq_ratio"),
        )
    )


# PII patterns: identical semantics in Java regex (Spark) and RE2 (DuckDB) —
# simple character classes and bounded repeats only
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
PII_NUM = r"[0-9]{7,}"


def scrub_pii(col: F.Column) -> F.Column:
    """Redact emails then long digit runs (phone/account numbers) — two
    regexp_replace passes in codegen, no Python in the loop."""
    return F.regexp_replace(
        F.regexp_replace(col, PII_EMAIL, "<EMAIL>"), PII_NUM, "<NUM>"
    )


@query(
    "pii_scrub",
    oracle=f"""
        WITH aug AS (
            SELECT doc_id,
                   text || ' contact user' || CAST(doc_id AS VARCHAR)
                        || '@mail.example phone 555'
                        || lpad(CAST(doc_id % 10000 AS VARCHAR), 7, '0')
                       AS text
            FROM documents
        )
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '{PII_EMAIL}')) AS INT)
                   AS n_emails,
               CAST(len(regexp_extract_all(text, '{PII_NUM}')) AS INT)
                   AS n_numbers,
               md5(regexp_replace(regexp_replace(text, '{PII_EMAIL}',
                       '<EMAIL>', 'g'), '{PII_NUM}', '<NUM>', 'g'))
                   AS redacted_fp
        FROM aug
    """,
    description="PII scrub for training-data curation: count + redact "
    "emails and long digit runs, fingerprint the redacted text — pure "
    "regexp codegen at scan speed. The synthetic corpus has no PII, so "
    "the query plants deterministic doc_id-derived PII identically in "
    "both engines, making every redaction count non-vacuous",
)
def pii_scrub(spark, sf_dir):
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example phone 555"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 7, "0"),
    )
    d = load(spark, sf_dir, "documents").select("doc_id", aug.alias("text"))
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(PII_EMAIL), F.lit(0))).alias(
            "n_emails"
        ),
        F.size(F.regexp_extract_all("text", F.lit(PII_NUM), F.lit(0))).alias(
            "n_numbers"
        ),
        F.md5(scrub_pii(F.col("text"))).alias("redacted_fp"),
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination
# ---------------------------------------------------------------------------

_DECON_N = 8  # n-gram width, the common eval-decontamination choice
_DECON_STRIDE = 101  # doc_id % stride == 0 -> stand-in "benchmark" doc


def ngram_hashes(toks: F.Column, n: int = _DECON_N) -> F.Column:
    """Distinct md5 hashes of every ``n``-token shingle of a token-array
    column — one codegen expression, no explode until the caller needs
    rows. Guarded for short docs: Spark's ``sequence(1, 0)`` counts DOWN,
    so the start list must be empty (not descending) below ``n`` tokens."""
    starts = F.when(
        F.size(toks) >= n,
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
    ).otherwise(F.array().cast("array<int>"))
    return F.array_distinct(
        F.transform(
            starts,
            lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, n))),
        )
    )


# 12 tokens -> five 8-grams; appended to benchmark docs AND to a
# deterministic slice of training docs so contamination exists at every SF
_CANARY = (
    "decon canary alpha beta gamma delta epsilon zeta eta theta iota kappa"
)
_CANARY_MOD = 13  # doc_id % 13 == 5 -> contaminated training doc


@query(
    "decontaminate",
    oracle=f"""
        WITH aug AS (
            SELECT doc_id,
                   CASE WHEN doc_id % {_DECON_STRIDE} = 0
                          OR doc_id % {_CANARY_MOD} = 5
                        THEN text || ' {_CANARY}'
                        ELSE text END AS text
            FROM documents
        ),
        toks AS (
            SELECT doc_id, string_split(text, ' ') AS t FROM aug
        ),
        grams AS (
            SELECT doc_id,
                   unnest(list_distinct(list_transform(
                       range(1, greatest(len(t) - {_DECON_N - 2}, 1)),
                       i -> md5(array_to_string(
                                list_slice(t, i, i + {_DECON_N - 1}), ' '))
                   ))) AS h
            FROM toks
        ),
        bench AS (
            SELECT DISTINCT h FROM grams WHERE doc_id % {_DECON_STRIDE} = 0
        )
        SELECT g.doc_id,
               CAST(count(*) AS BIGINT) AS n_hit_ngrams
        FROM grams g JOIN bench USING (h)
        WHERE g.doc_id % {_DECON_STRIDE} <> 0
        GROUP BY g.doc_id
    """,
    description="benchmark decontamination: flag training docs sharing any "
    f"{_DECON_N}-gram with the benchmark set (stand-in: every "
    f"{_DECON_STRIDE}th doc). Shingle hashes are computed per row in "
    "codegen and deduped BEFORE the explode; the benchmark hash set is "
    "tiny so the contamination join is broadcast — at 100 TB nothing "
    "shuffles but the per-doc hit counts (map-side partial agg). A fixed "
    "12-token canary is planted identically in both engines (benchmark "
    "docs + every 13th training doc) so matches are non-vacuous at every "
    "SF; natural n-gram overlaps count too",
)
def decontaminate(spark, sf_dir):
    contaminated = (F.col("doc_id") % _DECON_STRIDE == 0) | (
        F.col("doc_id") % _CANARY_MOD == 5
    )
    aug = F.when(
        contaminated, F.concat(F.col("text"), F.lit(" " + _CANARY))
    ).otherwise(F.col("text"))
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.split(aug, " ").alias("t")
    )
    grams = docs.select(
        "doc_id", F.explode(ngram_hashes(F.col("t"))).alias("h")
    )
    bench = (
        grams.filter(F.col("doc_id") % _DECON_STRIDE == 0)
        .select("h")
        .distinct()
    )
    return (
        grams.filter(F.col("doc_id") % _DECON_STRIDE != 0)
        .join(F.broadcast(bench), "h")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hit_ngrams"))
    )


# ---------------------------------------------------------------------------
# BM25 retrieval scoring
# ---------------------------------------------------------------------------

_BM25_TERMS = ["spark", "window", "merge"]
_BM25_K1 = 1.2
_BM25_B = 0.75
_NANO = 1_000_000_000


@query(
    "bm25_search",
    oracle=f"""
        WITH d AS (
            SELECT doc_id, string_split(text, ' ') AS t FROM documents
        ),
        tf AS (
            SELECT doc_id, CAST(len(t) AS BIGINT) AS dl,
                   {", ".join(
                       f"CAST(len(list_filter(t, x -> x = '{w}')) AS BIGINT)"
                       f" AS tf{i}" for i, w in enumerate(_BM25_TERMS))}
            FROM d
        ),
        g AS (
            SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(dl) AS BIGINT) AS total_len,
                   {", ".join(
                       f"CAST(sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END)"
                       f" AS BIGINT) AS df{i}"
                       for i in range(len(_BM25_TERMS)))}
            FROM tf
        )
        SELECT doc_id,
               CAST(floor(({" + ".join(
                   f"(ln(1 + (CAST(n_docs AS DOUBLE) - df{i} + 0.5)"
                   f" / (CAST(df{i} AS DOUBLE) + 0.5))"
                   f" * (CAST(tf{i} AS DOUBLE) * {_BM25_K1 + 1})"
                   f" / (CAST(tf{i} AS DOUBLE) + {_BM25_K1}"
                   f" * (1 - {_BM25_B} + {_BM25_B} * CAST(dl AS DOUBLE)"
                   f" / (CAST(total_len AS DOUBLE) / n_docs))))"
                   for i in range(len(_BM25_TERMS)))})
                   * {_NANO}) AS BIGINT) AS score_nano
        FROM tf CROSS JOIN g
        ORDER BY score_nano DESC, doc_id
        LIMIT 20
    """,
    description="BM25 top-20 for a fixed query term set "
    f"({'/'.join(_BM25_TERMS)}, k1={_BM25_K1}, b={_BM25_B}): per-doc term "
    "frequencies come from list_filter counts in codegen (no tokenizer "
    "explode, no per-term shuffle), the corpus stats (N, avg doclen, "
    "per-term document frequencies) reduce to ONE broadcast scalar row, "
    "and the per-term contributions add in a FIXED expression order so "
    "the double-precision score is deterministic under any parallelism. "
    "Top-k is TakeOrderedAndProject — no global sort. Scores floor into "
    "integer nano-units for cross-engine hashing",
)
def bm25_search(spark, sf_dir):
    # expression-text construction (r13): same functions and literals as
    # the original Column fold — retrieval._bm25_nano shares the exact
    # text since the (terms, k1, b) constants match — so the physical
    # plan and oracle hash are unchanged; build 0.43 -> 0.07 s
    from hls_payer_mrf_sparkstreaming_spark.operators.retrieval import (
        _bm25_nano,
        _g_exprs,
        _tf_exprs,
    )

    tf = load(spark, sf_dir, "documents").selectExpr(
        *_tf_exprs(_BM25_TERMS)
    )
    g = tf.agg(*[F.expr(e) for e in _g_exprs(_BM25_TERMS)])
    return (
        tf.crossJoin(F.broadcast(g))
        .selectExpr(
            "doc_id", f"{_bm25_nano(_BM25_TERMS)} AS score_nano"
        )
        .orderBy(F.desc("score_nano"), "doc_id")
        .limit(20)
    )


@query(
    "text_repetition",
    oracle="""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ),
        g AS (
            SELECT doc_id,
                   len(toks) AS n_tokens,
                   list_transform(
                       range(1, greatest(len(toks), 1)),
                       i -> array_to_string(list_slice(toks, i, i + 1), ' ')
                   ) AS g2,
                   list_transform(
                       range(1, greatest(len(toks) - 1, 1)),
                       i -> array_to_string(list_slice(toks, i, i + 2), ' ')
                   ) AS g3
            FROM t WHERE len(toks) >= 3
        )
        SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
               CAST(len(g2) - len(list_distinct(g2)) AS INT) AS dup_2grams,
               CAST(len(g3) - len(list_distinct(g3)) AS INT) AS dup_3grams,
               CAST(floor(CAST(len(g2) - len(list_distinct(g2)) AS DOUBLE)
                          / len(g2) * 1000000) AS BIGINT) AS dup2_ppm
        FROM g
    """,
    description="within-document repetition scoring (the Gopher "
    "repetition-removal gate): duplicate 2-gram / 3-gram counts and the "
    "duplicate-2-gram fraction in parts-per-million — shingles built "
    "with transform over a per-row sequence and deduped with "
    "array_distinct, all in codegen; zero shuffle, scan-bound at any "
    "corpus size",
)
def text_repetition(spark, sf_dir):
    toks = F.split("text", " ")

    def grams(n):
        return F.transform(
            F.sequence(
                F.lit(1),
                F.greatest(F.size("toks") - (n - 1), F.lit(1)),
            ),
            lambda i: F.concat_ws(" ", F.slice(F.col("toks"), i, n)),
        )

    d = (
        load(spark, sf_dir, "documents")
        .select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") >= 3)
        .select(
            "doc_id",
            F.size("toks").alias("n_tokens"),
            grams(2).alias("g2"),
            grams(3).alias("g3"),
        )
    )
    dup2 = F.size("g2") - F.size(F.array_distinct("g2"))
    dup3 = F.size("g3") - F.size(F.array_distinct("g3"))
    return d.select(
        "doc_id",
        "n_tokens",
        dup2.alias("dup_2grams"),
        dup3.alias("dup_3grams"),
        F.floor(dup2.cast("double") / F.size("g2") * 1_000_000)
        .cast("long")
        .alias("dup2_ppm"),
    )


@query(
    "corpus_mix",
    oracle="""
        WITH d AS (
            SELECT source, lang,
                   len(string_split(text, ' ')) AS n_toks
            FROM documents
        ),
        g AS (
            SELECT source, lang,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_toks) AS BIGINT) AS n_tokens
            FROM d GROUP BY source, lang
        ),
        t AS (SELECT sum(n_tokens) AS total FROM g)
        SELECT source, lang, n_docs, n_tokens,
               CAST(floor(CAST(n_tokens AS DOUBLE) / total * 1000000)
                    AS BIGINT) AS token_share_ppm
        FROM g CROSS JOIN t
    """,
    description="training-mix report: document and token counts per "
    "(source, lang) stratum with each stratum's token share in ppm — "
    "the artifact a data-mixing run is steered by. One partial-agg "
    "groupBy plus a broadcast scalar total; exact integer token counts "
    "so shares are engine-identical",
)
def corpus_mix(spark, sf_dir):
    d = load(spark, sf_dir, "documents").select(
        "source", "lang", F.size(F.split("text", " ")).alias("n_toks")
    )
    g = d.groupBy("source", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_toks").alias("n_tokens"),
    )
    t = g.agg(F.sum("n_tokens").alias("total"))
    return g.crossJoin(F.broadcast(t)).select(
        "source",
        "lang",
        "n_docs",
        "n_tokens",
        F.floor(
            F.col("n_tokens").cast("double") / F.col("total") * 1_000_000
        )
        .cast("long")
        .alias("token_share_ppm"),
    )


_FUNNEL_GATES = [
    ("len", "n_tokens BETWEEN 5 AND 1000"),
    ("avg_token_len", "avg_token_len BETWEEN 2.0 AND 15.0"),
    ("uniq", "uniq_ratio > 0.3"),
    ("stopword", "stopword_ratio >= 0.01"),
]


def _funnel_oracle_parts() -> tuple[str, str]:
    """(stages UNION ALL select, cumulative-gate aggregate columns)."""
    conds, cums, stages = [], [], []
    for i, (gate, cond) in enumerate(_FUNNEL_GATES, start=1):
        conds.append(cond)
        cum = " AND ".join(f"({c})" for c in conds)
        cums.append(
            f"CAST(sum(CASE WHEN {cum} THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS c{i}"
        )
        stages.append(
            f"""SELECT CAST({i} AS INT) AS stage, '{gate}' AS gate,
               c{i - 1} AS n_in, c{i} AS n_pass,
               CAST(floor(CAST(c{i - 1} - c{i} AS DOUBLE) / c{i - 1}
                    * 1000000) AS BIGINT) AS drop_ppm
        FROM agg"""
        )
    return "\nUNION ALL\n".join(stages), ",\n".join(cums)


_FUNNEL_STAGES_SQL, _FUNNEL_CUMS_SQL = _funnel_oracle_parts()


@query(
    "quality_funnel",
    oracle="""
        WITH m AS (
            SELECT len(string_split(text, ' ')) AS n_tokens,
                   CAST(length(text) AS DOUBLE)
                       / len(string_split(text, ' ')) AS avg_token_len,
                   CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                       / len(string_split(text, ' ')) AS uniq_ratio,
                   CAST(len(list_filter(string_split(text, ' '),
                        x -> list_contains({en_sw}, x))) AS DOUBLE)
                       / len(string_split(text, ' ')) AS stopword_ratio
            FROM documents
        ),
        agg AS (
            SELECT CAST(count(*) AS BIGINT) AS c0,
                   {cums}
            FROM m
        )
        {stages}
    """.format(
        en_sw=_sw_array_sql("en"),
        cums=_FUNNEL_CUMS_SQL,
        stages=_FUNNEL_STAGES_SQL,
    ),
    description="quality-filter funnel report: the document counts "
    "surviving each successive C4/Gopher-style gate (token count, "
    "average token length, uniqueness ratio, stopword ratio) with the "
    "per-stage drop rate in ppm — the observability artifact that tells "
    "you WHICH filter is eating the corpus. All cumulative gate counts "
    "come from ONE scan's conditional aggregates (a single scalar row); "
    "the 4-row funnel is unpivoted from it with stack. Constant output "
    "at any corpus size",
)
def quality_funnel(spark, sf_dir):
    toks = F.split("text", " ")
    n = F.size(toks)
    m = load(spark, sf_dir, "documents").select(
        n.alias("n_tokens"),
        (F.length("text").cast("double") / n).alias("avg_token_len"),
        (F.size(F.array_distinct(toks)).cast("double") / n).alias(
            "uniq_ratio"
        ),
        (
            F.size(F.filter(toks, _is_stopword("en"))).cast("double") / n
        ).alias("stopword_ratio"),
    )
    conds = []
    agg_cols = [F.count("*").cast("long").alias("c0")]
    for i, (_, cond) in enumerate(_FUNNEL_GATES, start=1):
        conds.append(cond)
        cum = " AND ".join(f"({c})" for c in conds)
        agg_cols.append(
            F.sum(F.expr(cum).cast("long")).cast("long").alias(f"c{i}")
        )
    a = m.agg(*agg_cols)
    stack_args = ", ".join(
        f"{i}, '{gate}', c{i - 1}, c{i}"
        for i, (gate, _) in enumerate(_FUNNEL_GATES, start=1)
    )
    return a.select(
        F.expr(
            f"stack({len(_FUNNEL_GATES)}, {stack_args}) "
            "AS (stage, gate, n_in, n_pass)"
        )
    ).select(
        F.col("stage").cast("int").alias("stage"),
        "gate",
        F.col("n_in").cast("long").alias("n_in"),
        F.col("n_pass").cast("long").alias("n_pass"),
        F.floor(
            (F.col("n_in") - F.col("n_pass")).cast("double")
            / F.col("n_in")
            * 1_000_000
        )
        .cast("long")
        .alias("drop_ppm"),
    )


def _gram_stream(spark, sf_dir):
    """Exploded (source, 8-gram md5) rows, duplicates included — the
    shared front of the exact overlap matrix and the sketch twin.
    rebalance(): per-gram md5 hashing is the dominant per-row cost and a
    small-but-dense parquet is ONE scan partition (measured: the whole
    overlap family single-threaded at sf0.1 without it; no-op at scale)."""
    docs = rebalance(load(spark, sf_dir, "documents")).select(
        "source", F.split("text", " ").alias("t")
    )
    return docs.select(
        "source", F.explode(ngram_hashes(F.col("t"))).alias("h")
    )


def _exact_overlap(grams):
    """Exact pairwise overlap matrix from a (source, h) gram relation,
    duplicates allowed — the shared back half of corpus_overlap and
    the in-query exact side of corpus_overlap_sketch.

    r14 (guide §2.3/§2.4): ONE corpus-sized exchange. Each
    fingerprint's SOURCE SET is collected directly from the raw gram
    stream — collect_set dedups, so the caller needs NO distinct()
    pass, and partial aggregation combines duplicate (source, h)
    occurrences map-side before they cross the wire. Every later
    relation is distinct-fingerprint-sized: per-source totals come
    from exploding the persisted source sets (each (source, h) pair
    counted once, exactly the old distinct-relation count), and
    shared-pair counting expands C(k, 2) combos inside the sorted
    array in codegen instead of a gram self-join on h (the r13 shape;
    a fingerprint shared by k sources emits k^2 probe rows under the
    join). The r13 lineage paid THREE corpus-sized exchanges
    (distinct, per-source count, set build) plus a corpus-sized
    distinct persist; this one pays the set build only and persists
    the per-fingerprint sets (one row per distinct gram, arrays
    bounded by source count). A hot boilerplate gram is skew-safe:
    its copies combine map-side and its set is bounded by the number
    of sources."""
    sets0 = scratch_persist(
        grams.groupBy("h").agg(
            F.array_sort(F.collect_set("source")).alias("ss")
        )
    )
    # per-source totals come back as ONE one-row source->count map
    # (crossJoin broadcast attach) instead of two separate broadcast
    # joins of renamed copies — the r13 shape re-ran the explode+count
    # pass once per join side (two broadcast-build jobs); a map lookup
    # over <= |sources| entries is O(20) per output row on a
    # source-pair-sized relation. (The bloom_prefilter counter-case —
    # GetMapValue is a linear scan — does not bite here: the map is
    # source-count-sized, never domain-sized.)
    per_map = (
        sets0.select(F.explode("ss").alias("source"))
        .groupBy("source")
        .agg(F.count("*").cast("long").alias("n"))
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("source", "n"))
            ).alias("nm")
        )
    )
    sets = sets0.filter(F.size("ss") >= 2)
    combos = F.flatten(
        F.transform(
            F.col("ss"),
            lambda x, i: F.transform(
                F.slice(F.col("ss"), i + 2, F.size(F.col("ss"))),
                lambda y: F.struct(
                    x.alias("source_a"), y.alias("source_b")
                ),
            ),
        )
    )
    shared = (
        sets.select(F.explode(combos).alias("p"))
        .groupBy(
            F.col("p.source_a").alias("source_a"),
            F.col("p.source_b").alias("source_b"),
        )
        .agg(F.count("*").cast("long").alias("n_shared_ngrams"))
    )
    na = F.element_at("nm", F.col("source_a"))
    nb = F.element_at("nm", F.col("source_b"))
    return (
        shared.crossJoin(F.broadcast(per_map))
        .select(
            "source_a",
            "source_b",
            "n_shared_ngrams",
            F.floor(
                F.col("n_shared_ngrams").cast("double")
                / (na + nb - F.col("n_shared_ngrams"))
                * 1_000_000
            )
            .cast("long")
            .alias("jaccard_ppm"),
        )
    )


@query(
    "corpus_overlap",
    oracle=f"""
        WITH toks AS (
            SELECT source, string_split(text, ' ') AS t FROM documents
        ),
        grams AS (
            SELECT DISTINCT source, h FROM (
                SELECT source,
                       unnest(list_distinct(list_transform(
                           range(1, greatest(len(t) - {_DECON_N - 2}, 1)),
                           i -> md5(array_to_string(
                                    list_slice(t, i, i + {_DECON_N - 1}),
                                    ' '))
                       ))) AS h
                FROM toks
            )
        ),
        per AS (
            SELECT source, CAST(count(*) AS BIGINT) AS n FROM grams
            GROUP BY source
        ),
        shared AS (
            SELECT a.source AS source_a, b.source AS source_b,
                   CAST(count(*) AS BIGINT) AS n_shared_ngrams
            FROM grams a JOIN grams b
              ON a.h = b.h AND a.source < b.source
            GROUP BY 1, 2
        )
        SELECT source_a, source_b, n_shared_ngrams,
               CAST(floor(CAST(n_shared_ngrams AS DOUBLE)
                    / (pa.n + pb.n - n_shared_ngrams) * 1000000)
                    AS BIGINT) AS jaccard_ppm
        FROM shared
        JOIN per pa ON pa.source = source_a
        JOIN per pb ON pb.source = source_b
    """,
    description=f"cross-corpus contamination matrix: for every pair of "
    f"sources, the count of shared distinct {_DECON_N}-gram fingerprints "
    "and the n-gram Jaccard in ppm — how much two ingest feeds overlap "
    "before they are mixed. Shingle hashes are computed per row in "
    "codegen and deduped before the explode; the pair join shuffles "
    "16-byte digests keyed by fingerprint (never all-pairs of docs), "
    "and per-source totals re-join broadcast. Output is one row per "
    "source pair regardless of corpus size",
)
def corpus_overlap(spark, sf_dir):
    # r14: no distinct(), no corpus-sized persist — _exact_overlap's
    # collect_set dedups inside its single partial-aggregated exchange
    return _exact_overlap(_gram_stream(spark, sf_dir))


_OVL_K = 1024  # one-permutation sketch buckets (σ <= sqrt(.25/filled))

# Exact overlap matrices for the committed test SFs, frozen from the
# corpus_overlap DuckDB oracle (r10; regenerate with
# scripts in tests/test_llm_ops.py::test_overlap_snapshot_fresh if the
# driver testdata ever changes). Keys are sf-dir basenames; missing
# pairs overlap 0 ppm. Lets the registered bounds twin check estimator
# drift WITHOUT recomputing the corpus-sized exact matrix every run.
_OVL_EXACT_SNAPSHOT = {
    "sf0.001": {
        ("src0", "src10"): 6058,
        ("src0", "src11"): 33767,
        ("src0", "src12"): 27733,
        ("src0", "src2"): 6762,
        ("src0", "src8"): 26086,
        ("src1", "src4"): 35268,
        ("src10", "src2"): 6584,
        ("src10", "src5"): 15858,
        ("src10", "src7"): 40446,
        ("src10", "src9"): 33376,
        ("src11", "src4"): 25289,
        ("src11", "src9"): 19016,
        ("src12", "src8"): 25949,
        ("src13", "src16"): 1287,
        ("src14", "src18"): 35341,
        ("src14", "src19"): 30023,
        ("src14", "src9"): 2976,
        ("src16", "src17"): 20600,
        ("src16", "src6"): 33074,
        ("src16", "src9"): 33712,
        ("src17", "src19"): 31844,
        ("src19", "src5"): 13145,
        ("src3", "src9"): 6584,
        ("src5", "src7"): 10700,
    },
    "sf0.01": {
        ("src0", "src12"): 12457,
        ("src0", "src13"): 28460,
        ("src1", "src5"): 57514,
        ("src10", "src12"): 8155,
        ("src10", "src18"): 38547,
        ("src10", "src7"): 36720,
        ("src10", "src9"): 8699,
        ("src11", "src3"): 14285,
        ("src12", "src17"): 15486,
        ("src12", "src18"): 13747,
        ("src13", "src18"): 25569,
        ("src13", "src5"): 29268,
        ("src13", "src7"): 27234,
        ("src14", "src15"): 10704,
        ("src14", "src7"): 6592,
        ("src15", "src6"): 12808,
        ("src17", "src6"): 12831,
        ("src18", "src2"): 21950,
        ("src3", "src6"): 24042,
        ("src4", "src6"): 7751,
        ("src5", "src7"): 29794,
        ("src5", "src8"): 37273,
    },
    "sf0.1": {
        ("src0", "src10"): 6814,
        ("src0", "src11"): 4060,
        ("src0", "src13"): 5190,
        ("src0", "src14"): 1416,
        ("src0", "src16"): 3228,
        ("src0", "src17"): 2144,
        ("src0", "src19"): 688,
        ("src0", "src2"): 2599,
        ("src0", "src3"): 2660,
        ("src0", "src4"): 3245,
        ("src0", "src7"): 5525,
        ("src0", "src8"): 9680,
        ("src0", "src9"): 2911,
        ("src1", "src10"): 6085,
        ("src1", "src11"): 1547,
        ("src1", "src12"): 946,
        ("src1", "src13"): 5584,
        ("src1", "src14"): 917,
        ("src1", "src15"): 3591,
        ("src1", "src16"): 1060,
        ("src1", "src17"): 1735,
        ("src1", "src18"): 5195,
        ("src1", "src2"): 2356,
        ("src1", "src3"): 126,
        ("src1", "src4"): 7378,
        ("src1", "src6"): 1994,
        ("src1", "src7"): 396,
        ("src1", "src8"): 3482,
        ("src1", "src9"): 2615,
        ("src10", "src11"): 3497,
        ("src10", "src12"): 7472,
        ("src10", "src14"): 218,
        ("src10", "src15"): 864,
        ("src10", "src17"): 2802,
        ("src10", "src18"): 1426,
        ("src10", "src19"): 3930,
        ("src10", "src2"): 11273,
        ("src10", "src3"): 3272,
        ("src10", "src4"): 3168,
        ("src10", "src5"): 1435,
        ("src10", "src6"): 3919,
        ("src10", "src7"): 4527,
        ("src11", "src12"): 2010,
        ("src11", "src13"): 6016,
        ("src11", "src15"): 438,
        ("src11", "src16"): 1986,
        ("src11", "src18"): 1360,
        ("src11", "src19"): 2902,
        ("src11", "src3"): 4925,
        ("src11", "src5"): 5472,
        ("src11", "src6"): 6154,
        ("src11", "src7"): 4055,
        ("src12", "src13"): 3662,
        ("src12", "src14"): 3109,
        ("src12", "src15"): 756,
        ("src12", "src16"): 3353,
        ("src12", "src19"): 2737,
        ("src12", "src2"): 3282,
        ("src12", "src3"): 6798,
        ("src12", "src4"): 1370,
        ("src12", "src5"): 11201,
        ("src12", "src6"): 8612,
        ("src12", "src8"): 3194,
        ("src12", "src9"): 3175,
        ("src13", "src14"): 4952,
        ("src13", "src15"): 2441,
        ("src13", "src17"): 10947,
        ("src13", "src19"): 1865,
        ("src13", "src2"): 2584,
        ("src13", "src3"): 3223,
        ("src13", "src5"): 2357,
        ("src13", "src6"): 3353,
        ("src13", "src7"): 2840,
        ("src13", "src8"): 3997,
        ("src13", "src9"): 2380,
        ("src14", "src15"): 937,
        ("src14", "src18"): 9037,
        ("src14", "src19"): 3171,
        ("src14", "src2"): 4007,
        ("src14", "src5"): 2538,
        ("src14", "src8"): 843,
        ("src14", "src9"): 619,
        ("src15", "src17"): 2466,
        ("src15", "src18"): 3268,
        ("src15", "src19"): 3439,
        ("src15", "src2"): 2277,
        ("src15", "src3"): 6824,
        ("src15", "src4"): 3843,
        ("src15", "src5"): 6297,
        ("src15", "src7"): 2893,
        ("src15", "src8"): 8108,
        ("src16", "src17"): 6659,
        ("src16", "src18"): 216,
        ("src16", "src19"): 1109,
        ("src16", "src2"): 3381,
        ("src16", "src3"): 2423,
        ("src16", "src4"): 3603,
        ("src16", "src5"): 2961,
        ("src16", "src6"): 1106,
        ("src16", "src7"): 9832,
        ("src16", "src8"): 2134,
        ("src16", "src9"): 3100,
        ("src17", "src18"): 1122,
        ("src17", "src19"): 1149,
        ("src17", "src2"): 6896,
        ("src17", "src3"): 2672,
        ("src17", "src4"): 4840,
        ("src17", "src5"): 4602,
        ("src17", "src6"): 1273,
        ("src17", "src7"): 8232,
        ("src18", "src19"): 2302,
        ("src18", "src2"): 1931,
        ("src18", "src3"): 1771,
        ("src18", "src4"): 434,
        ("src18", "src5"): 1837,
        ("src18", "src7"): 3751,
        ("src19", "src3"): 1831,
        ("src19", "src4"): 3742,
        ("src19", "src6"): 2477,
        ("src19", "src9"): 3281,
        ("src2", "src3"): 2655,
        ("src2", "src4"): 2122,
        ("src2", "src6"): 2617,
        ("src2", "src7"): 3872,
        ("src2", "src8"): 7486,
        ("src2", "src9"): 5388,
        ("src3", "src4"): 2393,
        ("src3", "src6"): 3617,
        ("src3", "src8"): 122,
        ("src3", "src9"): 2017,
        ("src4", "src5"): 5846,
        ("src4", "src6"): 983,
        ("src4", "src8"): 2063,
        ("src5", "src6"): 5482,
        ("src5", "src7"): 1836,
        ("src5", "src8"): 3056,
        ("src5", "src9"): 248,
        ("src6", "src7"): 885,
        ("src6", "src8"): 2504,
        ("src6", "src9"): 429,
        ("src7", "src8"): 1108,
        ("src7", "src9"): 2509,
    },
}


@query(
    "corpus_overlap_sketch",
    oracle="""
        SELECT a.source AS source_a, b.source AS source_b,
               TRUE AS within_bounds
        FROM (SELECT DISTINCT source FROM documents) a
        JOIN (SELECT DISTINCT source FROM documents) b
          ON a.source < b.source
    """,
    description=f"sketched cross-corpus contamination: per-source "
    f"one-permutation MinHash over {_OVL_K} buckets (each n-gram hashes "
    "once; bucket = h mod K; per-(source, bucket) MIN is a map-side-"
    "combinable aggregate, so the shuffle carries sources x K longs — "
    "NEVER the corpus-sized distinct n-gram set that the exact "
    "corpus_overlap must shuffle). Pairwise Jaccard estimate = matching "
    "bucket minima / union-occupied buckets; a bucket's union-minimum "
    "lands in both sketches with probability exactly J, so the "
    "estimator is unbiased with σ <= sqrt(.25/occupied). Like "
    "approx_distinct_users, this registered entry is the VERIFICATION "
    "TWIN: it pays for the exact matrix on purpose and the "
    "oracle-checked output is the 5σ error-bound predicate "
    "(constant-TRUE in DuckDB), so an estimator drifting out of its "
    "published bound turns the driver row red. The exact side is a "
    "PRE-COMMITTED snapshot for the known test SFs (computed once by "
    "the DuckDB oracle of corpus_overlap and frozen in "
    "_OVL_EXACT_SNAPSHOT) — the drift detector no longer pays the "
    "corpus-sized distinct-gram shuffle on every run; for any OTHER "
    "dataset it falls back to computing the exact matrix in-query "
    "(_sketch_vs_exact_twin, kept pytest-exercised). The sketch "
    "VALUES themselves are hash-oracled separately as "
    "corpus_overlap_sketch_only",
)
def corpus_overlap_sketch(spark, sf_dir):
    # snapshot lookup BEFORE any plan construction: the estimate path
    # scratch-persists its dense relation, and building it just to throw
    # it away on the fallback path would pollute the bounded scratch ring
    snap = _overlap_snapshot_for(sf_dir)
    if snap is None:
        return _sketch_vs_exact_twin(spark, sf_dir)
    est = _sketch_bounds_est(
        _dense_sketch(corpus_overlap_sketch_only(spark, sf_dir))
    )
    # the frozen exact matrix as ONE parsed inline table: a VALUES
    # literal is a single SQL parse producing the same broadcastable
    # local relation as createDataFrame without serializing ~190 Python
    # rows through py4j into an RDD (measured ~58 -> ~43 ms per build,
    # and the plan gains a constant-foldable LocalRelation instead of an
    # opaque ExistingRDD)
    rows = ",".join(
        f"('{a}','{b}',{v}L)" for (a, b), v in sorted(snap.items())
    )
    exact = F.broadcast(
        spark.sql(
            f"SELECT * FROM VALUES {rows} AS t(source_a, source_b, exact_ppm)"
        )
    )
    return _bounds_check(est, exact)


def _overlap_snapshot_for(sf_dir):
    """The frozen exact matrix for this dataset, or None when the live
    in-query comparison must run. Keyed by sf-dir basename AND the
    documents.parquet byte size (driver-side stat, no job): a user corpus
    that merely lives in a directory named sf0.1 — or regenerated
    testdata at the same path — must NOT be compared against exact
    values frozen from a different corpus."""
    import os

    key = os.path.basename(os.path.normpath(sf_dir))
    snap = _OVL_EXACT_SNAPSHOT.get(key)
    if snap is None:
        return None
    p = os.path.join(sf_dir, "documents.parquet")
    try:
        if os.path.isdir(p):
            size = sum(
                os.path.getsize(os.path.join(p, f))
                for f in os.listdir(p)
                if not f.startswith(".")
            )
        else:
            size = os.path.getsize(p)
    except OSError:
        return None  # remote / unstatable input: run the live comparison
    if size != _OVL_SNAPSHOT_BYTES.get(key):
        return None
    return snap


# documents.parquet byte sizes the snapshots were frozen against
_OVL_SNAPSHOT_BYTES = {
    "sf0.001": 65515,
    "sf0.01": 65049,
    "sf0.1": 594568,
}


def _dense_sketch(mins):
    """(source, bucket, min_hash) sketch rows -> one dense K-slot vector
    per source (missing buckets NULL), so the pairwise comparison is a
    zip over two arrays instead of a bucket-keyed join."""
    return (
        mins.groupBy("source")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("bucket", "min_hash"))
            ).alias("m")
        )
        .select(
            "source",
            F.transform(
                F.sequence(F.lit(0), F.lit(_OVL_K - 1)),
                lambda i: F.col("m")[i],
            ).alias("vec"),
        )
    )


def _sketch_bounds_est(dense):
    """Pairwise one-permutation Jaccard estimate with its 5σ bound from
    dense sketch vectors: estimate = matching bucket minima /
    union-occupied buckets; σ <= sqrt(.25/occupied). The dense relation
    (sources x one K-slot array) is scratch-persisted: the a<b pairing
    references it on BOTH sides, and without materialization the whole
    gram-hash scan underneath runs twice."""
    dense = scratch_persist(dense)
    a = dense.select(
        F.col("source").alias("source_a"), F.col("vec").alias("va")
    )
    b = dense.select(
        F.col("source").alias("source_b"), F.col("vec").alias("vb")
    )
    # expression text, not Column lambdas: each zip_with/filter lambda
    # costs a dozen py4j round trips per build (measured 0.31 s of the
    # query's driver time); the parsed trees are identical functions
    # over identical operands, so the plan and values are unchanged
    return (
        a.join(b, F.col("source_a") < F.col("source_b"))
        .selectExpr(
            "source_a",
            "source_b",
            "size(filter(zip_with(va, vb, (x, y) -> "
            "x IS NOT NULL OR y IS NOT NULL), q -> q)) AS occ",
            "size(filter(zip_with(va, vb, (x, y) -> "
            "x IS NOT NULL AND y IS NOT NULL AND x = y), q -> q)) AS mat",
        )
        .selectExpr(
            "source_a",
            "source_b",
            "CAST(CASE WHEN occ > 0 THEN "
            "floor(CAST(mat AS DOUBLE) / occ * 1000000) "
            "ELSE 0 END AS BIGINT) AS est_ppm",
            "CAST(CASE WHEN occ > 0 THEN "
            "floor(5000000 * sqrt(0.25D / occ)) "
            "ELSE 1000000 END AS BIGINT) AS bound_ppm",
        )
    )


def _bounds_check(est, exact):
    return est.join(exact, ["source_a", "source_b"], "left").select(
        "source_a",
        "source_b",
        (
            F.abs(
                F.col("est_ppm")
                - F.coalesce(F.col("exact_ppm"), F.lit(0).cast("long"))
            )
            <= F.col("bound_ppm")
        ).alias("within_bounds"),
    )


def _sketch_vs_exact_twin(spark, sf_dir):
    """Full in-query drift detector — sketch estimate vs the exact matrix
    computed live. The fallback path of corpus_overlap_sketch for any
    dataset without a pre-committed exact snapshot, and the pytest-pinned
    proof (tests/test_llm_ops.py) that the snapshot shortcut and the live
    comparison agree. CHECKPOINT, not persist, on the distinct gram set:
    _exact_overlap fans it into per-source totals and the shared-set
    build, and severing the lineage saves re-planning the gram explode's
    expression tree per branch."""
    from hls_payer_mrf_sparkstreaming_spark.operators.dedup import (
        _ensure_checkpoint_dir,
    )

    _ensure_checkpoint_dir(spark)
    # localCheckpoint (r14): query-local lineage cut — no file round-trip
    grams = (
        _gram_stream(spark, sf_dir).distinct().localCheckpoint(eager=True)
    )
    v = F.conv(F.substring(F.col("h"), 1, 15), 16, 10).cast("long")
    # per-bucket MIN is duplicate-invariant, so sketching from the
    # distinct relation equals the raw-stream production sketch exactly
    mins = (
        grams.select(
            "source",
            v.alias("v"),
            F.pmod(v, F.lit(_OVL_K)).cast("int").alias("bucket"),
        )
        .groupBy("source", "bucket")
        .agg(F.min("v").alias("min_hash"))
    )
    est = _sketch_bounds_est(_dense_sketch(mins))
    exact = _exact_overlap(grams).select(
        "source_a", "source_b", F.col("jaccard_ppm").alias("exact_ppm")
    )
    return _bounds_check(est, exact)


@query(
    "corpus_overlap_sketch_only",
    oracle=f"""
        WITH toks AS (
            SELECT source, string_split(text, ' ') AS t FROM documents
        ),
        grams AS (
            SELECT source,
                   unnest(list_distinct(list_transform(
                       range(1, greatest(len(t) - {_DECON_N - 2}, 1)),
                       i -> md5(array_to_string(
                                list_slice(t, i, i + {_DECON_N - 1}),
                                ' '))
                   ))) AS h
            FROM toks
        ),
        v AS (
            SELECT source,
                   CAST('0x' || substring(h, 1, 15) AS BIGINT) AS v
            FROM grams
        )
        SELECT source, CAST(v % {_OVL_K} AS INT) AS bucket,
               MIN(v) AS min_hash
        FROM v GROUP BY source, bucket
    """,
    description=f"the PRODUCTION corpus-overlap sketch: per-source "
    f"one-permutation MinHash over {_OVL_K} buckets, the per-(source, "
    "bucket) MIN map-side-combining directly over the RAW gram stream — "
    "no distinct anywhere, so the only wide shuffle carries sources x K "
    "longs at any corpus size. Every sketch VALUE is hash-oracled "
    "(deterministic md5-derived minima), so a drifting hash family or "
    "bucketing bug is a value mismatch here; estimator ACCURACY is "
    "certified by the corpus_overlap_sketch bounds twin. Plan pinned "
    "shuffle-light by tests/test_plans.py",
)
def corpus_overlap_sketch_only(spark, sf_dir):
    # r11 hot-path rework: _gram_stream hashes every gram inside an
    # ArrayTransform + array_distinct — higher-order functions are
    # CodegenFallback (interpreted per element), which profiling showed
    # as the dominant cost at 10x data. Per-bucket MIN is duplicate-
    # invariant, so the sketch needs NO per-doc distinct; exploding the
    # start indices FIRST moves the md5/conv per gram into whole-stage
    # codegen and the only remaining array op is the explode itself.
    # Values are unchanged (same md5s, min unaffected by duplicates) —
    # the oracle's list_distinct is equally inert.
    docs = rebalance(load(spark, sf_dir, "documents")).select(
        "source", F.split("text", " ").alias("t")
    )
    starts = F.when(
        F.size("t") >= _DECON_N,
        F.sequence(F.lit(1), F.size("t") - (_DECON_N - 1)),
    ).otherwise(F.array().cast("array<int>"))
    h = F.md5(F.concat_ws(" ", F.slice(F.col("t"), F.col("i"), _DECON_N)))
    v = F.conv(F.substring(h, 1, 15), 16, 10).cast("long")
    return (
        docs.select("source", "t", F.explode(starts).alias("i"))
        .select(
            "source",
            v.alias("v"),
            F.pmod(v, F.lit(_OVL_K)).cast("int").alias("bucket"),
        )
        .groupBy("source", "bucket")
        .agg(F.min("v").alias("min_hash"))
    )


@query(
    "token_length_histogram",
    oracle="""
        WITH t AS (
            SELECT len(string_split(text, ' ')) AS nt FROM documents
        )
        SELECT CAST(length(bin(nt)) AS BIGINT) AS log2_bucket,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(min(nt) AS BIGINT) AS min_tokens,
               CAST(max(nt) AS BIGINT) AS max_tokens,
               CAST(sum(nt) AS BIGINT) AS total_tokens
        FROM t GROUP BY 1
    """,
    description="power-of-two token-length histogram: bucket = bit length "
    "of the token count (floor(log2)+1 computed via the binary-string "
    "length, exact integers in both engines — no float log2 edge cases at "
    "powers of two). The length distribution drives sequence-packing "
    "parameters (pack_sequences' budget) and truncation policy for a "
    "training corpus. One map-side-combinable groupBy over a scan; "
    "shuffles only (bucket, partial-agg) rows",
)
def token_length_histogram(spark, sf_dir):
    t = load(spark, sf_dir, "documents").select(
        F.size(F.split("text", " ")).alias("nt")
    )
    return (
        t.select(
            F.length(F.bin("nt")).cast("long").alias("log2_bucket"), "nt"
        )
        .groupBy("log2_bucket")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("nt").cast("long").alias("min_tokens"),
            F.max("nt").cast("long").alias("max_tokens"),
            F.sum("nt").cast("long").alias("total_tokens"),
        )
    )


@query(
    "quality_deciles",
    oracle="""
        SELECT doc_id, lang,
               CAST(NTILE(10) OVER (
                   PARTITION BY lang ORDER BY n_chars, doc_id
               ) AS BIGINT) AS decile
        FROM documents
    """,
    description="per-language quality deciles via NTILE(10) — the "
    "bucketing step behind 'train on the top-N deciles' curation "
    "policies. The order key is (n_chars, doc_id): a total order, so "
    "both engines assign identical deciles (NTILE over a partial order "
    "is engine-dependent). One shuffle on lang; per-key window state is "
    "a row counter. At 100 TB the exact NTILE needs the per-language "
    "sort; the production scale path is quality_deciles_approx below "
    "(sketch cutpoints broadcast back, no corpus sort), for which this "
    "exact operator is the oracle anchor",
)
def quality_deciles(spark, sf_dir):
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.ntile(10).over(w).cast("long").alias("decile"),
    )


def quality_deciles_approx(spark, sf_dir):
    """Production shape of quality_deciles for 100 TB: per-language decile
    CUTPOINTS from a mergeable quantile sketch (one partial-agg pass, K
    rows out), broadcast back onto the corpus, decile = 1 + #cutpoints
    below the score — no per-language sort anywhere. Differs from exact
    NTILE only at tie/boundary values (value-based buckets vs forced
    equal counts); tests/test_llm_ops.py bounds that disagreement. The
    registered quality_deciles entry is the oracle anchor."""
    docs = load(spark, sf_dir, "documents")
    cuts = docs.groupBy("lang").agg(
        F.percentile_approx(
            "n_chars", [i / 10 for i in range(1, 10)], 10000
        ).alias("cuts")
    )
    return docs.join(F.broadcast(cuts), "lang").select(
        "doc_id",
        "lang",
        (
            1
            + F.aggregate(
                F.col("cuts"),
                F.lit(0).cast("long"),
                lambda acc, c: acc
                + F.when(F.col("n_chars") > c, 1).otherwise(0),
            )
        ).alias("decile"),
    )


_DUPFRAC_N = 8  # same n-gram width as decontaminate


@query(
    "intra_corpus_dup_ngrams",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS t FROM documents
        ),
        grams AS (
            SELECT doc_id,
                   unnest(list_distinct(list_transform(
                       range(1, greatest(len(t) - {_DUPFRAC_N - 2}, 1)),
                       i -> md5(array_to_string(
                                list_slice(t, i, i + {_DUPFRAC_N - 1}), ' '))
                   ))) AS h
            FROM toks
        ),
        shared AS (
            SELECT h FROM grams GROUP BY h HAVING count(*) >= 2
        ),
        hits AS (
            SELECT g.doc_id, count(*) AS n_dup
            FROM grams g JOIN shared USING (h)
            GROUP BY g.doc_id
        ),
        totals AS (
            SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY doc_id
        )
        SELECT t.doc_id,
               CAST(t.n_grams AS BIGINT) AS n_grams,
               CAST(coalesce(h.n_dup, 0) AS BIGINT) AS n_dup_grams,
               CAST(coalesce(h.n_dup, 0) * 1000000 // t.n_grams AS BIGINT)
                   AS dup_ppm
        FROM totals t LEFT JOIN hits h USING (doc_id)
    """,
    description="intra-corpus duplicate-n-gram fraction per document (the "
    "corpus-wide companion to text_repetition's within-doc gate, and the "
    f"filter behind 'drop docs that are mostly boilerplate'): each doc's "
    f"distinct {_DUPFRAC_N}-gram hashes, the share of them appearing in "
    "at least one OTHER doc (count >= 2 over per-doc-distinct grams), in "
    "exact integer ppm. Plan: shingle hashes are computed per row in "
    "codegen and deduped before the explode; the shared-gram set is two "
    "chained partial-agg groupBys over 16-byte digests; the hit join "
    "shuffles (digest, doc_id) pairs keyed by digest and everything "
    "after is doc_id-keyed counts — document text never shuffles, so at "
    "100 TB the wire carries only digests and longs",
)
def intra_corpus_dup_ngrams(spark, sf_dir):
    # rebalance: the per-gram md5 explode is the dominant cost and the
    # small-dense parquet is one scan partition (no-op at scale)
    docs = rebalance(load(spark, sf_dir, "documents")).select(
        "doc_id", F.split("text", " ").alias("t")
    )
    grams = docs.select(
        "doc_id", F.explode(ngram_hashes(F.col("t"), _DUPFRAC_N)).alias("h")
    )
    # r14 (VERDICT item 3, skew hardening; guide §2.3/§2.5): the r13
    # whole-partition count window over the digest key put every copy of
    # a hot boilerplate gram into ONE window task, unaggregated (windows
    # have no partial phase). Both aggregations the query needs — the
    # per-gram global count AND the per-doc gram total — instead ride
    # ONE grouping-sets pass over the gram stream: the Expand doubles
    # rows in codegen, the single exchange is PARTIAL-AGGREGATED (a hot
    # digest combines map-side, so at most one row per map partition
    # crosses the wire per gram), and per-doc dup counts come from the
    # identity n_dup = n_grams - n_uniq, where a gram with global count
    # 1 names its sole owner via min(doc_id). The final owner join is
    # doc_id-keyed over two distinct-doc-sized relations — never skewed.
    gs = grams.groupingSets([["h"], ["doc_id"]], "h", "doc_id").agg(
        F.count("*").alias("c"),
        F.min("doc_id").alias("owner"),
        F.grouping_id().alias("gid"),
    )
    # gid bit order: ("h", "doc_id") -> per-gram rows (doc_id aggregated
    # out) have gid 1, per-doc rows (h aggregated out) have gid 2
    totals = gs.filter(F.col("gid") == 2).select(
        "doc_id", F.col("c").cast("long").alias("n_grams")
    )
    uniq = (
        gs.filter((F.col("gid") == 1) & (F.col("c") == 1))
        .groupBy("owner")
        .agg(F.count("*").cast("long").alias("n_uniq"))
    )
    return (
        totals.join(uniq, totals["doc_id"] == uniq["owner"], "left")
        .select(
            "doc_id",
            "n_grams",
            (
                F.col("n_grams")
                - F.coalesce(F.col("n_uniq"), F.lit(0).cast("long"))
            )
            .cast("long")
            .alias("n_dup_grams"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_dup_grams",
            (F.col("n_dup_grams") * 1000000 / F.col("n_grams"))
            .cast("long")
            .alias("dup_ppm"),
        )
    )


_PMI_TOPV = 32  # co-occurrence is computed over the top-V vocab only


@query(
    "token_cooccurrence_lift",
    oracle=f"""
        WITH toks AS (
            SELECT DISTINCT doc_id, tok FROM (
                SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                FROM documents
            )
        ),
        n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        df AS (
            SELECT tok, CAST(count(*) AS BIGINT) AS n_tok
            FROM toks GROUP BY tok
        ),
        w AS (
            SELECT tok, n_tok FROM df ORDER BY n_tok DESC, tok
            LIMIT {_PMI_TOPV}
        ),
        tw AS (
            SELECT t.doc_id, t.tok, w.n_tok FROM toks t JOIN w USING (tok)
        ),
        p AS (
            SELECT a.tok AS tok_a, b.tok AS tok_b,
                   max(a.n_tok) AS na, max(b.n_tok) AS nb,
                   CAST(count(*) AS BIGINT) AS nab
            FROM tw a JOIN tw b
              ON a.doc_id = b.doc_id AND a.tok < b.tok
            GROUP BY 1, 2
        )
        SELECT tok_a, tok_b, nab AS n_ab,
               CAST(nab * n.n_docs * 1000000 // (na * nb) AS BIGINT)
                   AS lift_ppm
        FROM p CROSS JOIN n WHERE nab >= 2
    """,
    description="token co-occurrence lift over the top-"
    f"{_PMI_TOPV} vocabulary: P(a,b)/(P(a)P(b)) at document level as the "
    "exact integer n_ab*N*1e6 // (n_a*n_b) — the PMI ordering without "
    "the log, so the hash-compared output has no float anywhere. The "
    "collocation/compound-detection statistic for tokenizer vocab "
    "construction. Plan: the vocabulary cap is what makes this scale — "
    "per-doc pair fan-out is bounded by V^2/2 regardless of document "
    "length, the tiny (tok, df) relation broadcasts to both join sides, "
    "the pair self-join is an equi-join on doc_id (both sides already "
    "partitioned by it), and the corpus size N rides in as ONE broadcast "
    "scalar row — document text never shuffles",
)
def token_cooccurrence_lift(spark, sf_dir):
    # r13, measured and REJECTED (interleaved A/B): collapsing each
    # doc's top-V tokens to a sorted struct array with in-row a<b pair
    # generation (the copurchase_pairs shape) ran 2.2 -> 3.2 s — at
    # V=32 the 496-pair interpreted transform-in-transform lambda costs
    # more than the SMJ self-join it replaces (CodegenFallback, the r11
    # gram-hash lesson); copurchase wins the same trade only because
    # TPC-H baskets are <= 7 items. Dropping the toks persist also
    # measured slower (the array_distinct explode is the dominant cost
    # and would run twice). Shape kept as is.
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("tok")
    )
    toks = scratch_persist(toks)
    n = docs.agg(F.count("*").cast("long").alias("n_docs"))
    w = (
        toks.groupBy("tok")
        .agg(F.count("*").cast("long").alias("n_tok"))
        .orderBy(F.col("n_tok").desc(), "tok")
        .limit(_PMI_TOPV)
    )
    tw = toks.join(F.broadcast(w), "tok").select("doc_id", "tok", "n_tok")
    a = tw.alias("a")
    b = tw.alias("b")
    p = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.tok") < F.col("b.tok")),
        )
        .groupBy(
            F.col("a.tok").alias("tok_a"), F.col("b.tok").alias("tok_b")
        )
        .agg(
            F.max("a.n_tok").alias("na"),
            F.max("b.n_tok").alias("nb"),
            F.count("*").cast("long").alias("n_ab"),
        )
        .filter(F.col("n_ab") >= 2)
    )
    return p.crossJoin(F.broadcast(n)).select(
        "tok_a",
        "tok_b",
        "n_ab",
        F.expr("n_ab * n_docs * 1000000 div (na * nb)")
        .cast("long")
        .alias("lift_ppm"),
    )


@query(
    "ngram_novelty_score",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS t FROM documents
        ),
        grams AS (
            SELECT doc_id,
                   unnest(list_distinct(list_transform(
                       range(1, greatest(len(t) - {_DUPFRAC_N - 2}, 1)),
                       i -> md5(array_to_string(
                                list_slice(t, i, i + {_DUPFRAC_N - 1}), ' '))
                   ))) AS h
            FROM toks
        ),
        first_seen AS (
            SELECT h, min(doc_id) AS first_doc FROM grams GROUP BY h
        )
        SELECT g.doc_id,
               CAST(count(*) AS BIGINT) AS n_grams,
               CAST(count(*) FILTER (f.first_doc = g.doc_id) AS BIGINT)
                   AS n_novel,
               CAST(count(*) FILTER (f.first_doc = g.doc_id) * 1000000
                    // count(*) AS BIGINT) AS novelty_ppm
        FROM grams g JOIN first_seen f USING (h)
        GROUP BY g.doc_id
    """,
    description="ingest-order novelty score: the fraction of each "
    "document's distinct 8-grams that appear for the FIRST time in this "
    "document (first occurrence = smallest doc_id owning the gram) — "
    "the marginal-new-content metric that tells a curation pipeline "
    "when an ingest feed has stopped adding information, the per-doc "
    "complement of intra_corpus_dup_ngrams' global dup rate. Plan: "
    "shingle hashes dedupe per row in codegen before the explode, "
    "first-owners come from one partial-agg min-groupBy over 16-byte "
    "digests, the ownership join shuffles (digest, doc_id) pairs keyed "
    "by digest, and per-doc counts re-aggregate on doc_id — text never "
    "crosses the wire; exact integer ppm output",
)
def ngram_novelty_score(spark, sf_dir):
    docs = rebalance(load(spark, sf_dir, "documents")).select(
        "doc_id", F.split("text", " ").alias("t")
    )
    grams = docs.select(
        "doc_id", F.explode(ngram_hashes(F.col("t"), _DUPFRAC_N)).alias("h")
    )
    # r14 (VERDICT item 3, the intra_corpus_dup_ngrams shape): the r13
    # whole-partition MIN window shuffled every copy of a hot gram into
    # one unaggregated window task. One grouping-sets pass computes the
    # per-gram first owner (min(doc_id), partial-aggregated — hot grams
    # combine map-side) AND the per-doc gram totals in a single
    # exchange; per-doc novel counts are one tiny aggregate over the
    # one-row-per-gram branch, re-attached by an unskewable doc_id join.
    gs = grams.groupingSets([["h"], ["doc_id"]], "h", "doc_id").agg(
        F.count("*").alias("c"),
        F.min("doc_id").alias("owner"),
        F.grouping_id().alias("gid"),
    )
    totals = gs.filter(F.col("gid") == 2).select(
        "doc_id", F.col("c").cast("long").alias("n_grams")
    )
    novel = (
        gs.filter(F.col("gid") == 1)
        .groupBy("owner")
        .agg(F.count("*").cast("long").alias("n_novel0"))
    )
    return (
        totals.join(novel, totals["doc_id"] == novel["owner"], "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce(F.col("n_novel0"), F.lit(0).cast("long")).alias(
                "n_novel"
            ),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_novel",
            F.expr("n_novel * 1000000 div n_grams")
            .cast("long")
            .alias("novelty_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Vocabulary coverage curve: what fraction of all token OCCURRENCES do the
# top-k token TYPES cover? The tokenizer-design number — it tells you how
# big a vocab must be before the OOV/byte-fallback rate is acceptable, and
# it screens corpora whose curve is degenerate (boilerplate: near-total
# coverage from a handful of types).
# ---------------------------------------------------------------------------

_COVER_KS = (2, 4, 8, 16)


@query(
    "vocab_coverage_curve",
    oracle=f"""
        WITH t AS (
            SELECT unnest(string_split(text, ' ')) AS tok FROM documents
        ),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM t),
        top AS (
            SELECT tok, CAST(count(*) AS BIGINT) AS c
            FROM t GROUP BY tok
            ORDER BY c DESC, tok LIMIT {max(_COVER_KS)}
        ),
        cum AS (
            SELECT row_number() OVER (ORDER BY c DESC, tok) AS r,
                   CAST(sum(c) OVER (ORDER BY c DESC, tok
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS BIGINT) AS cumc
            FROM top
        )
        SELECT CAST(r AS BIGINT) AS k,
               cumc AS n_occurrences_cum,
               CAST(floor(CAST(cumc AS DOUBLE) / n * 1000000) AS BIGINT)
                   AS cover_ppm
        FROM cum CROSS JOIN tot
        WHERE r IN {_COVER_KS}
    """,
    description="vocabulary coverage curve: share (exact ppm) of all "
    f"token occurrences covered by the top-k token types, k in "
    f"{_COVER_KS} — the tokenizer-sizing stat (how big must the vocab "
    "be?) and a boilerplate screen (degenerate curves). Plan: one "
    "partially-aggregated token count, TakeOrderedAndProject to the "
    f"top {max(_COVER_KS)} types, then the running sum runs over those "
    "K ROWS ONLY (a single-partition window over a constant-size "
    "relation, NOT over the corpus) plus a broadcast scalar total — "
    "scale-independent after the first aggregation",
)
def vocab_coverage_curve(spark, sf_dir):
    from pyspark.sql import Window

    t = (
        load(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("tok"))
    )
    tot = t.agg(F.count("*").cast("long").alias("n"))
    top = (
        t.groupBy("tok")
        .agg(F.count("*").cast("long").alias("c"))
        .orderBy(F.desc("c"), "tok")
        .limit(max(_COVER_KS))
    )
    w = Window.orderBy(F.desc("c"), "tok")
    cum = top.select(
        F.row_number().over(w).alias("r"),
        F.sum("c")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cumc"),
    )
    return (
        cum.filter(F.col("r").isin(*_COVER_KS))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("r").cast("long").alias("k"),
            F.col("cumc").cast("long").alias("n_occurrences_cum"),
            F.floor(F.col("cumc").cast("double") / F.col("n") * 1_000_000)
            .cast("long")
            .alias("cover_ppm"),
        )
    )


@query(
    "token_entropy_per_doc",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents
        ),
        c AS (
            SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c
            FROM t GROUP BY doc_id, tok
        ),
        n AS (
            SELECT doc_id, tok, c,
                   sum(c) OVER (PARTITION BY doc_id) AS n
            FROM c
        )
        SELECT doc_id,
               CAST(max(n) AS BIGINT) AS n_tokens,
               CAST(count(*) AS BIGINT) AS n_types,
               CAST(sum(CAST(floor(-(CAST(c AS DOUBLE) / n)
                                   * ln(CAST(c AS DOUBLE) / n)
                                   * {_NANO}) AS BIGINT)) AS BIGINT)
                   AS entropy_nano
        FROM n GROUP BY doc_id
    """,
    description="per-document Shannon entropy (nano-nats) of the doc's "
    "own token distribution — the repetition/diversity quality signal "
    "(boilerplate and keyword-stuffed spam sit far below prose of the "
    "same length; complements text_repetition's ngram view). "
    "Per-type terms -(p ln p) are floored into integer nano-units "
    "BEFORE the per-doc sum, so the result is exact under any "
    "aggregation order. Plan: one partially-aggregated (doc_id, token) "
    "count, a per-doc window for the total, one final per-doc "
    "aggregation — shuffles carry (doc_id, token, count) triples, "
    "never text",
)
def token_entropy_per_doc(spark, sf_dir):
    from pyspark.sql import Window

    t = load(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    c = t.groupBy("doc_id", "tok").agg(F.count("*").cast("long").alias("c"))
    n = c.select(
        "doc_id",
        "c",
        F.sum("c").over(Window.partitionBy("doc_id")).alias("n"),
    )
    p = F.col("c").cast("double") / F.col("n")
    return n.groupBy("doc_id").agg(
        F.max("n").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_types"),
        F.sum(F.floor(-p * F.log(p) * _NANO).cast("long"))
        .cast("long")
        .alias("entropy_nano"),
    )


_OOV_VOCAB_K = 64  # corpus vocabulary = the 64 most frequent token types


@query(
    "doc_oov_rate",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents
        ),
        vocab AS (
            SELECT tok FROM (
                SELECT tok, count(*) AS c FROM t GROUP BY tok
                ORDER BY c DESC, tok LIMIT {_OOV_VOCAB_K}
            )
        )
        SELECT t.doc_id AS doc_id,
               CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(count(*) FILTER (WHERE vocab.tok IS NULL) AS BIGINT)
                   AS n_oov,
               CAST(floor(CAST(count(*) FILTER (WHERE vocab.tok IS NULL)
                               AS DOUBLE) / count(*) * 1000000) AS BIGINT)
                   AS oov_ppm
        FROM t LEFT JOIN vocab ON t.tok = vocab.tok
        GROUP BY t.doc_id
    """,
    description="per-document out-of-vocabulary rate against the corpus's "
    f"own top-{_OOV_VOCAB_K} token types (count-desc, token-asc "
    "tie-break) — the quality gate that flags docs written in a "
    "different register/language than the training vocabulary. Plan: one "
    "partial-agg token count feeds a TakeOrderedAndProject vocabulary "
    f"({_OOV_VOCAB_K} rows) that is BROADCAST back to the exploded "
    "token stream, so the corpus-side cost is one scan + one partial "
    "aggregation and the per-token membership test never shuffles the "
    "corpus",
)
def doc_oov_rate(spark, sf_dir):
    t = load(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    vocab = (
        t.groupBy("tok")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), "tok")
        .limit(_OOV_VOCAB_K)
        .select("tok")
    )
    joined = t.join(
        F.broadcast(vocab.withColumnRenamed("tok", "vtok")),
        t.tok == F.col("vtok"),
        "left",
    )
    n_oov = F.sum(F.when(F.col("vtok").isNull(), 1).otherwise(0))
    return joined.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_tokens"),
        n_oov.cast("long").alias("n_oov"),
        F.floor(n_oov.cast("double") / F.count("*") * 1_000_000)
        .cast("long")
        .alias("oov_ppm"),
    )


# -- two-pass exact heavy hitters ------------------------------------------
# support threshold: a token is a heavy hitter iff freq * _HH_DEN >= N
# (N = total corpus tokens). The candidate pass keeps _HH_K counters per
# partition; the Misra-Gries bound (undercount <= N_p / (K+1)) plus a
# pigeonhole over partitions guarantees every token with global
# freq > N / (_HH_K + 1) survives SOME partition's summary, and
# N / (_HH_K + 1) < N / _HH_DEN, so the candidate union is a strict
# superset of the true answer — the exact recount then makes the output
# independent of which extra candidates each partition happened to keep.
_HH_DEN = 500  # heavy hitter = >= 0.2% of all corpus tokens
_HH_K = 4096  # MG counters per partition (40 KB of state, any scale)


def _mg_candidates(batches):
    """Bounded-memory Misra-Gries sketch over a partition's token stream.

    Consumes the partition's Arrow batches one at a time (never the whole
    partition), folds each batch's token counts into a dict trimmed back
    to _HH_K keys WHILE folding — the moment the dict exceeds 2*_HH_K it
    applies the batched-decrement rule from Agarwal et al., "Mergeable
    Summaries" (PODS 2012): subtract the (K+1)-th largest count from
    every counter and drop the non-positive ones. Each decrement removes
    >= (K+1)*cut of total count mass, and only N_p mass ever enters, so
    the sum of cuts — any key's total undercount — is <= N_p/(K+1)
    regardless of how often the trim fires. Peak state is therefore
    2*_HH_K counters plus ONE Arrow batch's value_counts (Arrow batches
    are bounded by spark.sql.execution.arrow.maxRecordsPerBatch), never
    the partition's vocabulary.
    """
    import pandas as pd

    counts: dict = {}

    def trim():
        # (K+1)-th largest count; everything <= it gets zeroed
        cut = sorted(counts.values(), reverse=True)[_HH_K]
        return {t: c - cut for t, c in counts.items() if c > cut}

    for pdf in batches:
        batch = (
            pdf["text"].str.split(" ").explode().value_counts()
        )
        for tok, n in batch.items():
            counts[tok] = counts.get(tok, 0) + int(n)
            if len(counts) > 2 * _HH_K:
                counts = trim()
    if len(counts) > _HH_K:
        counts = trim()
    if counts:
        yield pd.DataFrame({"token": list(counts.keys())})


@query(
    "heavy_hitters_twopass",
    oracle=f"""
        WITH toks AS (
            SELECT unnest(string_split(text, ' ')) AS token
            FROM documents
        ),
        n AS (SELECT CAST(count(*) AS BIGINT) AS total FROM toks)
        SELECT token, CAST(count(*) AS BIGINT) AS freq
        FROM toks, n
        GROUP BY token, n.total
        HAVING count(*) * {_HH_DEN} >= n.total
    """,
    description="exact corpus-level heavy hitters (tokens with >= 1/"
    f"{_HH_DEN} of all token mass) via the canonical two-pass sketch: "
    "pass 1 runs a bounded-memory Misra-Gries summary per partition "
    f"(trimmed in-fold to {_HH_K} counters; peak state is 2K counters "
    "plus one Arrow batch's distinct tokens, never the vocabulary) "
    "whose union is "
    "provably a superset of the true answer; pass 2 broadcast-joins the "
    "tiny candidate set back onto the token stream and recounts exactly, "
    "filtering on the support threshold in pure integers. At 100 TB with "
    "a billions-of-distinct-tokens web vocabulary, a naive "
    "groupBy(token) shuffles every distinct token's partial count; this "
    "plan shuffles only the <= K-per-partition candidates — the shuffle "
    "is bounded by the sketch size, not the vocabulary",
)
def heavy_hitters_twopass(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("text")
    candidates = (
        docs.mapInPandas(_mg_candidates, "token string")
        .distinct()
    )
    toks = docs.select(
        F.explode(F.split("text", " ")).alias("token")
    )
    total = docs.select(
        F.sum(F.size(F.split("text", " "))).cast("long").alias("total")
    )
    return (
        toks.join(F.broadcast(candidates), "token")
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("freq"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("freq") * _HH_DEN >= F.col("total"))
        .select("token", "freq")
    )


# ---------------------------------------------------------------------------
# Zipf's-law fit over the corpus frequency spectrum
# ---------------------------------------------------------------------------

_ZIPF_TOP = 200  # fit over the head of the spectrum, where Zipf holds
_MICRO = 1_000_000  # log values in micro units keep the moment products
# within int64: |lx|,|ly| <= ~2e7 micro, so sum(lx*ly) over 200 terms
# stays < 1e17 << 2^63

# slope/intercept of ln(freq) ~ ln(rank) as ONE expression over five exact
# longs — identical text for Spark SQL and DuckDB
_ZIPF_SLOPE = (
    "((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
    " / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))"
)


@query(
    "zipf_slope",
    oracle=f"""
        WITH tok AS (
            SELECT unnest(string_split(text, ' ')) AS token FROM documents
        ),
        f AS (
            SELECT token, CAST(count(*) AS BIGINT) AS freq
            FROM tok GROUP BY token
        ),
        rk AS (
            SELECT freq,
                   row_number() OVER (ORDER BY freq DESC, token) AS rnk
            FROM f
        ),
        l AS (
            SELECT
                CAST(floor(ln(CAST(rnk AS DOUBLE)) * {_MICRO}) AS BIGINT)
                    AS lx,
                CAST(floor(ln(CAST(freq AS DOUBLE)) * {_MICRO}) AS BIGINT)
                    AS ly
            FROM rk WHERE rnk <= {_ZIPF_TOP}
        ),
        m AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(lx) AS BIGINT) AS sx,
                   CAST(sum(ly) AS BIGINT) AS sy,
                   CAST(sum(lx * ly) AS BIGINT) AS sxy,
                   CAST(sum(lx * lx) AS BIGINT) AS sxx
            FROM l
        )
        SELECT n AS n_terms,
               CAST(floor({_ZIPF_SLOPE} * {_NANO}) AS BIGINT) AS slope_nano,
               CAST(floor((CAST(sy AS DOUBLE) - {_ZIPF_SLOPE} * sx) / n
                          * 1000) AS BIGINT) AS intercept_nano
        FROM m
    """,
    description="Zipf's-law fit: OLS slope of ln(frequency) on ln(rank) "
    "over the top-200 corpus tokens — natural text sits near -1; a "
    "slope far off flags boilerplate-heavy or synthetic corpora (a "
    "standard pretraining-data health check). Token counting is one "
    "map-side-combinable groupBy; the head is taken with "
    "orderBy().limit() (TakeOrderedAndProject — no global sort of the "
    "vocabulary) with a deterministic (freq desc, token) tiebreak; each "
    "term's logs are floored to micro units so the five OLS moments are "
    "exact long sums, engine-independent at any parallelism",
)
def zipf_slope(spark, sf_dir):
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    f = (
        docs.select(
            F.explode(F.split(F.col("text"), " ")).alias("token")
        )
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("freq"))
    )
    # TakeOrderedAndProject keeps top-K per partition then merges K rows —
    # the vocabulary is never globally sorted
    head = f.orderBy(F.desc("freq"), F.asc("token")).limit(_ZIPF_TOP)
    rk = head.select(
        "freq",
        F.row_number()
        .over(Window.orderBy(F.desc("freq"), F.asc("token")))
        .alias("rnk"),
    )
    l = rk.select(
        F.floor(F.log(F.col("rnk").cast("double")) * _MICRO)
        .cast("long")
        .alias("lx"),
        F.floor(F.log(F.col("freq").cast("double")) * _MICRO)
        .cast("long")
        .alias("ly"),
    )
    m = l.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("lx").cast("long").alias("sx"),
        F.sum("ly").cast("long").alias("sy"),
        F.sum(F.col("lx") * F.col("ly")).cast("long").alias("sxy"),
        F.sum(F.col("lx") * F.col("lx")).cast("long").alias("sxx"),
    )
    return m.select(
        F.col("n").alias("n_terms"),
        F.expr(
            f"CAST(floor({_ZIPF_SLOPE} * {_NANO}) AS BIGINT)"
        ).alias("slope_nano"),
        F.expr(
            f"CAST(floor((CAST(sy AS DOUBLE) - {_ZIPF_SLOPE} * sx) / n"
            f" * 1000) AS BIGINT)"
        ).alias("intercept_nano"),
    )


# ---------------------------------------------------------------------------
# Linear-counting distinct sketch — mergeable AND bit-exactly oracle-checked
# ---------------------------------------------------------------------------

_LC_M = 4096  # sketch bitmap size; stderr ~ sqrt(m*(exp(t)-t-1))/n at load t

from hls_payer_mrf_sparkstreaming_spark.functions.hashing import (  # noqa: E402
    md5u60_sql,
)


@query(
    "linear_count_distinct",
    oracle=f"""
        WITH b AS (
            SELECT DISTINCT source,
                   {md5u60_sql('token')} % {_LC_M} AS bucket,
                   token
            FROM (
                SELECT source, unnest(string_split(text, ' ')) AS token
                FROM documents
            )
        ),
        m AS (
            SELECT source,
                   CAST(count(DISTINCT bucket) AS BIGINT) AS occupied,
                   CAST(count(DISTINCT token) AS BIGINT) AS exact_distinct
            FROM b GROUP BY source
        )
        SELECT source, occupied, exact_distinct,
               CASE WHEN occupied >= {_LC_M} THEN NULL ELSE
                   CAST(floor(-{_LC_M}.0
                        * ln(CAST({_LC_M} - occupied AS DOUBLE) / {_LC_M})
                        * 1000000000) AS BIGINT) END AS est_nano
        FROM m
    """,
    description="Linear-counting cardinality sketch (Whang et al. 1990) "
    "per source: tokens hash into a {m}-bucket bitmap and the distinct "
    "estimate is -m*ln(empty/m). Unlike HyperLogLog the sketch value "
    "itself is ORACLE-CHECKED bit-exactly, because the bucket function "
    "is the shared md5-60 family — DuckDB computes the identical bitmap. "
    "The bitmap is mergeable (bitwise OR across shards/streams), and the "
    "shuffle carries at most m=4096 distinct bucket ids per group key, "
    "never the vocabulary. exact_distinct is the verification twin "
    "(paid for here on purpose, like approx_distinct_users)".replace(
        "{m}", str(_LC_M)
    ),
)
def linear_count_distinct(spark, sf_dir):
    from hls_payer_mrf_sparkstreaming_spark.functions.hashing import md5u60

    toks = load(spark, sf_dir, "documents").select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    m = toks.groupBy("source").agg(
        F.countDistinct(F.pmod(md5u60(F.col("token")), _LC_M))
        .cast("long")
        .alias("occupied"),
        F.countDistinct("token").cast("long").alias("exact_distinct"),
    )
    return m.select(
        "source",
        "occupied",
        "exact_distinct",
        F.when(F.col("occupied") >= _LC_M, F.lit(None).cast("long"))
        .otherwise(
            F.floor(
                -float(_LC_M)
                * F.log(
                    (F.lit(_LC_M) - F.col("occupied")).cast("double")
                    / _LC_M
                )
                * 1_000_000_000
            ).cast("long")
        )
        .alias("est_nano"),
    )


# ---------------------------------------------------------------------------
# Winnowing document fingerprints (MOSS)
# ---------------------------------------------------------------------------

_WIN_K = 4  # shingle width (tokens)
_WIN_W = 5  # winnowing window (shingles)


@query(
    "winnowing_fingerprints",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS toks,
                   len(string_split(text, ' ')) AS n
            FROM documents
        ),
        g AS (
            SELECT doc_id,
                   list_transform(
                       range(n - {_WIN_K - 1}),
                       i -> CAST('0x' || substring(md5(array_to_string(
                                list_slice(toks, i + 1, i + {_WIN_K}), ' '
                            )), 1, 15) AS BIGINT)
                   ) AS hs
            FROM t WHERE n >= {_WIN_K + _WIN_W - 1}
        )
        SELECT DISTINCT doc_id,
               unnest(list_transform(
                   range(len(hs) - {_WIN_W - 1}),
                   j -> list_min(list_slice(hs, j + 1, j + {_WIN_W}))
               )) AS fp
        FROM g
    """,
    description="Winnowing fingerprints (Schleimer/Wilkerson/Aiken, "
    "SIGMOD 2003 — the MOSS algorithm): hash every {k}-token shingle, "
    "slide a {w}-shingle window, keep each window's minimum — guarantees "
    "any shared run of >= {k}+{w}-1 tokens between two documents shares "
    "a fingerprint, at ~2/(w+1) the storage of full shingling. The "
    "entire selection runs INSIDE array expressions (transform / slice / "
    "array_min) on the JVM — one projection, no explode shuffle until "
    "the final distinct; fingerprints join/aggregate downstream for "
    "plagiarism, contamination and containment detection. Documents "
    "shorter than {k}+{w}-1 tokens have no full window and are skipped, "
    "matching the oracle".replace("{k}", str(_WIN_K)).replace(
        "{w}", str(_WIN_W)
    ),
)
def winnowing_fingerprints(spark, sf_dir):
    from hls_payer_mrf_sparkstreaming_spark.functions.hashing import md5u60

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.col("text"), " ").alias("toks")
    )
    docs = docs.withColumn("n", F.size("toks")).filter(
        F.col("n") >= _WIN_K + _WIN_W - 1
    )
    hs = F.transform(
        F.sequence(F.lit(0), F.col("n") - _WIN_K),
        lambda i: md5u60(
            F.concat_ws(" ", F.slice(F.col("toks"), i + 1, _WIN_K))
        ),
    )
    docs = docs.select("doc_id", hs.alias("hs"))
    mins = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size("hs") - _WIN_W),
            lambda j: F.array_min(F.slice(F.col("hs"), j + 1, _WIN_W)),
        )
    )
    return docs.select(
        "doc_id", F.explode(mins).alias("fp")
    ).distinct()


# ---------------------------------------------------------------------------
# BPE tokenizer training, iteration 0: the merge-candidate table. Byte-pair
# encoding (Sennrich et al. 2016) trains by repeatedly merging the most
# frequent adjacent symbol pair; the expensive part at corpus scale is this
# very first pair count. The trick that makes it 100 TB-safe: aggregate the
# corpus to its WORD-FREQUENCY table first (vocabulary-sized, map-side
# combined), then explode character pairs over the distinct words only —
# pair work is O(vocab * avg_word_len), independent of how often each word
# repeats in the corpus. The final aggregate has at most alphabet^2 keys.
# ---------------------------------------------------------------------------

_BPE_TOPK = 50


@query(
    "bpe_merge_candidates",
    oracle=f"""
        WITH words AS (
            SELECT w AS word, CAST(count(*) AS BIGINT) AS wc
            FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
            WHERE length(w) >= 2
            GROUP BY w
        ),
        pairs AS (
            SELECT substr(word, i, 2) AS pair, wc
            FROM (SELECT word, wc, unnest(range(1, length(word))) AS i
                  FROM words)
        )
        SELECT pair, CAST(sum(wc) AS BIGINT) AS pair_count
        FROM pairs GROUP BY pair
        ORDER BY pair_count DESC, pair
        LIMIT {_BPE_TOPK}
    """,
    description="BPE tokenizer training, iteration 0: corpus-weighted "
    "adjacent character-pair counts, the merge-candidate table every "
    "subword tokenizer build starts from. Scale shape: corpus collapses "
    "to the distinct-word frequency table FIRST (one partially-aggregated "
    "groupBy), pairs explode over distinct words only (work independent "
    "of corpus duplication), and the pair aggregate has <= alphabet^2 "
    "keys; top-k is a TakeOrderedAndProject with a total (count desc, "
    "pair asc) order so the selected set is deterministic",
)
def bpe_merge_candidates(spark, sf_dir):
    words = (
        load(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("wc"))
    )
    pairs = words.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("word") - 1),
                lambda i: F.col("word").substr(i, F.lit(2)),
            )
        ).alias("pair"),
        "wc",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wc").cast("long").alias("pair_count"))
        .orderBy(F.desc("pair_count"), "pair")
        .limit(_BPE_TOPK)
    )


# ---------------------------------------------------------------------------
# BPE tokenizer training, iterations 1..K: the actual merge loop. Each
# iteration counts adjacent SYMBOL pairs over the (space-delimited) symbol
# sequences of the distinct-word table, picks the most frequent pair with a
# total (count desc, pair asc) order, and rewrites every sequence by a
# single-pass sentinel-delimited string replace — symbols are
# space-sentineled (' l o w ') so a merge can never match across a symbol
# boundary. NOTE on semantics: because the matched pattern consumes the
# trailing sentinel that the next occurrence would need as its leading
# sentinel, a RUN of the winning symbol ('aaaa' -> ' a a a a ') merges a
# maximal non-overlapping SUBSET per round, leaving interleaved singles
# for later rounds — e.g. 'aaaa' becomes [aa, a, a] after one round, not
# canonical BPE's [aa, aa]. This is the corpus-level SQL approximation of
# BPE's per-word greedy scan, exactly identical across both engines
# (pinned by the repeated-symbol test in tests/test_llm_ops.py). The corpus is touched exactly once (to build the word-frequency
# table); each iteration after that is a vocabulary-sized aggregate plus a
# ONE-ROW broadcast cross join carrying the chosen pair into the rewrite —
# the shape that keeps full BPE training viable at 100 TB.
# ---------------------------------------------------------------------------

_BPE_STEPS = 3


def _bpe_pair_top1(wdf):
    # expression text, not Column lambdas. NOTE (r13, measured): a
    # single parameterized spark.sql per step is NOT cheaper here —
    # SQLStringFormatter registers and drops a temp view per DataFrame
    # argument (dropTempView alone profiled ~0.6 s per query build
    # across the 5 calls), so the method chain stays
    pairs = (
        wdf.selectExpr("filter(split(seq, ' '), x -> x != '') AS s", "wc")
        .filter("size(s) >= 2")
        .selectExpr(
            "explode(transform(sequence(1, size(s) - 1), "
            "i -> concat(element_at(s, i), ' ', element_at(s, i + 1))))"
            " AS pair",
            "wc",
        )
    )
    return (
        pairs.groupBy("pair")
        .agg(F.expr("CAST(sum(wc) AS BIGINT)").alias("pair_count"))
        .orderBy(F.desc("pair_count"), "pair")
        .limit(1)
    )


def _bpe_sql_pair_top1(src: str) -> str:
    return f"""
        SELECT bg.a || ' ' || bg.b AS pair,
               CAST(sum(wc) AS BIGINT) AS pair_count
        FROM (
            SELECT unnest(list_transform(range(1, len(s)),
                          i -> struct_pack(a := s[i], b := s[i + 1]))) AS bg,
                   wc
            FROM (SELECT list_filter(string_split(seq, ' '),
                                     x -> x <> '') AS s, wc
                  FROM {src})
            WHERE len(s) >= 2
        )
        GROUP BY 1 ORDER BY pair_count DESC, pair LIMIT 1
    """


def _bpe_sql_merge(src: str, pair_cte: str) -> str:
    return f"""
        SELECT replace(seq, ' ' || {pair_cte}.pair || ' ',
                       ' ' || replace({pair_cte}.pair, ' ', '') || ' ')
                   AS seq,
               wc
        FROM {src} CROSS JOIN {pair_cte}
    """


@query(
    "bpe_train_steps",
    oracle=f"""
        WITH w0 AS (
            SELECT ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') AS seq,
                   CAST(count(*) AS BIGINT) AS wc
            FROM (SELECT unnest(string_split(text, ' ')) AS word
                  FROM documents)
            WHERE length(word) >= 2
            GROUP BY 1
        ),
        p1 AS ({_bpe_sql_pair_top1("w0")}),
        w1 AS ({_bpe_sql_merge("w0", "p1")}),
        p2 AS ({_bpe_sql_pair_top1("w1")}),
        w2 AS ({_bpe_sql_merge("w1", "p2")}),
        p3 AS ({_bpe_sql_pair_top1("w2")})
        SELECT CAST(1 AS INT) AS step, pair,
               replace(pair, ' ', '') AS merged, pair_count FROM p1
        UNION ALL
        SELECT CAST(2 AS INT), pair, replace(pair, ' ', ''), pair_count
        FROM p2
        UNION ALL
        SELECT CAST(3 AS INT), pair, replace(pair, ' ', ''), pair_count
        FROM p3
    """,
    description=f"BPE tokenizer training, the first {_BPE_STEPS} merge "
    "iterations end-to-end: adjacent symbol-pair counts over space-"
    "sentineled symbol sequences of the distinct-word frequency table, "
    "deterministic (count desc, pair asc) winner per step, single-pass "
    "sentinel-delimited replace rewrite (merges a maximal non-overlapping "
    "subset of a repeat run per round — the SQL approximation of BPE's "
    "per-word greedy scan, engine-identical by test). Scale shape: the corpus is "
    "scanned ONCE to build the word-frequency table; every iteration "
    "after that is a vocabulary-sized aggregate plus a one-row broadcast "
    "cross join (the chosen pair) into the sequence rewrite — no "
    "per-iteration corpus rescan, no driver-side loop state beyond the "
    "fixed plan",
)
def bpe_train_steps(spark, sf_dir):
    w = (
        load(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.length("word") >= 2)
        .select(
            F.concat(
                F.lit(" "), F.regexp_replace("word", "(.)", "$1 ")
            ).alias("seq")
        )
        .groupBy("seq")
        .agg(F.count("*").cast("long").alias("wc"))
        .transform(scratch_persist)
    )
    steps = []
    for k in range(1, _BPE_STEPS + 1):
        p = _bpe_pair_top1(w).transform(scratch_persist)
        steps.append(
            p.selectExpr(
                f"CAST({k} AS INT) AS step",
                "pair",
                "replace(pair, ' ', '') AS merged",
                "pair_count",
            )
        )
        if k < _BPE_STEPS:
            w = w.crossJoin(F.broadcast(p)).selectExpr(
                "replace(seq, concat(' ', pair, ' '), "
                "concat(' ', replace(pair, ' ', ''), ' ')) AS seq",
                "wc",
            )
    out = steps[0]
    for s in steps[1:]:
        out = out.unionAll(s)
    return out


# ---------------------------------------------------------------------------
# Tokenizer fertility — tokens produced per whitespace word, by language.
# THE standard multilingual tokenizer-efficiency metric (a tokenizer with
# fertility 2.1 on one language and 1.2 on another gives the first language
# ~1.75x less content per context window and ~1.75x higher serving cost);
# every vocabulary/tokenizer decision for a multilingual corpus starts from
# this table.
# ---------------------------------------------------------------------------

_FERT_MICRO = 1_000_000


@query(
    "tokenizer_fertility",
    oracle=f"""
        WITH t AS (
            SELECT lang,
                   CAST(len(regexp_extract_all(text, '{_BPE_PATTERN}'))
                        AS BIGINT) AS n_bpe,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws,
                   CAST(length(text) AS BIGINT) AS n_chars
            FROM documents
        )
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_bpe) AS BIGINT) AS bpe_tokens,
               CAST(sum(n_ws) AS BIGINT) AS ws_tokens,
               CAST(floor(CAST(sum(n_bpe) AS DOUBLE) * {_FERT_MICRO}
                          / sum(n_ws)) AS BIGINT) AS fertility_micro,
               CASE WHEN sum(n_bpe) = 0 THEN NULL ELSE
                   CAST(floor(CAST(sum(n_chars) AS DOUBLE) * {_FERT_MICRO}
                              / sum(n_bpe)) AS BIGINT)
               END AS chars_per_token_micro
        FROM t GROUP BY lang
    """,
    description="tokenizer fertility by language: BPE-style tokens per "
    "whitespace word plus characters per token, in exact integer "
    "micro-units — the tokenizer-efficiency table that decides whether a "
    "multilingual vocabulary taxes low-resource languages. Pure-regexp "
    "per-doc counts in codegen followed by ONE partially-aggregated "
    "groupBy on lang (a handful of keys) — scan-bound at 100 TB",
)
def tokenizer_fertility(spark, sf_dir):
    t = load(spark, sf_dir, "documents").select(
        "lang",
        F.size(
            F.regexp_extract_all("text", F.lit(_BPE_PATTERN), F.lit(0))
        )
        .cast("long")
        .alias("n_bpe"),
        F.size(F.split("text", " ")).cast("long").alias("n_ws"),
        F.length("text").cast("long").alias("n_chars"),
    )
    return t.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_bpe").cast("long").alias("bpe_tokens"),
        F.sum("n_ws").cast("long").alias("ws_tokens"),
        F.floor(
            F.sum("n_bpe").cast("double") * _FERT_MICRO / F.sum("n_ws")
        )
        .cast("long")
        .alias("fertility_micro"),
        # guard: a lang whose docs are all empty/whitespace has zero BPE
        # tokens — ANSI mode would abort on the divide, and the oracle's
        # CASE yields NULL
        F.when(
            F.sum("n_bpe") > 0,
            F.floor(
                F.sum("n_chars").cast("double")
                * _FERT_MICRO
                / F.sum("n_bpe")
            ).cast("long"),
        )
        .otherwise(F.lit(None).cast("long"))
        .alias("chars_per_token_micro"),
    )


@query(
    "corpus_temperature_mix",
    oracle="""
        WITH d AS (
            SELECT source, len(string_split(text, ' ')) AS n_toks
            FROM documents
        ),
        g AS (
            SELECT source, CAST(sum(n_toks) AS BIGINT) AS n_tokens
            FROM d GROUP BY source
        ),
        s AS (
            SELECT source, n_tokens,
                   CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)))
                        AS BIGINT) AS isq
            FROM g
        ),
        t AS (
            SELECT sum(n_tokens) AS total, sum(isq) AS total_isq FROM s
        )
        SELECT source, n_tokens,
               CAST(n_tokens * 1000000 // total AS BIGINT)
                   AS proportional_ppm,
               CAST(isq * 1000000 // total_isq AS BIGINT)
                   AS temperature_ppm
        FROM s CROSS JOIN t
    """,
    description="temperature-flattened sampling weights per source "
    "(the multilingual/multi-domain rebalancing mT5 popularized: "
    "sampling proportional to n^alpha with alpha=0.5 upweights small "
    "domains a proportional mix would starve). alpha=0.5 is chosen "
    "deliberately: sqrt is IEEE-correctly-rounded in BOTH engines, so "
    "floor(sqrt(n)) is cross-engine deterministic where a pow(n, 0.7) "
    "would hash-diverge in the last ulp; every weight is then pure "
    "integer arithmetic (ppm via integer division over integer sums, "
    "which are order-free where float sums are not). One partial-agg "
    "groupBy plus a broadcast two-scalar total — the report is "
    "|sources| rows at any corpus size",
)
def corpus_temperature_mix(spark, sf_dir):
    d = load(spark, sf_dir, "documents").select(
        "source", F.size(F.split("text", " ")).alias("n_toks")
    )
    s = (
        d.groupBy("source")
        .agg(F.sum("n_toks").cast("long").alias("n_tokens"))
        .withColumn(
            "isq",
            F.floor(F.sqrt(F.col("n_tokens").cast("double"))).cast("long"),
        )
    )
    t = s.agg(
        F.sum("n_tokens").alias("total"), F.sum("isq").alias("total_isq")
    )
    return s.crossJoin(F.broadcast(t)).select(
        "source",
        "n_tokens",
        F.expr("n_tokens * 1000000 DIV total")
        .cast("long")
        .alias("proportional_ppm"),
        F.expr("isq * 1000000 DIV total_isq")
        .cast("long")
        .alias("temperature_ppm"),
    )


@query(
    "text_code_detect",
    oracle="""
        WITH c AS (
            SELECT doc_id,
                   CAST(length(text) AS BIGINT) AS n_chars,
                   CAST(length(text) - length(replace(text, '{', ''))
                        + length(text) - length(replace(text, '}', ''))
                        AS BIGINT) AS n_braces,
                   CAST(length(text) - length(replace(text, ';', ''))
                        AS BIGINT) AS n_semis,
                   CAST(length(text) - length(replace(text, '=', ''))
                        AS BIGINT) AS n_eq,
                   CAST(length(text) - length(replace(text, '(', ''))
                        AS BIGINT) AS n_paren
            FROM documents
        )
        SELECT doc_id, n_chars, n_braces, n_semis,
               CAST((n_braces * 4 + n_semis * 3 + n_eq * 2 + n_paren)
                    * 1000000 // greatest(n_chars, 1) AS BIGINT)
                   AS code_score_ppm,
               (n_braces * 4 + n_semis * 3 + n_eq * 2 + n_paren)
                   * 1000000 // greatest(n_chars, 1) >= 20000 AS is_code
        FROM c
    """,
    description="code-vs-prose detection per document (training corpora "
    "route code and prose to different tokenization/mixing policies, so "
    "the classifier must run corpus-wide): weighted density of "
    "syntax-punctuation signals — braces, semicolons, assignment, "
    "parens — in exact ppm via occurrence counts from length deltas "
    "(length minus length-after-replace, identical primitive in both "
    "engines; no regex engine semantics to diverge on). Pure "
    "whole-stage-codegen string expressions over one scan, no shuffle "
    "at all; the 2% threshold flags code-like docs for routing",
)
def text_code_detect(spark, sf_dir):
    t = F.col("text")

    def occ(ch):
        return (
            F.length(t) - F.length(F.replace(t, F.lit(ch), F.lit("")))
        ).cast("long")

    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.length(t).cast("long").alias("n_chars"),
        (occ("{") + occ("}")).alias("n_braces"),
        occ(";").alias("n_semis"),
        occ("=").alias("n_eq"),
        occ("(").alias("n_paren"),
    )
    return d.select(
        "doc_id",
        "n_chars",
        "n_braces",
        "n_semis",
        F.expr(
            "(n_braces * 4 + n_semis * 3 + n_eq * 2 + n_paren) "
            "* 1000000 DIV greatest(n_chars, 1)"
        )
        .cast("long")
        .alias("code_score_ppm"),
        (
            F.expr(
                "(n_braces * 4 + n_semis * 3 + n_eq * 2 + n_paren) "
                "* 1000000 DIV greatest(n_chars, 1)"
            )
            >= 20000
        ).alias("is_code"),
    )
