"""Retrieval-pipeline operators beyond single-ranker BM25: hybrid rank
fusion, corpus n-gram statistics, unigram-LM document scoring, and
training-shard manifests.

These are the remaining pieces of a retrieval / data-curation loop over a
large corpus: score documents two ways and fuse the rankings (RRF — the
standard hybrid-search combiner), report the corpus's dominant n-grams,
score every document under a corpus-derived unigram language model (the
cheap stand-in for "perplexity filtering"), and emit the shard manifest a
training job reads.

Scale discipline: every ranker reduces to TakeOrderedAndProject top-k
(never a global sort), fused lists are tiny and joined broadcast, the LM
vocabulary is a broadcast top-V table, and all scores land in integer
nano-units so both engines hash identically.

No reference counterpart (net-new LLM-pipeline surface per SURVEY.md §2
Tier C / BASELINE.json north star).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hls_payer_mrf_sparkstreaming_spark.functions.hashing import (
    md5u60,
    md5u60_sql,
)
from hls_payer_mrf_sparkstreaming_spark.operators.suite import (
    load,
    query,
    scratch_persist,
)

_TERMS = ["spark", "window", "merge"]
_K1 = 1.2
_B = 0.75
_NANO = 1_000_000_000
_RRF_K = 60  # standard reciprocal-rank-fusion damping constant
_FUSE_DEPTH = 50  # per-ranker candidate depth fed into fusion
_VOCAB_V = 256  # unigram-LM vocabulary size
_N_SHARDS = 64


# expression TEXT builders (r13: the loop-built Column trees cost hundreds
# of py4j round trips per query construction — ndcg_eval build 2.39 s vs
# 0.61 s after, interleaved A/B). The parsed trees carry the identical
# functions and literals (Python-float repr + D suffix); the only plan-text
# deltas are parser lambda-variable names and `1.0 + x` vs the Column
# __radd__'s `x + 1.0` (IEEE addition commutes, so doubles are bit-equal —
# full-result hashes verified identical on sf0.1, oracle green)
_TOKS_EXPR = "split(text, ' ')"


def _tf_exprs(terms):
    return [
        "doc_id",
        f"CAST(size({_TOKS_EXPR}) AS BIGINT) AS dl",
        *[
            f"CAST(size(filter({_TOKS_EXPR}, x -> x = '{w}')) AS BIGINT)"
            f" AS tf{i}"
            for i, w in enumerate(terms)
        ],
    ]


def _g_exprs(terms):
    return [
        "count(*) AS n_docs",
        "sum(dl) AS total_len",
        *[
            f"sum(CAST((tf{i} > 0) AS BIGINT)) AS df{i}"
            for i in range(len(terms))
        ],
    ]


_AVGLEN_EXPR = "(CAST(total_len AS DOUBLE) / n_docs)"


def _term_stats(spark, sf_dir):
    """One scan of documents -> (doc_id, dl, tf0..tfN) plus the broadcast
    corpus-stats row (n_docs, total_len, df0..dfN). Shared by both rankers
    so the hybrid query reads the corpus exactly once."""
    tf = load(spark, sf_dir, "documents").selectExpr(*_tf_exprs(_TERMS))
    g = tf.agg(*[F.expr(e) for e in _g_exprs(_TERMS)])
    return tf, g


def _bm25_nano(terms=None):
    """BM25 score expression TEXT over a _term_stats row, in fixed term
    order; same association order as the original Column fold (each
    Python-computed float constant — k1+1, 1-b — lands as one double
    literal, exactly as the Column version's Literals did)."""
    terms = _TERMS if terms is None else terms
    return (
        "CAST(floor(("
        + " + ".join(
            f"(ln(1 + ((CAST(n_docs AS DOUBLE) - CAST(df{i} AS DOUBLE))"
            f" + 0.5D) / (CAST(df{i} AS DOUBLE) + 0.5D))"
            f" * (CAST(tf{i} AS DOUBLE) * {_K1 + 1!r}D))"
            f" / (CAST(tf{i} AS DOUBLE) + {_K1!r}D"
            f" * ({1 - _B!r}D + ({_B!r}D * CAST(dl AS DOUBLE))"
            f" / {_AVGLEN_EXPR}))"
            for i in range(len(terms))
        )
        + f") * {_NANO}) AS BIGINT)"
    )


def _tfidf_nano():
    """Length-normalized TF-IDF score expression TEXT over a _term_stats
    row — a deliberately different ranker shape from BM25 (no
    saturation), so the fused list is a genuine hybrid."""
    return (
        "CAST(floor(("
        + " + ".join(
            f"((CAST(tf{i} AS DOUBLE) / CAST(dl AS DOUBLE))"
            f" * ln(CAST(n_docs AS DOUBLE) / (1 + CAST(df{i} AS DOUBLE))))"
            for i in range(len(_TERMS))
        )
        + f") * {_NANO}) AS BIGINT)"
    )


def _sql_tf_cte():
    tf_cols = ", ".join(
        f"CAST(len(list_filter(t, x -> x = '{w}')) AS BIGINT) AS tf{i}"
        for i, w in enumerate(_TERMS)
    )
    df_cols = ", ".join(
        f"CAST(sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS df{i}"
        for i in range(len(_TERMS))
    )
    return f"""
        d AS (
            SELECT doc_id, string_split(text, ' ') AS t FROM documents
        ),
        tf AS (
            SELECT doc_id, CAST(len(t) AS BIGINT) AS dl, {tf_cols} FROM d
        ),
        g AS (
            SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(dl) AS BIGINT) AS total_len, {df_cols}
            FROM tf
        )
    """


def _sql_bm25_nano():
    return f"""CAST(floor(({" + ".join(
        f"(ln(1 + (CAST(n_docs AS DOUBLE) - df{i} + 0.5)"
        f" / (CAST(df{i} AS DOUBLE) + 0.5))"
        f" * (CAST(tf{i} AS DOUBLE) * {_K1 + 1})"
        f" / (CAST(tf{i} AS DOUBLE) + {_K1}"
        f" * (1 - {_B} + {_B} * CAST(dl AS DOUBLE)"
        f" / (CAST(total_len AS DOUBLE) / n_docs))))"
        for i in range(len(_TERMS)))})
        * {_NANO}) AS BIGINT)"""


def _sql_tfidf_nano():
    return f"""CAST(floor(({" + ".join(
        f"(CAST(tf{i} AS DOUBLE) / CAST(dl AS DOUBLE)"
        f" * ln(CAST(n_docs AS DOUBLE) / (1 + df{i})))"
        for i in range(len(_TERMS)))})
        * {_NANO}) AS BIGINT)"""


@query(
    "rank_fusion_rrf",
    oracle=f"""
        WITH {_sql_tf_cte()},
        scored AS (
            SELECT doc_id, {_sql_bm25_nano()} AS bm25_nano,
                   {_sql_tfidf_nano()} AS tfidf_nano
            FROM tf CROSS JOIN g
        ),
        ra AS (
            SELECT doc_id, row_number() OVER (
                       ORDER BY bm25_nano DESC, doc_id) AS rnk
            FROM scored ORDER BY bm25_nano DESC, doc_id LIMIT {_FUSE_DEPTH}
        ),
        rb AS (
            SELECT doc_id, row_number() OVER (
                       ORDER BY tfidf_nano DESC, doc_id) AS rnk
            FROM scored ORDER BY tfidf_nano DESC, doc_id LIMIT {_FUSE_DEPTH}
        )
        SELECT coalesce(ra.doc_id, rb.doc_id) AS doc_id,
               CAST(coalesce(CAST(floor({_NANO} / ({_RRF_K} + ra.rnk))
                                  AS BIGINT), 0)
                    + coalesce(CAST(floor({_NANO} / ({_RRF_K} + rb.rnk))
                                    AS BIGINT), 0) AS BIGINT) AS rrf_nano
        FROM ra FULL OUTER JOIN rb ON ra.doc_id = rb.doc_id
        ORDER BY rrf_nano DESC, doc_id
        LIMIT 20
    """,
    description="hybrid retrieval via reciprocal rank fusion: BM25 and "
    "length-normalized TF-IDF rankers share ONE corpus scan (tf table + "
    "broadcast stats row computed once), each ranker's top-50 comes from "
    "TakeOrderedAndProject (never a global sort), and fusion is a "
    f"full-outer join of two 50-row lists scoring 1e9/({_RRF_K}+rank) per "
    "list in integer nano-units. At 100 TB only the two top-k reductions "
    "touch the corpus; fusion cost is constant",
)
def rank_fusion_rrf(spark, sf_dir):
    tf, g = _term_stats(spark, sf_dir)
    scored = tf.crossJoin(F.broadcast(g)).selectExpr(
        "doc_id",
        f"{_bm25_nano()} AS bm25_nano",
        f"{_tfidf_nano()} AS tfidf_nano",
    )
    # compute both scores in one pass over the corpus, then reduce twice
    scored = scratch_persist(scored)

    def top_ranked(col):
        # orderBy+limit -> TakeOrderedAndProject; the row_number window
        # then runs on the collected 50-row list (single tiny partition)
        top = scored.orderBy(F.desc(col), "doc_id").limit(_FUSE_DEPTH)
        from pyspark.sql.window import Window

        w = Window.orderBy(F.desc(col), "doc_id")
        return top.select(
            "doc_id", F.row_number().over(w).alias("rnk")
        )

    ra = top_ranked("bm25_nano").alias("ra")
    rb = top_ranked("tfidf_nano").alias("rb")
    return (
        ra.join(rb, F.col("ra.doc_id") == F.col("rb.doc_id"), "full_outer")
        .selectExpr(
            "coalesce(ra.doc_id, rb.doc_id) AS doc_id",
            f"CAST(coalesce(CAST(floor({_NANO} / ({_RRF_K} + ra.rnk))"
            f" AS BIGINT), CAST(0 AS BIGINT))"
            f" + coalesce(CAST(floor({_NANO} / ({_RRF_K} + rb.rnk))"
            f" AS BIGINT), CAST(0 AS BIGINT)) AS BIGINT) AS rrf_nano",
        )
        .orderBy(F.desc("rrf_nano"), "doc_id")
        .limit(20)
    )


@query(
    "ngram_counts",
    oracle="""
        WITH t AS (
            SELECT string_split(text, ' ') AS toks FROM documents
            WHERE len(string_split(text, ' ')) >= 3
        ),
        grams AS (
            SELECT unnest(list_transform(
                       range(1, len(toks) - 1),
                       i -> array_to_string(list_slice(toks, i, i + 2), ' ')
                   )) AS gram
            FROM t
        )
        SELECT gram, CAST(count(*) AS BIGINT) AS n
        FROM grams GROUP BY gram
        ORDER BY n DESC, gram
        LIMIT 50
    """,
    description="corpus-level top-50 3-gram frequency table (the n-gram "
    "statistics a contamination check or LM-smoothing table is built "
    "from): shingles assembled per row with transform over sequence "
    "(codegen, no shuffle), counted with one partially-aggregated "
    "groupBy, top-k via TakeOrderedAndProject — output size is constant "
    "regardless of corpus size",
)
def ngram_counts(spark, sf_dir):
    toks = F.split("text", " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.size("toks") - 2),
        lambda i: F.concat_ws(" ", F.slice(F.col("toks"), i, 3)),
    )
    return (
        load(spark, sf_dir, "documents")
        .select(toks.alias("toks"))
        .filter(F.size("toks") >= 3)
        .select(F.explode(grams).alias("gram"))
        .groupBy("gram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "gram")
        .limit(50)
    )


@query(
    "unigram_logprob_score",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents
        ),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS total FROM t),
        v AS (
            SELECT tok, CAST(count(*) AS BIGINT) AS cnt
            FROM t GROUP BY tok
            ORDER BY cnt DESC, tok LIMIT {_VOCAB_V}
        ),
        vl AS (
            SELECT tok,
                   CAST(floor(ln(CAST(cnt AS DOUBLE) / total) * {_NANO})
                        AS BIGINT) AS lp
            FROM v CROSS JOIN tot
        ),
        s AS (
            SELECT t.doc_id,
                   coalesce(vl.lp,
                            CAST(floor(ln(0.5 / total) * {_NANO})
                                 AS BIGINT)) AS lp
            FROM t CROSS JOIN tot LEFT JOIN vl ON t.tok = vl.tok
        )
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(sum(lp) AS BIGINT) AS sum_logprob_nano,
               CAST(floor(CAST(sum(lp) AS DOUBLE) / count(*)) AS BIGINT)
                   AS avg_logprob_nano
        FROM s GROUP BY doc_id
    """,
    description="unigram language-model scoring — the cheap stand-in for "
    "perplexity-based quality filtering: the LM is the corpus's own "
    f"top-{_VOCAB_V} token distribution (one partially-aggregated count "
    "+ TakeOrderedAndProject), per-token log-probs are FLOORED INTO "
    "INTEGER NANO-UNITS inside the vocabulary table so per-document sums "
    "are exact integers under any execution order; out-of-vocabulary "
    "tokens get the fixed ln(0.5/total) floor. Documents join the "
    "vocabulary BROADCAST (a 256-row dim) — at 100 TB the only wide ops "
    "are the vocab count and the per-doc re-aggregation",
)
def unigram_logprob_score(spark, sf_dir):
    # r13 (the text_bigram_logprob discipline): the raw (doc_id, tok)
    # stream is corpus-sized — persisting it materialized the whole
    # token explosion just to serve three consumers. The vocab count and
    # the scoring pass each recompute the explode from the columnar scan
    # instead (cheap, codegen), and the token total comes from the
    # pre-explode relation, so nothing corpus-sized is ever cached.
    docs = load(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    tot = docs.agg(
        F.coalesce(F.sum(F.size(F.split("text", " "))), F.lit(0))
        .cast("long")
        .alias("total")
    )
    v = (
        t.groupBy("tok")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "tok")
        .limit(_VOCAB_V)
    )
    vl = v.crossJoin(F.broadcast(tot)).select(
        "tok",
        F.floor(
            F.log(F.col("cnt").cast("double") / F.col("total")) * _NANO
        )
        .cast("long")
        .alias("lp"),
    )
    oov = F.floor(F.log(0.5 / F.col("total")) * _NANO).cast("long")
    s = (
        t.crossJoin(F.broadcast(tot))
        .join(F.broadcast(vl), "tok", "left")
        .select("doc_id", F.coalesce(F.col("lp"), oov).alias("lp"))
    )
    return s.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum("lp").cast("long").alias("sum_logprob_nano"),
        F.floor(F.sum("lp").cast("double") / F.count("*"))
        .cast("long")
        .alias("avg_logprob_nano"),
    )


@query(
    "shard_manifest",
    oracle=f"""
        SELECT ({md5u60_sql("CAST(doc_id AS VARCHAR)")}) % {_N_SHARDS}
                   AS shard,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(strlen(text)) AS BIGINT) AS n_bytes,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                   AS n_tokens,
               CAST(min(doc_id) AS BIGINT) AS min_doc_id,
               CAST(max(doc_id) AS BIGINT) AS max_doc_id
        FROM documents
        GROUP BY 1
    """,
    description=f"training-shard manifest: every document lands in one of "
    f"{_N_SHARDS} shards by the cross-engine md5-60 hash of its id "
    "(deterministic, rebalance-stable), and the manifest row per shard "
    "carries doc/byte/token totals plus the id range — what a training "
    "loader consumes to plan epochs. One partially-aggregated groupBy "
    "over a scan; the hash gate means adding files never reshuffles "
    "existing shard membership",
)
def shard_manifest(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return (
        d.select(
            F.pmod(
                md5u60(F.col("doc_id").cast("string")), F.lit(_N_SHARDS)
            ).alias("shard"),
            F.octet_length("text").alias("nb"),
            F.size(F.split("text", " ")).alias("nt"),
            "doc_id",
        )
        .groupBy("shard")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("nb").cast("long").alias("n_bytes"),
            F.sum("nt").cast("long").alias("n_tokens"),
            F.min("doc_id").cast("long").alias("min_doc_id"),
            F.max("doc_id").cast("long").alias("max_doc_id"),
        )
    )


# ---------------------------------------------------------------------------
# Bigram conditional language model — one step up from the unigram scorer:
# p(w2 | w1) = c(w1 w2) / c(w1) over the corpus's own top-V vocabulary.
# The standard cheap perplexity proxy for fluency filtering (a doc of real
# sentences scores far above shuffled or boilerplate text even when its
# unigram mix is identical).
# ---------------------------------------------------------------------------

_BI_V = 256  # bigram-LM vocabulary (shared with the unigram scorer's scale)


@query(
    "text_bigram_logprob",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS l
            FROM documents
            WHERE len(string_split(text, ' ')) >= 2
        ),
        pairs AS (
            SELECT doc_id, bg.w1 AS w1, bg.w2 AS w2
            FROM (
                SELECT doc_id,
                       unnest(list_transform(range(1, len(l)),
                              i -> struct_pack(w1 := l[i],
                                               w2 := l[i + 1]))) AS bg
                FROM toks
            )
        ),
        uni AS (
            SELECT tok, CAST(count(*) AS BIGINT) AS c1
            FROM (SELECT unnest(l) AS tok FROM toks)
            GROUP BY tok ORDER BY c1 DESC, tok LIMIT {_BI_V}
        ),
        big AS (
            SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2
            FROM pairs GROUP BY w1, w2
        ),
        lm AS (
            SELECT b.w1, b.w2,
                   CAST(floor(ln(CAST(b.c2 AS DOUBLE) / u1.c1) * {_NANO})
                        AS BIGINT) AS lp
            FROM big b
            JOIN uni u1 ON b.w1 = u1.tok
            JOIN uni u2 ON b.w2 = u2.tok
        ),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS total FROM pairs),
        s AS (
            SELECT p.doc_id,
                   coalesce(lm.lp,
                            CAST(floor(ln(0.5 / total) * {_NANO})
                                 AS BIGINT)) AS lp
            FROM pairs p CROSS JOIN tot
            LEFT JOIN lm ON p.w1 = lm.w1 AND p.w2 = lm.w2
        )
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_bigrams,
               CAST(sum(lp) AS BIGINT) AS sum_logprob_nano,
               CAST(floor(CAST(sum(lp) AS DOUBLE) / count(*)) AS BIGINT)
                   AS avg_logprob_nano
        FROM s GROUP BY doc_id
    """,
    description="bigram conditional-LM scoring p(w2|w1) = c(w1w2)/c(w1) "
    f"over the corpus's own top-{_BI_V} vocabulary — the next step past "
    "unigram_logprob_score toward perplexity-based fluency filtering "
    "(word ORDER now matters). Per-bigram log-probs are floored into "
    "integer nano-units inside the LM table so per-document sums are "
    "exact under any execution order; out-of-vocab or unseen bigrams get "
    "the fixed ln(0.5/total) floor. The LM table is bounded by V^2 and "
    "joins the bigram stream BROADCAST; at 100 TB the only wide ops are "
    "the two count aggregations and the per-doc re-aggregation — "
    "documents never shuffle",
)
def text_bigram_logprob(spark, sf_dir):
    toks = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("toks"))
        .filter(F.size("toks") >= 2)
    )
    pairs = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1), "
                "i -> struct(element_at(toks, i) AS w1, "
                "element_at(toks, i + 1) AS w2))"
            )
        ).alias("bg"),
    ).select("doc_id", "bg.w1", "bg.w2")
    # persisted: BOTH broadcast sides of the LM join (w1 counts, w2
    # membership) read the top-V vocabulary, and without materialization
    # each broadcast build re-ran the corpus token count + TakeOrdered
    uni = scratch_persist(
        toks.select(F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").cast("long").alias("c1"))
        .orderBy(F.desc("c1"), "tok")
        .limit(_BI_V)
    )
    big = pairs.groupBy("w1", "w2").agg(
        F.count("*").cast("long").alias("c2")
    )
    u1 = uni.select(F.col("tok").alias("w1"), "c1")
    u2 = uni.select(F.col("tok").alias("w2"))
    lm = (
        big.join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .select(
            "w1",
            "w2",
            F.floor(
                F.log(F.col("c2").cast("double") / F.col("c1")) * _NANO
            )
            .cast("long")
            .alias("lp"),
        )
    )
    # pair count == sum(size - 1) over the kept docs: computable from the
    # pre-explode relation, so the total no longer re-runs the bigram
    # explode (one corpus pass fewer)
    tot = toks.agg(
        F.sum(F.size("toks") - 1).cast("long").alias("total")
    )
    oov = F.floor(F.log(0.5 / F.col("total")) * _NANO).cast("long")
    s = (
        pairs.crossJoin(F.broadcast(tot))
        .join(F.broadcast(lm), ["w1", "w2"], "left")
        .select("doc_id", F.coalesce(F.col("lp"), oov).alias("lp"))
    )
    return s.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.sum("lp").cast("long").alias("sum_logprob_nano"),
        F.floor(F.sum("lp").cast("double") / F.count("*"))
        .cast("long")
        .alias("avg_logprob_nano"),
    )


# ---------------------------------------------------------------------------
# Ranking quality: NDCG@k of the BM25 ranking against a graded relevance
# ---------------------------------------------------------------------------

_NDCG_K = 20

# per-rank discounted gain, identical text both engines: graded gain
# (2^rel - 1) over the standard log2(rank+1) discount, floored to nano so
# the DCG sums are exact longs
_DCG_TERM = (
    f"CAST(floor((pow(2, rel) - 1) / (ln(rnk + 1) / ln(2)) * {_NANO})"
    f" AS BIGINT)"
)


@query(
    "ndcg_eval",
    oracle=f"""
        WITH {_sql_tf_cte()},
        s AS (
            SELECT doc_id, {_sql_bm25_nano()} AS score_nano,
                   CAST((CASE WHEN tf0 > 0 THEN 1 ELSE 0 END)
                        + (CASE WHEN tf1 > 0 THEN 1 ELSE 0 END)
                        + (CASE WHEN tf2 > 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS rel
            FROM tf CROSS JOIN g
        ),
        top AS (
            SELECT rel, row_number() OVER (
                       ORDER BY score_nano DESC, doc_id) AS rnk
            FROM s ORDER BY score_nano DESC, doc_id LIMIT {_NDCG_K}
        ),
        ideal AS (
            SELECT rel, row_number() OVER (ORDER BY rel DESC, doc_id)
                       AS rnk
            FROM s ORDER BY rel DESC, doc_id LIMIT {_NDCG_K}
        ),
        dcg AS (SELECT CAST(sum({_DCG_TERM}) AS BIGINT) AS dcg_nano
                FROM top),
        idcg AS (SELECT CAST(sum({_DCG_TERM}) AS BIGINT) AS idcg_nano
                 FROM ideal)
        SELECT {_NDCG_K} AS k, dcg_nano, idcg_nano,
               CASE WHEN idcg_nano = 0 THEN NULL ELSE
                   CAST(floor(CAST(dcg_nano AS DOUBLE) / idcg_nano
                              * {_NANO}) AS BIGINT) END AS ndcg_nano
        FROM dcg CROSS JOIN idcg
    """,
    description="NDCG@{k} of the BM25 ranking against a graded relevance "
    "proxy (count of query terms present, 0-3) — the standard "
    "ranking-quality gate for retrieval pipelines and RAG index "
    "regression tests. Both the system top-{k} and the ideal ordering "
    "come from TakeOrderedAndProject with deterministic (key, doc_id) "
    "tiebreaks; each rank's discounted gain is floored to nano units so "
    "DCG/IDCG are exact long sums, and the corpus is scanned once "
    "(shared _term_stats scan with bm25_search). Swap the proxy for "
    "human judgments or click models and the plan is unchanged".replace(
        "{k}", str(_NDCG_K)
    ),
)
def ndcg_eval(spark, sf_dir):
    tf, g = _term_stats(spark, sf_dir)
    rel = " + ".join(
        f"CAST((tf{i} > 0) AS BIGINT)" for i in range(len(_TERMS))
    )
    s = tf.crossJoin(F.broadcast(g)).selectExpr(
        "doc_id",
        f"{_bm25_nano()} AS score_nano",
        f"({rel}) AS rel",
    # the DCG and IDCG branches both rank this scored relation; persist
    # it (as precision_recall_at_k does) or the corpus/term-stats scan
    # executes twice
    ).transform(scratch_persist)
    from pyspark.sql import Window

    def dcg_sum(ranked, order_cols):
        top = ranked.orderBy(*order_cols).limit(_NDCG_K)
        rnk = top.select(
            "rel",
            F.row_number().over(Window.orderBy(*order_cols)).alias("rnk"),
        )
        return rnk.agg(
            F.sum(F.expr(_DCG_TERM)).cast("long")
        )

    dcg = dcg_sum(s, [F.desc("score_nano"), F.asc("doc_id")]).toDF(
        "dcg_nano"
    )
    idcg = dcg_sum(s, [F.desc("rel"), F.asc("doc_id")]).toDF("idcg_nano")
    return dcg.crossJoin(idcg).select(
        F.lit(_NDCG_K).alias("k"),
        "dcg_nano",
        "idcg_nano",
        F.expr(
            f"CASE WHEN idcg_nano = 0 THEN NULL ELSE "
            f"CAST(floor(CAST(dcg_nano AS DOUBLE) / idcg_nano * {_NANO})"
            f" AS BIGINT) END"
        ).alias("ndcg_nano"),
    )


_PRK_K = 20

# AP@K per-rank term: precision-at-i at each relevant rank, floored to
# nano so the <=K-term sum is an exact long (identical text both engines)
_AP_TERM = (
    "CASE WHEN rel = 1 THEN CAST(floor(CAST(cum_rel AS DOUBLE) / rnk "
    "* 1000000000) AS BIGINT) ELSE 0 END"
)


@query(
    "precision_recall_at_k",
    oracle=f"""
        WITH {_sql_tf_cte()},
        s AS (
            SELECT doc_id, {_sql_bm25_nano()} AS score_nano,
                   CASE WHEN tf0 > 0 AND tf1 > 0 AND tf2 > 0
                        THEN 1 ELSE 0 END AS rel
            FROM tf CROSS JOIN g
        ),
        r AS (SELECT CAST(sum(rel) AS BIGINT) AS n_relevant FROM s),
        top AS (
            SELECT rel, row_number() OVER (
                       ORDER BY score_nano DESC, doc_id) AS rnk
            FROM s ORDER BY score_nano DESC, doc_id LIMIT {_PRK_K}
        ),
        cum AS (
            SELECT rel, rnk,
                   CAST(sum(rel) OVER (ORDER BY rnk) AS BIGINT) AS cum_rel
            FROM top
        ),
        a AS (
            SELECT CAST(sum(rel) AS BIGINT) AS hits,
                   CAST(min(CASE WHEN rel = 1 THEN rnk END) AS BIGINT)
                       AS first_rel,
                   CAST(sum({_AP_TERM}) AS BIGINT) AS ap_terms
            FROM cum
        )
        SELECT {_PRK_K} AS k, n_relevant, hits,
               CAST(floor(CAST(hits AS DOUBLE) / {_PRK_K} * 1000000000)
                    AS BIGINT) AS precision_nano,
               CASE WHEN n_relevant = 0 THEN NULL ELSE
                   CAST(floor(CAST(hits AS DOUBLE) / n_relevant
                              * 1000000000) AS BIGINT) END AS recall_nano,
               CASE WHEN first_rel IS NULL THEN 0 ELSE
                   CAST(floor(1000000000.0 / first_rel) AS BIGINT) END
                   AS mrr_nano,
               CASE WHEN n_relevant = 0 THEN NULL ELSE
                   CAST(floor(CAST(ap_terms AS DOUBLE)
                              / least(n_relevant, {_PRK_K})) AS BIGINT)
                   END AS ap_nano
        FROM a CROSS JOIN r
    """,
    description=f"precision@{_PRK_K} / recall@{_PRK_K} / MRR / AP@{_PRK_K} "
    "of the BM25 ranking against binary relevance (doc contains all query "
    "terms) — the set-retrieval quality gates that complete ndcg_eval's "
    "graded view; the regression suite every RAG index change runs. The "
    "ranked list is TakeOrderedAndProject top-K with deterministic "
    "(score, doc_id) tiebreaks (never a global sort); per-rank "
    "precision terms are floored to nano so the AP sum is an exact long; "
    "the relevant-total is one map-side-combinable scan sharing "
    "_term_stats with bm25_search. Window functions touch only the "
    f"{_PRK_K}-row top list",
)
def precision_recall_at_k(spark, sf_dir):
    from pyspark.sql import Window

    tf, g = _term_stats(spark, sf_dir)
    # persisted: both the relevant-total and the top-K branch read the
    # scored relation, so the corpus is scanned once, not twice per branch
    s = (
        tf.crossJoin(F.broadcast(g))
        .selectExpr(
            "doc_id",
            f"{_bm25_nano()} AS score_nano",
            "CAST(((tf0 > 0) AND (tf1 > 0)) AND (tf2 > 0) AS INT) AS rel",
        )
        .transform(scratch_persist)
    )
    r = s.agg(F.expr("CAST(sum(rel) AS BIGINT) AS n_relevant"))
    order = [F.desc("score_nano"), F.asc("doc_id")]
    top = s.orderBy(*order).limit(_PRK_K)
    cum = top.select(
        "rel",
        F.row_number().over(Window.orderBy(*order)).alias("rnk"),
    ).selectExpr(
        "rel",
        "rnk",
        "CAST(sum(rel) OVER (ORDER BY rnk) AS BIGINT) AS cum_rel",
    )
    a = cum.agg(
        F.expr("CAST(sum(rel) AS BIGINT) AS hits"),
        F.expr(
            "CAST(min(CASE WHEN rel = 1 THEN rnk END) AS BIGINT)"
            " AS first_rel"
        ),
        F.expr(f"CAST(sum({_AP_TERM}) AS BIGINT) AS ap_terms"),
    )
    return a.crossJoin(F.broadcast(r)).select(
        F.lit(_PRK_K).alias("k"),
        "n_relevant",
        "hits",
        F.expr(
            f"CAST(floor(CAST(hits AS DOUBLE) / {_PRK_K} * 1000000000)"
            " AS BIGINT)"
        ).alias("precision_nano"),
        F.expr(
            "CASE WHEN n_relevant = 0 THEN NULL ELSE "
            "CAST(floor(CAST(hits AS DOUBLE) / n_relevant * 1000000000)"
            " AS BIGINT) END"
        ).alias("recall_nano"),
        F.expr(
            "CASE WHEN first_rel IS NULL THEN 0 ELSE "
            "CAST(floor(1000000000.0 / first_rel) AS BIGINT) END"
        ).alias("mrr_nano"),
        F.expr(
            "CASE WHEN n_relevant = 0 THEN NULL ELSE "
            "CAST(floor(CAST(ap_terms AS DOUBLE)"
            f" / least(n_relevant, {_PRK_K})) AS BIGINT) END"
        ).alias("ap_nano"),
    )
