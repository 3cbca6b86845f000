"""Text-analysis operators for a large-scale training-data pipeline,
over the ``documents(doc_id, text, lang, source, n_chars)`` table.

All of these are pure column expressions (whole-stage codegen, no
Python in the hot path) so they run at scan speed and Catalyst pushes
the projection into the parquet read.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: small multilingual stopword sets for the n-gram language heuristic
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "que", "de", "los"],
}

_EN_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by",
]

#: BPE-ish tokenizer: words, numbers, or single non-space symbols
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"


def token_count(text: Column) -> Column:
    """Whitespace token count and a BPE-ish regex token count."""
    ws = F.size(F.split(F.trim(text), r"\s+"))
    bpe = F.size(F.regexp_extract_all(text, F.lit(TOKEN_REGEX), 0))
    return F.struct(ws.alias("ws_tokens"), bpe.alias("bpe_tokens"))


def quality_score(text: Column) -> Column:
    """Heuristic document quality in [0, 1]:
    mean of (length score, alpha ratio, stopword presence, low punct).
    Deterministic and SQL-expressible (mirrored in oracle SQL).
    """
    n = F.length(text)
    alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    punct = F.length(F.regexp_replace(text, r"[^!-/:-@\[-`{-~]", ""))
    words = F.size(F.split(F.lower(F.trim(text)), r"\s+"))
    stop_hits = sum(
        (
            F.when(
                F.array_contains(F.split(F.lower(text), r"\s+"), w), F.lit(1)
            ).otherwise(F.lit(0))
        )
        for w in _EN_STOPWORDS[:8]
    )
    len_score = F.least(n / F.lit(500.0), F.lit(1.0))
    alpha_ratio = alpha / F.greatest(n, F.lit(1))
    stop_score = F.least(stop_hits / F.lit(4.0), F.lit(1.0))
    punct_penalty = F.lit(1.0) - F.least(
        punct / F.greatest(words, F.lit(1)), F.lit(1.0)
    )
    return (len_score + alpha_ratio + stop_score + punct_penalty) / F.lit(4.0)


def detect_language(text: Column) -> Column:
    """Marker-word language heuristic: argmax over per-language marker
    hit counts; 'und' (undetermined) when nothing matches."""
    toks = F.split(F.lower(text), r"\s+")
    scores = []
    for lang, markers in _LANG_MARKERS.items():
        hits = sum(
            F.when(F.array_contains(toks, m), F.lit(1)).otherwise(F.lit(0))
            for m in markers
        )
        scores.append(F.struct(hits.cast("int").alias("hits"), F.lit(lang).alias("lang")))
    best = F.greatest(*scores)
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def repetition_ratio(text: Column, n: int = 3) -> Column:
    """Repeated-n-gram fraction: 1 - distinct(n-grams)/total(n-grams)
    over whitespace tokens — the standard boilerplate/spam signal for
    training-data filtering (near-0 for prose, → 1 for looped text).
    Documents shorter than n tokens score 0. Pure column expressions
    (two array ops over one split), scan-speed."""
    toks = F.split(F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "), " ")
    count = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(count, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.when(count <= 0, F.lit(0.0)).otherwise(
        F.lit(1.0) - F.size(F.array_distinct(grams)) / count
    )


#: PII patterns scrubbed before training: emails, international-ish
#: phone numbers, IPv4s. Deliberately conservative/high-precision —
#: the standard first-pass redaction for web corpora.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?\d{1,3}[-. ]?\(?\d{2,4}\)?[-. ]?\d{3,4}[-. ]?\d{3,4}",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
}


def scrub_pii(text: Column) -> Column:
    """Redact PII spans to ``<TYPE>`` tokens, returning a struct
    (clean TEXT, n_email, n_phone, n_ipv4). Counts come from
    regexp_count before replacement; everything is JVM regex at scan
    speed (order matters: emails first so phone/ip patterns can't eat
    their digits)."""
    counts = {
        k: F.size(F.regexp_extract_all(text, F.lit(p), 0))
        for k, p in PII_PATTERNS.items()
    }
    clean = text
    for k, p in PII_PATTERNS.items():
        clean = F.regexp_replace(clean, p, f"<{k.upper()}>")
    return F.struct(
        clean.alias("clean"),
        counts["email"].alias("n_email"),
        counts["phone"].alias("n_phone"),
        counts["ipv4"].alias("n_ipv4"),
    )


def fingerprint_documents(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit content fingerprint per document: xxhash64 of the
    whitespace-normalized lowercased text (stable across partitioning),
    plus the sha256 hex for exact-dup auditing."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    return docs.withColumn("fingerprint", F.xxhash64(norm)).withColumn(
        "content_sha256", F.sha2(norm, 256)
    )


def analyze_documents(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass text-analysis projection used by the entry queries.

    token_count is evaluated once as a struct and expanded in a second
    projection (CollapseProject keeps non-cheap multiply-referenced
    expressions un-inlined, so the regexp tokenization runs once per
    row, not once per selected field)."""
    t = F.col(text_col)
    staged = docs.select(
        "doc_id",
        token_count(t).alias("_tc"),
        F.round(quality_score(t), 6).alias("quality"),
        detect_language(t).alias("lang_guess"),
    )
    return staged.select(
        "doc_id",
        F.col("_tc.ws_tokens").alias("ws_tokens"),
        F.col("_tc.bpe_tokens").alias("bpe_tokens"),
        "quality",
        "lang_guess",
    )


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 5,
    min_term_len: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF with a LINEAR
    inverse-document-frequency ratio:

        score(term, doc) = (tf / doclen) · (N / df)

    Linear IDF (N/df instead of ln(N/df)) is chosen deliberately: every
    float op is then an IEEE-correctly-rounded division/multiply of
    exact integers, so the score — and therefore the top-k ORDERING —
    is bit-identical across engines and the DuckDB oracle can replay it
    with no log-rounding divergence; log-IDF is a one-line swap when
    cross-engine exactness isn't needed. Ranking ties (same tf, df)
    break on term ascending.

    Terms are maximal lowercase [a-z]+ runs of length >= min_term_len;
    doclen counts surviving terms; N counts ALL documents in the input
    (including termless ones); df counts documents containing the term.

    Scale shape: one explode to corpus-token rows, two map-side
    combined aggregates ((doc, term) counts; per-term df via the
    (term, doc) pre-group), the N scalar on a 1-row broadcast cross
    join, and a per-doc row_number window that WindowGroupLimit
    truncates to k map-side. No Python, no driver collect.

    Returns (doc_id, term, tf BIGINT, score DOUBLE, rank INT).
    """
    from pyspark.sql import Window

    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    terms = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z]+"), 0)
        ).alias("term"),
    ).where(F.length("term") >= min_term_len)
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    doclen = tf.groupBy("doc_id").agg(F.sum("tf").alias("doclen"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        tf.join(doclen, "doc_id")
        .join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            (
                (F.col("tf") / F.col("doclen"))
                * (F.col("n_docs") / F.col("df"))
            ).alias("score"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
