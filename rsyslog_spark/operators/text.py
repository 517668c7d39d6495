"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All pure Column expressions (regex + arithmetic), deterministic, and
DuckDB-oracle-expressible so they sit inside the correctness gate.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from rsyslog_spark.expr import ColumnOrName, rs_str

# Tiny per-language stopword anchors for the n-gram/stopword heuristic.
# Deliberately small: the operator contract is deterministic scoring,
# not linguistic accuracy (swap in fastText-style models via the
# multimodal UDF plumbing for production).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "das"],
    "fr": ["le", "la", "et", "est", "les"],
    "es": ["el", "la", "que", "de", "es"],
}


def token_count_ws(text: ColumnOrName) -> Column:
    """Whitespace token count."""
    t = F.trim(rs_str(text))
    return F.when(t == "", F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+", -1))
    ).cast("long")


def token_count_bpe(text: ColumnOrName) -> Column:
    """BPE-ish token estimate: count word pieces + digits + punctuation
    runs (a cheap, deterministic stand-in for a real tokenizer)."""
    t = rs_str(text)
    pieces = F.regexp_extract_all(
        t, F.lit(r"[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\s]"), F.lit(0)
    )
    return F.size(pieces).cast("long")


def word_count(text: ColumnOrName) -> Column:
    return token_count_ws(text)


def avg_word_len(text: ColumnOrName) -> Column:
    t = F.trim(rs_str(text))
    n = token_count_ws(t)
    letters = F.length(F.regexp_replace(t, r"\s+", ""))
    return F.when(n > 0, F.round(letters / n, 6)).otherwise(F.lit(0.0))


def punct_ratio(text: ColumnOrName) -> Column:
    t = rs_str(text)
    punct = F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    return F.when(F.length(t) > 0,
                  F.round(punct / F.length(t), 6)).otherwise(F.lit(0.0))


def stopword_ratio(text: ColumnOrName, lang: str = "en") -> Column:
    toks = F.split(F.lower(F.trim(rs_str(text))), r"\s+", -1)
    stops = LANG_MARKERS[lang]
    hits = F.size(F.filter(toks, lambda tok: tok.isin(*stops)))
    n = F.size(toks)
    return F.when(n > 0, F.round(hits / n, 6)).otherwise(F.lit(0.0))


def quality_score(text: ColumnOrName) -> Column:
    """Composite quality heuristic in [0,1]: length band + word length
    band + low punctuation. Mirrors the shape of C4/Gopher-style
    filters; each term deterministic and SQL-expressible."""
    t = rs_str(text)
    n_chars = F.length(t)
    wl = avg_word_len(t)
    len_ok = F.when((n_chars >= 50) & (n_chars <= 10000), 0.4).otherwise(0.0)
    wl_ok = F.when((wl >= 2.0) & (wl <= 12.0), 0.3).otherwise(0.0)
    punct_ok = F.when(punct_ratio(t) <= 0.2, 0.3).otherwise(0.0)
    return F.round(len_ok + wl_ok + punct_ok, 6)


def lang_id(text: ColumnOrName) -> Column:
    """Stopword-anchor language ID with CJK codepoint check first.

    Returns the language whose markers hit most tokens; 'zh' when CJK
    characters present; 'und' when nothing matches. Deterministic
    tie-break by language code order.
    """
    t = F.lower(rs_str(text))
    toks = F.split(F.trim(t), r"\s+", -1)
    scores: list[tuple[str, Column]] = []
    for code in sorted(LANG_MARKERS):
        stops = LANG_MARKERS[code]
        scores.append(
            (code, F.size(F.filter(toks, lambda tok: tok.isin(*stops))))
        )
    best: Column = F.lit("und")
    best_score: Column = F.lit(0)
    for code, sc in scores:  # earlier code wins ties via strict >
        is_better = sc > best_score
        best = F.when(is_better, F.lit(code)).otherwise(best)
        best_score = F.when(is_better, sc).otherwise(best_score)
    has_cjk = t.rlike(r"[一-鿿]")
    return F.when(has_cjk, F.lit("zh")).otherwise(best)


def doc_fingerprint(text: ColumnOrName) -> Column:
    """Deterministic content fingerprint: md5 of the normalized text
    (lowercase, whitespace collapsed). Stable across engines — the
    dedup key for exact dedup after fuzzy normalization."""
    norm = F.regexp_replace(F.lower(F.trim(rs_str(text))), r"\s+", " ")
    return F.md5(norm)


# PII detection/redaction — the scrub pass a training-data pipeline
# runs before any release. ORDERED: earlier kinds are redacted first,
# so later patterns never re-match inside an already-masked span
# (credit cards before phones keeps 4-4-4-4 runs out of the phone
# matcher; emails before IPv4 keeps user@1.2.3.4 hosts whole).
# Patterns use the RE2 ∩ java.util.regex dialect (no lookaround, no
# backrefs) so the exact same strings run in Spark and in external
# SQL oracles.
PII_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("credit_card", r"\b(?:\d{4}[- ]){3}\d{4}\b|\b\d{16}\b"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("phone", r"\(?\b\d{3}\)?[-. ]\d{3}[-. ]\d{4}\b"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b"),
    ("api_key", r"\b(?:sk|pk|api|key|tok)[-_][A-Za-z0-9]{16,}\b"),
]


#: entity -> replacement for html_to_text (the handful that dominate
#: real crawl text; numeric references are handled by pattern).
#: ``&amp;``/``&#38;`` are ABSENT here — they decode LAST (standard
#: entity-decode ordering) so double-escaped text like ``&amp;lt;``
#: renders as the literal ``&lt;`` instead of double-decoding to ``<``.
_HTML_ENTITIES = [("&nbsp;", " "), ("&lt;", "<"),
                  ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"),
                  ("&apos;", "'")]


def html_to_text(html: ColumnOrName) -> Column:
    """Boilerplate-free text from an HTML document — the extraction
    stage every web-corpus pipeline runs before quality/dedup
    (CCNet/RefinedWeb use WET or trafilatura; this is the
    engine-native column form for when only raw HTML landed in the
    lake).  Pure column regex chain, in order:

    1. drop ``<script>``/``<style>``/``<!-- -->``/``<head>`` blocks
       wholesale (content is never prose),
    2. block-level tags (``p``/``div``/``br``/``li``/headings/``tr``)
       become newlines so paragraphs stay separated,
    3. every remaining tag is stripped,
    4. common + numeric character entities decode,
    5. whitespace collapses (spaces within lines, >2 blank lines to
       one blank line), leading/trailing trim.

    A real DOM parser handles pathological markup better; for the
    overwhelmingly common case this is exact, and it runs at scan
    speed with zero Python.
    """
    c = F.col(html) if isinstance(html, str) else html
    for blk in ("script", "style", "head"):
        c = F.regexp_replace(
            c, f"(?is)<{blk}[^>]*>.*?</{blk}>", " ")
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(
        c, r"(?i)</?(p|div|br|li|ul|ol|tr|table|h[1-6]|blockquote)"
           r"[^>]*/?>", "\n")
    c = F.regexp_replace(c, r"(?s)<[^>]+>", " ")
    # entity decode: the named set above plus their numeric spellings
    # (the numeric entities that actually occur in crawl text); a
    # general &#N; needs chr(N), which has no column form — those
    # rare leftovers stay literal rather than corrupting the text.
    # &amp;/&#38; decode LAST so double-escaped entities ("&amp;lt;")
    # come out single-decoded ("&lt;"), matching html.unescape.
    for ent, repl in _HTML_ENTITIES + [
            ("&#34;", '"'), ("&#60;", "<"),
            ("&#62;", ">"), ("&#160;", " "),
            ("&amp;", "&"), ("&#38;", "&")]:
        c = F.replace(c, F.lit(ent), F.lit(repl))
    c = F.regexp_replace(c, r"[ \t\r]+", " ")
    c = F.regexp_replace(c, r" ?\n ?", "\n")
    c = F.regexp_replace(c, r"\n{2,}", "\n\n")
    return F.regexp_replace(c, r"^\s+|\s+$", "")


def redact_pii(text: ColumnOrName,
               kinds: list[str] | None = None) -> Column:
    """Mask every PII span with ``<KIND>`` (``<EMAIL>`` …), applying
    the patterns in PII_PATTERNS order. One chained regexp_replace
    tree — pure column expression, whole-stage codegen'd, no UDF."""
    out = rs_str(text)
    want = set(kinds) if kinds is not None else None
    for kind, pat in PII_PATTERNS:
        if want is None or kind in want:
            out = F.regexp_replace(out, pat, f"<{kind.upper()}>")
    return out


def pii_counts(text: ColumnOrName,
               kinds: list[str] | None = None) -> list[Column]:
    """Per-kind PII match counts, aliased ``n_<kind>``. Counted on
    the progressively-redacted text (kind i counted after kinds
    0..i-1 are masked) so a span is attributed to exactly one kind —
    the same attribution :func:`redact_pii` applies."""
    cur = rs_str(text)
    want = set(kinds) if kinds is not None else None
    out: list[Column] = []
    for kind, pat in PII_PATTERNS:
        if want is not None and kind not in want:
            continue
        out.append(F.size(F.regexp_extract_all(cur, F.lit(pat), 0))
                   .alias(f"n_{kind}"))
        cur = F.regexp_replace(cur, pat, f"<{kind.upper()}>")
    return out


def ngram_decontaminate(
    train: "DataFrame", bench: "DataFrame", text_col: str,
    id_col: str, *, shingle_n: int = 3, threshold: float = 0.5,
) -> "DataFrame":
    """Benchmark decontamination: per training doc, the fraction of
    its word n-grams that appear ANYWHERE in the benchmark corpus;
    docs at/above ``threshold`` are flagged ``contaminated`` (the
    eval-leakage filter every training pipeline runs before a data
    release).

    Plan: distinct shingles per side → left-semi-style match via an
    inner join against the DISTINCT benchmark shingle set → one
    groupBy(train doc). The join key is the shingle string and the
    benchmark set is typically small and broadcastable; at corpus
    scale both sides are shuffle-partitioned by shingle, and the
    hot-stopword-shingle skew is AQE's skew-join case.
    """
    from rsyslog_spark.operators.dedup import shingles

    t = train.select(
        F.col(id_col),
        F.explode(shingles(F.col(text_col), shingle_n)).alias("__sh"),
    )
    b = (bench.select(
            F.explode(shingles(F.col(text_col), shingle_n))
            .alias("__sh"))
         .distinct())
    totals = t.groupBy(id_col).agg(F.count(F.lit(1)).alias("__total"))
    hits = (t.join(b, "__sh")
            .groupBy(id_col).agg(F.count(F.lit(1)).alias("__hits")))
    frac = F.coalesce(F.col("__hits"), F.lit(0)) / F.col("__total")
    return (totals.join(hits, id_col, "left")
            .select(F.col(id_col),
                    F.round(frac, 6).alias("overlap_frac"),
                    (frac >= threshold).alias("contaminated")))


def repetition_metrics(text: ColumnOrName) -> list[Column]:
    """Gopher-style within-document repetition signals, pure column
    expressions: duplicate-word fraction (1 - distinct/total) and
    the most-frequent-bigram share of all bigrams. High values mark
    boilerplate/spam documents a quality filter drops.

    Returns [dup_word_frac, top_bigram_frac] so callers alias them.
    """
    toks = F.split(F.lower(F.trim(rs_str(text))), r"\s+", -1)
    n = F.size(toks)
    dup_word = F.round(
        (n - F.size(F.array_distinct(toks))) / n, 6)
    idx = F.sequence(F.lit(0), F.greatest(n - 2, F.lit(0)))
    bigrams = F.filter(
        F.transform(idx,
                    lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 2))),
        lambda g: F.length(g) > 0)
    nb = F.size(bigrams)
    # most-frequent bigram count: sort the bigram array and scan
    # consecutive runs — O(n log n) per doc (a distinct×n nested
    # filter would be quadratic on long documents)
    run = F.aggregate(
        F.array_sort(bigrams),
        F.struct(F.lit("").alias("prev"), F.lit(0).alias("run"),
                 F.lit(0).alias("best")),
        lambda acc, g: F.struct(
            g.alias("prev"),
            F.when(g == acc["prev"], acc["run"] + 1)
             .otherwise(F.lit(1)).alias("run"),
            F.greatest(acc["best"],
                       F.when(g == acc["prev"], acc["run"] + 1)
                       .otherwise(F.lit(1))).alias("best")),
        lambda acc: acc["best"])
    top_bigram = F.round(run / nb, 6)
    return [dup_word, top_bigram]


def bm25_scores(
    docs: "DataFrame", query_terms: list[str], text_col: str,
    id_col: str, *, k1: float = 1.2, b: float = 0.75,
) -> "DataFrame":
    """BM25 ranking of documents against a bag of query terms — the
    log-search primitive (score every document for an operator's
    search box) and the lexical half of hybrid retrieval pipelines.

    One explode → per-(doc, term) tf → document-frequency aggregation
    over the query terms only (the df frame is |terms| rows —
    broadcast) → score sum per doc. Shuffles once on the doc id;
    avgdl/N ride as a broadcast 1-row cross join, so the whole score
    is one lazy plan — no driver collect, streaming-composable.
    """
    # tokens are lowercased — normalize the query the same way or
    # capitalized terms would silently score zero
    query_terms = [t.lower() for t in query_terms]
    toks = F.split(F.lower(F.trim(rs_str(F.col(text_col)))), r"\s+", -1)
    base = docs.select(F.col(id_col), toks.alias("__toks")) \
        .withColumn("__dl", F.size("__toks"))
    stats = base.agg(F.count(F.lit(1)).alias("__n"),
                     F.avg("__dl").alias("__avgdl"))
    ex = base.select(id_col, "__dl",
                     F.explode("__toks").alias("__t")) \
        .filter(F.col("__t").isin(query_terms))
    tf = ex.groupBy(id_col, "__dl", "__t") \
        .agg(F.count(F.lit(1)).alias("__tf"))
    df_counts = tf.groupBy("__t").agg(
        F.countDistinct(id_col).alias("__df"))
    idf = F.log(
        (F.col("__n") - F.col("__df") + 0.5)
        / (F.col("__df") + 0.5) + 1.0)
    scored = (tf.join(F.broadcast(df_counts), "__t")
              .crossJoin(F.broadcast(stats))
              .withColumn("__idf", idf)
              .withColumn(
                  "__s",
                  F.col("__idf") * F.col("__tf") * (k1 + 1)
                  / (F.col("__tf")
                     + k1 * (1 - b
                             + b * F.col("__dl") / F.col("__avgdl")))))
    return scored.groupBy(id_col).agg(
        F.round(F.sum("__s"), 6).alias("bm25"))


def ngram_lm_scores(
    docs: "DataFrame", text_col: str, id_col: str, *,
    train: "DataFrame | None" = None, alpha: float = 0.5,
    round_to: int = 4,
) -> "DataFrame":
    """Per-document bigram language-model score — the CCNet-style
    quality/perplexity filter (CCNet scores every crawl doc with a
    KenLM trained on clean text and drops the high-perplexity tail;
    this is the engine-native n-gram form).

    Trains an add-α bigram model on ``train`` (default: ``docs``
    itself — self-perplexity, the "how unlike the rest of the corpus
    is this doc" signal) and scores every doc:

        P(w_i | w_{i-1}) = (C(w_{i-1} w_i) + α) / (C(w_{i-1}) + α·V)

    Output: (id, n_bigrams, avg_logp, ppl) with ppl = exp(−avg ln P),
    both rounded to ``round_to``. Docs with < 2 tokens drop out (no
    bigram positions — CCNet likewise can't score empty docs).

    Plan shape at 100 TB: bigram counts are ONE partial-agg shuffle on
    the (w1, w2) pair; context counts derive from the bigram frame
    (no second corpus scan); V rides as a broadcast 1-row cross join;
    scoring is an equi-join on the bigram key — vocab²-bounded, so it
    stays a shuffle join (NOT broadcast) by design — then one
    groupBy(doc). Unknown bigrams/contexts (cross-corpus scoring)
    back off to the α floor via left joins.

    Self-scoring (``train is None``) fuses C(w1) into the counts
    frame via a window sum over the (vocab²-bounded) c2 table instead
    of a second join: every scored bigram exists in c2 by
    construction, so the context backoff can never fire and one
    equi-join replaces two. That removes the w1-shuffle of the FULL
    scored stream — the second-largest exchange in the plan — which
    at 100 TB is a corpus-sized shuffle traded for a window over the
    counts table.
    """
    def toks_of(frame):
        raw = F.split(F.lower(F.trim(rs_str(F.col(text_col)))),
                      r"\s+", -1)
        return frame.select(
            F.col(id_col),
            F.filter(raw, lambda t: t != "").alias("__toks"))

    tr = toks_of(train if train is not None else docs)
    idx = F.sequence(F.lit(1), F.size("__toks") - 1)

    def bigrams(frame, cols):
        return (frame.filter(F.size("__toks") >= 2)
                .select(*cols, "__toks", F.explode(idx).alias("__i"))
                .select(*cols,
                        F.element_at("__toks", F.col("__i"))
                        .alias("__w1"),
                        F.element_at("__toks", F.col("__i") + 1)
                        .alias("__w2")))

    c2 = bigrams(tr, []).groupBy("__w1", "__w2") \
        .agg(F.count(F.lit(1)).alias("__c2"))
    vocab = tr.select(F.explode("__toks").alias("__t")) \
        .agg(F.countDistinct("__t").alias("__v"))

    sc = bigrams(toks_of(docs), [id_col])
    lp = F.log((F.coalesce(F.col("__c2"), F.lit(0)) + alpha)
               / (F.coalesce(F.col("__c1"), F.lit(0))
                  + alpha * F.col("__v")))
    if train is None:
        from pyspark.sql import Window

        c2c1 = c2.withColumn(
            "__c1", F.sum("__c2").over(Window.partitionBy("__w1")))
        scored = (sc.join(c2c1, ["__w1", "__w2"], "left")
                  .crossJoin(F.broadcast(vocab))
                  .withColumn("__lp", lp))
    else:
        c1 = c2.groupBy("__w1").agg(F.sum("__c2").alias("__c1"))
        scored = (sc.join(c2, ["__w1", "__w2"], "left")
                  .join(c1, ["__w1"], "left")
                  .crossJoin(F.broadcast(vocab))
                  .withColumn("__lp", lp))
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.round(F.avg("__lp"), round_to).alias("avg_logp"),
        F.round(F.exp(-F.avg("__lp")), round_to).alias("ppl"))
