"""Training-data-pipeline queries: dedup, similarity search, text
analysis, fingerprinting — first-class operators beyond the
reference's own surface (BASELINE.json north star).

MinHash/SimHash queries have no oracle (xxhash64 is not reproducible
in DuckDB) → driver's rows-only check; their *semantics* are covered
by unit tests with hand-computed fixtures instead.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rsyslog_spark.operators.dedup import (
    exact_dedup, minhash_dedup, ngram_jaccard_pairs, simhash,
    simhash_candidates,
)
from rsyslog_spark.operators.similarity import cosine_topk, cosine_topk_lsh, knn_join
from rsyslog_spark.operators.text import (
    avg_word_len, doc_fingerprint, lang_id, punct_ratio, quality_score,
    token_count_bpe, token_count_ws,
)
from rsyslog_spark.queries import Query, load

QUERIES: list[Query] = []


def q(name, oracle, doc=""):
    def deco(fn):
        QUERIES.append(Query(name=name, spark=fn, oracle=oracle, doc=doc))
        return fn
    return deco


@q(
    "dedup_exact",
    """
    SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id, COUNT(*) AS dup_count
    FROM documents GROUP BY text
    """,
    doc="Exact dedup via content-hash groupBy: keep lowest id per "
        "distinct text; shuffle carries (hash,id), not the text.",
)
def dedup_exact(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return exact_dedup(docs, "text", "doc_id")


@q(
    "ngram_jaccard_dup_pairs",
    """
    WITH sh AS (
      SELECT doc_id, sh, sz FROM (
        SELECT doc_id,
               list_distinct([array_to_string(words[i:i+2], ' ')
                              FOR i IN range(1, GREATEST(len(words) - 2, 1) + 1)]) AS shs,
               len(list_distinct([array_to_string(words[i:i+2], ' ')
                              FOR i IN range(1, GREATEST(len(words) - 2, 1) + 1)])) AS sz
        FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS words
              FROM documents WHERE doc_id < 300)
      ), UNNEST(shs) AS u(sh)
    )
    SELECT CAST(SUM(CASE WHEN jac >= 0.1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pairs_01,
           CAST(SUM(CASE WHEN jac >= 0.3 THEN 1 ELSE 0 END) AS BIGINT) AS n_pairs_03,
           CAST(COUNT(*) AS BIGINT) AS n_candidates
    FROM (
      SELECT a.doc_id, b.doc_id,
             COUNT(*) * 1.0 / (MIN(a.sz) + MIN(b.sz) - COUNT(*)) AS jac
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    """,
    doc="Exact word-3-gram Jaccard near-dup pairs (explode → "
        "shingle self-join → intersection counts).",
)
def ngram_jaccard_dup_pairs(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    pairs = ngram_jaccard_pairs(docs, "text", "doc_id", shingle_n=3,
                                threshold=0.0)
    return pairs.agg(
        F.sum(F.when(F.col("jaccard") >= 0.1, 1).otherwise(0))
        .cast("long").alias("n_pairs_01"),
        F.sum(F.when(F.col("jaccard") >= 0.3, 1).otherwise(0))
        .cast("long").alias("n_pairs_03"),
        F.count(F.lit(1)).cast("long").alias("n_candidates"),
    )


def _minhash_oracle() -> str:
    """Full MinHash+LSH pipeline in DuckDB: the portable hash family
    (md5-base + seeded LCG mod 2^31-1, dedup.portable_seeds) is
    engine-exact, so signatures, band buckets, candidate pairs AND the
    estimated-Jaccard verify are all reproduced row-for-row. The
    production query differs only in hash family (xxhash64)."""
    from rsyslog_spark.operators.dedup import portable_seeds

    seeds = ",\n      ".join(
        f"({i}, {a}, {b})"
        for i, (a, b) in enumerate(portable_seeds(64, seed=42)))
    return f"""
    WITH docs AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS words
      FROM documents WHERE doc_id < 300
    ),
    sh AS (
      SELECT DISTINCT doc_id, sh FROM (
        SELECT doc_id,
               list_distinct([array_to_string(words[i:i+2], ' ')
                              FOR i IN range(1, GREATEST(len(words) - 2, 1) + 1)]) AS shs
        FROM docs
      ), UNNEST(shs) AS u(sh)
    ),
    hv AS (
      SELECT doc_id, ('0x' || substr(md5(sh), 1, 8))::BIGINT % 2147483647 AS h
      FROM sh
    ),
    seeds(i, a, b) AS (VALUES
      {seeds}),
    sigs AS (
      SELECT doc_id, i, MIN((a * h + b) % 2147483647) AS mh
      FROM hv CROSS JOIN seeds GROUP BY doc_id, i
    ),
    bands AS (
      SELECT doc_id, i // 4 AS band,
             string_agg(mh::VARCHAR, ',' ORDER BY i) AS bh
      FROM sigs GROUP BY doc_id, i // 4
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
    )
    SELECT c.id_a, c.id_b,
           ROUND(SUM(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END) / 64.0, 6)
             AS est_jaccard
    FROM cand c
    JOIN sigs sa ON sa.doc_id = c.id_a
    JOIN sigs sb ON sb.doc_id = c.id_b AND sa.i = sb.i
    GROUP BY c.id_a, c.id_b
    HAVING est_jaccard >= 0.5
    """


@q(
    "minhash_lsh_dedup", _minhash_oracle(),
    doc="MinHash(64)+LSH(16 bands) near-dup candidate pairs with "
        "signature-estimated Jaccard verify. Driver-checked with the "
        "portable md5/LCG hash family reproduced in DuckDB (identical "
        "pipeline; production default is xxhash64, unit-tested on "
        "fixtures).",
)
def minhash_lsh_dedup(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    pairs = minhash_dedup(docs, "text", "doc_id", num_hashes=64, bands=16,
                          threshold=0.5, portable=True)
    return pairs.select("id_a", "id_b",
                        F.round("est_jaccard", 6).alias("est_jaccard"))


def _simhash_oracle() -> str:
    """SimHash fingerprints + 4-band candidates in DuckDB, exact to
    the bit: 60-bit portable token hash (15 md5 hex chars), per-bit
    signed sums, 4x15-bit banding, bit_count(xor) Hamming filter."""
    return """
    WITH docs AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
      FROM documents WHERE doc_id < 300
    ),
    hv AS (
      SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT AS h
      FROM docs, UNNEST(toks) AS u(t)
    ),
    sums AS (
      SELECT doc_id, i,
             SUM(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS s
      FROM hv CROSS JOIN range(60) r(i) GROUP BY doc_id, i
    ),
    fp AS (
      SELECT doc_id,
             SUM(CASE WHEN s > 0 THEN 1::BIGINT << i ELSE 0 END)::BIGINT
               AS simhash
      FROM sums GROUP BY doc_id
    ),
    banded AS (
      SELECT doc_id, simhash, r.band,
             (simhash >> (r.band * 15)) & 32767 AS bh
      FROM fp CROSS JOIN range(4) r(band)
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM banded a JOIN banded b
      ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """


@q(
    "simhash_near_dup", _simhash_oracle(),
    doc="SimHash fingerprints + 4-band candidates (Hamming <= 3, "
        "pigeonhole). Driver-checked bit-exact with the portable "
        "60-bit md5 token hash reproduced in DuckDB; production "
        "default is 64-bit xxhash64 (unit-tested).",
)
def simhash_near_dup(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    fps = simhash(docs, "text", "doc_id", portable=True)
    out = simhash_candidates(fps, "doc_id", max_hamming=3, bits=60)
    return out.select("id_a", "id_b",
                      F.col("hamming").cast("long").alias("hamming"))


@q(
    "similarity_topk_bruteforce",
    """
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id,
           ROUND(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)
                 / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
                    * sqrt(list_dot_product(q.qv, q.qv))), 4) AS cosine
    FROM embeddings e, q
    ORDER BY ROUND(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)
                 / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
                    * sqrt(list_dot_product(q.qv, q.qv))), 4) DESC, e.vec_id
    LIMIT 10
    """,
    doc="Brute-force cosine top-10 against the vec_id=0 embedding "
        "(zip_with/aggregate dot product; TakeOrderedAndProject — "
        "no shuffle of vectors).",
)
def similarity_topk_bruteforce(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in
            emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]]
    return cosine_topk(emb, qvec, k=10, round_digits=4)


@q(
    "similarity_knn_join",
    """
    WITH q AS (
      SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < 5
    ), scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)
               / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(q.qv, q.qv))) AS cos
      FROM embeddings e CROSS JOIN q
    )
    SELECT query_id, neighbor_id, ROUND(cos, 4) AS cosine,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
    FROM scored
    QUALIFY rank <= 3
    """,
    doc="Batch k-NN join: 5 broadcast query vectors, per-query top-3 "
        "via window rank.",
)
def similarity_knn_join(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    out = knn_join(emb, queries, k=3)
    return out.select(
        "query_id", "neighbor_id",
        F.round("cosine", 4).alias("cosine"),
        F.col("rank").cast("long").alias("rank"),
    )


def _lsh_topk_oracle() -> str:
    """The hyperplanes are deterministic (seeded Python RNG), so the
    full LSH path — signature, Hamming prune, exact re-rank — is
    reproducible in DuckDB by embedding the plane constants as
    literals. Sign-of-dot disagreement would need |dot| ~ 1 ulp;
    plane/vector dots here are O(1)."""
    from rsyslog_spark.operators.similarity import lsh_hyperplanes

    planes = lsh_hyperplanes(64, 16, seed=42)
    rows = ",\n      ".join(
        "({}, [{}]::DOUBLE[])".format(
            i, ",".join(repr(v) for v in p))
        for i, p in enumerate(planes))
    return f"""
    WITH planes(i, p) AS (VALUES
      {rows}),
    sigs AS (
      SELECT e.vec_id, e.embedding,
             SUM(CASE WHEN list_dot_product(
                          CAST(e.embedding AS DOUBLE[]), pl.p) >= 0
                      THEN 1::BIGINT << pl.i ELSE 0 END)::BIGINT AS sig
      FROM embeddings e CROSS JOIN planes pl
      GROUP BY e.vec_id, e.embedding),
    q AS (SELECT embedding, sig FROM sigs WHERE vec_id = 0)
    SELECT s.vec_id,
           ROUND(list_cosine_similarity(CAST(s.embedding AS DOUBLE[]),
                                        CAST(q.embedding AS DOUBLE[])),
                 6) AS cosine
    FROM sigs s, q
    WHERE bit_count(xor(s.sig, q.sig)) <= 3
    ORDER BY cosine DESC, s.vec_id
    LIMIT 10
    """


@q(
    "similarity_topk_lsh", _lsh_topk_oracle(),
    doc="LSH-pruned approximate top-k (random-hyperplane signatures, "
        "Hamming prune, exact re-rank). The seeded planes are "
        "embedded in the oracle SQL as literals, so the whole prune "
        "is DuckDB-checked; recall vs brute force additionally "
        "asserted in unit tests.",
)
def similarity_topk_lsh(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in
            emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]]
    return cosine_topk_lsh(emb, qvec, k=10, num_planes=16, max_hamming=3)


@q(
    "text_battery",
    """
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(COUNT(DISTINCT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))) AS BIGINT) AS n_unique,
           CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS total_words,
           CAST(SUM(len(regexp_extract_all(text, '[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\\s]'))) AS BIGINT) AS bpe_tokens,
           ROUND(AVG(ROUND(length(regexp_replace(trim(text), '\\s+', '', 'g'))
                     * 1.0 / len(string_split_regex(trim(text), '\\s+')), 6)), 4) AS mean_awl,
           ROUND(AVG(ROUND((length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))
                     * 1.0 / length(text), 6)), 4) AS mean_punct,
           ROUND(AVG(CASE WHEN length(text) BETWEEN 50 AND 10000 THEN 0.4 ELSE 0.0 END
                   + CASE WHEN ROUND(length(regexp_replace(trim(text), '\\s+', '', 'g'))
                          * 1.0 / len(string_split_regex(trim(text), '\\s+')), 6)
                          BETWEEN 2.0 AND 12.0 THEN 0.3 ELSE 0.0 END
                   + CASE WHEN ROUND((length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))
                          * 1.0 / length(text), 6) <= 0.2 THEN 0.3 ELSE 0.0 END), 4) AS mean_quality
    FROM documents GROUP BY lang
    """,
    doc="Text-analysis battery per lang, one scan: document "
        "fingerprinting (md5 of normalized text as canonical dedup "
        "key), whitespace + BPE-ish token counting, avg word length, "
        "punctuation ratio, composite C4/Gopher-style quality score. "
        "Pure column expressions — no UDFs.",
)
def text_battery(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(doc_fingerprint("text")).cast("long").alias("n_unique"),
        F.sum(token_count_ws("text")).cast("long").alias("total_words"),
        F.sum(token_count_bpe("text")).cast("long").alias("bpe_tokens"),
        F.round(F.avg(avg_word_len("text")), 4).alias("mean_awl"),
        F.round(F.avg(punct_ratio("text")), 4).alias("mean_punct"),
        F.round(F.avg(quality_score("text")), 4).alias("mean_quality"),
    )


_LANGID_ORACLE = """
    WITH scored AS (
      SELECT lang AS actual,
             len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                 t -> t IN ('der','die','und','ist','das'))) AS s_de,
             len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                 t -> t IN ('the','and','of','to','is'))) AS s_en,
             len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                 t -> t IN ('el','la','que','de','es'))) AS s_es,
             len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                 t -> t IN ('le','la','et','est','les'))) AS s_fr,
             regexp_matches(lower(text), '[一-鿿]') AS cjk
      FROM documents
    )
    SELECT CASE
             WHEN cjk THEN 'zh'
             WHEN GREATEST(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
             WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
             WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
             WHEN s_es >= s_fr THEN 'es'
             ELSE 'fr' END AS pred,
           actual, COUNT(*) AS cnt
    FROM scored GROUP BY 1, 2
"""


@q(
    "text_lang_id",
    _LANGID_ORACLE,
    doc="Language ID: stopword-anchor scoring with CJK codepoint "
        "check; deterministic tie-break (first of max in sorted "
        "language order).",
)
def text_lang_id(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy(
        lang_id("text").alias("pred"), F.col("lang").alias("actual")
    ).agg(F.count(F.lit(1)).alias("cnt"))


def _pii_oracle() -> str:
    """Sequential redaction chain in DuckDB built from the SAME
    PII_PATTERNS list the Spark operator compiles, so pattern text
    and attribution order can never drift apart."""
    from rsyslog_spark.operators.text import PII_PATTERNS

    ctes, carry = [], []
    prev = "base"
    for i, (kind, pat) in enumerate(PII_PATTERNS):
        inner_keep = "".join(f" {c}," for c in carry)
        keep = ", ".join(carry + [f"n_{kind}"])
        ctes.append(
            f"s{i} AS (SELECT lang, {keep},\n"
            f"  regexp_replace(t, '{pat}', '<{kind.upper()}>', 'g') AS t\n"
            f"  FROM (SELECT lang,{inner_keep} t,"
            f" len(regexp_extract_all(t, '{pat}')) AS n_{kind}"
            f" FROM {prev}))")
        carry.append(f"n_{kind}")
        prev = f"s{i}"
    residual = " + ".join(
        f"len(regexp_extract_all(t, '{p}'))" for _, p in PII_PATTERNS)
    sums = ",\n           ".join(
        f"CAST(SUM(n_{k}) AS BIGINT) AS {k}s" for k, _ in PII_PATTERNS)
    return f"""
    WITH base AS (
      SELECT lang,
             concat('contact user', doc_id::VARCHAR,
                    '@corp.example.com from 192.168.',
                    (doc_id % 256)::VARCHAR, '.7; card 4111-1111-1111-',
                    lpad((doc_id % 10000)::VARCHAR, 4, '0'),
                    ' ssn 078-05-', lpad((doc_id % 10000)::VARCHAR, 4, '0'),
                    ' call (415) 555-', lpad((doc_id % 10000)::VARCHAR, 4, '0'),
                    ' :: ', substr(text, 1, 120)) AS t
      FROM documents
    ),
    {",".join(ctes)}
    SELECT lang,
           {sums},
           CAST(SUM(length(t)) AS BIGINT) AS redacted_len,
           CAST(SUM(CASE WHEN {residual} > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_residual
    FROM {prev} GROUP BY lang
    """


@q(
    "pii_redaction_battery", _pii_oracle(),
    doc="PII scrub pass: synthetic emails/cards/SSNs/phones/IPs "
        "woven into every document, masked by the ordered "
        "redact_pii chain (pure regexp_replace tree, no UDF); "
        "verifies per-kind attribution counts, redacted byte "
        "lengths, and that nothing PII-shaped survives redaction.",
)
def pii_redaction_battery(spark, sf_dir):
    from rsyslog_spark.operators.text import (
        PII_PATTERNS, pii_counts, redact_pii)

    docs = load(spark, sf_dir, "documents")
    last4 = F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0")
    msg = F.concat(
        F.lit("contact user"), F.col("doc_id").cast("string"),
        F.lit("@corp.example.com from 192.168."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7; card 4111-1111-1111-"), last4,
        F.lit(" ssn 078-05-"), last4,
        F.lit(" call (415) 555-"), last4,
        F.lit(" :: "), F.substring(F.col("text"), 1, 120))
    red = docs.select(
        "lang", *pii_counts(msg), redact_pii(msg).alias("redacted"))
    residual = None
    for _, pat in PII_PATTERNS:
        n = F.size(F.regexp_extract_all(F.col("redacted"), F.lit(pat), 0))
        residual = n if residual is None else residual + n
    return red.groupBy("lang").agg(
        *[F.sum(f"n_{k}").cast("long").alias(f"{k}s")
          for k, _ in PII_PATTERNS],
        F.sum(F.length("redacted")).cast("long").alias("redacted_len"),
        F.sum(F.when(residual > 0, 1).otherwise(0)).cast("long")
        .alias("n_residual"),
    )


@q(
    "embedding_cosine_near_dup",
    """
    SELECT a.vec_id AS id_a, b.vec_id AS id_b
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE a.vec_id < 200 AND b.vec_id < 200
      AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                 CAST(b.embedding AS DOUBLE[])) >= 0.35
    """,
    doc="Embedding-cosine near-duplicate pairs (training-data dedup): "
        "exact all-pairs semantics WITHOUT a BroadcastNestedLoopJoin "
        "— the comparison matrix is tiled into stripes realized as a "
        "shuffle equi-join (1-bucket-theta pattern, "
        "operators/similarity.cosine_pairs_blocked); dot product is "
        "JVM-side zip_with/aggregate. Sub-quadratic approximate "
        "candidates at corpus scale: minhash_lsh_dedup / "
        "simhash_near_dup feed this same exact scorer.",
)
def embedding_cosine_near_dup(spark, sf_dir):
    from rsyslog_spark.operators.similarity import cosine_pairs_blocked

    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    return cosine_pairs_blocked(emb, threshold=0.35, n_blocks=16)


def _semantic_dedup_oracle() -> str:
    """Hyperplane signatures (seeded, embedded as literals), same-
    bucket cosine edges, recursive-CTE connected components — the
    whole SemDeDup pipeline reproduced in DuckDB."""
    from rsyslog_spark.operators.similarity import lsh_hyperplanes

    planes = lsh_hyperplanes(64, 8, seed=42)
    rows = ",\n      ".join(
        "({}, [{}]::DOUBLE[])".format(i, ",".join(repr(v) for v in p))
        for i, p in enumerate(planes))
    return f"""
    WITH RECURSIVE planes(i, p) AS (VALUES
      {rows}),
    sigs AS (
      SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v,
             SUM(CASE WHEN list_dot_product(
                          CAST(e.embedding AS DOUBLE[]), pl.p) >= 0
                      THEN 1::BIGINT << pl.i ELSE 0 END)::BIGINT AS sig
      FROM embeddings e CROSS JOIN planes pl
      GROUP BY e.vec_id, e.embedding),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM sigs a JOIN sigs b ON a.sig = b.sig AND a.vec_id < b.vec_id
      WHERE ROUND(list_cosine_similarity(a.v, b.v), 6) >= 0.3),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs),
    reach(id, lbl) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.id)
    SELECT CAST(id AS BIGINT) AS vec_id,
           CAST(MIN(lbl) AS BIGINT) AS component
    FROM reach GROUP BY id
    """


@q(
    "semantic_dedup", _semantic_dedup_oracle(),
    doc="SemDeDup-style semantic dedup: bucket the corpus by full "
        "8-plane LSH signature (deterministic analog of the paper's "
        "k-means assignment), exact cosine within bucket only "
        "(~N^2/256 compares, sort-merge equi-join, no BNLJ), then "
        "connected components to label each semantic-dup cluster. "
        "Planes embedded in the oracle as literals; components "
        "checked against a DuckDB recursive CTE.",
)
def semantic_dedup(spark, sf_dir):
    from rsyslog_spark.operators.dedup import connected_components
    from rsyslog_spark.operators.similarity import semantic_dedup_pairs

    emb = load(spark, sf_dir, "embeddings")
    edges = semantic_dedup_pairs(emb, dim=64, num_planes=8,
                                 threshold=0.3)
    comp = connected_components(edges)
    return comp.select(F.col("id").cast("long").alias("vec_id"),
                       F.col("component").cast("long").alias("component"))


@q(
    "multimodal_battery",
    """
    SELECT 'image' AS kind, doc_id AS key,
           CAST(octet_length(encode(text)) AS BIGINT) AS a,
           sha256(text) AS b
    FROM documents WHERE doc_id < 100
    UNION ALL
    SELECT 'video' AS kind, CAST(doc_id % 10 AS BIGINT) AS key,
           COUNT(*) AS a,
           CAST(SUM(CASE WHEN f = 0 THEN 1 ELSE 0 END) AS VARCHAR) AS b
    FROM (SELECT doc_id,
                 UNNEST(range(0, (length(text) % 60) + 1, 5)) AS f
          FROM documents) t
    GROUP BY 2
    """,
    doc="Multimodal plumbing battery: (image) text->binary payload->"
        "mapInPandas feature extraction — decode stubbed "
        "deterministic, oracle checks the Arrow round-trip invariants "
        "(byte length, sha256); width/height/histogram are "
        "stub-derived and unit-tested; (video) frame-sampling plan — "
        "per-video rows expand to frame timestamps (sequence+explode) "
        "BEFORE any decode, the decode being the stubbed mapInPandas "
        "step (operators/multimodal.py).",
)
def multimodal_battery(spark, sf_dir):
    from rsyslog_spark.operators.multimodal import (
        extract_image_features, frame_sample_plan,
    )

    docs = load(spark, sf_dir, "documents")
    media = docs.filter(F.col("doc_id") < 100).select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    feats = extract_image_features(media).select(
        F.lit("image").alias("kind"),
        F.col("media_id").alias("key"),
        F.col("n_bytes").cast("long").alias("a"),
        F.col("sha").alias("b"),
    )

    vids = docs.select(
        F.col("doc_id").alias("media_id"),
        F.create_map(
            F.lit("duration_s"),
            (F.length("text") % 60).cast("string"),
        ).alias("meta"),
    )
    frames = frame_sample_plan(vids, every_n_seconds=5).groupBy(
        (F.col("media_id") % 10).cast("long").alias("key")
    ).agg(
        F.count(F.lit(1)).alias("a"),
        F.sum((F.col("frame_ts") == 0).cast("long")).cast("string")
        .alias("b"),
    ).select(F.lit("video").alias("kind"), "key", "a", "b")

    return feats.unionByName(frames)


def _ivf_topk_oracle(k: int = 8, nprobe: int = 3, dim: int = 64) -> str:
    """The deterministic quantizer (seeded md5-sample init + one
    rounded Lloyd step) is reproduced wholesale in DuckDB: same init
    ordering, same rounded argmin assignment, same rounded
    per-dimension means, same probe ranking — so the FULL IVF path
    (train, assign, prune, exact re-rank) is oracle-checked."""
    return f"""
    WITH init AS (
      SELECT * FROM (
        SELECT ROW_NUMBER() OVER (
                 ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS b,
               CAST(embedding AS DOUBLE[]) AS c
        FROM embeddings) WHERE b < {k}),
    vecs AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    a0 AS (
      SELECT vec_id, v, b FROM (
        SELECT x.vec_id, x.v, i.b,
               ROW_NUMBER() OVER (PARTITION BY x.vec_id
                 ORDER BY ROUND(list_dot_product(i.c, i.c)
                              - 2 * list_dot_product(x.v, i.c), 6),
                          i.b) AS rn
        FROM vecs x CROSS JOIN init i) WHERE rn = 1),
    cmeans AS (
      SELECT a0.b, r.i,
             ROUND(AVG(a0.v[CAST(r.i + 1 AS INT)]), 6) AS x
      FROM a0 CROSS JOIN range({dim}) r(i)
      GROUP BY a0.b, r.i),
    cent AS (
      SELECT init.b, COALESCE(m.c, init.c) AS c
      FROM init LEFT JOIN (
        SELECT b, list(x ORDER BY i) AS c FROM cmeans GROUP BY b) m
      USING (b)),
    a1 AS (
      SELECT vec_id, v, b FROM (
        SELECT x.vec_id, x.v, cc.b,
               ROW_NUMBER() OVER (PARTITION BY x.vec_id
                 ORDER BY ROUND(list_dot_product(cc.c, cc.c)
                              - 2 * list_dot_product(x.v, cc.c), 6),
                          cc.b) AS rn
        FROM vecs x CROSS JOIN cent cc) WHERE rn = 1),
    q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
          FROM embeddings WHERE vec_id = 0),
    probe AS (
      SELECT b FROM (
        SELECT cc.b, ROW_NUMBER() OVER (
          ORDER BY ROUND(list_dot_product(cc.c, q.qv)
                   / (sqrt(list_dot_product(cc.c, cc.c))
                      * sqrt(list_dot_product(q.qv, q.qv))), 6) DESC,
                   cc.b) AS rn
        FROM cent cc, q) WHERE rn <= {nprobe})
    SELECT a1.vec_id, CAST(a1.b AS BIGINT) AS ivf_bucket,
           ROUND(list_dot_product(a1.v, q.qv)
                 / (sqrt(list_dot_product(a1.v, a1.v))
                    * sqrt(list_dot_product(q.qv, q.qv))), 4) AS cosine
    FROM a1 JOIN probe USING (b), q
    ORDER BY cosine DESC, a1.vec_id
    LIMIT 10
    """


@q(
    "similarity_topk_ivf", _ivf_topk_oracle(),
    doc="IVF ANN, fully oracle-checked: deterministic coarse "
        "quantizer (portable seeded-sample init + one rounded Lloyd "
        "step, operators/similarity.ivf_index_deterministic) -> rank "
        "centroids vs the query -> scan only nprobe/k buckets -> "
        "exact cosine top-10 re-rank.  The MLlib-KMeans quantizer "
        "(ivf_index) remains the library's quality path, recall-"
        "tested in units; this query pins the engine-portable "
        "variant against the same pipeline expressed in DuckDB SQL.",
)
def similarity_topk_ivf(spark, sf_dir):
    from rsyslog_spark.operators.similarity import (
        ivf_index_deterministic, lsh_hyperplanes)  # noqa: F401
    import math as _m

    emb = load(spark, sf_dir, "embeddings")
    q0 = emb.filter(F.col("vec_id") == 0).select("embedding").collect()
    qv = [float(x) for x in q0[0]["embedding"]]
    indexed, cents = ivf_index_deterministic(emb, k=8, lloyd_iters=1)

    qn = _m.sqrt(sum(x * x for x in qv))
    ranked = sorted(
        range(len(cents)),
        key=lambda i: (
            -round(sum(a * b for a, b in zip(cents[i], qv))
                   / (_m.sqrt(sum(x * x for x in cents[i])) * qn), 6),
            i))
    probe = ranked[:3]

    from rsyslog_spark.operators.similarity import cosine, _query_lit
    vec = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    sim = F.round(cosine(vec, _query_lit(qv)), 4)
    return (indexed.filter(F.col("ivf_bucket").isin(probe))
            .select("vec_id",
                    F.col("ivf_bucket").cast("long").alias("ivf_bucket"),
                    sim.alias("cosine"))
            .orderBy(F.desc("cosine"), "vec_id")
            .limit(10))


@q(
    "exact_substring_dedup",
    """
    WITH docs AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 2600),
    apos AS (
      SELECT doc_id, text,
             unnest(range(0, CAST(greatest(length(text) - 15, 0)
                                  AS BIGINT), 16)) AS p
      FROM docs),
    anchors AS (
      SELECT doc_id AS id_a, p AS pos_a,
             substr(text, CAST(p + 1 AS INT), 16) AS g
      FROM apos),
    fpos AS (
      SELECT doc_id, text,
             unnest(range(0, CAST(greatest(length(text) - 15, 0)
                                  AS BIGINT), 1)) AS p
      FROM docs),
    fulls AS (
      SELECT doc_id AS id_b, p AS pos_b,
             substr(text, CAST(p + 1 AS INT), 16) AS g
      FROM fpos),
    hits AS (
      SELECT id_a, id_b, pos_a, pos_b, pos_a - pos_b AS diag
      FROM anchors JOIN fulls USING (g) WHERE id_a <> id_b),
    marked AS (
      SELECT *, CASE WHEN pos_a - LAG(pos_a) OVER (
                       PARTITION BY id_a, id_b, diag
                       ORDER BY pos_a) = 16
                     THEN 0 ELSE 1 END AS brk
      FROM hits),
    grp AS (
      SELECT *, SUM(brk) OVER (PARTITION BY id_a, id_b, diag
                               ORDER BY pos_a) AS isl
      FROM marked)
    SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
           CAST(MIN(pos_a) AS BIGINT) AS start_a,
           CAST(MIN(pos_b) AS BIGINT) AS start_b,
           CAST(MAX(pos_a) - MIN(pos_a) + 16 AS BIGINT) AS span_len
    FROM grp GROUP BY id_a, id_b, diag, isl
    HAVING MAX(pos_a) - MIN(pos_a) + 16 >= 48
    """,
    doc="Exact-substring dedup (Lee et al. 2022 suffix-array method "
        "as a DataFrame join): anchored char-16-gram equi-join + "
        "diagonal gaps-and-islands merge reports every cross-document "
        "duplicated span >= 48 chars with byte-exact verified length "
        "(operators/dedup.exact_substring_spans). The whole pipeline "
        "— anchor/full gram generation, diagonal merge, span close — "
        "is reproduced in DuckDB SQL.",
)
def exact_substring_dedup(spark, sf_dir):
    from rsyslog_spark.operators.dedup import exact_substring_spans

    docs = load(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 2600)
    out = exact_substring_spans(docs, "text", "doc_id",
                                k=16, min_len=48)
    return out.select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        F.col("start_a").cast("long").alias("start_a"),
        F.col("start_b").cast("long").alias("start_b"),
        F.col("span_len").cast("long").alias("span_len"))


@q(
    "html_text_extraction",
    """
    WITH raw AS (
      SELECT doc_id,
             '<html><head><title>t</title><style>p{margin:0}</style>'
             || '</head><body><script>var a=1;</script><h1>'
             || lang || '</h1><p>First &amp; '
             || text || '</p><!-- c --><div>tail&nbsp;'
             || '&#39;end&#39;</div></body></html>' AS h
      FROM documents WHERE doc_id < 300),
    s1 AS (SELECT doc_id,
             regexp_replace(regexp_replace(regexp_replace(h,
               '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
               '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
               '(?is)<head[^>]*>.*?</head>', ' ', 'g') AS h
           FROM raw),
    s2 AS (SELECT doc_id, regexp_replace(h,
             '(?s)<!--.*?-->', ' ', 'g') AS h FROM s1),
    s3 AS (SELECT doc_id, regexp_replace(h,
             '(?i)</?(p|div|br|li|ul|ol|tr|table|h[1-6]|blockquote)[^>]*/?>',
             chr(10), 'g') AS h FROM s2),
    s4 AS (SELECT doc_id, regexp_replace(h, '(?s)<[^>]+>', ' ', 'g')
           AS h FROM s3),
    s5 AS (SELECT doc_id,
             replace(replace(replace(replace(replace(replace(replace(
               replace(replace(replace(replace(replace(h,
               '&nbsp;', ' '), '&lt;', '<'),
               '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
               '&apos;', ''''), '&#34;', '"'),
               '&#60;', '<'), '&#62;', '>'), '&#160;', ' '),
               '&amp;', '&'), '&#38;', '&') AS h
           FROM s4),
    s6 AS (SELECT doc_id,
             regexp_replace(regexp_replace(regexp_replace(h,
               '[ \t\r]+', ' ', 'g'),
               ' ?\n ?', chr(10), 'g'),
               '\n{2,}', chr(10) || chr(10), 'g') AS h
           FROM s5)
    SELECT doc_id,
           regexp_replace(h, '^\\s+|\\s+$', '', 'g') AS extracted
    FROM s6
    """,
    doc="HTML-to-text extraction (the stage before every web-corpus "
        "quality/dedup pass): script/style/head/comment removal, "
        "block tags to newlines, tag strip, entity decode, "
        "whitespace collapse — operators/text.html_to_text as a pure "
        "column regex chain, reproduced step-for-step in DuckDB.",
)
def html_text_extraction(spark, sf_dir):
    from rsyslog_spark.operators.text import html_to_text

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    h = F.concat(
        F.lit("<html><head><title>t</title><style>p{margin:0}</style>"
              "</head><body><script>var a=1;</script><h1>"),
        F.col("lang"), F.lit("</h1><p>First &amp; "),
        F.col("text"),
        F.lit("</p><!-- c --><div>tail&nbsp;&#39;end&#39;</div>"
              "</body></html>"))
    return docs.select("doc_id", html_to_text(h).alias("extracted"))


@q(
    "url_dedup_canonical",
    """
    WITH urls AS (
      SELECT event_id,
             'https://site' || CAST(user_id % 20 AS VARCHAR)
               || '.example.com/p/' || CAST(user_id AS VARCHAR)
               || CASE WHEN event_id % 4 = 3 THEN '/alt' ELSE '' END
               AS canon
      FROM events WHERE event_id < 1000)
    SELECT canon AS canonical_url,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(event_id) AS BIGINT) AS first_event
    FROM urls GROUP BY canon
    """,
    doc="Web-corpus URL dedup (CCNet/RefinedWeb convention): messy "
        "crawl variants — case-shuffled scheme/host, default :443 "
        "port, tracking params (utm_*/fbclid), unsorted query "
        "strings, trailing slashes, fragments — collapse to ONE "
        "canonical key (functions/url.url_canonicalize, pure column "
        "regex) before any content-level pass. The oracle computes "
        "the expected canonical form straight from the generating "
        "columns, so any canonicalization drift breaks the hash.",
)
def url_dedup_canonical(spark, sf_dir):
    from rsyslog_spark.functions.url import url_canonicalize

    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 1000)
    sid = (F.col("user_id") % 20).cast("string")
    uid = F.col("user_id").cast("string")
    base_host = F.concat(F.lit("site"), sid, F.lit(".example.com"))
    messy = (
        F.when(F.col("event_id") % 4 == 0,
               F.concat(F.lit("https://"), base_host,
                        F.lit("/p/"), uid, F.lit("?utm_source=feed")))
        .when(F.col("event_id") % 4 == 1,
              F.concat(F.lit("HTTPS://SITE"), sid,
                       F.lit(".Example.COM:443/p/"), uid,
                       F.lit("#section")))
        .when(F.col("event_id") % 4 == 2,
              F.concat(F.lit("https://"), base_host, F.lit("/p/"),
                       uid, F.lit("/?fbclid=x")))
        .otherwise(
            F.concat(F.lit("https://"), base_host, F.lit("/p/"),
                     uid, F.lit("/alt")))
    )
    return (ev.select(url_canonicalize(messy).alias("canonical_url"),
                      "event_id")
            .groupBy("canonical_url")
            .agg(F.count(F.lit(1)).cast("long").alias("n"),
                 F.min("event_id").cast("long").alias("first_event")))


@q(
    "dedup_components",
    """
    WITH RECURSIVE sh AS (
      SELECT doc_id, sh, sz FROM (
        SELECT doc_id,
               list_distinct([array_to_string(words[i:i+2], ' ')
                              FOR i IN range(1, GREATEST(len(words) - 2, 1) + 1)]) AS shs,
               len(list_distinct([array_to_string(words[i:i+2], ' ')
                              FOR i IN range(1, GREATEST(len(words) - 2, 1) + 1)])) AS sz
        FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS words
              FROM documents WHERE doc_id < 300)
      ), UNNEST(shs) AS u(sh)
    ),
    pairs AS (
      SELECT id_a, id_b FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               ROUND(COUNT(*) * 1.0
                     / (MIN(a.sz) + MIN(b.sz) - COUNT(*)), 6) AS jac
        FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
      ) WHERE jac >= 0.1
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs
    ),
    reach(id, lbl) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.id
    )
    SELECT CAST(id AS BIGINT) AS doc_id,
           CAST(MIN(lbl) AS BIGINT) AS component
    FROM reach GROUP BY id
    """,
    doc="Near-dup clustering close: exact-Jaccard pairs (>=0.1) as "
        "edges -> connected components by min-label propagation with "
        "pointer jumping (operators/dedup.connected_components; "
        "oracle = DuckDB recursive-CTE reachability). The canonical-"
        "doc-per-component pattern every dedup pipeline ends with.",
)
def dedup_components(spark, sf_dir):
    from rsyslog_spark.operators.dedup import connected_components

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    pairs = ngram_jaccard_pairs(docs, "text", "doc_id",
                                shingle_n=3, threshold=0.1)
    comp = connected_components(pairs.select("id_a", "id_b"))
    return comp.select(F.col("id").alias("doc_id"),
                       F.col("component"))


@q(
    "stratified_sample_docs",
    """
    SELECT lang,
           COUNT(*) AS n_kept,
           CAST(SUM(doc_id) AS BIGINT) AS id_checksum
    FROM documents
    WHERE ((doc_id * 2654435761 + 7) % 4294967296) / 4294967296.0
          < CASE lang WHEN 'en' THEN 1.0 WHEN 'de' THEN 0.5
                      WHEN 'fr' THEN 0.25 ELSE 0.1 END
    GROUP BY lang
    """,
    doc="Deterministic per-stratum data mixing (keep 100% en / 50% de "
        "/ 25% fr / 10% rest) by engine-portable key hash — same "
        "documents kept on every run, engine, and partitioning "
        "(operators/sampling.stratified_sample; the oracle computes "
        "the identical multiplicative hash in DuckDB).",
)
def stratified_sample_docs(spark, sf_dir):
    from rsyslog_spark.operators.sampling import stratified_sample

    docs = load(spark, sf_dir, "documents")
    kept = stratified_sample(
        docs, "lang", {"en": 1.0, "de": 0.5, "fr": 0.25},
        key_col="doc_id", default_fraction=0.1, seed=7, portable=True)
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("doc_id").cast("long").alias("id_checksum"))


@q(
    "decontaminate_ngram_overlap",
    """
    WITH tr AS (SELECT * FROM documents WHERE doc_id % 10 <> 0 AND doc_id < 300),
    be AS (SELECT * FROM documents WHERE doc_id % 10 = 0 AND doc_id < 300),
    tsh AS (
      SELECT doc_id, sh FROM (
        SELECT doc_id,
               list_distinct([array_to_string(words[i:i+2], ' ')
                              FOR i IN range(1, GREATEST(len(words) - 2, 1) + 1)]) AS shs
        FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS words FROM tr)
      ), UNNEST(shs) AS u(sh) WHERE sh <> ''
    ),
    bsh AS (
      SELECT DISTINCT sh FROM (
        SELECT list_distinct([array_to_string(words[i:i+2], ' ')
                              FOR i IN range(1, GREATEST(len(words) - 2, 1) + 1)]) AS shs
        FROM (SELECT string_split_regex(lower(trim(text)), '\\s+') AS words FROM be)
      ), UNNEST(shs) AS u(sh) WHERE sh <> ''
    )
    SELECT t.doc_id,
           ROUND(COALESCE(h.hits, 0) * 1.0 / t.total, 6) AS overlap_frac,
           COALESCE(h.hits, 0) * 1.0 / t.total >= 0.5 AS contaminated
    FROM (SELECT doc_id, COUNT(*) AS total FROM tsh GROUP BY doc_id) t
    LEFT JOIN (SELECT doc_id, COUNT(*) AS hits FROM tsh
               WHERE sh IN (SELECT sh FROM bsh) GROUP BY doc_id) h
    USING (doc_id)
    """,
    doc="Benchmark decontamination: per training doc, the fraction "
        "of its word 3-grams found anywhere in the held-out benchmark "
        "subset (doc_id % 10 == 0); >= 0.5 flags eval leakage "
        "(operators/text.ngram_decontaminate).",
)
def decontaminate_ngram_overlap(spark, sf_dir):
    from rsyslog_spark.operators.text import ngram_decontaminate

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    train = docs.filter(F.col("doc_id") % 10 != 0)
    bench = docs.filter(F.col("doc_id") % 10 == 0)
    return ngram_decontaminate(train, bench, "text", "doc_id",
                               shingle_n=3, threshold=0.5)


@q(
    "doc_repetition_filter",
    """
    SELECT lang,
           ROUND(AVG(ROUND((n - nd) * 1.0 / n, 6)), 4) AS mean_dup_word,
           ROUND(AVG(top_bg), 4) AS mean_top_bigram,
           CAST(SUM(CASE WHEN (n - nd) * 1.0 / n > 0.6 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_flagged
    FROM (
      SELECT lang, len(words) AS n, len(list_distinct(words)) AS nd,
             ROUND(
               (SELECT MAX(c) FROM (
                  SELECT COUNT(*) AS c FROM UNNEST(bgs) AS u(g) GROUP BY g))
               * 1.0 / len(bgs), 6) AS top_bg
      FROM (
        SELECT lang, words,
               [array_to_string(words[i:i+1], ' ')
                FOR i IN range(1, GREATEST(len(words) - 1, 1) + 1)] AS bgs
        FROM (SELECT lang, string_split_regex(lower(trim(text)), '\\s+') AS words
              FROM documents)
      )
    ) GROUP BY lang
    """,
    doc="Gopher-style within-document repetition: duplicate-word "
        "fraction and most-frequent-bigram share (sorted run-length "
        "scan, O(n log n) per doc), aggregated per lang with a "
        ">0.6 dup-word flag count (operators/text.repetition_metrics).",
)
def doc_repetition_filter(spark, sf_dir):
    from rsyslog_spark.operators.text import repetition_metrics

    docs = load(spark, sf_dir, "documents")
    dup_word, top_bigram = repetition_metrics("text")
    per_doc = docs.select(
        "lang", dup_word.alias("dw"), top_bigram.alias("tb"))
    return per_doc.groupBy("lang").agg(
        F.round(F.avg("dw"), 4).alias("mean_dup_word"),
        F.round(F.avg("tb"), 4).alias("mean_top_bigram"),
        F.sum((F.col("dw") > 0.6).cast("long")).cast("long")
         .alias("n_flagged"))


@q(
    "sequence_packing",
    """
    SELECT lang, bin_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc
    FROM (
      SELECT lang, doc_id, n_tokens,
             CAST(FLOOR((SUM(n_tokens) OVER w - n_tokens) / 2048.0) AS BIGINT)
               AS bin_id
      FROM (SELECT lang, doc_id,
                   len(string_split_regex(trim(text), '\\s+')) AS n_tokens
            FROM documents)
      WINDOW w AS (PARTITION BY lang ORDER BY doc_id
                   ROWS UNBOUNDED PRECEDING)
    ) GROUP BY lang, bin_id
    """,
    doc="Sequence packing: concatenate docs per lang shard in doc_id "
        "order, cut 2048-token context windows, report per-bin doc "
        "counts and token totals (operators/sampling.pack_sequences; "
        "per-shard windows - no global serialization).",
)
def sequence_packing(spark, sf_dir):
    from rsyslog_spark.operators.sampling import pack_sequences
    from rsyslog_spark.operators.text import token_count_ws

    docs = load(spark, sf_dir, "documents")
    packed = pack_sequences(docs, "doc_id", token_count_ws("text"),
                            window_tokens=2048, shard_col="lang")
    return packed.groupBy("lang", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("bin_tokens"),
        F.min("doc_id").cast("long").alias("first_doc"))


@q(
    "bm25_search",
    """
    WITH base AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks,
             len(string_split_regex(lower(trim(text)), '\\s+')) AS dl
      FROM documents
    ),
    stats AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM base),
    tf AS (
      SELECT doc_id, dl, t, COUNT(*) AS tf
      FROM base, UNNEST(toks) AS u(t)
      WHERE t IN ('scan', 'hash', 'join')
      GROUP BY doc_id, dl, t
    ),
    dfc AS (SELECT t, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY t)
    SELECT tf.doc_id,
           ROUND(SUM(
             ln((stats.n - dfc.df + 0.5) / (dfc.df + 0.5) + 1.0)
             * tf.tf * 2.2
             / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.dl / stats.avgdl))
           ), 6) AS bm25
    FROM tf JOIN dfc USING (t) CROSS JOIN stats
    GROUP BY tf.doc_id
    """,
    doc="BM25 lexical search over documents for terms (scan, hash, "
        "join) — the log-search primitive and lexical half of hybrid "
        "retrieval (operators/text.bm25_scores; k1=1.2 b=0.75; one "
        "shuffle on doc id, |terms|-row broadcast df frame).",
)
def bm25_search(spark, sf_dir):
    from rsyslog_spark.operators.text import bm25_scores

    docs = load(spark, sf_dir, "documents")
    return bm25_scores(docs, ["scan", "hash", "join"],
                       "text", "doc_id")


@q(
    "ngram_top_counts",
    """
    SELECT g AS bigram, COUNT(*) AS cnt
    FROM (
      SELECT [array_to_string(words[i:i+1], ' ')
              FOR i IN range(1, GREATEST(len(words) - 1, 1) + 1)] AS bgs
      FROM (SELECT string_split_regex(lower(trim(text)), '\\s+') AS words
            FROM documents)
    ), UNNEST(bgs) AS u(g)
    WHERE g <> ''
    GROUP BY g
    ORDER BY cnt DESC, g
    LIMIT 20
    """,
    doc="Corpus n-gram statistics: top-20 word bigrams by count "
        "(explode -> partial-agg groupBy -> TakeOrderedAndProject; "
        "the n-gram LM-count primitive).",
)
def ngram_top_counts(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+", -1)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - 2, F.lit(0)))
    bigrams = F.filter(
        F.transform(idx,
                    lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 2))),
        lambda g: F.length(g) > 0)
    return (docs.select(F.explode(bigrams).alias("bigram"))
            .groupBy("bigram").agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.col("cnt").desc(), "bigram").limit(20))


@q(
    "lm_perplexity_filter",
    """
    WITH base AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         t -> t <> '') AS toks
      FROM documents
    ),
    bg AS (
      SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
      FROM base, UNNEST(range(1, len(toks))) AS u(i)
      WHERE len(toks) >= 2
    ),
    c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM bg GROUP BY 1, 2),
    c1 AS (SELECT w1, SUM(c2) AS c1 FROM c2 GROUP BY 1),
    v AS (SELECT COUNT(DISTINCT t) AS v
          FROM base, UNNEST(toks) AS u(t)),
    scored AS (
      SELECT bg.doc_id,
             ln((c2.c2 + 0.5) / (c1.c1 + 0.5 * v.v)) AS lp
      FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(AVG(lp), 4) AS avg_logp,
           ROUND(EXP(-AVG(lp)), 4) AS ppl
    FROM scored GROUP BY doc_id
    """,
    doc="Per-document bigram LM perplexity — the CCNet-style quality "
        "filter (score each doc against an n-gram model, drop the "
        "high-perplexity tail). Self-trained add-0.5 bigram model "
        "(operators/text.ngram_lm_scores): ONE partial-agg shuffle "
        "for bigram counts, context counts derived from the bigram "
        "frame, V broadcast, shuffle equi-join on the bigram key "
        "(vocab-bounded, deliberately not broadcast), one "
        "groupBy(doc). DuckDB reproduces counts + smoothing exactly.",
)
def lm_perplexity_filter(spark, sf_dir):
    from rsyslog_spark.operators.text import ngram_lm_scores

    docs = load(spark, sf_dir, "documents")
    return ngram_lm_scores(docs, "text", "doc_id")


@q(
    "hybrid_retrieval_rrf",
    """
    WITH lex AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS r
      FROM (
        WITH base AS (
          SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks,
                 len(string_split_regex(lower(trim(text)), '\\s+')) AS dl
          FROM documents
        ),
        stats AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM base),
        tf AS (
          SELECT doc_id, dl, t, COUNT(*) AS tf
          FROM base, UNNEST(toks) AS u(t)
          WHERE t IN ('scan', 'hash', 'join') GROUP BY doc_id, dl, t
        ),
        dfc AS (SELECT t, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY t)
        SELECT tf.doc_id,
               SUM(ln((stats.n - dfc.df + 0.5) / (dfc.df + 0.5) + 1.0)
                   * tf.tf * 2.2
                   / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / stats.avgdl))) AS bm25
        FROM tf JOIN dfc USING (t) CROSS JOIN stats GROUP BY tf.doc_id
      )
    ),
    sem AS (
      SELECT vec_id AS doc_id,
             ROW_NUMBER() OVER (ORDER BY cos DESC, vec_id) AS r
      FROM (
        SELECT e.vec_id,
               ROUND(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)
                     / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                              CAST(e.embedding AS DOUBLE[])))
                        * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos
        FROM embeddings e,
             (SELECT CAST(embedding AS DOUBLE[]) AS qv
              FROM embeddings WHERE vec_id = 0) q
      )
    )
    SELECT doc_id,
           ROUND(SUM(1.0 / (60 + r)), 6) AS rrf
    FROM (SELECT * FROM lex WHERE r <= 100
          UNION ALL SELECT * FROM sem WHERE r <= 100)
    GROUP BY doc_id
    ORDER BY rrf DESC, doc_id LIMIT 20
    """,
    doc="Hybrid retrieval: BM25 lexical ranking fused with embedding "
        "cosine ranking by reciprocal-rank fusion (1/(60+rank)) — "
        "the two-tower search pipeline over one corpus, top-20 "
        "(operators/text.bm25_scores + similarity cosine; both "
        "rankings and the fusion reproduced in the DuckDB oracle).",
)
def hybrid_retrieval_rrf(spark, sf_dir):
    from pyspark.sql import Window
    from rsyslog_spark.operators.similarity import cosine
    from rsyslog_spark.operators.text import bm25_scores

    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0)
          .select("embedding").first()[0]]
    # rank only the top-100 of each ranker (standard RRF
    # truncation): orderBy().limit() is TakeOrderedAndProject — a
    # per-partition top-k + driver merge, never a global sort — and
    # the row_number window then runs over 100 rows, not the corpus
    lex = (bm25_scores(docs, ["scan", "hash", "join"],
                       "text", "doc_id")
           .orderBy(F.col("bm25").desc(), "doc_id").limit(100)
           .withColumn("r", F.row_number().over(
               Window.orderBy(F.col("bm25").desc(), "doc_id"))))
    qcol = F.array(*[F.lit(v) for v in qv])
    vec = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    sem = (emb.select(
        F.col("vec_id").alias("doc_id"),
        F.round(cosine(vec, qcol), 6).alias("cos"))
        .orderBy(F.col("cos").desc(), "doc_id").limit(100)
        .withColumn("r", F.row_number().over(
            Window.orderBy(F.col("cos").desc(), "doc_id"))))
    both = lex.select("doc_id", "r").unionByName(
        sem.select("doc_id", "r"))
    return (both.groupBy("doc_id")
            .agg(F.round(F.sum(1.0 / (60 + F.col("r"))), 6)
                 .alias("rrf"))
            .orderBy(F.col("rrf").desc(), "doc_id").limit(20))


@q(
    "anomaly_zscore_windows",
    """
    WITH counts AS (
      SELECT event_type, date_trunc('hour', ts) AS w, COUNT(*) AS cnt
      FROM events GROUP BY 1, 2
    ),
    stats AS (
      SELECT event_type, AVG(cnt) AS mu, STDDEV_SAMP(cnt) AS sd
      FROM counts GROUP BY event_type
    )
    SELECT c.event_type, c.w AS window_start, c.cnt,
           ROUND((c.cnt - s.mu) / s.sd, 4) AS z
    FROM counts c JOIN stats s USING (event_type)
    WHERE s.sd > 0 AND ABS((c.cnt - s.mu) / s.sd) >= 1.5
    """,
    doc="Volume-anomaly detection: per-event-type hourly counts, "
        "z-score against the type's own mean/stddev, flag |z|>=1.5 "
        "(the impstats-counter anomaly policy; one partial-agg "
        "shuffle + a per-type broadcast stats join).",
)
def anomaly_zscore_windows(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    counts = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("window_start")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    stats = counts.groupBy("event_type").agg(
        F.avg("cnt").alias("mu"), F.stddev_samp("cnt").alias("sd"))
    z = (F.col("cnt") - F.col("mu")) / F.col("sd")
    return (counts.join(F.broadcast(stats), "event_type")
            .filter((F.col("sd") > 0) & (F.abs(z) >= 1.5))
            .select("event_type", "window_start", "cnt",
                    F.round(z, 4).alias("z")))


@q(
    "training_pipeline_e2e",
    """
    WITH scored AS (
      SELECT doc_id, lang, text,
             md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
             len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
             (CASE WHEN length(text) BETWEEN 50 AND 10000 THEN 0.4 ELSE 0.0 END
              + CASE WHEN ROUND(length(regexp_replace(trim(text), '\\s+', '', 'g'))
                       * 1.0 / len(string_split_regex(trim(text), '\\s+')), 6)
                       BETWEEN 2.0 AND 12.0 THEN 0.3 ELSE 0.0 END
              + CASE WHEN ROUND((length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))
                       * 1.0 / length(text), 6) <= 0.2 THEN 0.3 ELSE 0.0 END) AS q,
             ROUND((len(string_split_regex(lower(trim(text)), '\\s+'))
                    - len(list_distinct(string_split_regex(lower(trim(text)), '\\s+'))))
                   * 1.0 / len(string_split_regex(lower(trim(text)), '\\s+')), 6) AS dw
      FROM documents
    ),
    filtered AS (SELECT * FROM scored WHERE q >= 0.7 AND dw <= 0.6),
    deduped AS (
      SELECT * FROM filtered
      WHERE doc_id IN (SELECT MIN(doc_id) FROM filtered GROUP BY fp)
    ),
    sampled AS (
      SELECT * FROM deduped
      WHERE ((doc_id * 2654435761 + 11) % 4294967296) / 4294967296.0
            < CASE lang WHEN 'en' THEN 1.0 WHEN 'zh' THEN 0.5 ELSE 0.25 END
    ),
    packed AS (
      SELECT lang, doc_id, n_tokens,
             CAST(FLOOR((SUM(n_tokens) OVER w - n_tokens) / 1024.0) AS BIGINT) AS bin_id
      FROM sampled
      WINDOW w AS (PARTITION BY lang ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
    )
    SELECT lang, COUNT(DISTINCT bin_id) AS n_bins,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(doc_id) AS BIGINT) AS id_checksum
    FROM packed GROUP BY lang
    """,
    doc="The full training-data pipeline as ONE lazy plan: "
        "quality + repetition filter -> fingerprint exact-dedup "
        "(min-id per md5) -> deterministic per-lang mixing "
        "(en 1.0 / zh 0.5 / rest 0.25) -> 1024-token sequence "
        "packing per lang shard -> corpus stats. Composes "
        "operators/text + dedup + sampling; the oracle chains the "
        "identical stages in DuckDB and hash-matches the totals.",
)
def training_pipeline_e2e(spark, sf_dir):
    from pyspark.sql import Window
    from rsyslog_spark.operators.sampling import (
        pack_sequences, stratified_sample)
    from rsyslog_spark.operators.text import (
        doc_fingerprint, quality_score, repetition_metrics,
        token_count_ws)

    docs = load(spark, sf_dir, "documents")
    dw, _tb = repetition_metrics("text")
    scored = docs.select(
        "doc_id", "lang", "text",
        doc_fingerprint("text").alias("fp"),
        quality_score("text").alias("q"), dw.alias("dw"))
    filtered = scored.filter((F.col("q") >= 0.7) & (F.col("dw") <= 0.6))
    w = Window.partitionBy("fp")
    deduped = filtered.withColumn(
        "__keep", F.min("doc_id").over(w)) \
        .filter(F.col("doc_id") == F.col("__keep")).drop("__keep")
    sampled = stratified_sample(
        deduped, "lang", {"en": 1.0, "zh": 0.5},
        key_col="doc_id", default_fraction=0.25, seed=11,
        portable=True)
    packed = pack_sequences(sampled, "doc_id",
                            token_count_ws("text"),
                            window_tokens=1024, shard_col="lang")
    return packed.groupBy("lang").agg(
        F.countDistinct("bin_id").alias("n_bins"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.sum("doc_id").cast("long").alias("id_checksum"))
