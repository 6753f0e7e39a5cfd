"""Text-analysis query registrations (beyond-reference ops)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.text import (
    EMAIL_REGEX,
    PHONE_REGEX,
    STOPWORDS,
    TOKEN_REGEX,
    fingerprints,
    language_id,
    pii_mask,
    quality_score,
    repetition_metrics,
    token_counts,
    winnowing_fingerprints,
)
from ..registry import register
from ..sources.tables import load_table
from .joins import _pagerank_ctes

_STOP_IN = ", ".join(f"'{s}'" for s in STOPWORDS)

# shared word-list fragments for the oracles
_W = "list_filter(string_split(text, ' '), w -> length(w) > 0)"
_STOP_RATIO = (
    f"CASE WHEN len({_W}) = 0 THEN 0.0 ELSE "
    f"len(list_filter({_W}, x -> lower(x) IN ({_STOP_IN}))) * 1.0 / len({_W}) END"
)


@register(
    "text_language_id",
    f"""
    SELECT doc_id AS id, round({_STOP_RATIO}, 6) AS stop_ratio,
           CASE WHEN {_STOP_RATIO} >= 0.05 THEN 'en' ELSE 'other' END AS lang_pred
    FROM documents
    """,
)
def text_language_id(spark, sf_dir):
    return language_id(load_table(spark, sf_dir, "documents"), "doc_id", "text")


_PUNCT = (
    "CASE WHEN length(text) = 0 THEN 0.0 ELSE "
    "length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) * 1.0 / length(text) END"
)


@register(
    "text_quality_score",
    f"""
    SELECT doc_id AS id,
           round(least(length(text) / 500.0, 1.0), 6) AS len_score,
           round({_STOP_RATIO}, 6) AS stop_ratio,
           round({_PUNCT}, 6) AS punct_ratio,
           round(CASE WHEN len({_W}) = 0 THEN 0.0 ELSE
             list_sum(list_transform({_W}, x -> CAST(length(x) AS DOUBLE)))
             / len({_W}) END, 6) AS avg_word_len,
           round(least(length(text) / 500.0, 1.0) * 0.4
                 + least({_STOP_RATIO} * 10, 1.0) * 0.3
                 + (1 - least({_PUNCT} * 10, 1.0)) * 0.3, 6) AS quality
    FROM documents
    """,
)
def text_quality_score(spark, sf_dir):
    return quality_score(load_table(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "text_token_counts",
    f"""
    SELECT doc_id AS id,
           CAST(len({_W}) AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '{TOKEN_REGEX}')) AS BIGINT)
             AS regex_tokens
    FROM documents
    """,
)
def text_token_counts(spark, sf_dir):
    return token_counts(load_table(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "text_fingerprints",
    f"""
    SELECT doc_id AS id,
           md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fingerprint,
           list_min(list_transform({_W}, x -> md5(lower(x)))) AS min_word_hash
    FROM documents
    """,
)
def text_fingerprints(spark, sf_dir):
    return fingerprints(load_table(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "text_repetition_filter",
    # Gopher-style repetition filter (duplicate-word fraction + modal
    # 2-gram fraction). The Spark side computes the 2-gram mode MAP-SIDE
    # (sorted-array longest-run fold, zero shuffle); this oracle computes
    # it the explode-and-group way — two algorithms, one answer.
    f"""
    WITH w AS (SELECT doc_id, {_W} AS ws FROM documents),
    g AS (
      SELECT doc_id, ws[i] || ' ' || ws[i+1] AS gram
      FROM w, unnest(range(1, len(ws))) AS t(i)
    ),
    gc AS (SELECT doc_id, gram, count(*) AS n FROM g GROUP BY doc_id, gram),
    top AS (SELECT doc_id, max(n) AS top_n FROM gc GROUP BY doc_id),
    m AS (
      SELECT w.doc_id, CAST(len(ws) AS BIGINT) AS n_tokens,
             round(CASE WHEN len(ws) = 0 THEN 0.0
                   ELSE 1.0 - len(list_distinct(ws)) * 1.0 / len(ws) END, 6)
               AS dup_word_frac,
             round(coalesce(top.top_n * 1.0 / (len(ws) - 1), 0.0), 6)
               AS top_2gram_frac
      FROM w LEFT JOIN top USING (doc_id)
    )
    SELECT doc_id, n_tokens, dup_word_frac, top_2gram_frac,
           (dup_word_frac <= 0.5 AND top_2gram_frac <= 0.08) AS keep
    FROM m
    """,
)
def text_repetition_filter(spark, sf_dir):
    return repetition_metrics(load_table(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "text_pii_mask",
    # PII scrubbing pass: the corpus has no real PII, so the plan first
    # APPENDS synthetic email/phone spans derived from doc_id, then masks
    # them — which makes the regex replace/count parity the thing under
    # test. Patterns stay in the Java-regex ∩ RE2 dialect subset.
    f"""
    WITH aug AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or call 555-0'
                  || CAST(doc_id % 100 AS VARCHAR) || ' now' AS t
      FROM documents
    )
    SELECT doc_id,
      CAST(len(regexp_extract_all(t, '{EMAIL_REGEX}')) AS BIGINT) AS n_emails,
      CAST(len(regexp_extract_all(t, '{PHONE_REGEX}')) AS BIGINT) AS n_phones,
      md5(regexp_replace(
            regexp_replace(t, '{EMAIL_REGEX}', '[EMAIL]', 'g'),
            '{PHONE_REGEX}', '[PHONE]', 'g')) AS masked_md5
    FROM aug
    """,
)
def text_pii_mask(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or call 555-0"),
            (F.col("doc_id") % 100).cast("string"),
            F.lit(" now"),
        ).alias("t"),
    )
    return pii_mask(aug, "doc_id", "t")


@register(
    "text_bpe_pair_counts",
    # The BPE-training inner loop at corpus scale: global counts of
    # adjacent token pairs (the statistic a merge step maximizes over).
    # Explode + groupBy with automatic map-side partial aggregation —
    # the shuffle carries distinct pairs (≤ vocab²), not corpus rows.
    f"""
    WITH w AS (SELECT {_W} AS ws FROM documents),
    g AS (
      SELECT ws[i] || ' ' || ws[i+1] AS pair
      FROM w, unnest(range(1, len(ws))) AS t(i)
    )
    SELECT pair, CAST(count(*) AS BIGINT) AS n
    FROM g GROUP BY pair HAVING count(*) >= 2
    """,
)
def text_bpe_pair_counts(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    staged = docs.select(F.split("text", " ").alias("raw"))
    staged = staged.select(
        F.filter(F.col("raw"), lambda x: F.length(x) > 0).alias("w")
    )
    w = F.col("w")
    pairs = F.when(
        F.size(w) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - 1),
            lambda i: F.concat(
                F.element_at(w, i), F.lit(" "), F.element_at(w, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        staged.select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
    )


@register(
    "text_winnowing_fingerprints",
    # Winnowing (k=3, w=4): per-document robust fingerprint set. The
    # oracle replays gram-hashing and window minima with DuckDB list
    # comprehensions — hex md5 minima are lexicographic on both engines.
    f"""
    WITH w AS (SELECT doc_id, {_W} AS ws FROM documents),
    g AS (
      SELECT doc_id,
             CASE WHEN len(ws) >= 3
                  THEN [md5(array_to_string(ws[i:i+2], ' '))
                        FOR i IN range(1, len(ws) - 1)]
                  ELSE [] END AS h
      FROM w
    ),
    f AS (
      SELECT doc_id,
             CASE WHEN len(h) >= 4
                  THEN [list_min(h[i:i+3]) FOR i IN range(1, len(h) - 2)]
                  WHEN len(h) > 0 THEN [list_min(h)]
                  ELSE [] END AS fps
      FROM g
    )
    SELECT doc_id, unnest(list_distinct(fps)) AS fingerprint FROM f
    """,
)
def text_winnowing_fingerprints(spark, sf_dir):
    return winnowing_fingerprints(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", k=3, w=4
    )


@register(
    "text_unigram_logprob",
    # Corpus-LM quality score (the CCNet/perplexity-filter shape with a
    # unigram model): p(w) from corpus counts, per-doc mean -ln p(w) —
    # high = rare-word-heavy docs (operators/text.py:unigram_logprob).
    # Round-5 changes, pinned in _RECHECK_FIRST: (a) the forced
    # F.broadcast on the corpus word table is GONE — a 100 TB corpus
    # vocabulary is not broadcastable (same anti-pattern VERDICT r4
    # flagged on the dedup drop list), AQE now decides; (b) words are the
    # empty-filtered list on both sides (trailing-space split artifacts
    # are not tokens); (c) perplexity = exp(mean_neg_logprob) added.
    # avg folds ~25 doubles per doc in engine-specific order; |error| «
    # 1e-6, inside the round-6 convention.
    f"""
    WITH w AS (
      SELECT doc_id, unnest({_W}) AS word FROM documents
    ), wf AS (SELECT word, count(*) AS n FROM w GROUP BY word),
    tot AS (SELECT sum(n) AS total FROM wf)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           round(avg(-ln(wf.n * 1.0 / tot.total)), 6) AS mean_neg_logprob,
           round(exp(avg(-ln(wf.n * 1.0 / tot.total))), 6) AS perplexity
    FROM w JOIN wf ON w.word = wf.word CROSS JOIN tot
    GROUP BY doc_id
    """,
)
def text_unigram_logprob(spark, sf_dir):
    from ..operators.text import unigram_logprob

    docs = load_table(spark, sf_dir, "documents")
    return unigram_logprob(docs, "doc_id", "text")


@register(
    "text_sliding_chunks",
    # Overlapping sliding-window chunking (W=10 words, stride 5) — the
    # standard pre-embedding split; disjoint chunks lose cross-boundary
    # context, so embedding pipelines chunk with overlap. Map-side only
    # (split materialized once, posexplode + slice, no shuffle). DuckDB
    # list slicing w[i : i+9] is 1-based inclusive ≡ Spark slice(i, 10).
    """
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    c AS (
      SELECT doc_id, i, w[i : i + 9] AS chunk_words
      FROM w, LATERAL unnest(generate_series(1, greatest(len(w), 1), 5)) t(i)
    )
    SELECT doc_id, CAST((i - 1) / 5 AS BIGINT) AS chunk_no,
           array_to_string(chunk_words, ' ') AS chunk
    FROM c
    """,
)
def text_sliding_chunks(spark, sf_dir):
    from ..operators.training import sliding_chunks

    docs = load_table(spark, sf_dir, "documents")
    return sliding_chunks(docs, "doc_id", "text", window_words=10, stride=5)


@register(
    "text_char_entropy",
    # Character-entropy quality signal (operators/text.py:char_entropy) —
    # map-side higher-order fold, zero shuffle. The distinct-char list is
    # SORTED before the fold so both engines sum the identical doubles in
    # the identical order (float addition is not associative; unsorted
    # first-occurrence orders differ across engines).
    """
    WITH c AS (
      SELECT doc_id, length(text) AS n,
             list_sort(list_distinct(
               list_transform(range(1, length(text) + 1),
                              i -> substr(text, CAST(i AS INT), 1)))) AS chars,
             text
      FROM documents
    )
    SELECT doc_id,
           round(coalesce(list_sum(list_transform(chars, ch ->
             -((n - length(replace(text, ch, ''))) * 1.0 / n)
              * log2((n - length(replace(text, ch, ''))) * 1.0 / n))), 0.0), 6)
             AS char_entropy
    FROM c
    """,
)
def text_char_entropy(spark, sf_dir):
    from ..operators.text import char_entropy

    docs = load_table(spark, sf_dir, "documents")
    return char_entropy(docs, "doc_id", "text")


@register(
    "text_normalize_canonical",
    # Canonicalization BEFORE dedup — the standard normalize step every
    # dedup pipeline runs so near-identical bytes hash identically:
    # lowercase, strip non-alphanumerics to spaces, collapse whitespace
    # runs, trim. Emits the canonical text's md5 so the driver hash
    # certifies byte-exact cross-engine normalization (a regex-semantics
    # divergence between engines flips the fingerprint). Map-side only.
    """
    SELECT doc_id,
           md5(trim(regexp_replace(regexp_replace(lower(text),
                 '[^a-z0-9]+', ' ', 'g'), ' +', ' ', 'g'))) AS canon_fp,
           length(trim(regexp_replace(regexp_replace(lower(text),
                 '[^a-z0-9]+', ' ', 'g'), ' +', ' ', 'g'))) AS canon_len
    FROM documents
    """,
)
def text_normalize_canonical(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    canon = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " "),
            " +",
            " ",
        )
    )
    return docs.select(
        "doc_id",
        F.md5(canon).alias("canon_fp"),
        F.length(canon).cast("int").alias("canon_len"),
    )


@register(
    "text_gopher_rules",
    # Gopher structural quality rules (operators/text.py:gopher_rules) —
    # word-count bounds, mean-word-length band, alpha-word fraction,
    # distinct-stopword floor, each as its own boolean plus the
    # conjunction. Map-side on the Spark side; the oracle recomputes every
    # rule from the same word list. Bounds (25, 1000) / (3, 4.5) / 0.8 / 2
    # chosen so the testdata exercises BOTH outcomes of the word-count,
    # mean-word-length, and stopword rules (testdata word counts span
    # 10–99, mean word lengths 3.7–5.3). The boundary compares are done on
    # UNROUNDED doubles on both sides — safe because both engines fold the
    # same integer word lengths in the same array order (bit-identical).
    f"""
    WITH w AS (SELECT doc_id, {_W} AS ws FROM documents),
    m AS (
      SELECT doc_id,
             CAST(len(ws) AS BIGINT) AS n_words,
             CASE WHEN len(ws) = 0 THEN 0.0 ELSE
               list_sum(list_transform(ws, x -> CAST(length(x) AS DOUBLE)))
               / len(ws) END AS mwl,
             CASE WHEN len(ws) = 0 THEN 0.0 ELSE
               len(list_filter(ws, x -> regexp_matches(x, '[a-zA-Z]')))
               * 1.0 / len(ws) END AS af,
             CAST(len(list_distinct(list_filter(ws,
               x -> lower(x) IN ({_STOP_IN})))) AS BIGINT) AS ns
      FROM w
    )
    SELECT doc_id, n_words,
           round(mwl, 6) AS mean_word_len,
           round(af, 6) AS alpha_word_frac,
           ns AS n_distinct_stopwords,
           (n_words >= 25 AND n_words <= 1000) AS rule_word_count,
           (mwl >= 3.0 AND mwl <= 4.5) AS rule_mean_word_len,
           (af >= 0.80) AS rule_alpha_words,
           (ns >= 2) AS rule_stopwords,
           ((n_words >= 25 AND n_words <= 1000) AND (mwl >= 3.0 AND mwl <= 4.5)
            AND (af >= 0.80) AND (ns >= 2)) AS pass_gopher
    FROM m
    """,
)
def text_gopher_rules(spark, sf_dir):
    from ..operators.text import gopher_rules

    docs = load_table(spark, sf_dir, "documents")
    return gopher_rules(
        docs, "doc_id", "text", min_words=25, max_mean_word_len=4.5
    )


@register(
    "text_vocab_coverage",
    # Top-V vocabulary + per-doc OOV rate (operators/text.py:
    # vocab_coverage). The vocabulary is deterministic under ties
    # (count DESC, word ASC) so both engines select the identical V words;
    # Spark takes it via distributed orderBy+limit, the oracle via QUALIFY
    # row_number.
    f"""
    WITH w AS (SELECT doc_id, unnest({_W}) AS word FROM documents),
    v AS (
      SELECT word FROM (SELECT word, count(*) AS c FROM w GROUP BY word)
      QUALIFY row_number() OVER (ORDER BY c DESC, word) <= 25
    ),
    s AS (
      SELECT w.doc_id, count(*) AS n_tokens,
             sum(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS n_oov
      FROM w LEFT JOIN v ON w.word = v.word
      GROUP BY w.doc_id
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_oov AS BIGINT) AS n_oov,
           round(n_oov * 1.0 / n_tokens, 6) AS oov_rate
    FROM s
    """,
)
def text_vocab_coverage(spark, sf_dir):
    from ..operators.text import vocab_coverage

    docs = load_table(spark, sf_dir, "documents")
    return vocab_coverage(docs, "doc_id", "text", vocab_size=25)


# Shared by text_classifier_score and its streaming twin
# (queries/advanced.py streaming_classifier_score): the streaming path
# must land on EXACTLY the batch model + scores, so both register the
# same replay oracle.
_CLASSIFIER_ORACLE = """
    WITH base AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> length(x) > 0) AS w
      FROM documents
    ),
    lbl AS (
      SELECT doc_id, w,
             (len(w) >= 10 AND len(w) <= 1000
              AND list_sum(list_transform(w, x -> length(x))) * 1.0 / len(w)
                  BETWEEN 3.0 AND 10.0) AS pos
      FROM base WHERE len(w) > 0
    ),
    g AS (
      SELECT doc_id, pos,
             unnest(w || CASE WHEN len(w) >= 2
                    THEN [w[i] || '_' || w[i+1] FOR i IN range(1, len(w))]
                    ELSE CAST([] AS VARCHAR[]) END) AS gram
      FROM lbl
    ),
    bk AS (
      SELECT doc_id, pos,
             CAST(('0x' || substr(md5(gram), 1, 8)) AS BIGINT) % 1024 AS b
      FROM g
    ),
    cnt AS (
      SELECT b, sum(CASE WHEN pos THEN 1 ELSE 0 END) AS np,
                sum(CASE WHEN pos THEN 0 ELSE 1 END) AS nn
      FROM bk GROUP BY b
    ),
    tot AS (
      SELECT sum(CASE WHEN pos THEN 1 ELSE 0 END) AS tp,
             sum(CASE WHEN pos THEN 0 ELSE 1 END) AS tn
      FROM bk
    ),
    wt AS (
      SELECT b, round(ln((np + 1.0) / (tp + 1024.0))
                      - ln((nn + 1.0) / (tn + 1024.0)), 6) AS wt
      FROM cnt CROSS JOIN tot
    ),
    nb AS (
      SELECT round(ln((sum(CASE WHEN pos THEN 1 ELSE 0 END) + 1.0)
                   / (sum(CASE WHEN pos THEN 0 ELSE 1 END) + 1.0)), 6) AS bias
      FROM lbl
    ),
    scored AS (
      SELECT doc_id,
             max(CASE WHEN pos THEN 1 ELSE 0 END) = 1 AS label_weak,
             count(*) AS n_grams, avg(wt) AS mw
      FROM bk JOIN wt USING (b) GROUP BY doc_id
    )
    SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams, label_weak,
           round(bias + mw, 6) AS score, (bias + mw) > 0 AS pred
    FROM scored CROSS JOIN nb
    """


@register(
    "text_classifier_score",
    # Learned linear quality classifier (operators/text.py
    # classifier_score): hashed unigram+bigram features (md5 % 1024),
    # closed-form NB log-odds weights from Gopher-style weak labels,
    # map-side mean-weight scoring. The oracle replays TRAINING AND
    # INFERENCE — bucket hashes, class counts, 6dp-rounded weights, bias,
    # final scores — so the learned model itself is value-hashed (the
    # learned-k-means gating precedent).
    _CLASSIFIER_ORACLE,
)
def text_classifier_score(spark, sf_dir):
    from ..operators.text import classifier_score

    docs = load_table(spark, sf_dir, "documents")
    return classifier_score(docs, "doc_id", "text", n_buckets=1024)


# Bigram-LM training + per-doc scoring CTE chain (ends at `scored`),
# shared by the text_bigram_logprob and text_perplexity_buckets oracles.
_BIGRAM_SCORED_CTES = """base AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> length(x) > 0) AS w
      FROM documents
    ),
    bg AS (
      SELECT doc_id, u.w1 AS w1, u.w2 AS w2 FROM (
        SELECT doc_id,
               unnest([{'w1': w[i], 'w2': w[i+1]} FOR i IN range(1, len(w))]) AS u
        FROM base WHERE len(w) >= 2)
    ),
    bc AS (SELECT w1, w2, count(*) AS cb FROM bg GROUP BY w1, w2),
    cc AS (SELECT w1, sum(cb) AS cw FROM bc GROUP BY w1),
    scored AS (
      SELECT doc_id, count(*) AS n_transitions,
             avg(-ln(cb * 1.0 / cw)) AS nlp
      FROM bg JOIN bc USING (w1, w2) JOIN cc USING (w1)
      GROUP BY doc_id
    )"""


@register(
    "text_bigram_logprob",
    # Bigram LM perplexity scoring (operators/text.py bigram_logprob) —
    # the order-2 CCNet-style quality filter: mean -ln P(w2|w1) under
    # corpus-trained conditional counts; context counts derived FROM the
    # bigram table so the model is self-consistent. Oracle replays
    # training (both count tables) and scoring.
    "WITH "
    + _BIGRAM_SCORED_CTES
    + """
    SELECT doc_id, CAST(n_transitions AS BIGINT) AS n_transitions,
           round(nlp, 6) AS mean_neg_logprob, round(exp(nlp), 6) AS perplexity
    FROM scored
    """,
)
def text_bigram_logprob(spark, sf_dir):
    from ..operators.text import bigram_logprob

    docs = load_table(spark, sf_dir, "documents")
    return bigram_logprob(docs, "doc_id", "text")


@register(
    "text_langid_profiles",
    # Cavnar–Trenkle char-trigram rank-order language ID
    # (operators/text.py langid_ngram_profiles): per-lang top-40 gram
    # profiles, per-doc top-20 ranks, out-of-place distance with
    # penalty 40, min-distance prediction. The oracle replays profile
    # training, doc ranking, distances, and predictions — the learned
    # profiles are value-hashed. (The synthetic corpus's lang labels
    # don't correlate with its text, so ACCURACY is honest noise; the
    # gate is the deterministic model pipeline, and `correct` reports
    # the measured accuracy as data.)
    """
    WITH g AS (
      SELECT doc_id, lang, u AS gram FROM (
        SELECT doc_id, lang,
               unnest([substr(text, i, 3) FOR i IN range(1, length(text) - 1)]) AS u
        FROM documents WHERE length(text) >= 3)
    ),
    lp AS (
      SELECT lang AS cand_lbl, gram,
             row_number() OVER (PARTITION BY lang ORDER BY c DESC, gram) AS prank
      FROM (SELECT lang, gram, count(*) AS c FROM g GROUP BY lang, gram)
      QUALIFY prank <= 40
    ),
    dp AS (
      SELECT doc_id, gram,
             row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, gram) AS drank
      FROM (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY doc_id, gram)
      QUALIFY drank <= 20
    ),
    lbls AS (SELECT DISTINCT lang AS cand_lbl FROM documents),
    sc AS (
      SELECT dp.doc_id, l.cand_lbl,
             sum(coalesce(abs(dp.drank - lp.prank), 40)) AS dist
      FROM dp CROSS JOIN lbls l
      LEFT JOIN lp ON lp.cand_lbl = l.cand_lbl AND lp.gram = dp.gram
      GROUP BY 1, 2
    ),
    pred AS (
      SELECT doc_id, cand_lbl AS pred_lang, CAST(dist AS BIGINT) AS dist
      FROM sc
      QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY dist, cand_lbl) = 1
    )
    SELECT p.doc_id, d.lang, p.pred_lang, p.dist,
           p.pred_lang = d.lang AS correct
    FROM pred p JOIN documents d USING (doc_id)
    """,
)
def text_langid_profiles(spark, sf_dir):
    from ..operators.text import langid_ngram_profiles

    docs = load_table(spark, sf_dir, "documents")
    return langid_ngram_profiles(docs, "doc_id", "text", "lang")


@register(
    "flagship_curation_pipeline",
    # The LLM data-curation pipeline END-TO-END as one lazy DAG (the
    # text-quality twin of flagship_corpus_pipeline): Gopher structural
    # gate (word-count + mean-word-length) → exact-dedup keep-first →
    # bigram-LM perplexity scored on the SURVIVING corpus → kept =
    # perplexity ≤ the survivors' median (Spark percentile ≡ DuckDB
    # quantile_cont, the agg_exact_percentiles precedent). Stage
    # interaction is the point: the LM's counts and the median both
    # derive from what the earlier stages let through, so a drift in ANY
    # stage hash-fails the final flags.
    """
    WITH base AS (
      SELECT doc_id, text,
             list_filter(string_split(text, ' '), x -> length(x) > 0) AS w
      FROM documents
    ),
    lbl AS (
      SELECT doc_id, text, w FROM base
      WHERE len(w) BETWEEN 10 AND 1000
        AND list_sum(list_transform(w, x -> length(x))) * 1.0 / len(w)
            BETWEEN 3.0 AND 10.0
    ),
    ded AS (
      SELECT doc_id, w FROM (
        SELECT doc_id, w,
               row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM lbl)
      WHERE rn = 1
    ),
    bg AS (
      SELECT doc_id, u.w1 AS w1, u.w2 AS w2 FROM (
        SELECT doc_id,
               unnest([{'w1': w[i], 'w2': w[i+1]} FOR i IN range(1, len(w))]) AS u
        FROM ded)
    ),
    bc AS (SELECT w1, w2, count(*) AS cb FROM bg GROUP BY w1, w2),
    cc AS (SELECT w1, sum(cb) AS cw FROM bc GROUP BY w1),
    sc AS (
      SELECT doc_id, avg(-ln(cb * 1.0 / cw)) AS nlp
      FROM bg JOIN bc USING (w1, w2) JOIN cc USING (w1)
      GROUP BY doc_id
    ),
    ppl AS (SELECT doc_id, round(exp(nlp), 6) AS perplexity FROM sc),
    med AS (SELECT quantile_cont(perplexity, 0.5) AS m FROM ppl)
    SELECT doc_id, perplexity, perplexity <= m AS kept
    FROM ppl CROSS JOIN med
    """,
)
def flagship_curation_pipeline(spark, sf_dir):
    from ..operators.text import bigram_logprob, words

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", "text", words(F.col("text")).alias("w"))
    w = F.col("w")
    n_words = F.size(w)
    mean_wlen = F.aggregate(w, F.lit(0.0), lambda a, x: a + F.length(x)) / n_words
    gpass = base.filter(
        (n_words >= 10)
        & (n_words <= 1000)
        & (mean_wlen >= 3.0)
        & (mean_wlen <= 10.0)
    )
    from pyspark.sql import Window

    ded = (
        gpass.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy(F.md5("text")).orderBy("doc_id")
            ),
        )
        .filter(F.col("rn") == 1)
        .select("doc_id", "text")
    )
    scored = bigram_logprob(ded, "doc_id", "text").select("doc_id", "perplexity")
    med = scored.agg(F.percentile("perplexity", F.lit(0.5)).alias("m"))
    return scored.crossJoin(F.broadcast(med)).select(
        "doc_id",
        "perplexity",
        (F.col("perplexity") <= F.col("m")).alias("kept"),
    )


def _bpe_ctes(n: int) -> str:
    """CTE chain replaying ``bpe_learn`` (operators/text.py) iteration by
    iteration: s0 = per-word char symbols (+ '</w>'), then per round r —
    weighted pair counts (p{r}), deterministic top-1 (t{r}), match flags
    (f{r}), canonical-merge selection via the run-parity rule (g{r}: a
    matching position merges iff an even number of consecutive matches
    immediately precede it — equivalent to the leftmost-first
    non-overlapping fold Spark runs, derivation in the operator
    docstring), and the rebuilt symbol table (s{r})."""
    parts = [
        """w0 AS (
      SELECT word, count(*) AS freq FROM (
        SELECT unnest(list_filter(string_split(text, ' '),
                                  x -> length(x) > 0)) AS word
        FROM documents)
      GROUP BY word
    ),
    s0 AS (
      SELECT word, freq,
             [word[i] FOR i IN range(1, length(word)+1)] || ['</w>'] AS syms
      FROM w0
    )"""
    ]
    for r in range(1, n + 1):
        p = r - 1
        parts.append(
            f"""p{r} AS (
      SELECT u.a AS a, u.b AS b, CAST(sum(freq) AS BIGINT) AS cnt FROM (
        SELECT freq,
               unnest([{{'a': syms[i], 'b': syms[i+1]}}
                       FOR i IN range(1, len(syms))]) AS u
        FROM s{p} WHERE len(syms) >= 2)
      GROUP BY 1, 2
    ),
    t{r} AS (SELECT a, b, cnt FROM p{r} ORDER BY cnt DESC, a, b LIMIT 1),
    f{r} AS (
      -- LEFT JOIN ON TRUE, not CROSS JOIN: an empty t{r} (no pair left
      -- to merge) must pass the vocab through unchanged — null t.a
      -- makes every mt element NULL and the coalesce in s{r} keeps
      -- each symbol (mirrors the Spark fold's null no-op)
      SELECT word, freq, syms,
             [syms[i] = t.a AND syms[i+1] = t.b
              FOR i IN range(1, len(syms))] AS mt
      FROM s{p} LEFT JOIN t{r} t ON TRUE
    ),
    r{r} AS (
      SELECT word, freq, syms, mt,
             '0' || array_to_string(
               [CASE WHEN m THEN '1' ELSE '0' END FOR m IN mt], '') AS ms
      FROM f{r}
    ),
    g{r} AS (
      SELECT word, freq, syms,
             [mt[i] AND ((i - length(rtrim(substr(ms, 1, i), '1')) + 1)
                         % 2 = 1)
              FOR i IN range(1, len(mt)+1)] AS mg
      FROM r{r}
    ),
    s{r} AS (
      SELECT word, freq,
             flatten([CASE
                WHEN coalesce(mg[i], false) THEN [syms[i] || syms[i+1]]
                WHEN i > 1 AND coalesce(mg[i-1], false)
                  THEN CAST([] AS VARCHAR[])
                ELSE [syms[i]] END
              FOR i IN range(1, len(syms)+1)]) AS syms
      FROM g{r}
    )"""
        )
    return ",\n    ".join(parts)


_BPE_N = 6


@register(
    "text_bpe_train",
    # BPE tokenizer TRAINING (operators/text.py bpe_learn — the merge-
    # application loop text_bpe_pair_counts stops short of, VERDICT r6
    # next-round #2): 6 iteration-exact merge rounds over the distinct-
    # word table, each round's (count → deterministic top-1 → canonical
    # leftmost-first merge) replayed CTE by CTE, so a drift in ANY
    # round's pair statistics, tie-break, or merge application
    # hash-fails. Output = the learned merge table (the model artifact).
    "WITH "
    + _bpe_ctes(_BPE_N)
    + "\n    "
    + "\n    UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS merge_rank, a AS pair_a, b AS pair_b,"
        f" a || b AS merged, cnt FROM t{r}"
        for r in range(1, _BPE_N + 1)
    ),
)
def text_bpe_train(spark, sf_dir):
    from ..operators.text import bpe_learn

    docs = load_table(spark, sf_dir, "documents")
    merges, _vocab = bpe_learn(docs, "doc_id", "text", n_merges=_BPE_N)
    return merges


@register(
    "text_bpe_encode",
    # The learned BPE vocabulary USED: per-document subword sequence
    # length after all 6 merges — the number packing/budget stages
    # consume. Joins exploded doc words to the trained word→n_tokens
    # table hint-free (corpus vocabulary, the no-broadcast rule).
    "WITH "
    + _bpe_ctes(_BPE_N)
    + f""",
    tok AS (SELECT word, CAST(len(syms) AS BIGINT) AS n_tokens FROM s{_BPE_N}),
    dw AS (
      SELECT doc_id, unnest(list_filter(string_split(text, ' '),
                                        x -> length(x) > 0)) AS word
      FROM documents
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(n_tokens) AS BIGINT) AS n_bpe_tokens
    FROM dw JOIN tok USING (word) GROUP BY doc_id
    """,
)
def text_bpe_encode(spark, sf_dir):
    from ..operators.text import bpe_learn, bpe_token_counts

    docs = load_table(spark, sf_dir, "documents")
    _merges, vocab = bpe_learn(docs, "doc_id", "text", n_merges=_BPE_N)
    return bpe_token_counts(docs, vocab, "doc_id", "text")


@register(
    "streaming_classifier_score",
    # Streaming twin of text_classifier_score (VERDICT r6 next-round #7,
    # the pattern of streaming_enrich_hash, registered here beside the
    # shared oracle): NB log-odds weights train on
    # the STATIC corpus (operators/text.py classifier_train), then the
    # documents STREAM is feature-hashed per micro-batch and scored via a
    # stream-static broadcast join + per-doc streaming aggregation
    # (complete mode over the AvailableNow backlog). The materialized
    # stream output must hash-match the full batch replay oracle — a
    # regression in stream-static join semantics, the broadcast model, or
    # streaming aggregation state flips this row.
    _CLASSIFIER_ORACLE,
)
def streaming_classifier_score(spark, sf_dir):
    import uuid

    from ..operators.text import (
        classifier_apply,
        classifier_features,
        classifier_train,
    )
    from ..sources.tables import load_table
    from ..streaming.source import stream_documents
    from ..streaming.weekly import run_stream_to_memory

    docs = load_table(spark, sf_dir, "documents")
    wt, bias_row = classifier_train(docs, "doc_id", "text", n_buckets=1024)
    # pin the trained model BEFORE the stream starts: a stream-static
    # join re-evaluates its static side per MICRO-BATCH, so an unpinned
    # model would re-run the whole training pass for every batch of a
    # long-lived stream (the AvailableNow single-batch harness masks
    # this — production would not). ≤1024 rows + 1 row: the fixed-size
    # model is exactly what you checkpoint.
    wt = wt.localCheckpoint(eager=True)
    bias_row = bias_row.localCheckpoint(eager=True)
    gb = classifier_features(
        stream_documents(spark, sf_dir), "doc_id", "text", n_buckets=1024
    )
    return run_stream_to_memory(
        spark,
        classifier_apply(gb, wt, bias_row),
        "classifier_stream_drv_" + uuid.uuid4().hex[:8],
    )


def _bpe_apply_ctes(n: int) -> str:
    """CTE chain replaying ``bpe_segment`` (tokenizer INFERENCE): apply
    the training chain's ranked merges t1..t{n} in order to a table of
    UNSEEN words (u0), with the same run-parity canonical-merge
    machinery as ``_bpe_ctes`` minus the frequency column. LEFT JOIN ON
    TRUE keeps absent ranks a no-op (the bpe_learn convention)."""
    parts = [
        """u0 AS (
      SELECT word,
             [word[i] FOR i IN range(1, length(word)+1)] || ['</w>'] AS syms
      FROM (SELECT DISTINCT reverse(word) AS word FROM (
              SELECT unnest(list_filter(string_split(text, ' '),
                                        x -> length(x) > 0)) AS word
              FROM documents))
    )"""
    ]
    for r in range(1, n + 1):
        p = r - 1
        parts.append(
            f"""uf{r} AS (
      SELECT word, syms,
             [syms[i] = t.a AND syms[i+1] = t.b
              FOR i IN range(1, len(syms))] AS mt
      FROM u{p} LEFT JOIN t{r} t ON TRUE
    ),
    ur{r} AS (
      SELECT word, syms, mt,
             '0' || array_to_string(
               [CASE WHEN m THEN '1' ELSE '0' END FOR m IN mt], '') AS ms
      FROM uf{r}
    ),
    ug{r} AS (
      SELECT word, syms,
             [mt[i] AND ((i - length(rtrim(substr(ms, 1, i), '1')) + 1)
                         % 2 = 1)
              FOR i IN range(1, len(mt)+1)] AS mg
      FROM ur{r}
    ),
    u{r} AS (
      SELECT word,
             flatten([CASE
                WHEN coalesce(mg[i], false) THEN [syms[i] || syms[i+1]]
                WHEN i > 1 AND coalesce(mg[i-1], false)
                  THEN CAST([] AS VARCHAR[])
                ELSE [syms[i]] END
              FOR i IN range(1, len(syms)+1)]) AS syms
      FROM ug{r}
    )"""
        )
    return ",\n    ".join(parts)


@register(
    "text_bpe_segment",
    # Tokenizer INFERENCE on UNSEEN words (operators/text.py
    # bpe_segment): the 6 learned merges apply in rank order to words
    # the training never saw (each corpus word reversed — a disjoint
    # surface-form set with the same character statistics), completing
    # the tokenizer story train → corpus-encode → new-text-encode. The
    # oracle replays training AND the ranked inference chain, so a
    # wrong rank order, a missed merge, or a non-canonical application
    # on novel words hash-fails.
    "WITH "
    + _bpe_ctes(_BPE_N)
    + ",\n    "
    + _bpe_apply_ctes(_BPE_N)
    + f"""
    SELECT word, CAST(len(syms) AS BIGINT) AS n_tokens,
           array_to_string(syms, ' ') AS segmented
    FROM u{_BPE_N}
    """,
)
def text_bpe_segment(spark, sf_dir):
    from ..operators.text import bpe_learn, bpe_segment, words

    docs = load_table(spark, sf_dir, "documents")
    merges, _vocab = bpe_learn(docs, "doc_id", "text", n_merges=_BPE_N)
    unseen = (
        docs.select(F.explode(words(F.col("text"))).alias("w"))
        .select(F.reverse(F.col("w")).alias("word"))
        .distinct()
    )
    return bpe_segment(unseen, merges, _BPE_N, "word")


_PMI_MIN_COUNT = 3
_PMI_K = 100


@register(
    "text_pmi_collocations",
    # PMI collocation extraction (operators/text.py pmi_collocations —
    # Church & Hanks 1990): corpus unigram/bigram counts, pairs seen ≥
    # min_count, PMI = log2 of the probability ratio computed as
    # ln(ratio)/ln(2) on BOTH engines (log2() itself differs in the last
    # ulp between libm implementations; ln/exp parity is the established
    # convention), top-k under the (pmi desc, w1, w2) total order.
    f"""
    WITH base AS (
      SELECT list_filter(string_split(text, ' '), x -> length(x) > 0) AS w
      FROM documents
    ),
    bg AS (
      SELECT u.w1 AS w1, u.w2 AS w2 FROM (
        SELECT unnest([{{'w1': w[i], 'w2': w[i+1]}} FOR i IN range(1, len(w))]) AS u
        FROM base WHERE len(w) >= 2)
    ),
    uc AS (
      SELECT t, count(*) AS c FROM (SELECT unnest(w) AS t FROM base) GROUP BY t
    ),
    bc AS (
      SELECT w1, w2, count(*) AS cb FROM bg GROUP BY w1, w2
      HAVING count(*) >= {_PMI_MIN_COUNT}
    ),
    tot AS (
      SELECT (SELECT sum(c) FROM uc) AS tt, (SELECT count(*) FROM bg) AS tb
    )
    SELECT w1, w2, CAST(cb AS BIGINT) AS pair_count,
           round(ln((cb * 1.0 / tb)
                    / ((c1.c * 1.0 / tt) * (c2.c * 1.0 / tt))) / ln(2.0),
                 6) AS pmi
    FROM bc JOIN uc c1 ON bc.w1 = c1.t JOIN uc c2 ON bc.w2 = c2.t, tot
    ORDER BY pmi DESC, w1, w2 LIMIT {_PMI_K}
    """,
)
def text_pmi_collocations(spark, sf_dir):
    from ..operators.text import pmi_collocations

    docs = load_table(spark, sf_dir, "documents")
    return pmi_collocations(
        docs, "text", min_count=_PMI_MIN_COUNT, k=_PMI_K
    )


# Word co-occurrence graph CTEs (produce `e(u, v)`) — the TextRank edge
# builder (operators/text.py textrank_edges): lowercase candidates of
# length ≥ 4, adjacent pairs over the FILTERED sequence, distinct
# undirected edges.
_TEXTRANK_E = """wg AS (
      SELECT list_transform(
               list_filter(string_split(text, ' '), x -> length(x) >= 4),
               x -> lower(x)) AS w
      FROM documents
    ),
    wp AS (
      SELECT u.a AS a, u.b AS b FROM (
        SELECT unnest([{'a': w[i], 'b': w[i+1]} FOR i IN range(1, len(w))]) AS u
        FROM wg WHERE len(w) >= 2)
    ),
    e AS (
      SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v
      FROM wp WHERE a <> b
    )"""

_TEXTRANK_ITERS = 5
_TEXTRANK_K = 50


@register(
    "text_rank_keywords",
    # TextRank keyword extraction (operators/text.py textrank_keywords —
    # Mihalcea & Tarau 2004): the SAME 6dp-lattice pagerank kernel and
    # iteration-replay oracle as graph_pagerank (_pagerank_ctes from
    # queries/joins.py, word-graph prefix swapped in), then top-k words
    # under the (score desc, word) total order. Gates the edge builder,
    # all 5 power-method rounds on a STRING-keyed graph, and the slice.
    "WITH "
    + _pagerank_ctes(_TEXTRANK_ITERS, 0.85, graph_ctes=_TEXTRANK_E)
    + f"""
    SELECT vertex AS word, r AS score FROM r{_TEXTRANK_ITERS}
    ORDER BY score DESC, word LIMIT {_TEXTRANK_K}
    """,
)
def text_rank_keywords(spark, sf_dir):
    from ..operators.text import textrank_keywords

    docs = load_table(spark, sf_dir, "documents")
    return textrank_keywords(
        docs,
        "text",
        iterations=_TEXTRANK_ITERS,
        damping=0.85,
        min_len=4,
        k=_TEXTRANK_K,
    )


@register(
    "text_perplexity_buckets",
    # CCNet-style perplexity bucketing (Wenzek et al. 2019 §4.4: corpora
    # are split into head/middle/tail by LM-perplexity TERCILES, and
    # training recipes sample the buckets differently): score every doc
    # with the corpus-trained bigram LM (_BIGRAM_SCORED_CTES — shared
    # with text_bigram_logprob), cut at the exact interpolated 1/3 and
    # 2/3 quantiles (Spark `percentile` ≡ DuckDB `quantile_cont`, the
    # filter_length_quantiles precedent), label each doc. Low perplexity
    # = most fluent = head.
    "WITH "
    + _BIGRAM_SCORED_CTES
    + f""",
    px AS (
      SELECT doc_id, round(exp(nlp), 6) AS perplexity FROM scored
    ),
    q AS (
      SELECT quantile_cont(perplexity, {1 / 3!r}) AS lo,
             quantile_cont(perplexity, {2 / 3!r}) AS hi
      FROM px
    )
    SELECT doc_id, perplexity,
           CASE WHEN perplexity <= q.lo THEN 'head'
                WHEN perplexity <= q.hi THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM px, q
    """,
)
def text_perplexity_buckets(spark, sf_dir):
    """Scale shape: the scored per-doc frame is PERSISTED — it feeds two
    consumers (the 2-value quantile aggregate and the labeling join) and
    recomputing it would replay the whole bigram-LM training per
    consumer (the r6 diamond-reuse rule). The quantile aggregate is one
    exact-percentile pass over doc-count rows; the cutoffs broadcast as
    a 1-row frame and labeling is map-side."""
    from ..operators.text import bigram_logprob

    docs = load_table(spark, sf_dir, "documents")
    scored = (
        bigram_logprob(docs, "doc_id", "text")
        .select("doc_id", "perplexity")
        .persist()
    )
    q = scored.agg(
        F.percentile("perplexity", F.lit(1 / 3)).alias("lo"),
        F.percentile("perplexity", F.lit(2 / 3)).alias("hi"),
    )
    return scored.crossJoin(F.broadcast(q)).select(
        "doc_id",
        "perplexity",
        F.when(F.col("perplexity") <= F.col("lo"), "head")
        .when(F.col("perplexity") <= F.col("hi"), "middle")
        .otherwise("tail")
        .alias("bucket"),
    )


_BM25_TERMS = ("data", "merge", "vector")
_BM25_K = 20


@register(
    "text_bm25_topk",
    # BM25 retrieval (Robertson–Spärck Jones / Lucene practical form;
    # operators/text.py bm25_topk — r8): fixed OR-query term set, Lucene
    # idf ln(1 + (N−df+0.5)/(df+0.5)), k1=1.2 b=0.75, top-20 docs under
    # the (6dp-rounded score desc, doc_id) order. The oracle replays the
    # per-term contributions with the identical expression tree; the
    # only cross-engine float risk is the ≤3-term per-doc sum order,
    # absorbed by the 6dp round (registry convention).
    f"""
    WITH w AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ),
    ww AS (SELECT doc_id, word FROM w WHERE length(word) > 0),
    dl AS (SELECT doc_id, count(*) AS dl FROM ww GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    tf AS (
      SELECT doc_id, word, count(*) AS tf FROM ww
      WHERE word IN ('data', 'merge', 'vector') GROUP BY doc_id, word
    ),
    dft AS (SELECT word, count(*) AS df FROM tf GROUP BY word),
    contrib AS (
      SELECT tf.doc_id,
             ln(1.0 + (s.n_docs - dft.df + 0.5) / (dft.df + 0.5))
             * (tf.tf * 2.2)
             / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / s.avgdl)) AS c
      FROM tf JOIN dft USING (word) JOIN dl USING (doc_id), stats s
    ),
    scored AS (
      SELECT doc_id, round(sum(c), 6) AS bm25 FROM contrib GROUP BY doc_id
    )
    SELECT doc_id, bm25, rank FROM (
      SELECT *, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank
      FROM scored
    ) WHERE rank <= {_BM25_K}
    """,
)
def text_bm25_topk(spark, sf_dir):
    from ..operators.text import bm25_topk

    return bm25_topk(
        load_table(spark, sf_dir, "documents"),
        list(_BM25_TERMS),
        k=_BM25_K,
    )


_CHI2_TOPK = 3


@register(
    "text_chi2_keywords",
    # Per-language discriminative keywords by χ² feature selection
    # (Yang & Pedersen 1997; operators/text.py chi2_keywords — r8):
    # document-presence 2×2 contingency per (lang, word), χ² =
    # N(ad−bc)²/((a+b)(c+d)(a+c)(b+d)), top-3 words per lang under
    # (χ² desc, word). All counts are integers; the single float
    # expression is fixed-tree + 6dp round. Words present in every
    # document are excluded on both engines (0/0).
    f"""
    WITH pres AS (
      SELECT DISTINCT doc_id, cls, word FROM (
        SELECT doc_id, lang AS cls, unnest(string_split(text, ' ')) AS word
        FROM documents
      ) WHERE length(word) > 0
    ),
    cw AS (SELECT cls, word, count(*) AS a FROM pres GROUP BY cls, word),
    wt AS (SELECT word, count(*) AS wt FROM pres GROUP BY word),
    ct AS (SELECT cls, count(*) AS ct FROM
           (SELECT DISTINCT doc_id, cls FROM pres) GROUP BY cls),
    n AS (SELECT count(DISTINCT doc_id) AS n FROM pres),
    j AS (
      SELECT cw.cls, cw.word,
             CAST(cw.a AS DOUBLE) AS a,
             CAST(wt.wt - cw.a AS DOUBLE) AS b,
             CAST(ct.ct - cw.a AS DOUBLE) AS c,
             CAST(n.n - ct.ct - (wt.wt - cw.a) AS DOUBLE) AS d,
             CAST(n.n AS DOUBLE) AS nn
      FROM cw JOIN wt USING (word) JOIN ct USING (cls), n
      WHERE wt.wt < n.n
    ),
    scored AS (
      SELECT cls, word,
             round(nn * (a * d - b * c) * (a * d - b * c)
                   / ((a + b) * (c + d) * (a + c) * (b + d)), 6) AS chi2
      FROM j
    )
    SELECT cls, word, chi2, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY cls
                                   ORDER BY chi2 DESC, word) AS rank
      FROM scored
    ) WHERE rank <= {_CHI2_TOPK}
    """,
)
def text_chi2_keywords(spark, sf_dir):
    from ..operators.text import chi2_keywords

    return chi2_keywords(
        load_table(spark, sf_dir, "documents"), top_k=_CHI2_TOPK
    )


@register(
    "text_lm_heldout_score",
    # Held-out interpolated Kneser-Ney bigram scoring (operators/
    # text.py kn_heldout_score; VERDICT r7 #7): train on doc_id % 5 <> 0,
    # score doc_id % 5 = 0 — unseen bigrams are the NORM, which the
    # unsmoothed text_bigram_logprob model cannot score at all. D=0.75
    # absolute discount, +1/(B+V) type-level floor on the continuation
    # distribution so fully-unseen words stay finite. Every transition's
    # -ln P snaps to the 1e-6 BIGINT lattice before the per-doc sum
    # (order-independent); the oracle replays training (all three count
    # tables + the (B,V) totals) and scoring with the same expression
    # shape, CTE by CTE.
    """
    WITH base AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> length(x) > 0) AS w
      FROM documents
    ),
    bgt AS (
      SELECT u.w1 AS w1, u.w2 AS w2 FROM (
        SELECT unnest([{'w1': w[i], 'w2': w[i+1]} FOR i IN range(1, len(w))]) AS u
        FROM base WHERE doc_id % 5 <> 0 AND len(w) >= 2)
    ),
    bc AS (SELECT w1, w2, count(*) AS cb FROM bgt GROUP BY 1, 2),
    ctx AS (SELECT w1, sum(cb) AS cw, count(*) AS n1f FROM bc GROUP BY 1),
    cont AS (SELECT w2, count(*) AS n1b FROM bc GROUP BY 1),
    tot AS (
      SELECT (SELECT count(*) FROM bc) AS bt,
             (SELECT count(DISTINCT tok) FROM (
                SELECT unnest(w) AS tok FROM base WHERE doc_id % 5 <> 0)) AS v
    ),
    bgh AS (
      SELECT doc_id, u.w1 AS w1, u.w2 AS w2 FROM (
        SELECT doc_id,
               unnest([{'w1': w[i], 'w2': w[i+1]} FOR i IN range(1, len(w))]) AS u
        FROM base WHERE doc_id % 5 = 0 AND len(w) >= 2)
    ),
    sc AS (
      SELECT doc_id,
             CASE WHEN ctx.w1 IS NULL
                  THEN (CAST(coalesce(cont.n1b, 0) AS DOUBLE) + 1.0)
                       / (tot.bt + tot.v)
                  ELSE (greatest(CAST(coalesce(bc.cb, 0) AS DOUBLE) - 0.75, 0.0)
                        + 0.75 * ctx.n1f
                          * ((CAST(coalesce(cont.n1b, 0) AS DOUBLE) + 1.0)
                             / (tot.bt + tot.v)))
                       / ctx.cw
             END AS p,
             CASE WHEN bc.cb IS NULL THEN 1 ELSE 0 END AS unseen
      FROM bgh
      LEFT JOIN bc USING (w1, w2)
      LEFT JOIN ctx USING (w1)
      LEFT JOIN cont USING (w2)
      CROSS JOIN tot
    ),
    agg AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_transitions,
             CAST(sum(unseen) AS BIGINT) AS n_unseen_bigrams,
             sum(CAST(round(-ln(p) * 1000000.0) AS BIGINT)) AS sl
      FROM sc GROUP BY doc_id
    )
    SELECT doc_id, n_transitions, n_unseen_bigrams,
           CAST((2 * sl + n_transitions) // (2 * n_transitions) AS DOUBLE)
             / 1000000.0 AS mean_neg_logprob,
           round(exp(CAST((2 * sl + n_transitions) // (2 * n_transitions)
                          AS DOUBLE) / 1000000.0), 6) AS perplexity
    FROM agg
    """,
)
def text_lm_heldout_score(spark, sf_dir):
    from ..operators.text import kn_heldout_score

    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 5 != 0)
    heldout = docs.filter(F.col("doc_id") % 5 == 0)
    return kn_heldout_score(train, heldout, "doc_id", "text", discount=0.75)


@register(
    "text_naive_bayes_confusion",
    # Multinomial add-one Naive Bayes trained/scored on the corpus
    # (r9; operators/text.py naive_bayes_confusion): integer token
    # counts, 6dp ln-likelihoods and priors, per-doc score re-rounded
    # before the (score desc, label asc) argmax, prior-only fallback
    # for token-free docs. The oracle replays model build + dense
    # smoothing + scoring + argmax + confusion rollup.
    """
    WITH base AS (SELECT doc_id, lang AS actual, text FROM documents),
    tok AS (
      SELECT doc_id, actual, unnest(list_filter(string_split(text, ' '),
                                                w -> length(w) > 0)) AS word
      FROM base
    ),
    docword AS (
      SELECT doc_id, word, CAST(count(*) AS BIGINT) AS cnt
      FROM tok GROUP BY doc_id, word
    ),
    wl AS (
      SELECT word, actual AS label, CAST(count(*) AS BIGINT) AS c
      FROM tok GROUP BY word, actual
    ),
    tot AS (SELECT label, CAST(sum(c) AS BIGINT) AS t FROM wl GROUP BY label),
    vocab AS (SELECT DISTINCT word FROM wl),
    vsize AS (SELECT CAST(count(*) AS BIGINT) AS v FROM vocab),
    dense AS (
      SELECT vo.word, tt.label,
             round(ln(CAST(coalesce(w.c, 0) + 1 AS DOUBLE)
                      / CAST(tt.t + vs.v AS DOUBLE)), 6) AS ll
      FROM vocab vo CROSS JOIN tot tt CROSS JOIN vsize vs
      LEFT JOIN wl w ON w.word = vo.word AND w.label = tt.label
    ),
    sumll AS (
      SELECT d.doc_id, n.label, sum(d.cnt * n.ll) AS s
      FROM docword d JOIN dense n ON d.word = n.word
      GROUP BY d.doc_id, n.label
    ),
    nd AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM base),
    priors AS (
      SELECT actual AS label,
             round(ln(CAST(count(*) AS DOUBLE) / nd.n_total), 6) AS prior
      FROM base CROSS JOIN nd GROUP BY actual, nd.n_total
    ),
    scored AS (
      SELECT b.doc_id, b.actual, p.label,
             round(p.prior + coalesce(s.s, 0.0), 6) AS score
      FROM base b CROSS JOIN priors p
      LEFT JOIN sumll s ON s.doc_id = b.doc_id AND s.label = p.label
    ),
    pred AS (
      SELECT actual, label AS predicted FROM (
        SELECT actual, label,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, label) AS rn
        FROM scored) WHERE rn = 1
    )
    SELECT actual, predicted, CAST(count(*) AS BIGINT) AS n_docs
    FROM pred GROUP BY actual, predicted
    """,
)
def text_naive_bayes_confusion(spark, sf_dir):
    from ..operators.text import naive_bayes_confusion

    docs = load_table(spark, sf_dir, "documents")
    return naive_bayes_confusion(docs)


@register(
    "text_span_corruption",
    # T5-style span corruption (r9; operators/text.py span_corruption):
    # 3-word spans, a span masked iff the first md5(doc_id|g) hex digit
    # falls in the lowest 4/16 (the portable hash-draw convention),
    # masked spans collapsed to reading-order '<extra_id_k>' sentinels,
    # canonical single-space rebuild. The oracle replays the grouping,
    # the draw, the sentinel numbering and the rebuild verbatim.
    """
    WITH w AS (
      SELECT doc_id, list_filter(string_split(text, ' '),
                                 x -> length(x) > 0) AS ws
      FROM documents
    ),
    g AS (
      SELECT doc_id, k AS g,
             array_to_string(ws[CAST(k * 3 + 1 AS INT)
                               :CAST(least((k + 1) * 3, len(ws)) AS INT)],
                             ' ') AS chunk,
             CAST(least((k + 1) * 3, len(ws)) - k * 3 AS BIGINT) AS n_words,
             strpos('0123456789abcdef',
                    substr(md5(CAST(doc_id AS VARCHAR) || '|'
                               || CAST(k AS VARCHAR)), 1, 1)) <= 4 AS masked
      FROM w, LATERAL unnest(range(0, CAST(ceil(len(ws) / 3.0) AS BIGINT)))
                t(k)
    ),
    s AS (
      SELECT doc_id, g, masked, n_words,
             CASE WHEN masked THEN
               '<extra_id_'
               || CAST(row_number() OVER (PARTITION BY doc_id, masked
                                          ORDER BY g) - 1 AS VARCHAR)
               || '>'
             ELSE chunk END AS token
      FROM g
    ),
    r AS (
      SELECT doc_id, string_agg(token, ' ' ORDER BY g) AS corrupted,
             CAST(sum(CASE WHEN masked THEN 1 ELSE 0 END) AS BIGINT)
               AS n_spans,
             CAST(sum(CASE WHEN masked THEN n_words ELSE 0 END) AS BIGINT)
               AS n_words_masked
      FROM s GROUP BY doc_id
    )
    SELECT b.doc_id, coalesce(r.corrupted, '') AS corrupted,
           CAST(coalesce(r.n_spans, 0) AS BIGINT) AS n_spans,
           CAST(coalesce(r.n_words_masked, 0) AS BIGINT) AS n_words_masked
    FROM documents b LEFT JOIN r ON b.doc_id = r.doc_id
    """,
)
def text_span_corruption(spark, sf_dir):
    from ..operators.text import span_corruption

    docs = load_table(spark, sf_dir, "documents")
    return span_corruption(docs, span_words=3, mask_rate_16ths=4)


def _unigram_em_oracle(
    L: int = 4, min_count: int = 2, rounds: int = 2, maxj: int = 16
) -> str:
    """Unrolled-DP replay of operators/text.py:unigram_lm_em — the seed
    vocabulary, then per EM round the Viterbi DP position by position
    (dp{r}_{j} joins the previous L position tables; the argmax is the
    same integer (score desc, start asc) order) and the Laplace M-step.
    ``maxj`` bounds word length (corpus max is 8; longer words would
    need a wider unroll, asserted by the final-position join)."""
    subs_q = (
        "SELECT w.word, w.freq, CAST(t.s AS INT) AS s, "
        "CAST(t.s + u.l AS INT) AS e, "
        "substr(w.word, CAST(t.s + 1 AS INT), CAST(u.l AS INT)) AS piece "
        "FROM wf w, LATERAL unnest(range(0, length(w.word))) t(s), "
        f"LATERAL unnest(range(1, {L + 1})) u(l) "
        "WHERE t.s + u.l <= length(w.word)"
    )
    llu = (
        "CAST(floor(ln(CAST(cnt + 1 AS DOUBLE) / (total + v)) "
        "* 1000000.0 + 0.5) AS BIGINT)"
    )
    parts = [
        f"""wf AS MATERIALIZED (
      SELECT word, CAST(count(*) AS BIGINT) AS freq
      FROM (SELECT unnest(list_filter(string_split(text, ' '),
                                      x -> length(x) > 0)) AS word
            FROM documents)
      GROUP BY word
    ),
    subs AS MATERIALIZED ({subs_q}),
    vocab AS MATERIALIZED (
      SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt
      FROM subs GROUP BY piece
      HAVING sum(freq) >= {min_count} OR length(piece) = 1
    ),
    vt0 AS (SELECT CAST(count(*) AS BIGINT) AS v,
                   CAST(sum(cnt) AS BIGINT) AS total FROM vocab),
    m0 AS MATERIALIZED (
      SELECT piece, {llu} AS ll_u FROM vocab CROSS JOIN vt0
    )"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""cand{r} AS MATERIALIZED (
      SELECT q.word, q.freq, q.s, q.e, m.ll_u
      FROM ({subs_q.replace('wf w', 'wf w')}) q
      JOIN m{r - 1} m ON m.piece = q.piece
    ),
    dp{r}_0 AS MATERIALIZED (
      SELECT word, CAST(0 AS INT) AS pos, CAST(0 AS BIGINT) AS su,
             CAST([] AS STRUCT(s INT, e INT)[]) AS path
      FROM wf
    )"""
        )
        for j in range(1, maxj + 1):
            prevs = " UNION ALL ".join(
                f"SELECT * FROM dp{r}_{i}"
                for i in range(max(0, j - L), j)
            )
            parts.append(
                f"""dp{r}_{j} AS MATERIALIZED (
      SELECT word, CAST({j} AS INT) AS pos, su, path FROM (
        SELECT c.word, p.su + c.ll_u AS su,
               list_append(p.path, {{'s': c.s, 'e': c.e}}) AS path,
               row_number() OVER (PARTITION BY c.word
                                  ORDER BY p.su + c.ll_u DESC, c.s ASC)
                 AS rn
        FROM cand{r} c
        JOIN ({prevs}) p ON p.word = c.word AND p.pos = c.s
        WHERE c.e = {j}
      ) WHERE rn = 1
    )"""
            )
        alldp = " UNION ALL ".join(
            f"SELECT * FROM dp{r}_{j}" for j in range(1, maxj + 1)
        )
        parts.append(
            f"""final{r} AS MATERIALIZED (
      SELECT w.word, w.freq, d.path
      FROM wf w JOIN ({alldp}) d
        ON d.word = w.word AND d.pos = length(w.word)
    ),
    segs{r} AS (
      SELECT substr(f.word, CAST(t.pc.s + 1 AS INT),
                    CAST(t.pc.e - t.pc.s AS INT)) AS piece, f.freq
      FROM final{r} f, LATERAL unnest(f.path) t(pc)
    ),
    cnt{r} AS MATERIALIZED (
      SELECT v.piece, CAST(coalesce(sum(s.freq), 0) AS BIGINT) AS cnt
      FROM vocab v LEFT JOIN segs{r} s ON s.piece = v.piece
      GROUP BY v.piece
    ),
    vt{r} AS (SELECT CAST(count(*) AS BIGINT) AS v,
                     CAST(sum(cnt) AS BIGINT) AS total FROM cnt{r}),
    m{r} AS MATERIALIZED (
      SELECT piece, cnt, {llu} AS ll_u FROM cnt{r} CROSS JOIN vt{r}
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT piece, cnt AS n_count,
           CAST(ll_u AS DOUBLE) / 1000000.0 AS ll
    FROM m{rounds}"""
    )


@register(
    "train_unigram_lm_em",
    # SentencePiece unigram-LM tokenizer training (Kudo 2018; r9;
    # operators/text.py unigram_lm_em): substring seed vocab (len <= 4,
    # count >= 2 or single char), then 2 EM rounds of Viterbi-best
    # segmentation (integer micro-lattice path scores, (score desc,
    # start asc) argmax) + Laplace re-estimation over the fixed vocab.
    # The oracle replays BOTH rounds with position-unrolled DP CTEs —
    # the EM twin of the BPE merge-replay convention, and everything
    # after the first explode is vocabulary-sized.
    _unigram_em_oracle(),
)
def train_unigram_lm_em(spark, sf_dir):
    from ..operators.text import unigram_lm_em

    docs = load_table(spark, sf_dir, "documents")
    return unigram_lm_em(docs)


@register(
    "text_calibration_curve",
    # Reliability diagram for the learned quality classifier (r9 — the
    # calibration eval every production filter ships with): the
    # classifier_score chain, then 8 equal-width score bins between the
    # corpus min/max (bin edges are a broadcast 1-row aggregate; the
    # bin index is floor arithmetic on identical doubles — no
    # round-half anywhere), per bin the doc count, weak-positive count,
    # and the mean score / positive rate both via the KN integer
    # half-up division on the 1e-6 lattice (quotients like 1/128 land
    # exactly on .5e-7 midpoints — the r9 round() divergence class).
    _CLASSIFIER_ORACLE.replace(
        """    SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams, label_weak,
           round(bias + mw, 6) AS score, (bias + mw) > 0 AS pred
    FROM scored CROSS JOIN nb
    """,
        """,
    sc AS (
      SELECT doc_id, label_weak, round(bias + mw, 6) AS score
      FROM scored CROSS JOIN nb
    ),
    edges AS (SELECT min(score) AS mn, max(score) AS mx FROM sc),
    binned AS (
      SELECT least(CAST(floor((score - mn) * 8.0 / (mx - mn)) AS BIGINT),
                   7) AS bin,
             label_weak,
             CAST(floor(score * 1000000.0 + 0.5) AS BIGINT) AS s_u
      FROM sc CROSS JOIN edges
    ),
    agg AS (
      SELECT bin, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CASE WHEN label_weak THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pos,
             CAST(sum(s_u + 1000000000) AS BIGINT) AS s_off
      FROM binned GROUP BY bin
    )
    SELECT bin, n_docs, n_pos,
           CAST((2 * s_off + n_docs) // (2 * n_docs) - 1000000000
                AS DOUBLE) / 1000000.0 AS mean_score,
           CAST((2 * n_pos * 1000000 + n_docs) // (2 * n_docs)
                AS DOUBLE) / 1000000.0 AS pos_rate
    FROM agg
    """,
    ),
)
def text_calibration_curve(spark, sf_dir):
    from pyspark.sql import Window

    from ..operators.text import classifier_score

    docs = load_table(spark, sf_dir, "documents")
    # persist: the scored frame (3 narrow columns per doc) has TWO
    # consumers — the 1-row min/max edges agg and the binning pass —
    # and without it the AQE final plan replays the entire classifier
    # scoring subtree for the edges side (audited r14: 11 document
    # scans / 10 gram explodes vs the chain's own 7/6). At sf0.1 this
    # measured NEUTRAL (interleaved A/B min-of-5 after warmup: 7.40 →
    # 6.96 s, mixed per-round — the NB model aggregations dominate at
    # this scale, so no speedup is CLAIMED); the change is the r6
    # persist rule's scale shape: at corpus scale the replay is a full
    # re-score (explode + model join + agg), far costlier than caching
    # doc_id/label/score.
    sc = (
        classifier_score(docs)
        .select("doc_id", "label_weak", "score")
        .persist()
    )
    edges = sc.agg(F.min("score").alias("mn"), F.max("score").alias("mx"))
    binned = sc.crossJoin(F.broadcast(edges)).select(
        F.least(
            F.floor(
                (F.col("score") - F.col("mn")) * 8.0
                / (F.col("mx") - F.col("mn"))
            ).cast("long"),
            F.lit(7).cast("long"),
        ).alias("bin"),
        "label_weak",
        F.floor(F.col("score") * 1000000.0 + 0.5).cast("long").alias("s_u"),
    )
    agg = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("label_weak").cast("long")).alias("n_pos"),
        F.sum(F.col("s_u") + 1000000000).alias("s_off"),
    )
    return agg.select(
        "bin",
        "n_docs",
        "n_pos",
        (
            (
                F.expr("(2 * s_off + n_docs) div (2 * n_docs)")
                - F.lit(1000000000)
            ).cast("double")
            / 1000000.0
        ).alias("mean_score"),
        (
            F.expr("(2 * n_pos * 1000000 + n_docs) div (2 * n_docs)")
            .cast("double")
            / 1000000.0
        ).alias("pos_rate"),
    )


@register(
    "text_bpe_fertility",
    # Tokenizer fertility per language (the tokenizer-eval table every
    # multilingual LLM report carries — Rust et al., ACL 2021): under
    # the 6-merge trained BPE, tokens-per-word and chars-per-token by
    # lang. Rides the shared training CTEs verbatim; the word ->
    # n_tokens join stays hint-free (corpus vocabulary, the
    # no-broadcast rule) and the per-lang ratios are single divisions
    # of exact BIGINT sums.
    "WITH "
    + _bpe_ctes(_BPE_N)
    + f""",
    tok AS (SELECT word, CAST(len(syms) AS BIGINT) AS n_tokens
            FROM s{_BPE_N}),
    dw AS (
      SELECT lang, unnest(list_filter(string_split(text, ' '),
                                      x -> length(x) > 0)) AS word
      FROM documents
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(n_tokens) AS BIGINT) AS n_bpe_tokens,
           CAST(sum(length(word)) AS BIGINT) AS n_chars,
           round(CAST(sum(n_tokens) AS DOUBLE) / CAST(count(*) AS DOUBLE),
                 6) AS fertility,
           round(CAST(sum(length(word)) AS DOUBLE)
                 / CAST(sum(n_tokens) AS DOUBLE), 6) AS chars_per_token
    FROM dw JOIN tok USING (word)
    GROUP BY lang
    """,
)
def text_bpe_fertility(spark, sf_dir):
    from ..operators.text import bpe_learn, words

    docs = load_table(spark, sf_dir, "documents")
    _merges, vocab = bpe_learn(docs, "doc_id", "text", n_merges=_BPE_N)
    dw = docs.select(
        "lang", F.explode(words(F.col("text"))).alias("word")
    )
    j = dw.join(vocab.select("word", "n_tokens"), "word")
    return j.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("n_tokens").cast("long").alias("n_bpe_tokens"),
        F.sum(F.length("word")).cast("long").alias("n_chars"),
        F.round(
            F.sum("n_tokens").cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("fertility"),
        F.round(
            F.sum(F.length("word")).cast("double")
            / F.sum("n_tokens").cast("double"),
            6,
        ).alias("chars_per_token"),
    )


@register(
    "text_lexical_diversity",
    # Lexical diversity per source (corpus-quality profiling: low
    # diversity flags template/boilerplate farms): type-token ratio and
    # Guiraud's root-TTR (types/sqrt(tokens) — the length-robust
    # variant). Types = distinct words per source (one distinct
    # aggregate, its own scan per the r7 distinct-Expand rule is
    # unnecessary here — no sketch shares the agg); tokens exact
    # BIGINT; root-TTR one IEEE sqrt + divide on identical trees.
    r"""
    WITH w AS (
      SELECT source,
             unnest(list_filter(string_split_regex(text, '\s+'),
                                x -> x <> '')) AS word
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(count(DISTINCT word) AS BIGINT) AS n_types,
           round(CAST(count(DISTINCT word) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE), 6) AS ttr,
           round(CAST(count(DISTINCT word) AS DOUBLE)
                 / sqrt(CAST(count(*) AS DOUBLE)), 6) AS root_ttr
    FROM w GROUP BY source
    """,
)
def text_lexical_diversity(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select(
        "source",
        F.explode(
            F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != "")
        ).alias("word"),
    )
    return w.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.count_distinct("word").alias("n_types"),
        F.round(
            F.count_distinct("word").cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("ttr"),
        F.round(
            F.count_distinct("word").cast("double")
            / F.sqrt(F.count(F.lit(1)).cast("double")),
            6,
        ).alias("root_ttr"),
    )
