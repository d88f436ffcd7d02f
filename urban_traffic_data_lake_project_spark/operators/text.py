"""Text-analysis operators over document tables (BASELINE.json north star:
language ID, quality scoring, token counting, fingerprinting).

All pure Catalyst expressions (regexp/length/split arithmetic) — the hot
path stays inside whole-stage codegen; no Python UDFs. Each operator is a
Column factory so callers compose them into a single projection pass over
the corpus (one scan computes every signal).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from urban_traffic_data_lake_project_spark.functions import normalize_text, stable_hash64
from urban_traffic_data_lake_project_spark.sources.tables import spread_to_parallelism

# Tiny per-language stopword marker sets for the n-gram/stopword-hit
# language heuristic. Deliberately small and high-precision: the point is
# the *operator shape* (argmax over per-language evidence scores computed
# in one pass), not lexicon quality.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "with"),
    "es": ("el", "la", "de", "que", "los", "las", "una", "por"),
    "fr": ("le", "la", "les", "des", "est", "une", "dans", "pour"),
    "de": ("der", "die", "das", "und", "ist", "mit", "ein", "nicht"),
    "zh": (),  # handled by CJK codepoint detection below
}


def token_count_whitespace(text: Column) -> Column:
    """Whitespace token count (0 for empty/blank)."""
    t = F.trim(text)
    return F.when(t == "", 0).otherwise(F.size(F.split(t, r"\s+")))


def token_count_bpe_ish(text: Column) -> Column:
    """BPE-ish proxy token count: word pieces + standalone non-space
    punctuation (the classic ``\\w+|[^\\w\\s]`` tokenizer)."""
    return F.regexp_count(text, F.lit(r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"))


def stopword_hits(text: Column, words: tuple[str, ...]) -> Column:
    """Number of tokens equal to any marker word (tokens = lowercase runs
    split on non-alphanumerics). Token-equality instead of a giant
    word-boundary alternation regex: same hits on word boundaries, and the
    single split is ~10x cheaper per document than k regex scans."""
    if not words:
        return F.lit(0)
    tokens = F.split(F.lower(text), "[^a-z0-9]+")
    return F.size(F.filter(tokens, lambda w: w.isin(*words)))


def cjk_char_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(r"[一-鿿]"))


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language evidence scores, all computed in one projection."""
    scores = {
        lang: stopword_hits(text, words)
        for lang, words in LANG_MARKERS.items()
        if words
    }
    scores["zh"] = cjk_char_count(text)
    return scores


def lang_id(text: Column, default: str = "und") -> Column:
    """Predicted language = argmax evidence score (ties -> lexicographically
    first language, deterministic); 'und' when no evidence at all.

    argmax via ``array_max`` over (score, priority, lang) structs — each
    score expression appears exactly once. A when-chain fold would embed
    every score expression at every chain level (no CSE across branches;
    measured 6.3s -> 0.5s on 5k docs)."""
    scores = lang_scores(text)
    langs = sorted(scores)
    entries = [
        F.struct(
            scores[lang].alias("score"),
            F.lit(len(langs) - i).alias("prio"),  # ties -> earliest lang wins
            F.lit(lang).alias("lang"),
        )
        for i, lang in enumerate(langs)
    ]
    best = F.array_max(F.array(*entries))
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit(default))


def repetition_signals(text: Column) -> dict[str, Column]:
    """The C4/Gopher-family repetition and boilerplate filters — the
    signals a production curation pipeline leans on daily to catch
    templated/spammy documents that pass the length/alpha checks:

    - ``dup_line_frac``: fraction of non-empty (trimmed) lines that are
      repeats of an earlier line. Navigation chrome / boilerplate
      footers repeat lines; prose does not.
    - ``top_bigram_share``: fraction of tokens covered by occurrences of
      the single most frequent word bigram (lowercased whitespace
      tokens). Keyword-stuffed and machine-generated text concentrates
      mass on one bigram.
    - ``symbol_word_ratio``: '#'/ellipsis symbols per token (the Gopher
      symbol-to-word filter) — markup debris and truncated scrapes.

    All pure Catalyst array/regexp expressions (one projection, no
    shuffle, no Python). The bigram count is LINEAR per document:
    adjacent-token pairs via ``zip_with`` over two shifted slices (the
    lambda touches only its element arguments — never an outer subtree,
    which interpreted HOF evaluation would re-execute per element), then
    ``array_sort`` + one ``aggregate`` pass tracking the longest equal-run
    — O(n log n) per row, exactly the max-count the oracle's
    unnest+GROUP BY computes, with no corpus-wide bigram shuffle."""
    lines = F.filter(
        F.transform(F.split(text, "\n"), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    n_lines = F.size(lines)
    dup_line_frac = F.when(
        n_lines > 0,
        (n_lines - F.size(F.array_distinct(lines))).cast("double") / n_lines,
    ).otherwise(F.lit(0.0))

    toks = F.filter(F.split(F.lower(F.trim(text)), r"\s+"), lambda x: x != "")
    n_toks = F.size(toks)
    n_bigrams = F.greatest(n_toks - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(toks, 1, n_bigrams),
        F.slice(toks, 2, n_bigrams),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )

    def _run(acc: Column, x: Column) -> Column:
        # current equal-run length after appending x (sorted order puts
        # equal bigrams adjacent, so max run length == max bigram count)
        return F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1).otherwise(F.lit(1))

    top_count = F.aggregate(
        F.array_sort(bigrams),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            _run(acc, x).alias("run"),
            F.greatest(acc["best"], _run(acc, x)).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    top_bigram_share = F.when(
        n_toks >= 2, (2.0 * top_count.cast("double")) / n_toks
    ).otherwise(F.lit(0.0))

    n_sym = F.regexp_count(text, F.lit(r"#|\.\.\."))
    symbol_word_ratio = F.when(
        n_toks > 0, n_sym.cast("double") / n_toks
    ).otherwise(F.lit(0.0))
    return {
        "dup_line_frac": dup_line_frac,
        "top_bigram_share": top_bigram_share,
        "symbol_word_ratio": symbol_word_ratio,
    }


def repetition_ngram_signals(text: Column) -> dict[str, Column]:
    """The CHAR-fraction / higher-n repetition family (Gopher-inspired,
    r12) — the signals that catch templated text the count-based
    ``repetition_signals`` ratios miss (a doc whose few duplicate lines
    are very LONG, or whose repetition lives at phrase rather than bigram
    grain):

    - ``dup_line_char_frac``: fraction of line CHARACTERS belonging to
      repeat occurrences of a line (total line chars minus chars of the
      distinct line set, over total) — the Gopher "duplicate line
      character fraction".
    - ``top_trigram_share``: fraction of tokens covered by occurrences of
      the most frequent word TRIGRAM (3 * top count / tokens).
    - ``dup_5gram_frac``: fraction of word 5-gram occurrences that are
      repeats (1 - distinct/total) — phrase-grain self-similarity.

    All pure Catalyst array expressions — one projection, no shuffle, no
    Python, same scale posture as ``repetition_signals``. The trigram max
    count reuses the sorted equal-run fold (O(n log n) per row, no
    corpus-wide shuffle)."""
    lines = F.filter(
        F.transform(F.split(text, "\n"), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    chars = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
    )
    lc = chars(lines)
    lcd = chars(F.array_distinct(lines))
    dup_line_char_frac = F.when(
        lc > 0, (lc - lcd).cast("double") / lc
    ).otherwise(F.lit(0.0))

    toks = F.filter(F.split(F.lower(F.trim(text)), r"\s+"), lambda x: x != "")
    n = F.size(toks)
    n3 = F.greatest(n - 2, F.lit(0))
    tri = F.zip_with(
        F.zip_with(
            F.slice(toks, 1, n3),
            F.slice(toks, 2, n3),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
        F.slice(toks, 3, n3),
        lambda ab, c: F.concat(ab, F.lit(" "), c),
    )

    def _run(acc: Column, x: Column) -> Column:
        return F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1).otherwise(F.lit(1))

    top3 = F.aggregate(
        F.array_sort(tri),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            _run(acc, x).alias("run"),
            F.greatest(acc["best"], _run(acc, x)).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    top_trigram_share = F.when(
        n >= 3, (3.0 * top3.cast("double")) / n
    ).otherwise(F.lit(0.0))

    n5 = F.greatest(n - 4, F.lit(0))
    # 5-grams via FOUR zip_with folds over pre-shifted slices — each
    # slice materializes once per row and the lambdas touch only their
    # element arguments. The transform(sequence, i -> slice(toks, i, 5))
    # form re-slices per ELEMENT inside the interpreted HOF evaluator:
    # measured 3.0 s -> this form at sf0.1 (5k docs) for the same output
    sh = lambda k: F.slice(toks, 1 + k, n5)  # noqa: E731
    g5 = sh(0)
    for _k in (1, 2, 3, 4):
        g5 = F.zip_with(g5, sh(_k), lambda a, b: F.concat(a, F.lit(" "), b))
    dup_5gram_frac = F.when(
        n >= 5,
        (n5 - F.size(F.array_distinct(g5))).cast("double") / n5,
    ).otherwise(F.lit(0.0))
    return {
        "dup_line_char_frac": dup_line_char_frac,
        "top_trigram_share": top_trigram_share,
        "dup_5gram_frac": dup_5gram_frac,
    }


def quality_signals(text: Column) -> dict[str, Column]:
    """The classic cheap quality signals, one projection pass:
    - n_chars, n_tokens
    - mean token length
    - alpha ratio (letters / non-space chars)
    - punct ratio
    - stopword ratio (any-language markers / tokens)
    - the repetition/boilerplate family (``repetition_signals``)
    """
    n_chars = F.length(text)
    n_tokens = token_count_whitespace(text)
    nonspace = F.length(F.regexp_replace(text, r"\s", ""))
    alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    punct = F.regexp_count(text, F.lit(r"[.,;:!?'\"()\[\]{}-]"))
    all_markers = tuple(w for ws in LANG_MARKERS.values() for w in ws)
    stop_hits = stopword_hits(text, all_markers)
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_token_len": F.when(n_tokens > 0, nonspace.cast("double") / n_tokens).otherwise(F.lit(0.0)),
        "alpha_ratio": F.when(nonspace > 0, alpha.cast("double") / nonspace).otherwise(F.lit(0.0)),
        "punct_ratio": F.when(nonspace > 0, punct.cast("double") / nonspace).otherwise(F.lit(0.0)),
        "stopword_ratio": F.when(n_tokens > 0, stop_hits.cast("double") / n_tokens).otherwise(F.lit(0.0)),
        **repetition_signals(text),
    }


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality score: weighted blend of bounded signals,
    now including the repetition/boilerplate penalties. Deterministic,
    monotone in each signal — a filterable ranking, not a trained model."""
    return quality_score_from(quality_signals(text))


def quality_score_from(s: dict[str, Column]) -> Column:
    """The composite-score formula over already-computed signal columns —
    callers that also project the individual signals (``document_profile``)
    compute them ONCE into a struct and feed the fields here, so the
    signal expression trees are not re-expanded inside the score."""
    len_score = F.least(s["n_tokens"].cast("double") / 50.0, F.lit(1.0))
    return (
        0.3 * len_score
        + 0.25 * s["alpha_ratio"]
        + 0.15 * F.least(s["stopword_ratio"] * 5.0, F.lit(1.0))
        + 0.1 * (1.0 - F.least(s["punct_ratio"] * 5.0, F.lit(1.0)))
        + 0.1 * (1.0 - s["dup_line_frac"])
        + 0.05 * (1.0 - F.least(s["top_bigram_share"] * 2.0, F.lit(1.0)))
        + 0.05 * (1.0 - F.least(s["symbol_word_ratio"] * 10.0, F.lit(1.0)))
    )


def fingerprint(text: Column) -> Column:
    """Deterministic 64-bit content fingerprint of the normalized text
    (md5-derived; identical expression exists in ANSI SQL for the oracle)."""
    return stable_hash64(normalize_text(text))


def tf_idf(df: DataFrame, id_col: str, text_col: str, min_df: int = 1) -> DataFrame:
    """Classic smooth TF-IDF over whitespace-normalized terms:
    tf = term count / doc length, idf = ln(N / df). One explode + two
    grouped aggregations; the per-term document frequency joins back on
    the term (broadcast when the vocabulary is small). The corpus doc
    count N is a broadcast one-row aggregate INSIDE the plan — no eager
    ``df.count()`` job before the real one (same pattern as
    ``unigram_logprob``'s total term count)."""
    df = spread_to_parallelism(df)
    terms = df.select(
        F.col(id_col),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("term"),
    ).filter(F.col("term") != "")
    n_docs = df.groupBy().agg(F.count(F.lit(1)).cast("double").alias("__n_docs"))
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("n"))
    doc_len = terms.groupBy(id_col).agg(F.count(F.lit(1)).alias("len"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df")).filter(F.col("df") >= min_df)
    return (
        tf.join(doc_len, id_col)
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "term",
            (
                (F.col("n") / F.col("len")) * F.log(F.col("__n_docs") / F.col("df"))
            ).alias("tfidf"),
        )
    )


def tfidf_docsim_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    ngram_n: int = 3,
    min_df: int = 2,
    max_df_frac: float = 0.5,
) -> DataFrame:
    """Sparse document-document cosine similarity via the inverted index —
    the lexical sibling of the dense embedding retrieval family: exact
    IDF-weighted cosine over distinct word n-gram shingles (the same
    shingle space the MinHash dedup family banding approximates), per-doc
    top-k neighbors. Per-doc TF normalization is deliberately absent:
    shingles are distinct within a doc, so tf is the constant 1/len and
    cosine is invariant to any per-doc uniform scale — idf alone gives
    the identical ranking with fewer terms in the sum.

    The df band is the scale lever (the DISCO / prefix-filter insight): a
    shingle occurring in f docs fans out f(f-1)/2 candidate partial
    products, so the df <= max_df_frac*N cap drops exactly the
    boilerplate-grade shingles whose posting self-join would dominate
    cost while contributing near-uniform similarity mass. Within the band
    the computation is exact: postings self-join on shingle (equi-join —
    never all-pairs), one grouped sum per co-occurring pair, norms from
    the same banded postings so the cosine is a true cosine in that
    space. All shuffles key on shingle or doc pair; nothing collects.
    """
    from urban_traffic_data_lake_project_spark.functions.core import (
        shingles_from_words,
    )

    src = spread_to_parallelism(df)
    words = src.select(
        F.col(id_col), F.split(normalize_text(F.col(text_col)), " ").alias("__words")
    )
    sh = (
        words.select(
            F.col(id_col),
            F.explode(shingles_from_words(F.col("__words"), ngram_n)).alias("term"),
        )
        .filter(F.col("term") != "")
    )
    n_docs = df.groupBy().agg(F.count(F.lit(1)).cast("double").alias("__nd"))
    dfreq = sh.groupBy("term").agg(F.count(F.lit(1)).alias("__df"))
    p = (
        sh.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .filter(
            (F.col("__df") >= min_df)
            & (F.col("__df") <= F.floor(F.lit(max_df_frac) * F.col("__nd")))
        )
        .select(id_col, "term", F.log(F.col("__nd") / F.col("__df")).alias("tfidf"))
    )
    # The banded postings feed TWO differently-keyed shuffles: the term
    # self-join (whose two exchanges runtime exchange-reuse already
    # dedups) and the per-doc norm aggregation (keyed by id — its exchange
    # re-derives the tokenize + dfreq-join subtree). At bench scale the
    # re-derivation measured cheaper than a persist (r12: 2.8-3.6 s vs
    # 4.0-5.2 s); at corpus scale the extra full tokenization pass always
    # loses — scale-conditional persist, a no-op below the byte threshold.
    from urban_traffic_data_lake_project_spark.sources.tables import (
        persist_for_reuse_if_large,
    )

    # probe the pre-join shingle frame: optimizing the banded-postings
    # join just to read its size estimate cost ~6% of the whole query at
    # bench scale; the shingle stream bounds the postings size from above
    p = persist_for_reuse_if_large(p, probe_df=sh)
    norms = p.groupBy(id_col).agg(
        F.sqrt(F.sum(F.col("tfidf") * F.col("tfidf"))).alias("__nn")
    )
    a = p.select(F.col(id_col).alias("__da"), "term", F.col("tfidf").alias("__wa"))
    b = p.select(F.col(id_col).alias("__db"), "term", F.col("tfidf").alias("__wb"))
    pairs = (
        a.join(b, "term")
        .filter(F.col("__da") < F.col("__db"))
        .groupBy("__da", "__db")
        .agg(F.sum(F.col("__wa") * F.col("__wb")).alias("__dot"))
    )
    sym = pairs.select(
        F.col("__da").alias(id_col), F.col("__db").alias("neighbor_id"), "__dot"
    ).unionByName(
        pairs.select(
            F.col("__db").alias(id_col), F.col("__da").alias("neighbor_id"), "__dot"
        )
    )
    na = norms.select(F.col(id_col), F.col("__nn").alias("__na"))
    nb = norms.select(
        F.col(id_col).alias("neighbor_id"), F.col("__nn").alias("__nb")
    )
    sims = (
        sym.join(na, id_col)
        .join(nb, "neighbor_id")
        .select(
            id_col,
            "neighbor_id",
            F.round(F.col("__dot") / (F.col("__na") * F.col("__nb")), 6).alias(
                "cos_sim"
            ),
        )
    )
    rank_w = W.partitionBy(id_col).orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= k)
        .select(id_col, "neighbor_id", "cos_sim", "rank")
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 100,
    overlap: int = 20,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Overlapping fixed-token-window chunking — the standard training-
    corpus preparation step: whitespace tokens, windows of ``chunk_tokens``
    advancing by ``chunk_tokens - overlap``; the final window may be
    shorter; token-less docs yield no chunks.

    Pure Catalyst (split -> sequence of window starts -> transform(slice)
    -> posexplode): embarrassingly parallel, no shuffle, no Python. The
    word array materializes as a column BEFORE the lambda (no CSE inside
    higher-order-function lambdas).

    Returns (id, chunk_id, n_tokens, chunk_text, *carry_cols) —
    ``carry_cols`` ride along through the explode so downstream consumers
    (shard labels, split tags) need no re-join back to the corpus."""
    step = chunk_tokens - overlap
    if step <= 0:
        raise ValueError("overlap must be smaller than chunk_tokens")
    df = spread_to_parallelism(df)
    words = df.select(
        F.col(id_col), *carry_cols, F.split(F.trim(F.col(text_col)), r"\s+").alias("__w")
    ).filter(F.trim(F.col(text_col)) != "")
    n = F.size("__w")
    n_chunks = F.floor((F.greatest(n - overlap, F.lit(1)) + (step - 1)) / step).cast("int")
    starts = F.sequence(F.lit(0), (n_chunks - 1) * step, F.lit(step))
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            F.size(F.slice("__w", s + 1, chunk_tokens)).alias("n_tokens"),
            F.array_join(F.slice("__w", s + 1, chunk_tokens), " ").alias("chunk_text"),
        ),
    )
    return words.select(
        F.col(id_col), *carry_cols, F.posexplode(chunks).alias("chunk_id", "__c")
    ).select(
        id_col, "chunk_id", F.col("__c.n_tokens"), F.col("__c.chunk_text"), *carry_cols
    )


# PII patterns, applied IN ORDER (emails before URLs before IPs before bare
# digit runs, so a token never double-matches a later, looser pattern).
# Every pattern stays inside the Java-regex ∩ RE2 common dialect so the
# DuckDB oracle replicates the redaction byte-for-byte.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("url", r"https?://[^\s]+", "<URL>"),
    ("ip", r"\b\d{1,3}(\.\d{1,3}){3}\b", "<IP>"),
    ("digit_run", r"\d{6,}", "<NUM>"),
)


def redact_pii(text: Column) -> dict[str, Column]:
    """PII scrubbing as a single sequential ``regexp_replace`` chain — the
    standard pre-training privacy pass. Returns the redacted text plus a
    per-pattern hit count (counted against the text as it stands when that
    pattern is applied, i.e. exactly the occurrences that were replaced).

    Pure Catalyst expressions — the whole chain is one codegen'd
    projection, embarrassingly parallel at any corpus size."""
    out: dict[str, Column] = {}
    cur = text
    for name, pat, token in PII_PATTERNS:
        out[f"n_{name}"] = F.regexp_count(cur, F.lit(pat))
        cur = F.regexp_replace(cur, pat, token)
    out["redacted"] = cur
    return out


def unigram_logprob(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Language-model quality scoring, unigram form: fit term frequencies
    on the corpus itself, score each document by its mean token
    log-probability (the cheap stand-in for the perplexity filtering a
    production pipeline runs with a KenLM-style model — low scores flag
    boilerplate/garbage relative to the corpus distribution).

    Returns (id, n_tokens, avg_logp).

    Scale shape: the classic fit + transform two-pass — corpus pass 1
    builds the vocabulary term counts (map-side partials, shuffle |vocab|
    rows), which are CACHED; the total term count is derived from the
    cached vocabulary, never from a corpus re-scan; corpus pass 2 joins
    terms back to the vocabulary (Zipf head-term skew handled by AQE's
    skew-join split) and re-aggregates per doc. No Python."""
    df = spread_to_parallelism(df)
    terms = df.select(
        F.col(id_col),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("term"),
    ).filter(F.col("term") != "")
    freqs = terms.groupBy("term").agg(F.count(F.lit(1)).alias("__tf")).persist()
    n_total = freqs.groupBy().agg(F.sum("__tf").alias("__n"))
    scored = terms.join(freqs, "term").crossJoin(F.broadcast(n_total))
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.avg(F.log(F.col("__tf") / F.col("__n"))).alias("avg_logp"),
    )


def document_profile(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Everything above in one pass over the corpus: id, predicted
    language, quality signals + composite score, token counts, fingerprint.

    Two stacked projections: the first computes every quality signal ONCE
    into a struct column, the second projects the fields and derives the
    composite score from them. CollapseProject will not merge the two
    (the struct is referenced many times and is not cheap), so the signal
    trees are evaluated once per row instead of once per output column."""
    df = spread_to_parallelism(df)
    t = F.col(text_col)
    sig = quality_signals(t)
    staged = df.select(
        F.col(id_col),
        lang_id(t).alias("pred_lang"),
        F.struct(*[c.alias(name) for name, c in sig.items()]).alias("__sig"),
        token_count_bpe_ish(t).alias("n_tokens_bpe"),
        fingerprint(t).alias("fingerprint"),
    )
    fields = {name: F.col("__sig").getField(name) for name in sig}
    return staged.select(
        F.col(id_col),
        "pred_lang",
        *[fields[name].alias(name) for name in sig],
        F.round(quality_score_from(fields), 6).alias("quality"),
        "n_tokens_bpe",
        "fingerprint",
    )


# ---------------------------------------------------------------------------
# Tokenizer-faithful BPE — real byte-pair-encoding merges, not a regex
# proxy. Training and application both run on SYMBOL STRINGS (characters
# joined by single spaces) where one merge step is a literal
# ``replace(sym, 'a b', 'ab')`` — greedy left-to-right non-overlapping in
# Spark (UTF8String.replace), DuckDB, and Python alike, so the whole
# tokenizer is oracle-checkable merge for merge.
# ---------------------------------------------------------------------------
def bpe_word_table(df: DataFrame, text_col: str) -> DataFrame:
    """(word, freq, sym) — corpus word frequencies with each word expanded
    to its initial character-symbol string. The ONLY corpus-scale pass in
    BPE training: everything after runs on the aggregated vocabulary.

    Symbol encoding: each symbol is PIPE-WRAPPED (``the`` ->
    ``|t||h||e|``; the alphabet is [a-z0-9] after normalize_text, so
    ``|`` can never occur inside a symbol). The earlier space-separated
    form had a boundary bug: applying merge (a, b) via
    ``replace(sym, 'a b', 'ab')`` also matched INSIDE a longer previous
    symbol — ``['xa', 'b']`` serialized as ``'xa b'`` contains ``'a b'``
    and was corrupted to one ``'xab'`` token (the reference BPE guards
    boundaries with ``(?<!\\S)pair(?!\\S)``, Sennrich et al. 2016). With
    wrapping, the search key ``|a||b|`` cannot match a suffix (``'x'``
    precedes the ``a``, not ``|``), and greedy left-to-right
    non-overlapping replace still merges runs correctly:
    ``|b||b||b||b|`` + merge (b,b) -> ``|bb||bb|``."""
    words = (
        spread_to_parallelism(df)
        .select(F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("w"))
        .filter(F.col("w") != "")
    )
    vocab = words.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    sym = F.regexp_replace(F.col("w"), "(.)", "|$1|")
    return vocab.select(F.col("w").alias("word"), "freq", sym.alias("sym"))


def _bpe_symbols(sym_col: str) -> F.Column:
    """Symbol array from the pipe-wrapped encoding (drops the empty
    fragments the double pipes produce)."""
    return F.filter(F.split(sym_col, "[|]"), lambda x: x != "")


# Materialize the BPE symbol table after this many stacked merges: bounds
# the live replace-chain depth (plan size, per-round re-evaluation cost) at
# K while costing one bounded vocab-table job per K rounds. Env-overridable
# so the stress harness can A/B the bounded chain against the unbounded one.
import os as _os

_BPE_CHECKPOINT_EVERY = int(_os.environ.get("SPARK_GRAFT_BPE_CKPT_EVERY", "32"))


def _bpe_fit_driver(
    rows: list, num_merges: int
) -> tuple[list[tuple[str, str, int]], list]:
    """The merge loop on the collected (word, freq, sym) vocabulary —
    incremental pair counts + a lazy max-heap, the classic Sennrich
    trainer. Bit-equivalent to the distributed loop by construction:
    the argmax key is (count desc, pa asc, pb asc) exactly as the Spark
    ``orderBy`` (UTF-8 binary order == Python code-point order), and the
    merge applies via the same left-to-right non-overlapping
    ``str.replace`` on the same pipe-wrapped encoding. Cost per merge is
    proportional to the words CONTAINING the pair, not the vocabulary —
    4,096 merges over a 20k-word vocab run in seconds where the
    job-per-round distributed loop pays ~0.5 s of scheduling per merge.
    Returns (merges, final [word, freq, sym] rows)."""
    import heapq
    from collections import Counter

    words: list[list] = [[sym, int(freq)] for _, freq, sym in rows]
    names = [w for w, _, _ in rows]

    def word_pairs(sym: str) -> Counter:
        syms = [s for s in sym.split("|") if s]
        return Counter(zip(syms, syms[1:]))

    pair_counts: Counter = Counter()
    pair_words: dict[tuple[str, str], set[int]] = {}
    for wi, (sym, freq) in enumerate(words):
        for p, k in word_pairs(sym).items():
            pair_counts[p] += k * freq
            pair_words.setdefault(p, set()).add(wi)
    heap = [(-c, p[0], p[1]) for p, c in pair_counts.items()]
    heapq.heapify(heap)
    merges: list[tuple[str, str, int]] = []
    while len(merges) < num_merges and heap:
        nc, pa, pb = heapq.heappop(heap)
        cur = pair_counts.get((pa, pb), 0)
        if cur <= 0 or -nc != cur:
            continue  # stale heap entry — a fresher one exists (or pair died)
        merges.append((pa, pb, cur))
        target, repl = f"|{pa}||{pb}|", f"|{pa}{pb}|"
        for wi in list(pair_words.get((pa, pb), ())):
            sym, freq = words[wi]
            old = word_pairs(sym)
            new_sym = sym.replace(target, repl)
            new = word_pairs(new_sym)
            words[wi][0] = new_sym
            for p in old.keys() | new.keys():
                d = new.get(p, 0) - old.get(p, 0)
                if not d:
                    continue
                c2 = pair_counts[p] + d * freq
                pair_counts[p] = c2
                if new.get(p, 0):
                    pair_words.setdefault(p, set()).add(wi)
                else:
                    s = pair_words.get(p)
                    if s is not None:
                        s.discard(wi)
                if c2 > 0:
                    heapq.heappush(heap, (-c2, p[0], p[1]))
        pair_counts.pop((pa, pb), None)
        pair_words.pop((pa, pb), None)
    return merges, [[names[i], words[i][1], words[i][0]] for i in range(len(words))]


def bpe_train(
    df: DataFrame,
    text_col: str,
    num_merges: int = 12,
    driver_fit: bool = True,
    max_vocab_words: int = 1 << 20,
) -> tuple[list, DataFrame]:
    """Sennrich-style BPE training: ``num_merges`` rounds of (count
    adjacent symbol pairs weighted by word frequency -> take the most
    frequent, ties to the lexicographically smallest pair -> apply the
    merge). Returns (ordered list of (pa, pb, freq) merges, final
    symbol table).

    Scale shape: the corpus is touched ONCE (``bpe_word_table``); each
    round is a pair-explode + grouped sum + limit(1) over the |vocab|-row
    table — driver-coordinated like the IVF/FA fits, with the per-round
    argmax the only collected row. The pair explode materializes the
    split-symbol array before zipping (no CSE inside HOF lambdas).

    The word table is PERSISTED before the loop: without it every round's
    pair-count job would re-execute the corpus explode + aggregation —
    num_merges full corpus scans instead of one.

    Plan growth (r8 verdict item 4): naively each round stacks one more
    ``replace`` onto ``sym``'s expression chain and every later round
    re-evaluates the WHOLE chain over the vocab — O(num_merges^2)
    expression work and an ever-deeper plan that hits an analysis-time /
    plan-size cliff at real tokenizer vocab (30k+ merges). The loop
    therefore MATERIALIZES the symbol table every ``_BPE_CHECKPOINT_EVERY``
    rounds with an eager ``localCheckpoint`` (lineage truncated to the
    materialized rows; executor-local storage — the right durability
    trade for a driver-coordinated fit loop), so the live chain is
    bounded at K replaces and total work is O(K * num_merges) — linear in
    merges for fixed K. Measured on a 200k-doc/1.1k-word synthetic corpus
    (tools/stress.py bpe_train_256): 135 vs 179 s at 256 merges, 169 vs
    210 s at 512 — at this small vocab the per-round job overhead
    dominates and the chain tax is ~25-33%; the bounded plan DEPTH is the
    structural win (the unbounded chain's analysis cost and expression
    tree keep growing with every merge, the cliff at real 30k+-merge
    vocab). Full rows in SCALING.md.

    ``driver_fit=True`` (the default since r10, verdict item 6) removes
    the remaining per-merge bottleneck — the top-1 driver round-trip per
    round, ~0.5 s of job scheduling that makes 30k merges infeasible no
    matter how flat the per-round plan is. The corpus-scale work is
    unchanged (``bpe_word_table``, ONE pass); the merge loop then runs on
    the collected vocabulary with incremental pair counts + a lazy
    max-heap (``_bpe_fit_driver``) — the fit/score split this engine uses
    for every bounded-fit operator (PCA moments, k-means sample, EM
    histogram), and exactly how production BPE trainers work: the
    distinct-word frequency table is vocabulary-sized, not corpus-sized.
    Bit-equivalent to the distributed loop (same argmax key, same
    replace semantics — property-tested at 256 merges on the stress
    corpus); 4,096 merges over 200k docs measured sub-second fit time
    after the one corpus pass (SCALING.md). ``max_vocab_words`` caps the
    collected table (freq desc, word asc — deterministic) as the honest
    scale boundary at open-web vocabularies; under the cap the fit is
    exact. ``driver_fit=False`` keeps the fully-distributed loop as the
    uncapped-exact alternative and A/B reference."""
    if driver_fit:
        # ONE corpus-scale action (ADVICE r10: the count()-then-collect()
        # pair executed the word aggregation twice): collect cap+1 rows in
        # the deterministic (freq desc, word asc) order — a TakeOrdered
        # over the agg, not a full sort — and detect overflow by whether
        # the sentinel row came back. Under the cap this is the exact
        # vocabulary; over it, dropping the sentinel leaves exactly the
        # top max_vocab_words, identical to the old two-action path.
        wt = bpe_word_table(df, text_col)
        rows = [
            (r["word"], r["freq"], r["sym"])
            for r in wt.select("word", "freq", "sym")
            .orderBy(F.desc("freq"), F.asc("word"))
            .limit(max_vocab_words + 1)
            .collect()
        ]
        if len(rows) > max_vocab_words:
            rows = rows[:max_vocab_words]
        merges, out_rows = _bpe_fit_driver(rows, num_merges)
        symtab = df.sparkSession.createDataFrame(
            [tuple(r) for r in out_rows], "word string, freq bigint, sym string"
        )
        return merges, symtab
    cur = bpe_word_table(df, text_col).persist()
    pinned = cur  # currently-materialized base (persisted or checkpointed)
    depth = 0  # replaces stacked since the last materialization
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        s = cur.select("freq", _bpe_symbols("sym").alias("__s"))
        n_pairs = F.greatest(F.size("__s") - 1, F.lit(0))
        pairs = s.select(
            "freq",
            F.explode(
                F.zip_with(
                    F.slice("__s", 1, n_pairs),
                    F.slice("__s", 2, n_pairs),
                    lambda a, b: F.struct(a.alias("pa"), b.alias("pb")),
                )
            ).alias("__p"),
        ).select(F.col("__p.pa"), F.col("__p.pb"), "freq")
        top = (
            pairs.groupBy("pa", "pb")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("pa").asc(), F.col("pb").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break  # vocabulary fully merged — nothing left to learn
        pa, pb = top[0]["pa"], top[0]["pb"]
        merges.append((pa, pb, int(top[0]["cnt"])))
        cur = cur.withColumn(
            "sym",
            F.replace(F.col("sym"), F.lit(f"|{pa}||{pb}|"), F.lit(f"|{pa}{pb}|")),
        )
        depth += 1
        if depth >= _BPE_CHECKPOINT_EVERY:
            nxt = cur.localCheckpoint(eager=True)
            pinned.unpersist()
            cur, pinned, depth = nxt, nxt, 0
    return merges, cur


def bpe_token_counts(
    df: DataFrame, id_col: str, text_col: str, num_merges: int = 12
) -> DataFrame:
    """Per-document token counts under a corpus-trained BPE tokenizer:
    (id, n_words, n_bpe_tokens). The distinct-word symbol table (tiny
    after aggregation) broadcasts to the exploded corpus words; documents
    with no words report zeros.

    This replaces the ``token_count_bpe_ish`` regex APPROXIMATION with
    counts from an actual trained merge table — the difference matters
    when budgeting training tokens."""
    _, symtab = bpe_train(df, text_col, num_merges)
    wordtab = symtab.select(
        "word", F.size(_bpe_symbols("sym")).alias("__n_sub")
    )
    doc_words = df.select(
        F.col(id_col),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("word"),
    ).filter(F.col("word") != "")
    per_doc = (
        doc_words.join(F.broadcast(wordtab), "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("__n_sub").alias("n_bpe_tokens"),
        )
    )
    zero = F.lit(0).cast("bigint")
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_words", zero).alias("n_words"),
            F.coalesce("n_bpe_tokens", zero).alias("n_bpe_tokens"),
        )
    )


def bpe_encode(
    df: DataFrame, id_col: str, text_col: str, num_merges: int = 12
) -> DataFrame:
    """Tokenize every document with the corpus-trained BPE — the encode
    step a tokenizer build ships alongside its merge table. Returns
    (id, n_words, n_tokens, token_fp) where ``token_fp`` is the md5 of
    the space-joined token stream in DOCUMENT WORD ORDER, so the
    fingerprint pins the exact token sequence (ids and counts alone
    cannot distinguish reordered tokenizations).

    Scale shape: training is ``bpe_train`` (one corpus pass + vocab-table
    rounds); encoding joins the tiny word->tokens table (broadcast) to
    the posexploded corpus words, then rebuilds each document's stream
    with the order-free ``array_sort(collect_list(struct(pos, toks)))``
    idiom — no order-sensitive aggregation anywhere (the r4
    ``string_agg ORDER BY`` lesson)."""
    _, symtab = bpe_train(df, text_col, num_merges)
    syms = _bpe_symbols("sym")
    wordtok = symtab.select(
        "word",
        F.array_join(syms, " ").alias("__toks"),
        F.size(syms).alias("__n_sub"),
    )
    doc_words = df.select(
        F.col(id_col),
        F.posexplode(
            F.filter(
                F.split(normalize_text(F.col(text_col)), " "), lambda x: x != ""
            )
        ).alias("__pos", "word"),
    )
    per_doc = (
        doc_words.join(F.broadcast(wordtok), "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("__n_sub").alias("n_tokens"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("__pos", "__toks"))),
                        lambda s: s["__toks"],
                    ),
                    " ",
                )
            ).alias("token_fp"),
        )
    )
    zero = F.lit(0).cast("bigint")
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_words", zero).alias("n_words"),
            F.coalesce(F.col("n_tokens").cast("bigint"), zero).alias("n_tokens"),
            F.coalesce("token_fp", F.md5(F.lit(""))).alias("token_fp"),
        )
    )


def bigram_logprob(
    df: DataFrame,
    id_col: str,
    text_col: str,
    fit_df: DataFrame | None = None,
    backoff: float = 0.4,
) -> DataFrame:
    """Bigram language-model scoring with stupid backoff — one rung up
    from ``unigram_logprob`` toward the KenLM-style perplexity filter:
    every adjacent token pair scores ``ln(C(w1 w2) / C(w1))`` when the
    bigram was seen in the FIT corpus, else backs off to
    ``ln(backoff * (C(w2) + 1) / (N + V))`` (add-one inside the backoff so
    OOV tokens stay finite). Fitting on a held-out split (``fit_df``)
    keeps the backoff path live — scoring the fit corpus on itself never
    backs off.

    Returns (id, n_bigrams, avg_logp, oov_frac); docs with < 2 tokens get
    n_bigrams = 0 and NULL scores.

    Scale shape: fit = two grouped counts over the fit corpus's pair /
    term explosions (map-side partials, |bigram-vocab| rows, persisted);
    score = the corpus pair explosion joined back to the two count tables
    (Zipf head-word skew handled by AQE skew-join split) and one per-doc
    re-aggregation. No Python anywhere."""
    fit = spread_to_parallelism(fit_df if fit_df is not None else df)

    def pair_rows(src: DataFrame, *extra):
        toks = F.filter(F.split(normalize_text(F.col(text_col)), " "), lambda x: x != "")
        words = src.select(*extra, toks.alias("__t"))
        npairs = F.greatest(F.size("__t") - 1, F.lit(0))
        return words.select(
            *extra,
            F.explode(
                F.zip_with(
                    F.slice("__t", 1, npairs),
                    F.slice("__t", 2, npairs),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("__p"),
        ).select(*extra, F.col("__p.w1").alias("w1"), F.col("__p.w2").alias("w2"))

    big = pair_rows(fit).groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("__c12")).persist()
    uni = (
        fit.select(F.explode(F.filter(F.split(normalize_text(F.col(text_col)), " "), lambda x: x != "")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("__c1"))
        .persist()
    )
    totals = uni.groupBy().agg(
        F.sum("__c1").alias("__n"), F.count(F.lit(1)).alias("__v")
    )

    pairs = pair_rows(spread_to_parallelism(df), F.col(id_col))
    scored = (
        pairs.join(big, ["w1", "w2"], "left")
        .join(uni.select(F.col("term").alias("w1"), F.col("__c1").alias("__c1p")), "w1", "left")
        .join(uni.select(F.col("term").alias("w2"), F.col("__c1").alias("__c1c")), "w2", "left")
        .crossJoin(F.broadcast(totals))
    )
    logp = F.when(
        F.col("__c12").isNotNull(), F.log(F.col("__c12") / F.col("__c1p"))
    ).otherwise(
        F.log(backoff * (F.coalesce(F.col("__c1c"), F.lit(0)) + 1) / (F.col("__n") + F.col("__v")))
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.avg(logp).alias("avg_logp"),
        F.avg(F.when(F.col("__c12").isNull(), 1.0).otherwise(0.0)).alias("oov_frac"),
    )
    zero = F.lit(0).cast("bigint")
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_bigrams", zero).alias("n_bigrams"),
            F.col("avg_logp"),
            F.col("oov_frac"),
        )
    )


# ---------------------------------------------------------------------------
# Markup stripping + corpus-level boilerplate removal — the web-extraction
# cleaning stages (C4/RefinedWeb-style) that run BEFORE quality scoring on
# crawled corpora. Both stay pure Catalyst: regexp chains and one
# line-frequency shuffle; no Python in the hot path.
# ---------------------------------------------------------------------------
_TAG_RE = "<[^>]*>"
_URL_RE = "https?://[^\\s<>]+"
_ENTITY_RE = "&[a-zA-Z]+;|&#[0-9]+;"


def strip_markup(text: Column) -> dict[str, Column]:
    """``{'clean', 'n_tags', 'n_urls'}`` — remove HTML tags, URLs, and
    character entities, then collapse whitespace. Counts are taken on the
    raw text so the caller can keep them as extraction diagnostics. One
    codegen'd regexp chain per row; patterns are RE2-safe so the identical
    expressions run on any ANSI engine (oracle parity)."""
    clean = F.regexp_replace(text, _URL_RE, " ")
    clean = F.regexp_replace(clean, _TAG_RE, " ")
    clean = F.regexp_replace(clean, _ENTITY_RE, " ")
    clean = F.trim(F.regexp_replace(clean, "\\s+", " "))
    return {
        "clean": clean,
        "n_tags": F.regexp_count(text, F.lit(_TAG_RE)),
        "n_urls": F.regexp_count(text, F.lit(_URL_RE)),
    }


def remove_boilerplate_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_doc_frac: float = 0.10,
) -> DataFrame:
    """Drop lines that appear (verbatim) in at least ``max_doc_frac`` of
    all documents — shared navigation/footer chrome survives per-document
    dedup because every copy lives in a different doc; this is the
    corpus-level complement (within-doc repeats are dup_line_frac's job;
    cross-doc PARAGRAPH dedup is substring_span_dedup's).

    Returns (id, n_lines, n_boiler, clean_text) for every input document
    (clean_text = '' when everything was chrome).

    Scale shape: explode lines -> one groupBy on the line counting
    distinct owner docs -> equi-join back -> one groupBy per doc
    rebuilding the text from the kept (idx, line) pairs. Two hash
    shuffles of line rows; the doc-count threshold rides along as a
    broadcast scalar inside the plan — no eager count, no collect.

    The threshold compare is integer-exact (``__nd * den < num *
    __ndocs`` with ``num/den`` the rational form of ``max_doc_frac``)
    so no engine's float rounding of ``frac * n`` is load-bearing —
    the same doc is flagged on any ANSI engine."""
    from fractions import Fraction

    frac = Fraction(max_doc_frac).limit_denominator(10**6)
    lines = spread_to_parallelism(df).select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("idx", "line"),
    )
    owners = lines.groupBy("line").agg(
        F.count_distinct(F.col(id_col)).alias("__nd")
    )
    total = df.agg(F.count(F.lit(1)).alias("__ndocs"))
    flagged = (
        lines.join(owners, "line")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "__keep",
            F.col("__nd") * F.lit(frac.denominator)
            < F.lit(frac.numerator) * F.col("__ndocs"),
        )
    )
    kept_struct = F.when(
        F.col("__keep"), F.struct(F.col("idx"), F.col("line"))
    )
    perdoc = flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.when(~F.col("__keep"), 1).otherwise(0)).alias("n_boiler"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_struct)), lambda s: s["line"]
            ),
            "\n",
        ).alias("clean_text"),
    )
    return df.select(id_col).join(perdoc, id_col, "left").select(
        id_col,
        F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
        F.coalesce("n_boiler", F.lit(0)).alias("n_boiler"),
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
    )


def inverted_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_df: int = 2,
    max_df_frac: float = 0.9,
) -> DataFrame:
    """Build an inverted index over normalized terms: one row per term
    with its document frequency and the sorted posting list (comma-joined
    doc ids — string-typed so the row is engine-portable). ``max_df_frac``
    bounds posting-list width RELATIVE to corpus size (the threshold is a
    broadcast scalar inside the plan, no eager count): terms in more than
    that fraction of documents are the stopword head retrieval drops
    anyway, and capping them keeps every output row small at any scale; a
    full-scale index would shard the surviving lists into positional
    chunks with the same plan.

    Scale shape: explode terms -> distinct (term, doc) pairs (one
    shuffle) -> one groupBy per term (map-side partial distinct) — the
    standard corpus shape; no collects, no driver loops."""
    terms = (
        spread_to_parallelism(df)
        .select(
            F.col(id_col),
            F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("term"),
        )
        .filter(F.col("term") != "")
        .distinct()
    )
    n_docs = df.groupBy().agg(F.count(F.lit(1)).alias("__ndocs"))
    g = terms.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.col(id_col))),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("postings"),
    )
    return (
        g.crossJoin(F.broadcast(n_docs))
        .filter(
            (F.col("df") >= min_df)
            & (F.col("df") <= max_df_frac * F.col("__ndocs"))
        )
        .drop("__ndocs")
    )


def compression_ratio(df: DataFrame, id_col: str, text_col: str, level: int = 6) -> DataFrame:
    """Gopher-style compressibility signal: deflate each document and
    report compressed/raw byte ratio — boilerplate-heavy or repetitive
    text compresses far better than natural prose, catching what
    token-level repetition ratios miss (long-range repeats). zlib has no
    ANSI-SQL form, so this is a rows-only operator validated by property
    tests (monotonicity on engineered fixtures) rather than the oracle.

    Arrow-batched mapInPandas; embarrassingly parallel per-byte CPU, so
    callers spread under-partitioned inputs first (same rule as the
    codecs). Returns (id, n_bytes, n_compressed, compression_ratio)."""
    import zlib

    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    schema = StructType(
        [
            StructField("__id", LongType()),
            StructField("n_bytes", LongType()),
            StructField("n_compressed", LongType()),
            StructField("compression_ratio", DoubleType()),
        ]
    )

    def run(batches):
        import pandas as pd

        for pdf in batches:
            ids, nb, nc, ratio = [], [], [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                raw = (t or "").encode("utf-8")
                comp = zlib.compress(raw, level)
                ids.append(i)
                nb.append(len(raw))
                nc.append(len(comp))
                ratio.append(len(comp) / len(raw) if raw else None)
            yield pd.DataFrame(
                {"__id": ids, "n_bytes": nb, "n_compressed": nc, "compression_ratio": ratio}
            )

    out = spread_to_parallelism(df).select(F.col(id_col), F.col(text_col)).mapInPandas(
        run, schema=schema
    )
    return out.withColumnRenamed("__id", id_col)


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: tuple[str, ...],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 retrieval: score every document against a bag of query terms
    and return the top-``k`` (Robertson/Sparck-Jones idf with the +1
    Lucene floor, standard tf saturation + length normalization).

    Scale shape: doc length is a per-row expression (``size`` of the
    normalized token array — NO token explosion for the length pass);
    the explosion is filtered to the handful of query terms *before* the
    ``(doc, term)`` tf aggregation, so the only corpus-sized shuffle
    carries rows for matching docs only. Corpus stats (N, avgdl) ride in
    as a broadcast one-row frame; per-term df is a second tiny broadcast.
    The final top-k is an ``orderBy().limit()`` —
    TakeOrderedAndProject, partition-local heads, never a full sort.
    """
    terms_arr = F.filter(
        F.split(normalize_text(F.col(text_col)), " "), lambda x: x != ""
    )
    docs = spread_to_parallelism(df).select(
        F.col(id_col), terms_arr.alias("__terms")
    ).withColumn("__dl", F.size("__terms"))

    stats = docs.groupBy().agg(
        F.count(F.lit(1)).alias("__n_docs"),
        F.avg("__dl").alias("__avgdl"),
    )

    tf = (
        docs.select(
            F.col(id_col), "__dl", F.explode("__terms").alias("term")
        )
        .filter(F.col("term").isin(*query_terms))
        .groupBy(id_col, "__dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    term_df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))

    scored = (
        tf.join(F.broadcast(term_df), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "__idf",
            F.log(
                F.lit(1.0)
                + (F.col("__n_docs") - F.col("df_t") + F.lit(0.5))
                / (F.col("df_t") + F.lit(0.5))
            ),
        )
        .withColumn(
            "__s",
            F.col("__idf")
            * F.col("tf") * F.lit(k1 + 1.0)
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("__dl") / F.col("__avgdl"))
            ),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.round(F.sum("__s"), 6).alias("bm25"),
        F.count(F.lit(1)).alias("n_terms_hit"),
    )
    return per_doc.orderBy(F.col("bm25").desc(), F.col(id_col)).limit(k)


def naive_bayes_lang_confusion(
    df: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
    eval_permille: int = 300,
    round_to: int = 6,
) -> DataFrame:
    """Multinomial Naive Bayes language classifier, trained and evaluated
    inside one lazy plan: seeded-hash split, token-count fit with Laplace
    smoothing, log-likelihood scoring of the held-out docs, and the
    confusion matrix (true_label, pred_label, n) as output — the
    fasttext-shaped lang-id baseline with zero Python in the loop.

    Scale shape: fit = one grouped count over (label, token) plus a
    per-label total (map-side partials); scoring joins the test tokens
    against the broadcastable (token, label, logp) table and folds with
    one grouped sum. Argmax runs on scores ROUNDED to ``round_to`` so
    cross-engine float-sum noise (1e-12) cannot flip near-ties — ties
    break to the smaller label."""
    from urban_traffic_data_lake_project_spark.functions import stable_hash64

    toks = (
        df.where(F.trim(F.col(text_col)) != "")
        .select(
            F.col(id_col),
            F.col(label_col).alias("__true"),
            F.explode(
                F.filter(
                    F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                    lambda x: x != "",
                )
            ).alias("__tok"),
        )
        .withColumn(
            "__split",
            F.when(
                stable_hash64(F.col(id_col).cast("string"), salt="nb|") % 1000
                < eval_permille,
                F.lit("test"),
            ).otherwise(F.lit("train")),
        )
    )
    train = toks.where(F.col("__split") == "train")
    test = toks.where(F.col("__split") == "test")

    counts = train.groupBy("__true", "__tok").agg(F.count(F.lit(1)).alias("__c"))
    totals = train.groupBy("__true").agg(F.count(F.lit(1)).alias("__n"))
    vocab = train.agg(F.countDistinct("__tok").alias("__v"))
    # per-label token log-probs and the per-label unseen default
    logp = (
        counts.join(totals, "__true")
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col("__true").alias("__lbl"),
            "__tok",
            F.log((F.col("__c") + 1.0) / (F.col("__n") + F.col("__v"))).alias("__lp"),
        )
    )
    defaults = totals.crossJoin(F.broadcast(vocab)).select(
        F.col("__true").alias("__lbl"),
        F.log(1.0 / (F.col("__n") + F.col("__v"))).alias("__dlp"),
    )
    # document priors from train doc counts per label
    train_docs = train.select(id_col, "__true").distinct()
    priors_n = train_docs.groupBy("__true").agg(F.count(F.lit(1)).alias("__d"))
    priors = priors_n.crossJoin(
        F.broadcast(priors_n.agg(F.sum("__d").alias("__dt")))
    ).select(
        F.col("__true").alias("__lbl"),
        F.log(F.col("__d") / F.col("__dt")).alias("__prior"),
    )

    labels = totals.select(F.col("__true").alias("__lbl"))
    scored = (
        test.crossJoin(F.broadcast(labels))
        .join(F.broadcast(logp), ["__lbl", "__tok"], "left")
        .join(F.broadcast(defaults), "__lbl")
        .groupBy(id_col, "__true", "__lbl")
        .agg(F.sum(F.coalesce("__lp", "__dlp")).alias("__s"))
        .join(F.broadcast(priors), "__lbl")
        .select(
            id_col,
            "__true",
            "__lbl",
            F.round(F.col("__s") + F.col("__prior"), round_to).alias("__score"),
        )
    )
    # argmax with ties to the smaller label: min over (-score, label)
    pred = scored.groupBy(id_col, "__true").agg(
        F.min(
            F.struct((-F.col("__score")).alias("ns"), F.col("__lbl").alias("lbl"))
        ).alias("__best")
    )
    return (
        pred.select(
            F.col("__true").alias("true_label"),
            F.col("__best.lbl").alias("pred_label"),
        )
        .groupBy("true_label", "pred_label")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def bpe_apply_merges(
    words: DataFrame, merges: list, sym_col: str = "sym"
) -> DataFrame:
    """Apply an ORDERED trained merge list to pipe-wrapped symbol strings
    — the shared kernel of tokenizer inference. Sequential left-to-right
    non-overlapping replace per merge, exactly the operation training
    performed, so an in-vocabulary word reproduces its trained symbol
    string bit-for-bit and an unseen word tokenizes the way a shipped
    tokenizer would.

    Two paths, equivalence property-tested: <= 64 merges run as a pure
    Catalyst ``replace`` chain (localCheckpoint every
    ``_BPE_CHECKPOINT_EVERY`` keeps plan depth bounded — the bpe_train
    lesson); larger merge lists (realistic 4k-32k vocab) run as ONE
    Arrow stage with the merge list riding the task closure — per
    distinct word, not per corpus row, so the inference cost is
    vocabulary-sized at any corpus scale."""
    reps = [(f"|{pa}||{pb}|", f"|{pa}{pb}|") for pa, pb, *_ in merges]
    if len(reps) <= 64:
        cur = words
        for i, (t, r) in enumerate(reps):
            cur = cur.withColumn(sym_col, F.replace(F.col(sym_col), F.lit(t), F.lit(r)))
            if (i + 1) % _BPE_CHECKPOINT_EVERY == 0:
                cur = cur.localCheckpoint(eager=True)
        return cur

    schema = words.schema

    def apply(batches):
        for pdf in batches:
            if len(pdf):
                def run(s: str) -> str:
                    for t, r in reps:
                        s = s.replace(t, r)
                    return s

                pdf = pdf.assign(**{sym_col: pdf[sym_col].map(run)})
            yield pdf

    return words.mapInPandas(apply, schema)


def bpe_encode_with_oov(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list,
    train_vocab: DataFrame | None = None,
) -> DataFrame:
    """Tokenizer INFERENCE over a corpus that may contain words never
    seen at training: every distinct word is char-split and run through
    the ordered merge list (``bpe_apply_merges``), so out-of-vocabulary
    words tokenize into learned subword units instead of silently
    counting zero tokens (what ``bpe_encode``'s vocab join does to
    them). Returns (id, n_words, n_tokens, n_oov_words, token_fp);
    ``n_oov_words`` counts words absent from ``train_vocab`` (0
    everywhere when no vocab is given).

    Scale shape: one distinct-word aggregation (vocabulary-sized), the
    merge application on that table only, then the same broadcast
    word->tokens join + order-free fingerprint as ``bpe_encode``."""
    w = F.filter(F.split(normalize_text(F.col(text_col)), " "), lambda x: x != "")
    distinct_words = (
        df.select(F.explode(w).alias("word")).distinct()
        .withColumn("sym", F.regexp_replace(F.col("word"), "(.)", "|$1|"))
    )
    applied = bpe_apply_merges(distinct_words, merges)
    syms = _bpe_symbols("sym")
    wordtok = applied.select(
        "word",
        F.array_join(syms, " ").alias("__toks"),
        F.size(syms).alias("__n_sub"),
    )
    if train_vocab is not None:
        known = train_vocab.select("word", F.lit(True).alias("__known"))
        wordtok = wordtok.join(F.broadcast(known), "word", "left").withColumn(
            "__oov", F.coalesce(~F.col("__known"), F.lit(True))
        ).drop("__known")
    else:
        wordtok = wordtok.withColumn("__oov", F.lit(False))
    doc_words = df.select(
        F.col(id_col),
        F.posexplode(w).alias("__pos", "word"),
    )
    per_doc = (
        doc_words.join(F.broadcast(wordtok), "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("__n_sub").alias("n_tokens"),
            F.sum(F.col("__oov").cast("bigint")).alias("n_oov_words"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("__pos", "__toks"))),
                        lambda s: s["__toks"],
                    ),
                    " ",
                )
            ).alias("token_fp"),
        )
    )
    zero = F.lit(0).cast("bigint")
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_words", zero).alias("n_words"),
            F.coalesce(F.col("n_tokens").cast("bigint"), zero).alias("n_tokens"),
            F.coalesce(F.col("n_oov_words").cast("bigint"), zero).alias("n_oov_words"),
            F.coalesce("token_fp", F.md5(F.lit(""))).alias("token_fp"),
        )
    )
