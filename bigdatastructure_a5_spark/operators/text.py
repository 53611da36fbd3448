"""Text analysis for training-data pipelines: language ID, quality scoring,
tokenization statistics, rolling-hash fingerprints.

Extension scope (BASELINE.json).  Everything is built-in expressions
(higher-order functions over token arrays) — the whole module runs inside
whole-stage codegen, no Python per row, so at 100 TB these are scan-speed
annotators of the kind used to filter pretraining corpora (cf. Gopher/
FineWeb-style quality heuristics).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from bigdatastructure_a5_spark.functions.hashing import tokens

#: Small public stopword/marker lexicons; membership *ratios* over these are
#: the classic cheap language-ID signal (a word-level analogue of the n-gram
#: profile method of Cavnar & Trenkle 1994).
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "that", "it", "for"),
    "es": ("el", "la", "los", "las", "de", "que", "y", "en", "un", "una"),
    "de": ("der", "die", "das", "und", "nicht", "ein", "eine", "zu", "ist", "mit"),
    "fr": ("le", "la", "les", "des", "et", "que", "une", "dans", "est", "pour"),
}

#: "BPE-ish" pretokenizer: word pieces OR single non-space punctuation —
#: the usual pre-tokenization split before byte-pair merging.
BPE_TOKEN_REGEX = r"\w+|[^\w\s]"


def _marker_count(toks: Column, lang: str) -> Column:
    """How many tokens are markers of ``lang`` (membership in a literal set
    — compiled to a codegen'd IN list).  NULL text yields a NULL token
    array; coalesce the count to 0 so score columns stay integer-typed
    facts (and match the oracle's COALESCE'd counts) instead of
    propagating NULL through every downstream sum/argmax."""
    markers = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.coalesce(
        F.size(F.filter(toks, lambda t: F.array_contains(markers, t))),
        F.lit(0),
    )


def lang_scores(text_col: Column | str) -> dict[str, Column]:
    toks = tokens(text_col)
    return {lang: _marker_count(toks, lang) for lang in STOPWORDS}


def _check_clash(df, out_cols: list[str], staging: str) -> None:
    """Reject inputs already carrying this adder's output/staging columns —
    silently duplicating ``sc_en`` (AMBIGUOUS_REFERENCE downstream) or
    clobbering a user's staging-named column is worse than a construction-
    time ValueError (same guard as similarity.with_lsh_buckets)."""
    clash = [c for c in df.columns if c in out_cols or c == staging]
    if clash:
        raise ValueError(
            f"input already has columns {clash}; drop or rename them (or "
            "use a different prefix)"
        )


def with_lang_scores(
    df,
    text_col: str = "text",
    prefix: str = "sc_",
    toks_col: str | None = None,
):
    """Append one ``{prefix}{lang}`` marker-count column per language.

    Two projections on purpose: the token array is materialized first, and
    because ``split()`` is not a cheap expression referenced once,
    CollapseProject leaves it materialized — each score column then scans
    the SAME array.  Composing ``lang_scores`` expressions inline instead
    re-tokenizes once per language (and once per duplicated branch of any
    downstream when-chain).

    Pass ``toks_col`` naming an ALREADY-materialized token-array column to
    score from it directly (no internal tokenize, the column is left in
    place) — the fusion hook for pipelines that tokenize once and feed
    scoring, stats and shingling from the same array."""
    # the __toks staging name only matters on the internal-tokenize path;
    # a caller-supplied toks_col may legitimately BE named __toks
    _check_clash(
        df,
        [f"{prefix}{lang}" for lang in STOPWORDS],
        "__toks" if toks_col is None else "",
    )
    if toks_col is not None:
        return df.select(
            "*",
            *[
                _marker_count(F.col(toks_col), lang).alias(f"{prefix}{lang}")
                for lang in STOPWORDS
            ],
        )
    toks_c = F.col("__toks")
    return (
        df.withColumn("__toks", tokens(text_col))
        .select(
            "*",
            *[
                _marker_count(toks_c, lang).alias(f"{prefix}{lang}")
                for lang in STOPWORDS
            ],
        )
        .drop("__toks")
    )


def _argmax_lang(scores: dict[str, Column]) -> Column:
    """Shared argmax fold over per-language score columns: highest score
    wins, deterministic tie-break by dict insertion order (the lexicon /
    profile order), 'und' (undetermined) when nothing scores > 0.  One
    when-chain implementation for all three language-ID surfaces
    (lang_id, lang_id_from_scores, lang_id_ngram)."""
    best = None
    best_score = None
    for lang, s in scores.items():
        if best is None:
            best, best_score = F.lit(lang), s
        else:
            cond = s > best_score
            best = F.when(cond, F.lit(lang)).otherwise(best)
            best_score = F.when(cond, s).otherwise(best_score)
    return F.when(best_score > 0, best).otherwise(F.lit("und"))


def lang_id_from_scores(prefix: str = "sc_") -> Column:
    """Argmax language over materialized ``{prefix}{lang}`` columns (cheap
    column references, safe to duplicate through the when-chain);
    deterministic tie-break by lexicon order; 'und' when no marker hits."""
    return _argmax_lang({lang: F.col(f"{prefix}{lang}") for lang in STOPWORDS})


def lang_id(text_col: Column | str) -> Column:
    """Argmax language by marker count; deterministic tie-break by the fixed
    lexicon order (en, es, de, fr); 'und' (undetermined) when no marker hits.
    """
    return _argmax_lang(lang_scores(text_col))


#: Per-language character-trigram profiles (with word-boundary spaces) —
#: the top-of-profile slice of the classic Cavnar & Trenkle 1994 n-gram
#: method.  Hand-sized to the highest-frequency trigrams of each language's
#: function words; membership counts over these separate the four lexicons
#: the same way the marker sets do, but from CHARACTER evidence, so the
#: detector also fires on inflected/unseen word forms.
NGRAM_PROFILES: dict[str, tuple[str, ...]] = {
    "en": (" th", "the", "he ", "ing", "ng ", " an", "and", "nd ", " of",
           "of ", " to", "to ", "ion", " is", "is ", "ed ", " it", "it "),
    "es": (" de", "de ", " la", "la ", " el", "el ", " qu", "que", "ue ",
           " en", "en ", "os ", "as ", "ión", "ció", " un", "una", "ar "),
    "de": (" de", "der", "die", "das", "er ", "ie ", " un", "und", "nd ",
           "ich", "ch ", "sch", "ein", " ei", "ung", "en ", "cht", " zu"),
    "fr": (" le", "le ", "les", "es ", " de", "des", " et", "et ", "ent",
           "nt ", " qu", "que", "ue ", "ait", " es", "est", "our", " po"),
}


def char_ngrams(text_col: Column | str, n: int = 3) -> Column:
    """All overlapping character n-grams of the normalized text, padded
    with one leading/trailing space so word-boundary grams (' th', 'nd ')
    exist — pure Catalyst: one sequence + per-position substr, scan-speed
    inside codegen."""
    from bigdatastructure_a5_spark.functions.hashing import normalized_text

    padded = F.concat(F.lit(" "), normalized_text(text_col), F.lit(" "))
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(padded) - (n - 1), F.lit(1))),
        lambda i: padded.substr(i, F.lit(n)),
    )


def _profile_count(grams: Column, profile) -> Column:
    """Occurrence count of one language profile's trigrams in a gram array
    — THE shared counting expression behind both the inline surface
    (ngram_lang_scores) and the materialized-column surface
    (with_ngram_scores), so the two can never drift.  COALESCE to 0 for
    NULL text (same contract as _marker_count): the scores are integer
    facts that downstream sums/argmax consume, and a NULL would otherwise
    propagate through any aggregate over them.  (The helper also scopes
    ``plit`` per call, avoiding the loop-capture pitfall the call sites
    previously each worked around.)"""
    plit = F.array(*[F.lit(g) for g in profile])
    return F.coalesce(
        F.size(F.filter(grams, lambda t: F.array_contains(plit, t))),
        F.lit(0),
    )


def ngram_lang_scores(text_col: Column | str) -> dict[str, Column]:
    """Occurrence count of each language's profile trigrams in the text
    (occurrence-weighted membership — a document repeating 'the' keeps
    voting 'en', matching the rank-profile intuition without a per-doc
    sort)."""
    grams = char_ngrams(text_col, 3)
    return {
        lang: _profile_count(grams, profile)
        for lang, profile in NGRAM_PROFILES.items()
    }


def with_ngram_scores(df, text_col: str = "text", prefix: str = "ng_"):
    """Append one ``{prefix}{lang}`` profile-trigram count per language,
    with the gram array materialized ONCE (same two-projection rationale
    as with_lang_scores: the transform is not a cheap expression, so
    CollapseProject leaves it shared instead of duplicating it into every
    language's count).  Downstream, ``lang_id_from_scores(prefix)`` gives
    the argmax over these columns — NGRAM_PROFILES and STOPWORDS share
    the same language keys and order."""
    _check_clash(df, [f"{prefix}{lang}" for lang in NGRAM_PROFILES], "__grams")
    g = F.col("__grams")
    cols = [
        _profile_count(g, profile).alias(f"{prefix}{lang}")
        for lang, profile in NGRAM_PROFILES.items()
    ]
    return (
        df.withColumn("__grams", char_ngrams(text_col))
        .select("*", *cols)
        .drop("__grams")
    )


def lang_id_ngram(text_col: Column | str) -> Column:
    """Character-n-gram language ID (Cavnar & Trenkle-style profiles):
    argmax of profile-trigram occurrence counts, deterministic tie-break
    by profile order, 'und' when nothing matches.

    Convenience inline form: composing the gram transform as a plain
    expression duplicates it into every language's count and again through
    the when-chain branches (the duplication with_lang_scores' docstring
    warns about).  Pipelines should use ``with_ngram_scores`` +
    ``lang_id_from_scores("ng_")`` — the gram array materialized once —
    which is the scan-speed path at scale."""
    return _argmax_lang(ngram_lang_scores(text_col))


def quality_score(
    text_col: Column | str,
    toks: Column | str | None = None,
    stop_hits: Column | None = None,
) -> Column:
    """Composite quality heuristic in [0, 1]:

    0.25 x length_ok   (120 <= chars <= 20000)
    0.25 x diversity   (distinct tokens / tokens)
    0.25 x word_shape  (mean token length in [3, 12])
    0.25 x stopwordy   (>= 2 stopword hits in any language)

    Ratios are exact-integer divisions and the weighted sum is a fixed-order
    IEEE expression, so the DuckDB oracle (same operation order) matches
    bit-for-bit.

    Pass ``toks`` (a MATERIALIZED token-array column) in hot paths: inline,
    the tokenization subtree appears ~7x in this expression and is
    re-evaluated each time (measured ~30% slower at sf0.1).  Pass
    ``stop_hits`` (the sum of already-computed ``with_lang_scores``
    marker-count columns) to skip re-filtering the token array four more
    times for the stopwordy term — the counts are the same values by
    construction.
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    if toks is None:
        toks = tokens(c)
    elif isinstance(toks, str):
        toks = F.col(toks)
    n_chars = F.length(c)
    n_toks = F.size(toks)
    distinct_ratio = F.size(F.array_distinct(toks)).cast("double") / n_toks.cast(
        "double"
    )
    mean_tok_len = (F.length(F.regexp_replace(c, r"\s+", ""))).cast(
        "double"
    ) / n_toks.cast("double")
    any_stop = stop_hits
    if any_stop is None:
        for lang in STOPWORDS:
            cnt = _marker_count(toks, lang)
            any_stop = cnt if any_stop is None else any_stop + cnt
    return (
        F.when((n_chars >= 120) & (n_chars <= 20000), 0.25).otherwise(0.0)
        + F.when(distinct_ratio >= 0.5, 0.25).otherwise(0.0)
        + F.when((mean_tok_len >= 3.0) & (mean_tok_len <= 12.0), 0.25).otherwise(0.0)
        + F.when(any_stop >= 2, 0.25).otherwise(0.0)
    )


def _nonempty_lines(text_col: Column | str, sep: str) -> Column:
    """Trimmed, non-empty segments of the text split on ``sep``."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.filter(
        F.transform(F.split(c, sep), F.trim), lambda s: s != ""
    )


def duplicate_line_fraction(
    text_col: Column | str, paragraph: bool = False
) -> Column:
    """Fraction of lines (or paragraphs) that repeat an earlier one —
    the Gopher repetition filter family (Rae et al. 2021 discard
    documents with high duplicate-line/paragraph fractions: boilerplate,
    scraped navigation, generated spam).  ``1 - distinct/total`` over
    trimmed non-empty lines; 0.0 for documents with no lines (nothing
    repeats), NULL text stays NULL.

    Pure built-in expressions (split/filter/array_distinct) — a map-side
    column at any corpus size, same cost shape as quality_score; exact
    integer-ratio arithmetic, so a DuckDB twin (LIST_DISTINCT/LEN over
    STRING_SPLIT) matches bit-for-bit."""
    lines = _nonempty_lines(text_col, r"\n\n+" if paragraph else r"\n")
    n = F.size(lines)
    return F.when(
        n > 0,
        F.lit(1.0)
        - F.size(F.array_distinct(lines)).cast("double") / n.cast("double"),
    ).otherwise(
        F.when(n == 0, F.lit(0.0))
    )


def top_ngram_token_share(
    text_col: Column | str, n: int = 2, toks: Column | str | None = None
) -> Column:
    """Token share of the most frequent word n-gram: ``max_count * n /
    n_tokens`` — the Gopher top-n-gram filter (a document whose top
    2-gram covers a large token share is loops/boilerplate).  Counts
    overlapping occurrences, so the share can exceed 1 on degenerate
    repetition ("a a a a" at n=2) — callers threshold, they don't sum.

    Zero Python and zero explode: the max frequency folds over the
    SORTED shingle array with a run-length ``aggregate`` (struct
    accumulator: previous value, current run, best run) — stays inside
    whole-stage codegen, O(tokens log tokens) per row for the sort.
    Documents shorter than n words score 0.0; NULL stays NULL.  Pass a
    materialized ``toks`` column in hot paths (same reason as
    quality_score)."""
    from bigdatastructure_a5_spark.functions.hashing import (
        word_shingles_from_tokens,
    )

    c = F.col(text_col) if isinstance(text_col, str) else text_col
    if toks is None:
        toks = tokens(c)
    elif isinstance(toks, str):
        toks = F.col(toks)
    grams = F.array_sort(word_shingles_from_tokens(toks, n))
    best = F.aggregate(
        grams,
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).cast("bigint").alias("run"),
            F.lit(0).cast("bigint").alias("best"),
        ),
        lambda acc, g: F.struct(
            g.alias("prev"),
            F.when(g == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1).cast("bigint"))
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(g == acc["prev"], acc["run"] + 1).otherwise(
                    F.lit(1).cast("bigint")
                ),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    n_toks = F.size(toks)
    return F.when(
        n_toks >= n,
        best.cast("double") * n / n_toks.cast("double"),
    ).otherwise(F.when(n_toks >= 0, F.lit(0.0)))


def document_report(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Every per-document text signal in ONE pass: token/char counts,
    quality score, language id, repetition fractions, top-2-gram share,
    PII counts, content fingerprint.  At 100 TB the corpus scan IS the
    budget — a pipeline that computes quality in one job and language in
    another pays the scan twice; this report materializes the token
    array once and fans every signal out of it as sibling expressions in
    a single projection (zero exchanges, zero Python, one scan —
    plan-pinned).

    Each signal is individually verified elsewhere (driver oracles or
    DuckDB-parity pytests); the report pins that the FUSED forms equal
    the standalone ones (tests), so fusion is a pure cost optimization,
    never a semantics fork.
    """
    from bigdatastructure_a5_spark.functions.hashing import normalized_text

    # materialize the normalization ONCE, then the token split ONCE, and
    # derive every downstream signal from the materialized columns — a
    # naive token_count(text)/md5_fingerprint(text) here would re-run
    # the normalization regex several more times per row, the exact
    # expression-duplication cost quality_score's docstring measures
    with_scores = with_lang_scores(
        df.select(
            F.col(id_col),
            F.col(text_col),
            normalized_text(text_col).alias("__norm"),
        ).select(
            F.col(id_col),
            F.col(text_col),
            "__norm",
            F.split(F.col("__norm"), " ").alias("__toks"),
        ),
        text_col,
        toks_col="__toks",
    )
    stop_hits = None
    for lang in STOPWORDS:
        c = F.col(f"sc_{lang}")
        stop_hits = c if stop_hits is None else stop_hits + c
    n_tokens = (
        F.when(F.col("__norm") == "", F.lit(0))
        .otherwise(F.size("__toks"))
        .cast("bigint")
    )
    return with_scores.select(
        id_col,
        n_tokens.alias("n_tokens"),
        F.length(text_col).cast("bigint").alias("n_chars"),
        quality_score(
            text_col, toks="__toks", stop_hits=stop_hits
        ).alias("quality"),
        lang_id_from_scores().alias("lang_id"),
        duplicate_line_fraction(text_col).alias("dup_line_frac"),
        duplicate_line_fraction(text_col, paragraph=True).alias(
            "dup_para_frac"
        ),
        top_ngram_token_share(text_col, 2, toks="__toks").alias(
            "top_2gram_share"
        ),
        pii_counts(text_col, "email").alias("n_email"),
        pii_counts(text_col, "ipv4").alias("n_ipv4"),
        pii_counts(text_col, "phone").alias("n_phone"),
        # md5_fingerprint(text) == md5 of the NORMALIZED text — reuse
        # the materialized column instead of re-normalizing
        F.md5(F.col("__norm")).alias("fingerprint"),
    )


#: PII patterns, written in the COMMON dialect of Java regex (Spark) and
#: RE2 (DuckDB): no lookaround, no backreferences — both engines support
#: (?i), (?:...), {m,n}, \d, \b.  Email before phone in the redaction
#: order: an email's digit runs must not be half-eaten by the phone
#: pattern first.  These are scrubbing heuristics (recall-leaning, like
#: every production PII scrubber), not validators — a malformed IP like
#: 999.999.999.999 redacts too, which is the right failure direction.
PII_PATTERNS: dict[str, str] = {
    "email": r"(?i)\b[a-z0-9][a-z0-9._%+-]*@[a-z0-9][a-z0-9.-]*\.[a-z]{2,}\b",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    # shaped groups (cc? NXX NXX XX-XXXXXX), not "digits and separators":
    # a free [\d\s.-]+ class redacts year lists and numeric table columns
    # wholesale ('2020 2021 2022 2023' -> one <PHONE>); the grouped form
    # keeps those while matching +1 (555) 123-4567 / 555-123-4567 /
    # 1234567890.  Known miss: 2-4-4 groupings (+44 20 7946 0958) — the
    # precision/recall trade is documented, extend the alternation per
    # deployment locale.
    "phone": r"\+?\d{0,3}[\s.-]?\(?\d{3}\)?[\s.-]?\d{3}[\s.-]?\d{2,6}",
}


def redact_pii(text_col: Column | str, kinds: list[str] | None = None) -> Column:
    """Replace PII spans with ``<EMAIL>`` / ``<IPV4>`` / ``<PHONE>``
    placeholder tokens — the standard scrub a training corpus gets
    before packing.  Pure chained ``regexp_replace`` (zero Python,
    map-side at any corpus size); redaction order is the PII_PATTERNS
    insertion order (emails first, so phone digits inside addresses are
    already gone)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    kinds = list(PII_PATTERNS) if kinds is None else kinds
    for kind in kinds:
        c = F.regexp_replace(c, PII_PATTERNS[kind], f"<{kind.upper()}>")
    return c


def pii_counts(text_col: Column | str, kind: str) -> Column:
    """Match count for one PII kind — the audit column next to the
    redaction (how much PII a source carries is itself a curation
    signal).

    Counted on the text with every EARLIER kind (PII_PATTERNS order)
    already redacted, so the counts agree with what ``redact_pii``
    actually replaces: on raw text the phone pattern also matches the
    digit runs inside emails and IPv4s, and the audit would overstate
    phone PII on exactly the documents the redaction order protects.
    ``size(regexp_extract_all(...))`` in Spark ==
    ``LEN(REGEXP_EXTRACT_ALL(...))`` in DuckDB for every pattern in the
    common dialect; bigint for the schema gate."""
    kinds = list(PII_PATTERNS)
    prior = kinds[: kinds.index(kind)]
    c = redact_pii(text_col, kinds=prior) if prior else (
        F.col(text_col) if isinstance(text_col, str) else text_col
    )
    return F.size(F.regexp_extract_all(c, F.lit(PII_PATTERNS[kind]), 0)).cast(
        "bigint"
    )


def curriculum_bins(
    df,
    n_bins: int = 10,
    score_col: str = "quality",
    group_col: str | None = "lang",
    id_col: str = "doc_id",
):
    """Add a ``bin`` column (1 = lowest score decile .. n_bins = highest)
    of equal-count quantile bins per group — curriculum ordering for a
    training pipeline (feed high-quality bins first, or weight bins into
    operators/mixture.py's spec as domains).

    ``ntile`` over (score, id) — the id tiebreak makes the total order,
    and therefore every bin label, DETERMINISTIC and cross-engine
    reproducible (DuckDB's NTILE on the same order agrees exactly;
    pinned in tests/test_text_multimodal.py).  One window per group: groups
    partition the corpus, so the shuffle is one hash exchange and each
    group's ntile runs independently — the same parallel-by-key shape as
    packing's shard window.  With ``group_col=None`` the frame is one
    group (single-partition window — fixture-only, like the packer's
    single-shard mode)."""
    from pyspark.sql import Window

    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    part = [group_col] if group_col else []
    w = Window.partitionBy(*part).orderBy(score_col, id_col)
    return df.withColumn("bin", F.ntile(n_bins).over(w))


def bpe_token_count(text_col: Column | str) -> Column:
    """Token count under the BPE-ish pretokenizer regex (words + punctuation
    marks), the standard proxy for LLM token budgets."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_TOKEN_REGEX), 0))


def rolling_fingerprint(text_col: Column | str, base: int = 131, mod: int = (1 << 31) - 1) -> Column:
    """Order-sensitive polynomial rolling hash over the characters of the
    normalized text: ``h = (h*base + ascii(c)) mod (2^31-1)`` — unlike the
    md5 fingerprint this is incremental (streaming/rolling-window friendly)
    and content-order sensitive.  The accumulator stays below ``mod`` so the
    fold never overflows a 64-bit long (acc*131 + 127 < 2^38), and the char
    basis makes it expressible in plain SQL (cross-engine oracle-checkable:
    DuckDB's ``list_reduce`` with a prepended 0 seed folds identically).
    """
    from bigdatastructure_a5_spark.functions.hashing import normalized_text

    chars = F.split(normalized_text(text_col), "")
    return F.aggregate(
        chars,
        F.lit(0).cast("bigint"),
        lambda acc, c: (acc * base + F.ascii(c)) % F.lit(mod),
    )
