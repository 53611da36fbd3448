"""Text-analysis and multimodal-plumbing tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatastructure_a5_spark.catalog import load_table
from bigdatastructure_a5_spark.operators.multimodal import (
    decode_media,
    fake_decode,
    frame_sample,
    media_from_documents,
    real_decode,
)
from bigdatastructure_a5_spark.operators.text import (
    bpe_token_count,
    lang_id,
    quality_score,
    rolling_fingerprint,
)


def test_lang_id_on_real_phrases(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and it was happy"),
            (2, "el perro corre en la casa y come un hueso"),
            (3, "der Hund und die Katze sind nicht zu Hause"),
            (4, "le chat est dans les jardins et il dort pour une heure"),
            (5, "zzz qqq xxx"),  # no markers anywhere
        ],
        ["id", "text"],
    )
    out = {r.id: r.lang for r in df.select("id", lang_id("text").alias("lang")).collect()}
    assert out == {1: "en", 2: "es", 3: "de", 4: "fr", 5: "und"}


def test_quality_score_range_and_sensitivity(spark):
    good = (
        "the quick brown fox jumps over the lazy dog and runs through the "
        "forest to find some food for its hungry family members today"
    )
    df = spark.createDataFrame(
        [(1, good), (2, "a a a a a a a a"), (3, "x")], ["id", "text"]
    )
    scores = {
        r.id: r.q for r in df.select("id", quality_score("text").alias("q")).collect()
    }
    assert scores[1] == 1.0  # long, diverse, normal word shape, stopwordy
    assert scores[2] < scores[1]  # repetitive, short
    assert 0.0 <= scores[3] <= 0.5


def test_bpe_token_count(spark):
    df = spark.createDataFrame([(1, "hello, world! it's fine")], ["id", "text"])
    n = df.select(bpe_token_count("text").alias("n")).first().n
    # hello , world ! it ' s fine
    assert n == 8


def test_rolling_fingerprint_is_order_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "c b a")], ["id", "text"]
    )
    fp = {
        r.id: r.f
        for r in df.select("id", rolling_fingerprint("text").alias("f")).collect()
    }
    assert fp[1] == fp[2]
    assert fp[1] != fp[3]  # md5-of-normalized would also differ, but this one
    # distinguishes order even for equal token MULTISETS
    assert all(0 <= v < (1 << 31) - 1 for v in fp.values())


def test_decode_media_batches_and_features(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    media = media_from_documents(docs)
    assert dict(media.dtypes)["payload"] == "binary"
    decoded = decode_media(media)
    rows = decoded.collect()
    assert len(rows) == 50
    by_id = {r.media_id: r for r in rows}
    sample = docs.select("doc_id", "text").first()
    expected = fake_decode(sample.text.encode(), "image")
    got = by_id[sample.doc_id]
    assert got.n_bytes == expected["n_bytes"]
    assert got.sha1_prefix == expected["sha1_prefix"]
    assert got.byte_entropy_q == expected["byte_entropy_q"]


def test_real_decode_boundary_fails_loudly_without_codecs():
    """real_decode must not silently fall back: images need Pillow
    (ImportError where absent), audio/video codecs are stubbed everywhere
    in this container (NotImplementedError)."""
    try:
        import PIL  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False
    if not has_pil:
        try:
            real_decode(b"\xff\xd8", "image")
            raise AssertionError("expected ImportError without Pillow")
        except ImportError:
            pass
    try:
        real_decode(b"\x00", "video")
        raise AssertionError("expected NotImplementedError")
    except NotImplementedError as e:
        assert "codec" in str(e)


def test_frame_sample_offsets(spark):
    df = spark.createDataFrame(
        [(1, "image", bytes(range(200)))], ["media_id", "kind", "payload"]
    )
    rows = frame_sample(df, every_n_bytes=64).collect()
    assert [r.byte_offset for r in rows] == [0, 64, 128, 192]
    assert [r.frame_no for r in rows] == [0, 1, 2, 3]


def test_frame_sample_counts_bytes_not_chars(spark):
    """Offsets must come from the payload's BYTE length: 65 two-byte UTF-8
    sequences are 130 bytes (offsets 0/64/128), where a cast-to-string
    character count would see 65 'chars' and silently never sample the
    tail.  Empty and NULL payloads sample zero frames — no phantom
    offset-0 row."""
    two_byte = ("é" * 65).encode()  # 130 bytes, 65 characters
    assert len(two_byte) == 130
    df = spark.createDataFrame(
        [(1, "image", two_byte), (2, "image", b""), (3, "image", None)],
        ["media_id", "kind", "payload"],
    )
    rows = frame_sample(df, every_n_bytes=64).collect()
    by_id: dict = {}
    for r in rows:
        by_id.setdefault(r.media_id, []).append(r.byte_offset)
    assert by_id.get(1) == [0, 64, 128]
    assert 2 not in by_id and 3 not in by_id


def test_resize_media_contract(spark):
    """Bytes-in/bytes-out mapInPandas: exact target payload size, metadata
    rewritten, schema preserved, deterministic tiling."""
    from bigdatastructure_a5_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        media_from_documents,
        resize_media,
    )

    docs = spark.createDataFrame(
        [(1, "abc"), (2, ""), (3, "a longer payload than the target size")],
        ["doc_id", "text"],
    )
    media = media_from_documents(docs)
    out = resize_media(media, target_width=8, target_height=2)
    assert out.schema == MEDIA_SCHEMA
    rows = {r.media_id: r for r in out.collect()}
    assert all(len(r.payload) == 16 for r in rows.values())
    assert rows[1].payload == (b"abc" * 6)[:16]  # deterministic tiling
    assert rows[2].payload == b"\x00" * 16       # empty payload -> zero fill
    assert rows[3].width == 8 and rows[3].height == 2


def test_best_decoder_selects_by_environment():
    """The codec boundary is runtime-selected: Pillow-backed real_decode
    when the library imports, the deterministic byte-feature fallback
    otherwise.  Both sides of the branch share the feature contract."""
    from bigdatastructure_a5_spark.operators.multimodal import (
        best_decoder,
        fake_decode,
        real_decode,
    )

    try:
        import PIL  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False

    dec = best_decoder("image")
    if has_pil:
        from bigdatastructure_a5_spark.operators.multimodal import (
            dispatch_decode,
        )

        assert dec is dispatch_decode
        # 1x1 grayscale PNG, decoded features over pixels
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.new("L", (2, 2), color=7).save(buf, format="PNG")
        out = dec(buf.getvalue(), "image")
        assert out["n_bytes"] == len(buf.getvalue())
        assert out["byte_entropy_q"] == 1000  # 4 identical pixels
        # mixed-kind safety: a video row in the same batch falls back to
        # byte features instead of raising (real_decode stays the loud
        # variant — see test_real_decode_boundary_fails_loudly)
        assert dec(b"abc", "video") == fake_decode(b"abc", "video")
    else:
        assert dec is fake_decode
    # audio/video stay stubbed in every environment without codecs
    assert best_decoder("video") is fake_decode
    payload = b"abcabc"
    assert fake_decode(payload, "image")["n_bytes"] == 6


def test_best_resizer_bytes_to_bytes_contract(spark):
    """The resize codec boundary mirrors the decode one: Pillow-backed
    decode-resize-encode where the library imports (output decodes back to
    the target dimensions), deterministic tiling fallback otherwise."""
    from bigdatastructure_a5_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        best_resizer,
        fake_resize,
        pillow_resize,
        resize_media,
    )

    try:
        import PIL  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False

    rz = best_resizer("image")
    assert best_resizer("video") is fake_resize
    if not has_pil:
        assert rz is fake_resize
        return

    from bigdatastructure_a5_spark.operators.multimodal import dispatch_resize

    assert rz is dispatch_resize
    # mixed-kind safety: non-image rows take the deterministic fallback
    assert rz(b"abc", "video", 2, 2) == fake_resize(b"abc", "video", 2, 2)
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("L", (16, 16), color=7).save(buf, format="PNG")
    df = spark.createDataFrame(
        [(1, "image", buf.getvalue(), 16, 16, None, None)], MEDIA_SCHEMA
    )
    out = resize_media(df, target_width=4, target_height=3, resizer=rz)
    assert out.schema == MEDIA_SCHEMA
    row = out.collect()[0]
    resized = Image.open(io.BytesIO(bytes(row.payload)))
    assert resized.size == (4, 3)
    assert (row.width, row.height) == (4, 3)


def test_lang_id_ngram_on_real_phrases(spark):
    """The character-n-gram detector (Cavnar & Trenkle-style profiles)
    classifies the same real phrases as the word-marker detector, plus a
    form the marker lexicon CANNOT catch: inflected/unseen words whose
    character patterns are still unmistakably of the language."""
    from bigdatastructure_a5_spark.operators.text import (
        lang_id_from_scores,
        lang_id_ngram,
        with_ngram_scores,
    )

    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and it was happy"),
            (2, "el perro corre en la casa y come un hueso"),
            (3, "der Hund und die Katze sind nicht zu Hause"),
            (4, "le chat est dans les jardins et il dort pour une heure"),
            (5, "zzz qqq xxx"),
            # no lexicon markers at all — character evidence only:
            (6, "thinking things throughout another thing"),   # en-ish grams
            (7, "Erziehung Forschung Entscheidung Verantwortung"),  # de -ung
            (8, None),  # NULL text: counts must coalesce to 0, lang 'und'
        ],
        ["id", "text"],
    )
    out = {
        r.id: r.lang
        for r in df.select("id", lang_id_ngram("text").alias("lang")).collect()
    }
    assert out[1] == "en" and out[2] == "es" and out[3] == "de"
    assert out[4] == "fr" and out[5] == "und"
    assert out[6] == "en" and out[7] == "de"
    assert out[8] == "und"

    # the materialized-scores path agrees with the inline expression, and
    # NULL text yields INTEGER zero scores (not NULLs that would poison
    # any downstream sum over the ng_ columns)
    scored = (
        with_ngram_scores(df)
        .select("id", "ng_en", lang_id_from_scores("ng_").alias("lang"))
        .collect()
    )
    out2 = {r.id: r.lang for r in scored}
    assert out2 == out
    assert {r.ng_en for r in scored if r.id == 8} == {0}


def test_dispatch_decode_survives_corrupt_image_payload():
    """The per-row dispatchers' contract: a corrupt image payload degrades
    to deterministic byte features instead of killing the task, while a
    MISSING codec library still raises loudly (ImportError is re-raised,
    not swallowed)."""
    import pytest

    from bigdatastructure_a5_spark.operators.multimodal import (
        dispatch_decode,
        dispatch_resize,
        fake_decode,
        fake_resize,
    )

    try:
        import PIL  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False

    junk = b"definitely not an image"
    if has_pil:
        # corrupt payload -> deterministic byte-feature fallback
        assert dispatch_decode(junk, "image") == fake_decode(junk, "image")
        assert dispatch_resize(junk, "image", 4, 2) == fake_resize(
            junk, "image", 4, 2
        )
    else:
        # missing codec library stays LOUD (not silently degraded)
        with pytest.raises(ImportError):
            dispatch_decode(junk, "image")
        with pytest.raises(ImportError):
            dispatch_resize(junk, "image", 4, 2)
    # non-image kinds always use the deterministic fallback
    assert dispatch_decode(junk, "video") == fake_decode(junk, "video")


def test_lang_score_adders_reject_clashing_columns(spark):
    """with_lang_scores / with_ngram_scores raise at construction when the
    input already carries their output columns — a silent duplicate sc_en
    would fail much later as AMBIGUOUS_REFERENCE."""
    import pytest

    from bigdatastructure_a5_spark.operators.text import (
        with_lang_scores,
        with_ngram_scores,
    )

    df = spark.createDataFrame([(1, "hello", 3)], ["id", "text", "sc_en"])
    with pytest.raises(ValueError, match="sc_en"):
        with_lang_scores(df)
    df2 = spark.createDataFrame([(1, "hello", 3)], ["id", "text", "ng_de"])
    with pytest.raises(ValueError, match="ng_de"):
        with_ngram_scores(df2)


def test_text_operators_are_null_safe(spark):
    """NULL text must produce integer-zero marker counts, 'und' language,
    and quality 0.0 — matching the oracles' COALESCE'd counts (a NULL
    count previously fell through DuckDB's CASE to 'fr' while Spark said
    'und': a latent hash mismatch)."""
    from bigdatastructure_a5_spark.operators.text import (
        lang_id,
        quality_score,
        with_lang_scores,
    )

    df = spark.createDataFrame([(1, None), (2, "the cat and the hat")],
                               "doc_id bigint, text string")
    rows = {r.doc_id: r for r in with_lang_scores(df).select(
        "doc_id", "sc_en", lang_id("text").alias("lang"),
        quality_score("text").alias("q")).collect()}
    assert rows[1].sc_en == 0 and rows[1].lang == "und" and rows[1].q == 0.0
    assert rows[2].sc_en > 0 and rows[2].lang == "en"


def test_curriculum_bins_equal_count_and_monotone(spark):
    """Quantile bins per group: equal counts (±1 per NTILE semantics),
    and a higher score never lands in a lower bin within its group."""
    from bigdatastructure_a5_spark.operators.text import curriculum_bins

    df = spark.createDataFrame(
        [(i, "g%d" % (i % 2), float((i * 37) % 100)) for i in range(200)],
        "doc_id bigint, lang string, quality double",
    )
    rows = curriculum_bins(df, n_bins=5).collect()
    per = {}
    for r in rows:
        per.setdefault(r.lang, []).append((r.quality, r.doc_id, r.bin))
    for lang, xs in per.items():
        sizes = {}
        for _, _, b in xs:
            sizes[b] = sizes.get(b, 0) + 1
        assert sorted(sizes) == [1, 2, 3, 4, 5]
        assert max(sizes.values()) - min(sizes.values()) <= 1
        xs.sort()
        bins = [b for _, _, b in xs]
        assert bins == sorted(bins)  # monotone in (score, id) order


def test_curriculum_bins_deterministic_under_ties(spark):
    """All-equal scores: the id tiebreak fixes every label — two runs
    agree exactly (no nondeterministic window order)."""
    from bigdatastructure_a5_spark.operators.text import curriculum_bins

    df = spark.createDataFrame(
        [(i, "g", 1.0) for i in range(30)],
        "doc_id bigint, lang string, quality double",
    )
    a = sorted((r.doc_id, r.bin) for r in curriculum_bins(df, 3).collect())
    b = sorted((r.doc_id, r.bin) for r in curriculum_bins(df, 3).collect())
    assert a == b
    assert [x[1] for x in a] == [1] * 10 + [2] * 10 + [3] * 10


def test_curriculum_bins_match_duckdb_on_documents(spark, sf_dir):
    """Cross-engine: NTILE over the same deterministic total order
    (quality, doc_id) per language agrees bit-for-bit with DuckDB on the
    real documents table + the engine's own quality score."""
    import duckdb

    from bigdatastructure_a5_spark.operators.text import (
        curriculum_bins,
        quality_score,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", quality_score("text").alias("quality")
    )
    got = sorted(
        (r.doc_id, r.bin) for r in curriculum_bins(docs, n_bins=4).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    # materialize Spark's quality values (already oracle-checked by the
    # text_quality gate query) and rank them in DuckDB
    con.execute(
        "CREATE TABLE q (doc_id BIGINT, lang VARCHAR, quality DOUBLE)"
    )
    con.executemany(
        "INSERT INTO q VALUES (?, ?, ?)",
        [(r.doc_id, r.lang, r.quality) for r in docs.collect()],
    )
    want = sorted(
        (r[0], r[1])
        for r in con.sql(
            "SELECT doc_id, NTILE(4) OVER (PARTITION BY lang "
            "ORDER BY quality, doc_id) FROM q"
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_curriculum_bins_plan_is_one_exchange(spark):
    from bigdatastructure_a5_spark.operators.text import curriculum_bins

    df = spark.createDataFrame(
        [(i, "g%d" % (i % 4), float(i)) for i in range(40)],
        "doc_id bigint, lang string, quality double",
    )
    plan = (
        curriculum_bins(df, 4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_duplicate_line_fraction_hand_examples(spark):
    """Gopher repetition filter: known duplicate-line/paragraph values,
    empty text scores 0.0 (nothing repeats), NULL stays NULL."""
    from bigdatastructure_a5_spark.operators.text import (
        duplicate_line_fraction,
    )

    rows = [
        (0, "a\nb\nc\na"),            # 4 lines, 3 distinct -> 0.25
        (1, "x\nx\nx\nx"),            # 4 lines, 1 distinct -> 0.75
        (2, "one\n\n  \ntwo"),        # blanks dropped -> 0.0
        (3, ""),                       # no lines -> 0.0
        (4, None),                     # NULL -> NULL
        (5, "p1\n\np2\n\np1"),        # paragraphs: 3, 2 distinct -> 1/3
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r.doc_id: (r.lf, r.pf)
        for r in df.select(
            "doc_id",
            duplicate_line_fraction("text").alias("lf"),
            duplicate_line_fraction("text", paragraph=True).alias("pf"),
        ).collect()
    }
    assert got[0][0] == 0.25
    assert got[1][0] == 0.75
    assert got[2][0] == 0.0
    assert got[3] == (0.0, 0.0)
    assert got[4] == (None, None)
    assert abs(got[5][1] - (1 - 2 / 3)) < 1e-12


def test_top_ngram_token_share_hand_examples(spark):
    """Top n-gram share: overlapping counts, short-doc zero, and the
    degenerate all-same case exceeding 1 (callers threshold)."""
    from bigdatastructure_a5_spark.operators.text import (
        top_ngram_token_share,
    )

    rows = [
        (0, "the cat sat on the cat mat"),  # 'the cat' x2 of 7 toks -> 4/7
        (1, "a b c d"),                      # all 2-grams unique -> 2/4
        (2, "word"),                         # shorter than n -> 0.0
        (3, "a a a a"),                      # 'a a' x3 overlap -> 6/4 > 1
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r.doc_id: r.s
        for r in df.select(
            "doc_id", top_ngram_token_share("text", 2).alias("s")
        ).collect()
    }
    assert abs(got[0] - 4 / 7) < 1e-12
    assert got[1] == 0.5
    assert got[2] == 0.0
    assert got[3] == 1.5
    assert got[4] is None


def test_repetition_filters_match_duckdb_on_documents(spark, sf_dir):
    """Cross-engine parity on the real documents table: the duplicate
    -line fraction via LIST_DISTINCT and the top-2-gram share via an
    UNNEST + GROUP BY replay (the engine's sorted run-length fold and
    the oracle's group-count are the same max frequency)."""
    import duckdb

    from bigdatastructure_a5_spark.operators.text import (
        duplicate_line_fraction,
        top_ngram_token_share,
    )

    docs = load_table(spark, sf_dir, "documents")
    got = {
        r.doc_id: (r.lf, r.share)
        for r in docs.select(
            "doc_id",
            duplicate_line_fraction("text").alias("lf"),
            top_ngram_token_share("text", 2).alias("share"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    lf = {
        r[0]: r[1]
        for r in con.sql(
            r"""
            WITH t AS (
              SELECT doc_id,
                     LIST_FILTER(
                       LIST_TRANSFORM(STRING_SPLIT_REGEX(text, '\n'),
                                      x -> TRIM(x)),
                       x -> x <> '') AS lines
              FROM documents
            )
            SELECT doc_id,
                   CASE WHEN LEN(lines) > 0
                        THEN 1.0 - CAST(LEN(LIST_DISTINCT(lines)) AS DOUBLE)
                                   / CAST(LEN(lines) AS DOUBLE)
                        ELSE 0.0 END AS lf
            FROM t
            """
        ).fetchall()
    }
    share = {
        r[0]: r[1]
        for r in con.sql(
            r"""
            WITH t AS (
              SELECT doc_id,
                     STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text),
                                                      '\s+', ' ', 'g')),
                                  ' ') AS w
              FROM documents
            ),
            s AS (
              SELECT doc_id, LEN(w) AS n_toks,
                     UNNEST([ARRAY_TO_STRING(w[i:i+1], ' ')
                             FOR i IN GENERATE_SERIES(1, LEN(w) - 1)]) AS g
              FROM t WHERE LEN(w) >= 2
            ),
            c AS (
              SELECT doc_id, n_toks, g, COUNT(*) AS cnt
              FROM s GROUP BY doc_id, n_toks, g
            )
            SELECT doc_id, MAX(cnt) * 2.0 / MAX(n_toks) AS share
            FROM c GROUP BY doc_id
            """
        ).fetchall()
    }
    want = {
        d: (lf[d], share.get(d, 0.0)) for d in lf
    }
    assert got == want and len(got) > 0


def test_pii_redaction_and_counts_cross_engine(spark):
    """PII scrub: emails/IPs/phones redact to placeholder tokens, counts
    match DuckDB bit-for-bit (the patterns live in the Java-regex ∩ RE2
    common dialect — no lookaround, no backreferences), and redaction
    order protects email digits from the phone pattern."""
    import duckdb

    from bigdatastructure_a5_spark.operators.text import (
        PII_PATTERNS,
        pii_counts,
        redact_pii,
    )

    rows = [
        (0, "contact Jo.Smith+spam@example.co.uk or call +1 (555) 123-4567."),
        (1, "server at 192.168.1.254, backup 10.0.0.1 — no phone"),
        (2, "digits 12345 are fine, 1234567890 is a phone-shaped run"),
        (3, "no pii at all here"),
        (4, None),
        (5, "results: 2020 2021 2022 2023 and v1.2.3 stay intact"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r.doc_id: (r.red, r.n_email, r.n_ip, r.n_phone)
        for r in df.select(
            "doc_id",
            redact_pii("text").alias("red"),
            pii_counts("text", "email").alias("n_email"),
            pii_counts("text", "ipv4").alias("n_ip"),
            pii_counts("text", "phone").alias("n_phone"),
        ).collect()
    }
    # redaction semantics
    assert "<EMAIL>" in got[0][0] and "<PHONE>" in got[0][0]
    assert "Jo.Smith" not in got[0][0] and "555" not in got[0][0]
    assert got[1][0].count("<IPV4>") == 2 and "<PHONE>" not in got[1][0]
    assert "12345 are fine" in got[2][0] and "<PHONE>" in got[2][0]
    assert got[3][0] == rows[3][1]
    assert got[4] == (None, None, None, None)
    # grouped phone shape: year lists and version strings stay intact
    assert got[5][0] == rows[5][1] and got[5][3] == 0
    # counts agree with the redaction order: the IPs do NOT also count
    # as phones, the email's digits do not feed the phone pattern
    assert got[1][3] == 0 and got[0][3] == 1
    # count parity vs DuckDB: same patterns, same prior-kind redaction
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", rows)
    kinds = list(PII_PATTERNS)
    for kind, col_ix in (("email", 1), ("ipv4", 2), ("phone", 3)):
        expr = "text"
        for prior in kinds[: kinds.index(kind)]:
            expr = (
                f"REGEXP_REPLACE({expr}, '{PII_PATTERNS[prior]}', "
                f"'<{prior.upper()}>', 'g')"
            )
        want = {
            r[0]: r[1]
            for r in con.execute(
                f"SELECT doc_id, CAST(LEN(REGEXP_EXTRACT_ALL({expr}, ?)) "
                "AS BIGINT) FROM d",
                [PII_PATTERNS[kind]],
            ).fetchall()
        }
        for doc_id, vals in got.items():
            assert vals[col_ix] == want[doc_id], (kind, doc_id)


def test_document_report_single_pass_and_matches_standalone(spark, sf_dir):
    """The fused per-document report equals the standalone operators
    column by column (fusion is a cost optimization, never a semantics
    fork) and its plan is ONE scan, zero exchanges, zero Python."""
    from bigdatastructure_a5_spark.functions.hashing import (
        md5_fingerprint,
        token_count,
        tokens,
    )
    from bigdatastructure_a5_spark.operators.text import (
        document_report,
        duplicate_line_fraction,
        lang_id_from_scores,
        pii_counts,
        quality_score,
        top_ngram_token_share,
        with_lang_scores,
    )

    docs = load_table(spark, sf_dir, "documents")
    report = document_report(docs)
    plan = report._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    got = {r.doc_id: r for r in report.collect()}
    standalone = {
        r.doc_id: r
        for r in with_lang_scores(
            docs.select("doc_id", "text", tokens("text").alias("__toks")),
            "text",
            toks_col="__toks",
        )
        .select(
            "doc_id",
            token_count("text").alias("n_tokens"),
            quality_score("text", toks="__toks").alias("quality"),
            lang_id_from_scores().alias("lang_id"),
            duplicate_line_fraction("text").alias("dup_line_frac"),
            top_ngram_token_share("text", 2, toks="__toks").alias(
                "top_2gram_share"
            ),
            pii_counts("text", "email").alias("n_email"),
            md5_fingerprint("text").alias("fingerprint"),
        )
        .collect()
    }
    assert set(got) == set(standalone) and len(got) > 0
    for d, r in got.items():
        s = standalone[d]
        assert (
            r.n_tokens,
            r.quality,
            r.lang_id,
            r.dup_line_frac,
            r.top_2gram_share,
            r.n_email,
            r.fingerprint,
        ) == (
            s.n_tokens,
            s.quality,
            s.lang_id,
            s.dup_line_frac,
            s.top_2gram_share,
            s.n_email,
            s.fingerprint,
        )
