"""Non-quadratic xN oracles for the five pair-enumeration gate queries.

VERDICT r5 item 1: above x10 the registered DuckDB oracles for the dedup /
curation family were skipped because their CHECK is quadratic in the copy
count — the inverted shingle join explodes as copies^2 per shingle (every
replica carries the same text), while the operators themselves are
output-bound.  This module derives, for a `tools/scale_fixtures.ensure_x10`
corpus, an EXACT xN oracle whose cost is linear in the copy count:

1. run the ORIGINAL registered oracle restricted to the copy-0 documents
   (`doc_id < OFFSET`) — the base-level answer, the same size as the x1
   check regardless of N;
2. LIFT it arithmetically using the replication structure.  Texts are
   verbatim per copy (scale_fixtures construction), so every pair value
   between copies is the base value bit-for-bit:

   - pair queries (jaccard / hamming): a base pair (x < y, v) lifts to all
     copies^2 cross pairs {(x + c1*OFF, y + c2*OFF)} with the SAME value v,
     oriented by LEAST/GREATEST; and every in-domain base doc contributes
     C(copies, 2) self pairs at the exact-duplicate value (jaccard 1.0 /
     hamming 0).  "In-domain" is each operator's own row filter (non-empty
     shingle set for the trigram family; non-empty normalized text for
     simhash) — re-stated from the same SQL fragments the registered
     oracles use, so the two can never drift.
   - pipeline_curation: survivors lift, they don't multiply.  A copy c>0
     of any doc with >= 3 tokens is always dropped (its copy-0 twin is an
     exact duplicate with a smaller id), and copy 0 survives iff the base
     doc survives — so the xN survivor set IS the base survivor set, plus
     every copy of the <3-token survivors (empty shingle sets are outside
     the pair domain and can never be dropped).

The lifted SQL is therefore O(base_pairs * copies^2) in OUTPUT (which is
the true answer's size — the operator emits the same rows) but never joins
anything larger than the base corpus.  `dedup_semantic` is NOT
liftable: scale_fixtures rotates each copy's vector (to avoid cosine
ties), and a rotated dot product folds the same terms in a different
order, so values are not bit-identical to any base-level computation — its
registered all-pairs oracle matches the operator's own exact-all-pairs
complexity class and simply runs in full.

Validated by tests/test_tools.py::test_lifted_oracles_match_full_at_x10:
at x10 (where the full pair oracles are still tractable) the lifted SQL
returns the identical multiset of rows.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from scale_fixtures import OFFSET  # noqa: E402

from bigdatastructure_a5_spark.queries.pipeline import (  # noqa: E402
    _NORM_SQL,
    _SHINGLES_SQL,
)
from bigdatastructure_a5_spark.registry import REGISTRY, _load_all  # noqa: E402

#: Word-bounded so an identifier like `documents_meta` can neither satisfy
#: the count guard nor be corrupted by the rewrite (ADVICE r6).
_MARKER_RE = re.compile(r"\bFROM\s+documents\b", flags=re.IGNORECASE)


def _base_restricted(sql: str) -> str:
    """The original oracle, reading only the copy-0 documents."""
    hits = _MARKER_RE.findall(sql)
    if len(hits) != 1:
        raise ValueError(
            "expected exactly one word-bounded 'FROM documents' in the "
            f"oracle; the textual restriction would be ambiguous (found {len(hits)})"
        )
    return _MARKER_RE.sub(
        f"FROM (SELECT * FROM documents WHERE doc_id < {OFFSET}) AS documents",
        sql,
    )


def _lift_pairs(
    base_sql: str, value_col: str, self_value: str, domain_sql: str, copies: int
) -> str:
    """Lift a base-level (id_a, id_b, value) pair oracle to xN."""
    return f"""
    WITH bp AS ({base_sql}),
    dom AS ({domain_sql}),
    copies AS (SELECT UNNEST(RANGE({copies})) AS c)
    SELECT LEAST(p.id_a + c1.c * {OFFSET}, p.id_b + c2.c * {OFFSET}) AS id_a,
           GREATEST(p.id_a + c1.c * {OFFSET}, p.id_b + c2.c * {OFFSET}) AS id_b,
           p.{value_col} AS {value_col}
    FROM bp p, copies c1, copies c2
    UNION ALL
    SELECT d.doc_id + c1.c * {OFFSET} AS id_a,
           d.doc_id + c2.c * {OFFSET} AS id_b,
           {self_value} AS {value_col}
    FROM dom d, copies c1, copies c2
    WHERE c1.c < c2.c
    """


def _lift_clusters(base_pairs_sql: str, domain_sql: str, copies: int) -> str:
    """Lift the cluster labels: at xN every in-domain base doc's copies
    are exact duplicates (jaccard 1.0 pairs in every band), so ALL
    in-domain docs cluster, base components merge across copies, and the
    min label of a merged component is the min BASE id of the doc's base
    component (copy-0 ids are the smallest).  Close the BASE graph with a
    recursive CTE — seeded with every in-domain vertex so base singletons
    become their own (copy-clique) cluster — then cross the labels with
    the copy shifts."""
    return f"""
    WITH RECURSIVE bp AS (SELECT id_a, id_b FROM ({base_pairs_sql})),
    dom AS (SELECT doc_id FROM ({domain_sql})),
    sym AS (
      SELECT id_a AS a, id_b AS b FROM bp UNION SELECT id_b, id_a FROM bp
    ),
    reach(a, b) AS (
      SELECT doc_id, doc_id FROM dom
      UNION
      SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
    ),
    base_comp AS (SELECT a AS id, MIN(b) AS comp FROM reach GROUP BY a),
    copies AS (SELECT UNNEST(RANGE({copies})) AS c)
    SELECT bc.id + c.c * {OFFSET} AS doc_id, bc.comp AS cluster_id
    FROM base_comp bc, copies c
    """


def _lift_curation(base_sql: str, copies: int) -> str:
    """Lift the curation survivor set: base survivors with >= 3 tokens stay
    singular (their copies are dropped as exact duplicates of copy 0); the
    <3-token survivors have empty shingle sets, sit outside the pair
    domain, and keep every copy."""
    return f"""
    WITH base_out AS ({base_sql}),
    copies AS (SELECT UNNEST(RANGE({copies})) AS c)
    SELECT b.doc_id + c.c * {OFFSET} AS doc_id, b.n_tokens, b.quality
    FROM base_out b, copies c
    WHERE b.n_tokens < 3
    UNION ALL
    SELECT doc_id, n_tokens, quality FROM base_out WHERE n_tokens >= 3
    """


def _lift_retraction(base_pairs_sql: str, domain_sql: str, copies: int) -> str:
    """Lift the r13 retraction gate row's keep-set.  OFFSET is even (and
    divisible by 4), so copy shifts preserve doc_id residues mod 4 and
    the xN pair structure factors cleanly per parity class:

    - RETRACTION at xN hits exactly the copies of base evens that are
      cross-parity AND congruent 0 mod 4 (the row's rule) — a base
      even's copies all share its residue, and its cross-parity
      partners at xN are the copies of its base cross-parity partners.
    - CROSS-BATCH drops: an odd copy-0 doc drops through the index iff
      its base doc has a SURVIVING even partner — one with residue 2
      mod 4 (the 0-mod-4 partners are retracted).  Higher odd copies of
      in-domain docs drop via their self pair anyway, so the clause
      only matters at copy 0.
    - WITHIN-batch drops lift like the pair family: copy-0 doc y drops
      iff some same-parity base partner x < y exists (cross-copy pairs
      of smaller copies never undercut copy 0 because OFFSET dominates
      any base id), and every copy c >= 1 of an IN-DOMAIN doc drops via
      its jaccard-1.0 self pair with copy 0.  Out-of-domain docs (empty
      shingle sets) pair with nothing and keep every copy.
    """
    return f"""
    WITH bp AS ({base_pairs_sql}),
    dom AS ({domain_sql}),
    sym AS (
      SELECT id_a AS x, id_b AS y FROM bp
      UNION ALL SELECT id_b, id_a FROM bp
    ),
    retr AS (
      SELECT DISTINCT x AS doc_id FROM sym
      WHERE x % 4 = 0 AND y % 2 = 1
    ),
    dropped0 AS (
      SELECT DISTINCT id_b AS doc_id FROM bp WHERE id_a % 2 = id_b % 2
      UNION
      SELECT DISTINCT s.y AS doc_id FROM sym s
      WHERE s.y % 2 = 1 AND s.x % 2 = 0
        AND s.x NOT IN (SELECT doc_id FROM retr)
    ),
    base AS (
      SELECT doc_id FROM documents WHERE doc_id < {OFFSET}
    ),
    copies AS (SELECT UNNEST(RANGE({copies})) AS c)
    SELECT b.doc_id + c.c * {OFFSET} AS doc_id,
           CAST(b.doc_id % 2 AS BIGINT) AS ingest_batch
    FROM base b, copies c
    WHERE (c.c = 0 AND b.doc_id NOT IN (SELECT doc_id FROM dropped0))
       OR (c.c > 0 AND b.doc_id NOT IN (SELECT doc_id FROM dom))
    """


#: Trigram-family pair domain: base docs with a non-empty shingle set
#: (the sz CTE of the registered oracle).
_TRIGRAM_DOMAIN = (
    _base_restricted(_SHINGLES_SQL) + " SELECT doc_id FROM sh WHERE LEN(s) > 0"
)

#: SimHash pair domain: the registered oracle's own t-CTE row filter.
_SIMHASH_DOMAIN = (
    f"SELECT doc_id FROM (SELECT * FROM documents WHERE doc_id < {OFFSET}) "
    f"AS documents WHERE text IS NOT NULL AND {_NORM_SQL} <> ''"
)


def _lift_decontam(base_sql: str, copies: int) -> str:
    """Lift the contamination matches: corpus/bench slice membership is
    copy-invariant (doc_id % 10 is preserved because OFFSET % 10 == 0 —
    asserted below), texts are verbatim per copy, so the xN answer is
    exactly the base (corpus_id, bench_id) matches crossed with copies^2
    id shifts, values unchanged.  No self-pair term: a bench doc's copies
    keep the bench residue and never enter the corpus side."""
    assert OFFSET % 10 == 0, "slice residue must survive the copy stride"
    return f"""
    WITH bp AS ({base_sql}),
    copies AS (SELECT UNNEST(RANGE({copies})) AS c)
    SELECT p.corpus_id + c1.c * {OFFSET} AS corpus_id,
           p.bench_id + c2.c * {OFFSET} AS bench_id,
           p.overlap, p.bench_size, p.containment
    FROM bp p, copies c1, copies c2
    """


def lifted_oracles(copies: int) -> dict[str, str]:
    """name -> exact xN oracle SQL for every liftable pair-family query."""
    _load_all()
    out: dict[str, str] = {}
    for name in ("dedup_ngram_jaccard", "dedup_minhash_lsh"):
        out[name] = _lift_pairs(
            _base_restricted(REGISTRY[name].oracle),
            "jaccard",
            "CAST(1.0 AS DOUBLE)",
            _TRIGRAM_DOMAIN,
            copies,
        )
    out["dedup_simhash"] = _lift_pairs(
        _base_restricted(REGISTRY["dedup_simhash"].oracle),
        "hamming",
        "CAST(0 AS INT)",
        _SIMHASH_DOMAIN,
        copies,
    )
    out["dedup_clusters"] = _lift_clusters(
        _base_restricted(REGISTRY["dedup_minhash_lsh"].oracle),
        _TRIGRAM_DOMAIN,
        copies,
    )
    # the star-contraction row (r12) answers the SAME closure question —
    # the oracle is algorithm-agnostic, so the lift applies verbatim
    out["dedup_clusters_star"] = out["dedup_clusters"]
    out["pipeline_curation"] = _lift_curation(
        _base_restricted(REGISTRY["pipeline_curation"].oracle), copies
    )
    out["dedup_retraction"] = _lift_retraction(
        _base_restricted(REGISTRY["dedup_minhash_lsh"].oracle),
        _TRIGRAM_DOMAIN,
        copies,
    )
    out["decontam_benchmark"] = _lift_decontam(
        _base_restricted(REGISTRY["decontam_benchmark"].oracle), copies
    )
    return out
