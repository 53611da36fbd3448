"""SQL front door + denormalization-aware rewriter.

Full ANSI SQL goes straight to ``spark.sql`` — Catalyst strictly supersedes
the reference's regex grammar (`/root/reference/challenge/planner.py:71-112`
parses only ``SELECT f FROM A [a] [JOIN B [b] ON a.x=b.y] [WHERE f=v AND
...]``).  What Catalyst does NOT do is the reference's *physical-design
routing*: rewriting a query against the logical (normalized) schema into a
query against a denormalized variant (join elimination via embedding,
`challenge/planner.py:168-222`; collection substitution `:271-291`).  This
module implements that routing over the same restricted grammar, as a
fresh-written parser (behavioral parity only — the reference's code is not
reused).

Rewrite rules, given a ``DenormalizationSpec``:

1. ``A JOIN B`` where an embed covers {A, B}: collapse to the embedding host
   — SELECT/WHERE fields of the embedded side become ``path.field``; the
   embedded side's join key maps to the host's key (the embed consumed it).
2. Single-collection query on a collection absent from the layout but
   embedded elsewhere: retarget to the host with ``path.``-prefixed fields.
   (Reference semantics preserved: the result is per-HOST-document.)
3. Anything else: pass through unchanged.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from bigdatastructure_a5_spark.operators.denormalize import DenormalizationSpec

_SQL_RE = re.compile(
    r"^\s*SELECT\s+(?P<select>.+?)\s+FROM\s+(?P<table>\w+)(?:\s+(?P<alias>(?!JOIN\b|WHERE\b)\w+))?"
    r"(?:\s+JOIN\s+(?P<jtable>\w+)(?:\s+(?P<jalias>(?!ON\b)\w+))?"
    r"\s+ON\s+(?:(?P<lq>\w+)\.)?(?P<lf>\w+)\s*=\s*(?:(?P<rq>\w+)\.)?(?P<rf>\w+))?"
    r"(?:\s+WHERE\s+(?P<where>.+?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)

_PRED_RE = re.compile(
    r"^\s*(?:(?P<qual>\w+)\.)?(?P<field>\w+)\s*=\s*(?P<value>'[^']*'|\"[^\"]*\"|[\w.+-]+)\s*$"
)


@dataclass(frozen=True)
class SimpleQuery:
    """Parsed restricted-grammar query (reference parse_sql output analogue,
    `challenge/planner.py:71-112`)."""

    select: tuple[str, ...]  # raw select items, possibly "alias.field"
    table: str
    alias: str
    join_table: str | None = None
    join_alias: str | None = None
    join_left: tuple[str | None, str] | None = None  # (qualifier, field)
    join_right: tuple[str | None, str] | None = None
    where: tuple[tuple[str | None, str, str], ...] = ()  # (qual, field, literal)


def parse_simple_sql(sql: str) -> SimpleQuery | None:
    """Parse the restricted grammar; None if it doesn't fit (caller then runs
    the SQL unmodified via spark.sql — full-SQL passthrough)."""
    m = _SQL_RE.match(sql)
    if not m:
        return None
    g = m.groupdict()
    preds: list[tuple[str | None, str, str]] = []
    if g["where"]:
        for clause in re.split(r"\s+AND\s+", g["where"], flags=re.IGNORECASE):
            pm = _PRED_RE.match(clause)
            if not pm:
                return None  # beyond the restricted grammar
            preds.append((pm.group("qual"), pm.group("field"), pm.group("value")))
    select = tuple(s.strip() for s in g["select"].split(","))
    # select items must be bare or alias-qualified identifiers (or *):
    # anything richer — COUNT(u.id), expressions — is beyond the grammar,
    # and the rewriter's qualifier-splitting would MANGLE it into invalid
    # SQL; None routes those queries to full-SQL passthrough instead
    item_re = re.compile(r"^(?:\*|(?:\w+\.)?\w+|(?:\w+\.)?\*)$")
    if not all(item_re.match(s) for s in select):
        return None
    return SimpleQuery(
        select=select,
        table=g["table"],
        alias=g["alias"] or g["table"],
        join_table=g["jtable"],
        join_alias=(g["jalias"] or g["jtable"]) if g["jtable"] else None,
        join_left=(g["lq"], g["lf"]) if g["jtable"] else None,
        join_right=(g["rq"], g["rf"]) if g["jtable"] else None,
        where=tuple(preds),
    )


def _owner(
    q: SimpleQuery,
    qualifier: str | None,
    field: str | None = None,
    columns: dict[str, set[str]] | None = None,
) -> str:
    """Resolve a field qualifier (alias or table name) to its collection.

    Unqualified fields resolve by COLUMN MEMBERSHIP when the caller supplied
    the logical schema (``columns``): a field living only on the joined
    side belongs to it — exactly Spark's own name resolution for a query
    that was unambiguous pre-rewrite.  Without ``columns`` (or when the
    name exists on both sides, where the original query was ambiguous
    anyway) the FROM collection wins and a mis-resolution surfaces as an
    UNRESOLVED_COLUMN error on the rewritten SQL, never silent wrong data.
    """
    if qualifier in (q.alias, q.table):
        return q.table
    if q.join_table and qualifier in (q.join_alias, q.join_table):
        return q.join_table
    if (
        qualifier is None
        and field is not None
        and columns is not None
        and q.join_table
        and field in columns.get(q.join_table, ())
        and field not in columns.get(q.table, ())
    ):
        return q.join_table
    return q.table  # unqualified fields default to the FROM collection


def rewrite_for_variant(
    sql: str,
    spec: DenormalizationSpec,
    columns: dict[str, set[str]] | None = None,
) -> str:
    """Route a logical-schema query to a denormalization variant's tables.

    Returns SQL to run against views registered under the variant's
    collection names.  Pass-through when no rewrite applies (including SQL
    beyond the restricted grammar — Catalyst handles it on the kept
    tables).  ``columns`` (collection -> logical column set) is optional;
    when present, unqualified fields of the embedded side resolve
    correctly instead of defaulting to the host.

    A join is only collapsed when its ON keys ARE the embed keys — an
    equi-join between the same collections on different columns describes
    a different relationship, which the embed cannot answer; it passes
    through (and fails loudly if the variant dropped the standalone
    table, rather than silently returning the wrong join's rows).  Star
    selects (`*` / `alias.*`) in a join also pass through: the embed
    cannot reproduce the join's output shape (struct/array columns, the
    consumed key), and a silently different schema is worse than running
    the explicit join.
    """
    q = parse_simple_sql(sql)
    if q is None:
        return sql

    def strip_qual(item: str) -> str:
        return item.split(".", 1)[1] if "." in item else item

    if q.join_table:
        embed = spec.embed_covering(q.table, q.join_table)
        if embed is None:
            return sql
        host, hosted, path = embed.target, embed.source, embed.path
        # the rewrite is only sound for the embed's OWN join relationship:
        # host.target_key = hosted.source_key.  Any other ON pair keeps
        # the explicit join.  ON-key qualifiers resolve with the SAME
        # field/columns membership fallback as SELECT/WHERE (an
        # unqualified `ON l_orderkey = o_orderkey` is legal SQL when the
        # names are unambiguous); if both sides still land on one owner
        # the original query was ambiguous — keep the explicit join
        # rather than guess.
        left_owner = _owner(q, q.join_left[0], q.join_left[1], columns)
        right_owner = _owner(q, q.join_right[0], q.join_right[1], columns)
        if left_owner == right_owner:
            return sql
        on_keys = {
            left_owner: q.join_left[1],
            right_owner: q.join_right[1],
        }
        if (
            on_keys.get(host) != embed.target_key
            or on_keys.get(hosted) != embed.source_key
        ):
            return sql
        if any(strip_qual(item.strip()) == "*" for item in q.select):
            return sql  # star shape is not reproducible from the embed
        # `one`-embed: hosted fields are struct members `path.field`.
        # `many`-embed: hosted rows live in an ARRAY -> explode it; inner-join
        # semantics are preserved (hosts with empty arrays emit no rows).
        many = embed.cardinality == "many"
        ref = "__e" if many else path

        def map_field(qualifier: str | None, fld: str) -> str:
            if _owner(q, qualifier, fld, columns) == hosted:
                # the embedded side's join key was consumed by the embed
                if fld == embed.source_key:
                    return embed.target_key
                return f"{ref}.{fld}"
            return fld

        sel = []
        for item in q.select:
            qual = item.split(".", 1)[0] if "." in item else None
            mapped = map_field(qual, strip_qual(item))
            # keep the original unqualified name as the output column
            out_name = strip_qual(item)
            sel.append(mapped if mapped == out_name else f"{mapped} AS {out_name}")
        where = [
            f"{map_field(qual, fld)} = {lit}" for qual, fld, lit in q.where
        ]
        out = f"SELECT {', '.join(sel)} FROM {host}"
        if many:
            out += f" LATERAL VIEW EXPLODE({path}) __t AS __e"
        if where:
            out += " WHERE " + " AND ".join(where)
        return out

    # single-collection query: O15 substitution when the table is hosted
    embed = spec.host_of(q.table)
    if embed is None:
        return sql
    path = embed.path
    many = embed.cardinality == "many"
    ref = "__e" if many else path

    def map_single(fld: str) -> str:
        return embed.target_key if fld == embed.source_key else f"{ref}.{fld}"

    sel = []
    for item in q.select:
        if strip_qual(item.strip()) == "*":
            # the embed's struct holds every hosted field EXCEPT the
            # consumed join key; restore it so `SELECT *` keeps the
            # logical column set (the key lands last — order is the one
            # permitted deviation, a missing column is not)
            sel.append(f"{ref}.*")
            sel.append(f"{embed.target_key} AS {embed.source_key}")
            continue
        fld = strip_qual(item)
        mapped = map_single(fld)
        sel.append(mapped if mapped == fld else f"{mapped} AS {fld}")
    where = [f"{map_single(fld)} = {lit}" for _, fld, lit in q.where]
    out = f"SELECT {', '.join(sel)} FROM {embed.target}"
    if many:
        out += f" LATERAL VIEW EXPLODE({path}) __t AS __e"
    if where:
        out += " WHERE " + " AND ".join(where)
    return out
