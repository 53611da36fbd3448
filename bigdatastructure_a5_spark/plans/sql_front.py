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
    r"\s+ON\s+(?P<lq>\w+)\.(?P<lf>\w+)\s*=\s*(?P<rq>\w+)\.(?P<rf>\w+))?"
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
    join_left: tuple[str, str] | None = None  # (qualifier, field)
    join_right: tuple[str, str] | None = None
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


def _owner(q: SimpleQuery, qualifier: str | None) -> str:
    """Resolve a field qualifier (alias or table name) to its collection."""
    if qualifier in (q.alias, q.table):
        return q.table
    if q.join_table and qualifier in (q.join_alias, q.join_table):
        return q.join_table
    return q.table  # unqualified fields default to the FROM collection


def rewrite_for_variant(sql: str, spec: DenormalizationSpec) -> str:
    """Route a logical-schema query to a denormalization variant's tables.

    Returns SQL to run against views registered under the variant's
    collection names.  Pass-through when no rewrite applies (including SQL
    beyond the restricted grammar — Catalyst handles it on the kept tables).
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
        # `one`-embed: hosted fields are struct members `path.field`.
        # `many`-embed: hosted rows live in an ARRAY -> explode it; inner-join
        # semantics are preserved (hosts with empty arrays emit no rows).
        many = embed.cardinality == "many"
        ref = "__e" if many else path

        def map_field(qualifier: str | None, fld: str) -> str:
            if _owner(q, qualifier) == hosted:
                # the embedded side's join key was consumed by the embed
                if fld == embed.source_key:
                    return embed.target_key
                return f"{ref}.{fld}"
            return fld

        sel = []
        for item in q.select:
            if item.strip() == "*":
                sel.append("*")
                continue
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
        if item.strip() == "*":
            sel.append(f"{ref}.*")
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
