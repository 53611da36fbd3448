"""Loaders for the reference's JSON config formats (S4/S5/S6 parity).

The reference drives everything from JSON files: denormalization candidates
(`/root/reference/challenge/denormalizations.json`, parsed at
`challenge/loader.py:79-106`) and a query workload with frequencies
(`challenge/queries.json`, parsed at `challenge/loader.py:185-187` /
`challenge/run.py:22-27`).  These loaders accept the same shapes so existing
workload files port directly; stats files (S4) are superseded by real data
statistics (``ANALYZE TABLE`` + Catalyst CBO) and are intentionally not
modeled.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path

from bigdatastructure_a5_spark.operators.denormalize import (
    CollectionSpec,
    DenormalizationSpec,
    EmbedSpec,
)


@dataclass(frozen=True)
class QuerySpec:
    """One workload query: id + SQL + frequency weight (reference
    `challenge/run.py:22-27`)."""

    id: str
    sql: str
    frequency: float = 1.0


def load_queries(path: str | Path) -> list[QuerySpec]:
    """``{"queries": [{"id", "sql", "frequency"}, ...]}`` (S6)."""
    data = json.loads(Path(path).read_text())
    items = data["queries"] if isinstance(data, dict) else data
    return [
        QuerySpec(q["id"], q["sql"], float(q.get("frequency", 1.0))) for q in items
    ]


def load_denormalizations(
    path: str | Path, key_map: dict[tuple[str, str], tuple[str, str]]
) -> list[DenormalizationSpec]:
    """``{"denormalizations": [{id, description, collections: {name:
    {sharding_key, indexes}}, embeds: [{source, target, path,
    cardinality}]}]}`` (S5, reference `challenge/loader.py:79-106`).

    ``key_map`` supplies the join-key pair per (target, source) — the
    reference infers it from its flat schema's shared field names; real
    tables need it explicit.
    """
    data = json.loads(Path(path).read_text())
    items = data["denormalizations"] if isinstance(data, dict) else data
    specs = []
    for d in items:
        colls = tuple(
            CollectionSpec(
                name=name,
                sharding_key=c.get("sharding_key"),
                indexes=tuple(c.get("indexes", ())),
            )
            for name, c in d.get("collections", {}).items()
        )
        embeds = []
        for e in d.get("embeds", ()):
            tk, sk = key_map[(e["target"], e["source"])]
            embeds.append(
                EmbedSpec(
                    source=e["source"],
                    target=e["target"],
                    path=e["path"],
                    cardinality=e["cardinality"],
                    target_key=tk,
                    source_key=sk,
                )
            )
        specs.append(
            DenormalizationSpec(
                id=d["id"],
                description=d.get("description", ""),
                collections=colls,
                embeds=tuple(embeds),
            )
        )
    return specs
