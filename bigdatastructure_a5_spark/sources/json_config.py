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
from dataclasses import dataclass, field
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


def load_queries(
    path: str | Path, defaults: dict[str, float] | None = None
) -> list[QuerySpec]:
    """``{"queries": [{"id", "sql", "frequency"}, ...]}`` (S6).

    ``defaults`` supplies per-id frequencies when a query omits one — the
    reference takes these from stats.json's ``query_frequencies``
    (`challenge/run.py:22-27`).  Trailing semicolons are stripped (the
    reference files carry them; ``spark.sql`` wants a single statement).
    """
    data = json.loads(Path(path).read_text())
    items = data["queries"] if isinstance(data, dict) else data
    defaults = defaults or {}
    return [
        QuerySpec(
            q["id"],
            q["sql"].strip().rstrip(";"),
            float(q.get("frequency", defaults.get(q["id"], 1.0))),
        )
        for q in items
    ]


def load_query_frequencies(stats_path: str | Path) -> dict[str, float]:
    """stats.json's ``query_frequencies`` block (`challenge/run.py:22-27`
    default weights), absent -> {}."""
    data = json.loads(Path(stats_path).read_text())
    return {k: float(v) for k, v in data.get("query_frequencies", {}).items()}


def infer_join_keys(
    schema: dict[str, dict], target: str, source: str
) -> tuple[str, str]:
    """The (target_key, source_key) pair for an embed, inferred from a flat
    schema the way the reference does (`challenge/loader.py:109-146`): the
    shared field that is a primary key of either side (the FK convention in
    the reference's schemas, e.g. Product.IDP appearing in OrderLine), else
    any shared field name."""
    t_fields = set(schema.get(target, {}).get("fields", {}))
    s_fields = set(schema.get(source, {}).get("fields", {}))
    shared = t_fields & s_fields
    if not shared:
        raise ValueError(f"no shared field between {target} and {source}")
    for side in (source, target):
        pk = schema.get(side, {}).get("primary_key")
        if pk in shared:
            return pk, pk
    k = sorted(shared)[0]
    return k, k


def load_denormalizations(
    path: str | Path,
    key_map: dict[tuple[str, str], tuple[str, str]] | None = None,
    schema: dict[str, dict] | None = None,
) -> list[DenormalizationSpec]:
    """``{"denormalizations": [{id, description, collections: {name:
    {sharding_key, indexes}}, embeds: [{from, to, path, cardinality}]}]}``
    (S5, reference `challenge/loader.py:79-106`; ``source``/``target`` are
    accepted as synonyms of the reference's ``from``/``to``).

    The embed join-key pair per (target, source) comes from ``key_map``
    when given, else is inferred from ``schema`` (load_flat_schema shape)
    like the reference infers it from shared field names.
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
            source = e.get("source", e.get("from"))
            target = e.get("target", e.get("to"))
            if key_map is not None and (target, source) in key_map:
                tk, sk = key_map[(target, source)]
            elif schema is not None:
                tk, sk = infer_join_keys(schema, target, source)
            else:
                raise ValueError(
                    f"embed {source}->{target}: need key_map or schema to "
                    "determine join keys"
                )
            embeds.append(
                EmbedSpec(
                    source=source,
                    target=target,
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


@dataclass(frozen=True)
class ClusterConfig:
    """Reference cluster knobs (`challenge/models.py:63-66`,
    `chapter5/loader.py:11-14`): server count and the fraction of a
    collection a shard-targeted access touches."""

    nb_servers: int = 1000
    sharding_access_fraction: float = 0.1

    def shuffle_partitions(self, cap: int = 2000) -> int:
        """Map the modeled cluster onto a Spark knob: one shuffle partition
        per modeled server, capped (AQE coalesces below this at runtime)."""
        return min(self.nb_servers, cap)


@dataclass(frozen=True)
class CollectionStats:
    """Reference per-collection statistics (`challenge/models.py:39-44`,
    `main.py:22-35`).  In this engine real data supersedes these (ANALYZE
    TABLE / CBO); the loader exists so reference stats.json files remain
    usable as *hints* (e.g. expected NDVs for workload planning)."""

    nb_documents: int = 0
    distinct_values: dict[str, int] = field(default_factory=dict)
    avg_array_lengths: dict[str, float] = field(default_factory=dict)
    field_selectivity: dict[str, float] = field(default_factory=dict)
    sharding_key: str | None = None


def load_stats(path: str | Path) -> tuple[ClusterConfig, dict[str, CollectionStats]]:
    """S4: parse the reference stats format — ``{"cluster": {...},
    "collections": {name: {...}}}`` (`challenge/loader.py:53-76`,
    `chapter5/loader.py:32-54`)."""
    data = json.loads(Path(path).read_text())
    cl = data.get("cluster", {})
    cluster = ClusterConfig(
        nb_servers=int(cl.get("nb_servers", 1000)),
        sharding_access_fraction=float(cl.get("sharding_access_fraction", 0.1)),
    )
    stats: dict[str, CollectionStats] = {}
    for name, s in data.get("collections", {}).items():
        stats[name] = CollectionStats(
            nb_documents=int(s.get("nb_documents", 0)),
            distinct_values={k: int(v) for k, v in s.get("distinct_values", {}).items()},
            avg_array_lengths={
                k: float(v) for k, v in s.get("avg_array_lengths", {}).items()
            },
            field_selectivity={
                k: float(v) for k, v in s.get("field_selectivity", {}).items()
            },
            sharding_key=s.get("sharding_key"),
        )
    return cluster, stats


def load_flat_schema(path: str | Path) -> dict[str, dict]:
    """S3: the challenge's flat schema format — ``{"collections": {name:
    {"primary_key": ..., "fields": {fname: {"type", "avg_size"}}}}}``
    (`challenge/loader.py:35-50`).  Returns per-collection field specs;
    combine with sources.schema_loader for nested JSON-Schema dialects."""
    data = json.loads(Path(path).read_text())
    return {
        name: {
            "primary_key": c.get("primary_key"),
            "fields": dict(c.get("fields", {})),
        }
        for name, c in data.get("collections", {}).items()
    }
