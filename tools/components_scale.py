"""Connected-component clustering at scale -> EXPERIMENTS.md §18.

The xN fixture construction is a purpose-built CC stress: every base
document becomes an N-way exact-duplicate group, and base-level
near-dup links replicate across all copies — so as N grows the VERTEX
count grows Nx and the PAIR list grows ~N² inside each group (the
output-bound property §9 names for the pair family), while the KEPT
set stays EXACTLY the x1 kept set: copies of linked docs merge into
the base component, and every other doc's copies form their own
cluster whose representative is the one survivor.  Three hard analytic
invariants to measure against: kept-set size flat at x1's value for
EVERY N, cluster count flat at that same value for every N >= 2 (at
x1 unclustered singletons aren't vertices, so the count is smaller),
and propagation rounds flat in N (duplicate groups are LSH
quasi-cliques, diameter ~2 — more copies widen the cliques, they do
not lengthen paths).

Usage: python tools/components_scale.py [copies ...]   (default 1 10 30)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F  # noqa: E402

SECTION = "## 18. Cluster dedup (connected components) at scale"
BASE = "/root/testdata/sf0.01"


def measure(spark, copy_points) -> list[str]:
    from scale_fixtures import ensure_x10

    from bigdatastructure_a5_spark.operators.components import (
        connected_components,
    )
    from bigdatastructure_a5_spark.operators.dedup import (
        near_duplicates_minhash,
    )
    from bigdatastructure_a5_spark.session import persist_df

    rows = []
    for copies in copy_points:
        sf_dir = BASE if copies == 1 else ensure_x10(BASE, copies)
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        n_docs = docs.count()
        t0 = time.perf_counter()
        pairs = persist_df(
            near_duplicates_minhash(docs, "doc_id", "text", threshold=0.8)
            .select("id_a", "id_b")
        )
        n_pairs = pairs.count()
        t_pairs = time.perf_counter() - t0

        t0 = time.perf_counter()
        rounds: list = []
        comp = connected_components(pairs, rounds=rounds)
        n_clustered = comp.count()
        n_clusters = comp.select("comp").distinct().count()
        t_cc = time.perf_counter() - t0
        kept = n_docs - (n_clustered - n_clusters)
        comp.unpersist()
        pairs.unpersist()
        rows.append(
            f"| x{copies} | {n_docs:,} | {n_pairs:,} | {n_clustered:,} | "
            f"{n_clusters:,} | {kept:,} | {rounds[0]} | {t_pairs:.1f} | "
            f"{t_cc:.1f} |"
        )
        print(rows[-1])
    return rows


def measure_deep_chains(
    spark,
    chain_cliques=(1, 4, 8, 16),
    n_chains: int = 200,
    k: int = 5,
) -> list[str]:
    """Deliberately DEEP graphs (VERDICT r10 item 7): chains of k-cliques
    bridged end-to-end, so the diameter is ~2*L instead of the dedup
    quasi-clique's ~2 — this measures the round-count sensitivity that
    the xN table cannot (its diameter is flat by construction).  Rounds
    for min-label propagation = the min-id vertex's eccentricity + 1
    confirmation round, so the L rungs directly price max_iterations."""
    import time as _time

    from bigdatastructure_a5_spark.operators.components import (
        connected_components,
        connected_components_star,
    )

    rows = []
    for L in chain_cliques:
        edges = []
        for c in range(n_chains):
            base = c * 1_000_000
            for i in range(L):
                ids = [base + i * 100 + j for j in range(k)]
                edges.extend(
                    (ids[a], ids[b])
                    for a in range(k)
                    for b in range(a + 1, k)
                )
                if i:
                    edges.append((base + (i - 1) * 100 + (k - 1), ids[0]))
        df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
        n_vertices = n_chains * L * k
        rounds: list = []
        t0 = _time.perf_counter()
        comp = connected_components(df, max_iterations=200, rounds=rounds)
        n_clusters = comp.select("comp").distinct().count()
        t_cc = _time.perf_counter() - t0
        comp.unpersist()
        assert n_clusters == n_chains, (L, n_clusters)
        srounds: list = []
        t0 = _time.perf_counter()
        scomp = connected_components_star(df, rounds=srounds)
        s_clusters = scomp.select("comp").distinct().count()
        t_star = _time.perf_counter() - t0
        scomp.unpersist()
        assert s_clusters == n_chains, (L, s_clusters)
        diameter = 2 * L - 1 if L > 1 else 1
        rows.append(
            f"| chain of {L} cliques (k={k}) x {n_chains} | "
            f"{n_vertices:,} | {len(edges):,} | ~{diameter} | "
            f"{rounds[0]} | {t_cc:.1f} | {srounds[0]} | {t_star:.1f} |"
        )
        print(rows[-1])
    return rows


def main() -> None:
    from bigdatastructure_a5_spark.session import get_spark

    copy_points = (
        tuple(int(a) for a in sys.argv[1:])
        if len(sys.argv) > 1
        else (1, 10, 30)
    )
    spark = get_spark("components-scale")
    spark.sparkContext.setLogLevel("ERROR")
    rows = measure(spark, copy_points)
    deep_rows = measure_deep_chains(spark)
    section = "\n".join(
        [
            SECTION,
            "",
            "`tools/components_scale.py`: minhash near-dup pairs on the",
            "xN documents fixture, clustered by",
            "`operators/components.connected_components` (min-label",
            "propagation, localCheckpoint-bounded plans).  The xN",
            "construction is a purpose-built stress: every base doc",
            "becomes an N-way exact-duplicate group and base near-dup",
            "links replicate across copies, so vertices grow Nx, the",
            "pair list grows ~N² within groups (the §9 output-bound",
            "property of the pair family), and the KEPT set stays",
            "exactly the x1 kept set.  'kept' = docs - (clustered -",
            "clusters): the corpus that survives one-representative-per-",
            "cluster dedup.",
            "",
            "| corpus | docs | pairs | clustered docs | clusters | "
            "kept docs | rounds | pairs secs | CC secs |",
            "| --- | --- | --- | --- | --- | --- | --- | --- | --- |",
            *rows,
            "",
            "Reading: the KEPT set is flat at the x1 value on every",
            "rung — copies merge into their base component or their",
            "own copy-clique, never creating new survivors — exactly",
            "the dedup a trainer wants under duplication growth (the",
            "cluster count matches it from x10 up; at x1 unclustered",
            "singletons aren't vertices).  CC wall tracks the EDGE",
            "count (each",
            "propagation round is one equi-join over the symmetrized",
            "pairs), which here grows ~N² because the truth itself is",
            "quadratic — on a corpus whose true duplication is bounded",
            "(fixed clique sizes, linearly more cliques) both the pair",
            "list and CC are linear, the §4/§5 measurement.  Round",
            "count (MEASURED per rung, fixpoint + confirmation) stays",
            "at the quasi-clique diameter at every rung — wider",
            "cliques, not longer paths — which is the",
            "premise for choosing diameter-bounded propagation over",
            "star-contraction in the first place.",
            "",
            "**Round-count sensitivity on deliberately DEEP graphs**",
            "(`measure_deep_chains`): chains of 5-cliques bridged",
            "end-to-end — diameter ~2L where the dedup quasi-clique's",
            "is ~2 — so the round count (and max_iterations guidance)",
            "is a measured number, not an assumption inherited from the",
            "quasi-clique claim:",
            "",
            "| graph | vertices | edges | diameter | label rounds | "
            "label secs | star rounds | star secs |",
            "| --- | --- | --- | --- | --- | --- | --- | --- |",
            *deep_rows,
            "",
            "Reading: min-label rounds track the min-id vertex's",
            "eccentricity (+1 confirmation) — linear in chain depth,",
            "flat in chain COUNT (200 parallel chains converge",
            "simultaneously; each round is one equi-join regardless of",
            "how many chains it advances).  The alternating",
            "star-contraction path (`connected_components_star`,",
            "Kiveris et al. 2014) converges logarithmically in depth —",
            "the measured escape hatch when the guard trips — at ~2",
            "joins + an exact exceptAll fixpoint probe per round, so",
            "min-label stays the right default for diameter-2-4 dedup",
            "graphs.  Guidance from the data: the default",
            "max_iterations=25 covers diameter <= ~24 (every dedup",
            "graph by a wide margin, and chains up to ~8 cliques);",
            "deeper or unknown topologies switch to star contraction.",
        ]
    )
    path = REPO / "EXPERIMENTS.md"
    text = path.read_text()
    tail = ""
    if SECTION in text:
        head, rest = text.split(SECTION, 1)
        head = head.rstrip() + "\n"
        nxt = rest.find("\n## ")
        if nxt != -1:
            tail = rest[nxt:].lstrip("\n")
    else:
        head = text.rstrip() + "\n"
    path.write_text(head + "\n" + section + "\n" + (("\n" + tail) if tail else ""))
    print(f"updated {path}")


if __name__ == "__main__":
    main()
