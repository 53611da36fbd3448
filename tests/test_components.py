"""Connected-component clustering (operators/components.py): fixpoint
correctness vs a union-find reference and a DuckDB recursive-CTE twin,
the pair-rule divergence case, and the composition over real minhash
pairs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdatastructure_a5_spark.operators.components import (
    cluster_dedup,
    connected_components,
    connected_components_star,
)

SF_SMALL = "/root/testdata/sf0.001"


def _union_find(edges):
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


def _spark_cc(spark, edges):
    df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    comp = connected_components(df)
    out = {r.id: r.comp for r in comp.collect()}
    comp.unpersist()
    return out


def test_components_match_union_find(spark):
    """Chains, cliques, singleton pairs, and a long path in one graph —
    labels equal the union-find's min-root everywhere."""
    edges = [
        (1, 2), (2, 3),                      # chain
        (10, 11), (11, 12), (10, 12),        # triangle
        (20, 21),                            # pair
        (30, 31), (31, 32), (32, 33), (33, 34), (34, 35),  # path, diam 5
        (40, 41), (41, 40),                  # duplicate edge both ways
    ]
    assert _spark_cc(spark, edges) == _union_find(edges)


def test_reliable_checkpoint_mode_matches_local(spark, tmp_path):
    """``checkpoint_dir`` switches the per-round lineage truncation from
    executor-local blocks to reliable ``.checkpoint()`` on a shared
    path (the production mode: a lost executor recomputes instead of
    killing the job — VERDICT r10 item 5).  Labels must be identical
    under both modes, and the reliable run must actually write
    checkpoint data under the given dir."""
    import os

    edges = [
        (1, 2), (2, 3),
        (10, 11), (11, 12), (10, 12),
        (30, 31), (31, 32), (32, 33), (33, 34), (34, 35),
    ]
    df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    local = {r.id: r.comp for r in connected_components(df).collect()}
    ckpt = str(tmp_path / "cc_ckpt")
    reliable = {
        r.id: r.comp
        for r in connected_components(df, checkpoint_dir=ckpt).collect()
    }
    assert reliable == local == _union_find(edges)
    wrote = any(files for _, _, files in os.walk(ckpt))
    assert wrote, "reliable mode must write checkpoint blocks to the dir"


def test_components_match_duckdb_recursive_cte(spark):
    """Cross-engine: the min label per component equals DuckDB's
    transitive closure (WITH RECURSIVE reachability + MIN) on the same
    edge list."""
    import duckdb

    edges = [(i, (i * 7) % 23) for i in range(23) if i != (i * 7) % 23] + [
        (100, 101),
        (102, 101),
    ]
    got = _spark_cc(spark, edges)
    con = duckdb.connect()
    con.execute("CREATE TABLE e (a BIGINT, b BIGINT)")
    con.executemany("INSERT INTO e VALUES (?, ?)", edges)
    want = {
        r[0]: r[1]
        for r in con.sql(
            """
            WITH RECURSIVE sym AS (
              SELECT a, b FROM e UNION SELECT b, a FROM e
            ),
            reach(a, b) AS (
              SELECT a, a FROM (SELECT a FROM sym UNION SELECT b FROM sym)
              UNION
              SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
            )
            SELECT a AS id, MIN(b) AS comp FROM reach GROUP BY a
            """
        ).fetchall()
    }
    assert got == want and len(got) > 0


def test_cluster_dedup_beats_pair_rule_on_nontransitive_pairs(spark):
    """THE divergence case: pairs {(a,c), (b,c)} — the pair-drop rule
    ('drop id_b of every pair') keeps a AND b; transitive clustering
    keeps only the cluster min a.  This is why production dedup
    clusters."""
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in (1, 2, 3, 9)], "doc_id bigint, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 3), (2, 3)], "id_a bigint, id_b bigint"
    )
    # pair rule: drop {3} -> keeps 1, 2, 9
    pair_rule_kept = {
        r.doc_id
        for r in docs.join(
            pairs.select(F.col("id_b").alias("doc_id")).distinct(),
            "doc_id",
            "left_anti",
        ).collect()
    }
    assert pair_rule_kept == {1, 2, 9}
    tracked: list = []
    kept = {
        r.doc_id
        for r in cluster_dedup(docs, pairs, tracker=tracked).collect()
    }
    for df in tracked:
        df.unpersist()
    assert kept == {1, 9}  # one representative for {1,2,3}; 9 untouched


def test_diameter_guard_raises(spark):
    """A path longer than max_iterations hits the guard loudly instead
    of returning a wrong (unconverged) labeling."""
    edges = [(i, i + 1) for i in range(8)]
    df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    with pytest.raises(RuntimeError, match="fixpoint"):
        connected_components(df, max_iterations=2)


def test_cluster_dedup_over_real_minhash_pairs(spark):
    """Composition over the real dedup stage: minhash near-dup pairs on
    the fixture documents -> clusters -> kept set.  Invariants: kept ==
    docs - (clustered vertices - one representative per cluster), every
    cluster representative is its cluster's min id, and the kept set is
    a subset of the pair-rule's (transitive closure can only drop
    MORE)."""
    from bigdatastructure_a5_spark.catalog import load_table
    from bigdatastructure_a5_spark.operators.dedup import (
        near_duplicates_minhash,
    )

    docs = load_table(spark, SF_SMALL, "documents")
    pairs = near_duplicates_minhash(docs, "doc_id", "text", threshold=0.8)
    edge_rows = [(r.id_a, r.id_b) for r in pairs.collect()]
    assert edge_rows, "fixture should contain near-duplicates"
    comp = connected_components(
        spark.createDataFrame(edge_rows, "id_a bigint, id_b bigint")
    )
    got = {r.id: r.comp for r in comp.collect()}
    comp.unpersist()
    assert got == _union_find(edge_rows)
    tracked: list = []
    kept = {
        r.doc_id
        for r in cluster_dedup(
            docs,
            spark.createDataFrame(edge_rows, "id_a bigint, id_b bigint"),
            tracker=tracked,
        )
        .select("doc_id")
        .collect()
    }
    for df in tracked:
        df.unpersist()
    n_docs = docs.count()
    clustered = set(got)
    n_clusters = len(set(got.values()))
    assert len(kept) == n_docs - (len(clustered) - n_clusters)
    pair_rule_kept_n = n_docs - len({b for _, b in edge_rows})
    assert len(kept) <= pair_rule_kept_n


def test_star_contraction_matches_label_propagation(spark):
    """The Kiveris alternating star-contraction path produces IDENTICAL
    labels to min-label propagation on every graph shape — chains,
    cliques, stars, self-loops, duplicate edges — including vertices
    that appear only as a self-loop (labeled with themselves)."""
    import random

    from bigdatastructure_a5_spark.operators.components import (
        connected_components_star,
    )

    shaped = [
        (1, 2), (2, 3),                       # chain
        (10, 11), (11, 12), (10, 12),         # triangle
        (20, 21),                             # pair
        (30, 31), (31, 32), (32, 33), (33, 34), (34, 35),  # path
        (40, 41), (41, 40),                   # duplicate both ways
        (50, 50),                             # self-loop-only vertex
        (60, 61), (60, 62), (60, 63),         # star centered high... (min 60)
        (99, 70),                             # reversed order pair
    ]
    rng = random.Random(7)
    rand = [
        (rng.randrange(200, 260), rng.randrange(200, 260))
        for _ in range(60)
    ]
    for edges in (shaped, rand):
        df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
        label = {r.id: r.comp for r in connected_components(df).collect()}
        star = {
            r.id: r.comp
            for r in connected_components_star(df).collect()
        }
        assert star == label and len(star) > 0


def test_star_contraction_beats_propagation_on_deep_chains(spark):
    """The measured escape hatch for the max_iterations guard: a chain
    of 16 bridged 5-cliques (diameter ~31) needs 32 min-label rounds
    (EXPERIMENTS §18) but converges in far fewer alternating star
    rounds — and min-label at its default cap of 25 rounds RAISES on
    this graph while star succeeds."""
    import pytest

    from bigdatastructure_a5_spark.operators.components import (
        connected_components_star,
    )

    edges = []
    for c in range(3):  # 3 chains keep the job small but multi-component
        base = c * 1_000_000
        for i in range(16):
            ids = [base + i * 100 + j for j in range(5)]
            edges.extend(
                (ids[a], ids[b]) for a in range(5) for b in range(a + 1, 5)
            )
            if i:
                edges.append((base + (i - 1) * 100 + 4, ids[0]))
    df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    with pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components(df)  # default max_iterations=25 < 32 needed
    rounds: list = []
    star = {
        r.id: r.comp
        for r in connected_components_star(df, rounds=rounds).collect()
    }
    assert star == _union_find(edges)
    assert {v for v in star.values()} == {0, 1_000_000, 2_000_000}
    assert rounds[0] <= 8, f"star took {rounds[0]} rounds on diameter ~31"


def test_cluster_dedup_star_algorithm_matches_label(spark):
    """cluster_dedup(algorithm='star') keeps the identical set as the
    default label-propagation path, and an unknown algorithm raises."""
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in (1, 2, 3, 9)], "doc_id bigint, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 3), (2, 3)], "id_a bigint, id_b bigint"
    )
    kept_label = {
        r.doc_id for r in cluster_dedup(docs, pairs).collect()
    }
    kept_star = {
        r.doc_id
        for r in cluster_dedup(docs, pairs, algorithm="star").collect()
    }
    assert kept_star == kept_label == {1, 9}
    with pytest.raises(ValueError, match="unknown algorithm"):
        cluster_dedup(docs, pairs, algorithm="bogus")


def test_checkpoint_dir_is_scoped_not_global(spark, tmp_path):
    """connected_components(checkpoint_dir=...) must restore the
    SparkContext's previous checkpoint dir on exit — setCheckpointDir is
    context-GLOBAL, and leaving it pointed at one job's dir silently
    redirects every other job's reliable checkpoints."""
    prev_dir = str(tmp_path / "prev_ckpt")
    spark.sparkContext.setCheckpointDir(prev_dir)
    edges = [(1, 2), (2, 3), (10, 11)]
    df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    cc_dir = str(tmp_path / "cc_ckpt")
    got = {
        r.id: r.comp
        for r in connected_components(df, checkpoint_dir=cc_dir).collect()
    }
    assert got == _union_find(edges)
    # setCheckpointDir appends a fresh UUID subdir per call, so assert
    # the restored dir lives back under the PREVIOUS tree, not the CC's
    current = spark.sparkContext._jsc.sc().getCheckpointDir()
    assert current.isDefined()
    assert "prev_ckpt" in current.get()
    assert "cc_ckpt" not in current.get()


def _current_ckpt_dir(spark):
    opt = spark.sparkContext._jsc.sc().getCheckpointDir()
    return opt.get() if opt.isDefined() else None


def _clear_ckpt_dir(spark):
    setter = getattr(spark.sparkContext._jsc.sc(), "checkpointDir_$eq")
    setter(spark.sparkContext._jvm.scala.Option.apply(None))


def test_checkpoint_scope_restores_unset_and_survives_errors(spark, tmp_path):
    """ADVICE r11 low, both halves: (1) when no checkpoint dir was set
    before the run, the scope restores UNSET (not the CC run's dir);
    (2) an analysis error on malformed input must not leak the run's
    dir either — the scope is entered as a real `with` block after the
    input projections are built."""
    import pytest
    from pyspark.errors import AnalysisException

    _clear_ckpt_dir(spark)
    edges = [(1, 2), (2, 3), (10, 11)]
    df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")

    cc_dir = str(tmp_path / "cc_unset")
    got = {
        r.id: r.comp
        for r in connected_components(df, checkpoint_dir=cc_dir).collect()
    }
    assert got == _union_find(edges)
    assert _current_ckpt_dir(spark) is None

    # error path: missing src column raises at analysis, before any
    # setCheckpointDir call can leak
    with pytest.raises(AnalysisException):
        connected_components(
            df.select(F.col("id_a").alias("x"), "id_b"),
            checkpoint_dir=str(tmp_path / "cc_err"),
        )
    assert _current_ckpt_dir(spark) is None

    # star variant: same contract
    got_star = {
        r.id: r.comp
        for r in connected_components_star(
            df, checkpoint_dir=str(tmp_path / "cc_unset_star")
        ).collect()
    }
    assert got_star == _union_find(edges)
    assert _current_ckpt_dir(spark) is None


def test_reliable_checkpoint_through_hadoop_fs_uri(spark, tmp_path):
    """VERDICT r11 item 7: the reliable-checkpoint mode exercised through
    a scheme-qualified file:// URI — the same Hadoop FileSystem
    resolution path an hdfs:// or s3a:// production dir takes (local
    bare paths short-circuit through the driver's POSIX view; a URI
    must round-trip the FileSystem.get(uri, conf) machinery the state
    stores already use).  Labels identical to local mode for BOTH
    iterative algorithms, and checkpoint blocks land under the URI's
    local target."""
    import os

    _clear_ckpt_dir(spark)
    edges = [(1, 2), (2, 3), (4, 5), (5, 6), (6, 7), (100, 101)]
    df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    want = _union_find(edges)

    target = tmp_path / "uri_ckpt"
    uri = "file://" + str(target)
    got = {
        r.id: r.comp
        for r in connected_components(df, checkpoint_dir=uri).collect()
    }
    assert got == want
    wrote = any(files for _, _, files in os.walk(str(target)))
    assert wrote, "URI-mode checkpoints must land under the file:// target"
    assert _current_ckpt_dir(spark) is None

    target2 = tmp_path / "uri_ckpt_star"
    got_star = {
        r.id: r.comp
        for r in connected_components_star(
            df, checkpoint_dir="file://" + str(target2)
        ).collect()
    }
    assert got_star == want
    assert any(files for _, _, files in os.walk(str(target2)))
