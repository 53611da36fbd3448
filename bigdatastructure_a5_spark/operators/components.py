"""Connected components over near-duplicate pairs: pairs -> clusters ->
one kept representative per cluster.

The dedup operators (operators/dedup.py) emit PAIRS; a curation pipeline
needs CLUSTERS.  The two differ exactly when similarity is not observed
transitively: on pairs {(a,c), (b,c)} the pair-drop rule ("drop id_b of
every pair") keeps BOTH a and b even though they share a near-duplicate
c — transitive closure puts all three in one cluster and keeps only its
representative.  Production dedup (the policy behind SlimPajama's and
FineWeb's MinHash stages — public writeups) clusters for this reason.

Algorithm: iterative MIN-LABEL PROPAGATION — every vertex starts
labeled with its own id; each round every vertex takes the min label
across itself and its neighbors; stop when no label changes.  Rounds
needed = the graph diameter.  The scale argument for choosing it over
the O(log n) star-contraction family (Kiveris et al., "Connected
Components in MapReduce and Beyond" — the standard citation for big CC)
is the SHAPE of dedup graphs: near-duplicate clusters are tiny
quasi-cliques (banded LSH links most members pairwise), so the diameter
is 2-4 and propagation converges in as many rounds of one equi-join +
one min-aggregation each — all shuffles on the vertex key, no
driver-side graph state (the only collect is the per-round convergence
COUNT).  A pathological long-chain graph would need diameter rounds;
``max_iterations`` guards it, and ``connected_components_star``
implements the Kiveris alternating star contraction as the measured
escape hatch (EXPERIMENTS §18: log-depth rounds on deliberately deep
chains, same labels everywhere).

Per-round label frames are ``localCheckpoint(eager=True)``-ed, not
merely persisted: persistence caches DATA but keeps the logical plan,
and an iterative self-join's plan nests exponentially with the round
count — measured here as a driver ``OutOfMemoryError`` inside plan
STRINGIFICATION (AQE's explain string) at ~10 rounds on a 23-vertex
test graph.  Local checkpointing truncates the lineage to the
materialized blocks each round, which is how every iterative-on-Spark
system (GraphX/GraphFrames included) bounds plan growth; the trade —
checkpoint blocks are executor-local and a lost executor kills the job
rather than recomputing — is the standard one for short iterative jobs.
For long production runs pass ``checkpoint_dir`` (a shared-filesystem
path): every round then uses RELIABLE ``.checkpoint()`` and survives
executor loss, at the cost of one distributed write per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdatastructure_a5_spark.session import persist_df


class _checkpoint_dir_scope:
    """Scope ``setCheckpointDir`` (a SparkContext-GLOBAL setting): set
    the CC run's dir on entry, restore whatever was there before on
    exit, so a concurrent job's own checkpoint dir is not silently
    redirected.  Retention note: reliable checkpoint files are NOT
    auto-deleted unless ``spark.cleaner.referenceTracking.cleanCheckpoints``
    is on — a maintenance window should clear old run subdirs, and the
    returned labels frame's own blocks must outlive their consumers."""

    def __init__(self, spark, checkpoint_dir: str | None):
        self.spark = spark
        self.dir = checkpoint_dir

    def __enter__(self):
        if self.dir is None:
            return self
        jsc = self.spark.sparkContext._jsc.sc()
        prev = jsc.getCheckpointDir()
        self.prev = prev.get() if prev.isDefined() else None
        self.spark.sparkContext.setCheckpointDir(self.dir)
        return self

    def __exit__(self, *exc):
        if self.dir is None:
            return False
        sc = self.spark.sparkContext
        if self.prev is not None:
            sc.setCheckpointDir(self.prev)
        else:
            # restore to UNSET (ADVICE r11 low): leaving this run's dir
            # as the context-global checkpoint dir would silently route a
            # later, unrelated job's checkpoints here.  The Java API has
            # no "clear" call, so go through the Scala setter with None.
            setter = getattr(sc._jsc.sc(), "checkpointDir_$eq")
            setter(sc._jvm.scala.Option.apply(None))
        return False


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 25,
    rounds: list | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(id, component) for every vertex appearing in ``pairs``;
    ``component`` is the MIN vertex id of the connected component —
    deterministic, engine-independent, and directly usable as the
    cluster's kept representative.

    ``pairs`` is undirected input (each edge listed once in either
    direction); isolated vertices don't appear (a doc with no pairs is
    its own kept singleton by construction — no row needed).

    Raises ``RuntimeError`` if the fixpoint is not reached within
    ``max_iterations`` (= the graph diameter exceeded it): near-dup
    graphs converge in a handful of rounds, so hitting the guard means
    the input is not a dedup graph — raise the cap for long-chain
    graphs, or pre-contract with star steps.  Measured (EXPERIMENTS
    §18 deep-chain table): rounds = min-id eccentricity + 1 — a chain
    of L bridged 5-cliques takes exactly 2L rounds (2/8/16/32 for
    L=1/4/8/16), so the default cap of 25 covers diameter <= ~24;
    dedup quasi-cliques converge in 2 at every measured scale.

    ``rounds``, if given, receives the number of propagation rounds run
    to the fixpoint (including the final no-change confirmation round) —
    the diagnostic EXPERIMENTS §18 reports.

    ``checkpoint_dir`` selects the lineage-truncation mode.  ``None``
    (default) uses ``localCheckpoint`` — blocks live on executors, the
    right trade for short local/test runs.  A path (hdfs://, s3a://...)
    switches every round to RELIABLE ``.checkpoint()`` via
    ``setCheckpointDir``: blocks live on the shared filesystem, so a
    lost executor recomputes from the last checkpoint instead of
    killing a long CC job — the production-cluster mode (VERDICT r10
    item 5).  Labels are identical under both modes (pytest-pinned);
    only durability and per-round write cost differ.
    """

    def truncate(df: DataFrame) -> DataFrame:
        if checkpoint_dir is None:
            return df.localCheckpoint(eager=True)
        return df.checkpoint(eager=True)

    # input projections are built BEFORE the scope is entered, and the
    # scope is a real `with` block: an analysis error here (missing
    # src/dst column) or anywhere in the loop can no longer leak this
    # run's dir as the context-global checkpoint dir (ADVICE r11 low)
    e = pairs.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).filter(F.col("a").isNotNull() & F.col("b").isNotNull())
    sym_plan = e.union(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    with _checkpoint_dir_scope(pairs.sparkSession, checkpoint_dir):
        sym = persist_df(sym_plan)
        try:
            labels = truncate(
                sym.select(F.col("a").alias("id"))
                .distinct()
                .withColumn("comp", F.col("id"))
            )
            for it in range(max_iterations):
                nbr_min = (
                    sym.join(
                        labels.select(
                            F.col("id").alias("b"),
                            F.col("comp").alias("bcomp"),
                        ),
                        "b",
                    )
                    .groupBy("a")
                    .agg(F.min("bcomp").alias("nmin"))
                    .select(F.col("a").alias("id"), "nmin")
                )
                # checkpoint (local or reliable — see checkpoint_dir), not
                # persist: truncate the lineage so the next round's plan
                # starts from materialized blocks (module docstring —
                # persisted-only iteration OOMs the driver in plan
                # stringification).  The convergence flag rides along in
                # the SAME projection: a label changes exactly when a
                # neighbor min undercuts it (nmin < comp — NULL nmin
                # means no neighbors contributed, i.e. unchanged), so the
                # fixpoint test is an existence probe over the
                # checkpointed blocks instead of the former
                # labels x new_labels shuffle join + full count — one
                # corpus-sized join per round removed (r14).
                stepped = truncate(
                    labels.join(nbr_min, "id", "left").select(
                        "id",
                        F.least(
                            F.col("comp"), F.coalesce("nmin", F.col("comp"))
                        ).alias("comp"),
                        (F.col("nmin") < F.col("comp")).alias("__changed"),
                    )
                )
                changed = (
                    stepped.filter(F.col("__changed")).limit(1).count()
                )
                labels = stepped.select("id", "comp")
                if changed == 0:
                    if rounds is not None:
                        rounds.append(it + 1)
                    return labels
        finally:
            sym.unpersist()
    raise RuntimeError(
        f"connected_components: no fixpoint within {max_iterations} "
        "rounds — graph diameter exceeds the cap (not a dedup-shaped "
        "graph); raise max_iterations or use connected_components_star "
        "(O(log diameter) alternating star contraction, same output)"
    )


def connected_components_star(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 50,
    rounds: list | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(id, component) via ALTERNATING STAR CONTRACTION (Kiveris et al.
    2014, "Connected Components in MapReduce and Beyond" — the public
    algorithm this module's docstring cites as the long-chain escape):
    same output contract as ``connected_components`` (component = min
    vertex id; isolated vertices absent), but rounds grow
    O(log diameter)-ish instead of O(diameter) — the path for graphs
    that trip min-label propagation's ``max_iterations`` guard.

    One round = large-star then small-star, each a groupBy-min +
    self-join over the edge list:

    - large-star: every neighbor LARGER than u re-attaches to
      m = min(N(u) + {u}) — long tails collapse toward minima in
      doubling steps;
    - small-star: edges directed large->small; every not-larger
      neighbor (and u itself) attaches to m — stars flatten.

    Fixpoint: the edge set stabilizes as (vertex, component-min) stars
    (exact change check — count equality + one empty ``exceptAll``
    set-difference on distinct sets, not a checksum).  Measured
    (EXPERIMENTS §18): chains of 1/4/8/16 bridged cliques converge in
    2/4/5/6 alternating rounds where min-label needs 2/8/16/32.

    Prefer ``connected_components`` for dedup-shaped graphs (diameter
    2-4: one join per round beats two, and its fixpoint needs fewer
    total shuffles there); prefer this for unknown or deliberately
    chained topologies."""
    if max_iterations < 1:
        raise ValueError(f"max_iterations must be >= 1, got {max_iterations}")

    def truncate(df: DataFrame) -> DataFrame:
        if checkpoint_dir is None:
            return df.localCheckpoint(eager=True)
        return df.checkpoint(eager=True)

    scope = _checkpoint_dir_scope(pairs.sparkSession, checkpoint_dir)

    def large_star(e: DataFrame) -> DataFrame:
        sym = e.union(
            e.select(F.col("b").alias("a"), F.col("a").alias("b"))
        ).filter(F.col("a") != F.col("b"))
        mins = sym.groupBy("a").agg(
            F.least(F.min("b"), F.first("a")).alias("m")
        )
        return (
            sym.filter(F.col("b") > F.col("a"))
            .join(mins, "a")
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .distinct()
        )

    def small_star(e: DataFrame) -> DataFrame:
        # direct large -> small: every neighbor here is < u, so
        # m = min(N(u)) is the star target for N(u) + {u}
        d = e.select(
            F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
        ).filter(F.col("a") != F.col("b"))
        mins = d.groupBy("a").agg(F.min("b").alias("m"))
        attach_nbrs = (
            d.join(mins, "a")
            .filter(F.col("b") != F.col("m"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
        )
        attach_self = mins.select("a", F.col("m").alias("b"))
        return attach_nbrs.union(attach_self).distinct()

    e0 = pairs.select(F.col(src).alias("a"), F.col(dst).alias("b")).filter(
        F.col("a").isNotNull() & F.col("b").isNotNull()
    )
    # vertices captured BEFORE the self-loop drop: a vertex appearing
    # only as (x, x) still labels itself, matching connected_components
    with scope:
        verts = truncate(
            e0.select(F.col("a").alias("id"))
            .union(e0.select(F.col("b").alias("id")))
            .distinct()
        )
        e = truncate(e0.filter(F.col("a") != F.col("b")).distinct())
        e_count = e.count()
        for it in range(max_iterations):
            new_e = truncate(small_star(large_star(e)))
            # exact fixpoint test on DISTINCT sets: equal counts + one
            # empty set-difference imply equality — half the shuffle
            # work of a two-directional exceptAll, and the count is
            # cheap on a checkpointed frame
            new_count = new_e.count()
            changed = (
                1
                if new_count != e_count
                else new_e.exceptAll(e).limit(1).count()
            )
            e, e_count = new_e, new_count
            if changed == 0:
                if rounds is not None:
                    rounds.append(it + 1)
                # stars: (vertex, component-min); roots appear only on
                # the right — every vertex gets a row, roots label
                # themselves
                labels = verts.join(
                    e.select(
                        F.col("a").alias("id"), F.col("b").alias("comp")
                    ),
                    "id",
                    "left",
                ).select(
                    "id", F.coalesce("comp", F.col("id")).alias("comp")
                )
                return truncate(labels)
    raise RuntimeError(
        f"connected_components_star: no fixpoint within {max_iterations} "
        "alternating rounds — not expected for any finite graph at this "
        "cap; raise max_iterations"
    )


def cluster_dedup(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
    tracker: list | None = None,
    algorithm: str = "label",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Keep one representative (the min id) per near-duplicate CLUSTER:
    transitive-closure dedup, the policy stricter than the pair-drop
    rule exactly on non-transitive pair sets (module docstring).

    Cost: the CC rounds (diameter-bounded, cluster-key shuffles) + one
    anti-join of the corpus against the non-representative ids — the
    same size-gated anti-join shape as pipeline.curate_documents (the
    drop set is |clustered vertices - clusters|, far smaller than the
    corpus).

    The component labels arrive as the fixpoint's locally-checkpointed
    frame (already materialized — the anti-join reads blocks, not the
    propagation rounds); ``tracker`` still receives it for interface
    symmetry with the other tracked operators (unpersist on a
    checkpointed frame is a harmless no-op; the blocks free with the
    reference).

    ``algorithm``: ``"label"`` (default — min-label propagation, the
    right choice for diameter-2-4 dedup graphs) or ``"star"``
    (``connected_components_star``, for deep/unknown topologies);
    ``checkpoint_dir`` selects reliable per-round checkpointing on
    either (see ``connected_components``)."""
    if algorithm == "label":
        cc = connected_components
    elif algorithm == "star":
        cc = connected_components_star
    else:
        raise ValueError(
            f"unknown algorithm {algorithm!r}: expected 'label' or 'star'"
        )
    comp = cc(pairs, src=src, dst=dst, checkpoint_dir=checkpoint_dir)
    if tracker is not None:
        tracker.append(comp)
    drop = comp.filter(F.col("id") != F.col("comp")).select(
        F.col("id").alias(id_col)
    )
    return docs.join(drop, id_col, "left_anti")
