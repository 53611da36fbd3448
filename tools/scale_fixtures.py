"""Synthetic x10 fixture builder for the full-registry scale gate.

VERDICT r4 item 4: the oracle gate must run one scale up for EVERY query
family, not only the dedup/ANN experiments.  This tool materializes a x10
copy of a driver fixture directory as plain parquet with the SAME table
names, so `tools/check_correctness.py x10` can point both Spark and the
DuckDB oracle at identical scaled inputs — the comparison machinery is
unchanged, only the data grows.

Construction (key-consistent replication):
- region/nation stay single-copy: they are true dimensions whose keys are
  never shifted, exactly like a 100 TB warehouse where dims stay small.
- Every other table is replicated 10x with copy c shifting its OWN keys and
  its FOREIGN keys into scaled tables by c * OFFSET (customer/supplier/part/
  orders/lineitem/events/documents/embeddings) — referential integrity
  holds within each copy, so joins really do 10x their matches.
- documents keep their text verbatim: copies are EXACT duplicates, which is
  deliberate stress for the dedup family (each doc gains >= 9 near-dups).
- embeddings rotate the vector by c positions per copy (norm-preserving):
  identical vectors would create cosine TIES that no fixture scale has,
  turning a determinism question into a data artifact; rotation keeps the
  corpus spread while both engines still read the same parquet.

The scaled directory is content-addressed by the base dir's file sizes +
mtimes and cached under /tmp, so repeat gate runs skip the build.
"""

from __future__ import annotations

import hashlib
import os
import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

#: Key shift per copy — far above any fixture key domain, well inside int64.
OFFSET = 1_000_000_000

#: Tables replicated 10x -> the key columns shifted by copy * OFFSET.
#: region/nation are intentionally absent (single-copy dimensions).
SHIFT_COLS: dict[str, tuple[str, ...]] = {
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}

DIM_TABLES = ("region", "nation")


def _fingerprint(base_dir: str) -> str:
    h = hashlib.md5()
    # the GENERATOR is part of the cache key: editing OFFSET/SHIFT_COLS/the
    # rotation (or anything else in this file) must invalidate cached
    # fixtures, or the scale gate would silently run against data built by
    # the old construction
    h.update(Path(__file__).read_bytes())
    for name in sorted(os.listdir(base_dir)):
        if not name.endswith(".parquet"):
            continue
        st = os.stat(os.path.join(base_dir, name))
        h.update(f"{name}:{st.st_size}:{st.st_mtime_ns}".encode())
    return h.hexdigest()[:12]


def _rotate_lists(col: pa.ChunkedArray, k: int) -> pa.Array:
    """Rotate each list element left by k (pure python — fixture-sized).

    Rotation alone has period len(v): at copies > dim the wrapped copy
    would be an EXACT duplicate of copy 0 — precisely the artifact the
    rotation exists to avoid (an identical pair puts cosine on the 1.0
    rounding boundary, where engines may differ by an ulp; seen as a
    x100 sim_*_topk hash mismatch on copy 64 of a 64-dim corpus).  Each
    completed wrap therefore negates the vector (norm- and
    orthogonality-preserving), extending the distinct-copy period to
    2*len(v)."""
    out = []
    for chunk in col.chunks:
        for v in chunk.to_pylist():
            if not v:
                out.append(v)
                continue
            r = v[k % len(v):] + v[: k % len(v)]
            if (k // len(v)) % 2:
                r = [-x for x in r]
            out.append(r)
    return pa.array(out, type=col.type)


#: Stale generations younger than this are left alone (ADVICE r7): a
#: concurrently running gate from an older checkout may still be reading
#: its fixture — unconditional rmtree would delete it mid-read and fail
#: that run confusingly.  Reuse touches the _COMPLETE marker, so "recent"
#: means "recently built OR recently picked up by a run"; a full pooled
#: gate finishes in well under this window.
_EVICT_MIN_AGE_SECS = 2 * 3600


def _evict_stale(copies: int, base_name: str, live_tag: str) -> None:
    """Drop cached builds of this (copies, base) whose construction hash no
    longer matches HEAD (VERDICT r6 item 8): a stale generation left on
    disk could otherwise be picked up by a hand-typed path and silently
    validate against an old construction.  Generations touched within
    _EVICT_MIN_AGE_SECS are skipped (possibly in use by a concurrent run);
    evictions are logged."""
    import re
    import shutil
    import time

    pat = re.compile(rf"^bds_x{copies}_{re.escape(base_name)}_[0-9a-f]{{12}}$")
    now = time.time()
    for p in Path("/tmp").glob(f"bds_x{copies}_{base_name}_*"):
        if not pat.match(p.name) or p.name.endswith(live_tag):
            continue
        try:
            marker_mtime = (p / "_COMPLETE").stat().st_mtime
        except OSError:  # no marker: half-built leftover, dir mtime decides
            marker_mtime = p.stat().st_mtime if p.exists() else 0.0
        if now - marker_mtime < _EVICT_MIN_AGE_SECS:
            print(f"scale_fixtures: stale generation {p.name} is recent "
                  "(possibly in use) — skipping eviction", file=sys.stderr)
            continue
        print(f"scale_fixtures: evicting stale generation {p.name}",
              file=sys.stderr)
        shutil.rmtree(p, ignore_errors=True)


def ensure_x10(base_dir: str, copies: int = 10) -> str:
    """Build (or reuse) the x10 directory for ``base_dir``; returns its path."""
    tag = _fingerprint(base_dir)
    _evict_stale(copies, Path(base_dir).name, tag)
    final_dir = Path(f"/tmp/bds_x{copies}_{Path(base_dir).name}_{tag}")
    marker = final_dir / "_COMPLETE"
    if marker.exists():
        # freshen the marker: reuse counts as "in use" for the eviction
        # age guard, so a long chain of gate runs on an old checkout keeps
        # its generation alive while it is actively read
        os.utime(marker)
        return str(final_dir)
    # build into a process-private staging dir, then atomically rename:
    # two concurrent gate runs can both build, but neither ever reads a
    # half-written table (the loser of the rename race just reuses the
    # winner's directory)
    import tempfile

    out_dir = Path(
        tempfile.mkdtemp(prefix=f"{final_dir.name}_build_", dir="/tmp")
    )

    for t in DIM_TABLES:
        src = Path(base_dir) / f"{t}.parquet"
        if src.exists():
            pq.write_table(pq.read_table(src), out_dir / f"{t}.parquet")

    for t, keys in SHIFT_COLS.items():
        src = Path(base_dir) / f"{t}.parquet"
        if not src.exists():
            continue
        base = pq.read_table(src)
        parts = []
        for c in range(copies):
            tbl = base
            for k in keys:
                i = tbl.schema.get_field_index(k)
                shifted = pc.add(tbl.column(k), pa.scalar(c * OFFSET))
                tbl = tbl.set_column(i, tbl.schema.field(i), shifted)
            if t == "embeddings" and c > 0:
                i = tbl.schema.get_field_index("embedding")
                tbl = tbl.set_column(
                    i,
                    tbl.schema.field(i),
                    _rotate_lists(tbl.column("embedding"), c),
                )
            parts.append(tbl)
        pq.write_table(pa.concat_tables(parts), out_dir / f"{t}.parquet")

    (out_dir / "_COMPLETE").write_text("ok\n")
    import shutil

    try:
        os.rename(out_dir, final_dir)
    except OSError:
        if marker.exists():
            # another process won the race with an identical build; use theirs
            shutil.rmtree(out_dir, ignore_errors=True)
        else:
            # a stale half-built final_dir (crashed run, no marker): replace
            shutil.rmtree(final_dir, ignore_errors=True)
            try:
                os.rename(out_dir, final_dir)
            except OSError:
                if marker.exists():
                    # lost a second race, winner's build is complete
                    shutil.rmtree(out_dir, ignore_errors=True)
                else:
                    # a REAL rename failure (EXDEV, EACCES, ...): keep the
                    # valid staging build on disk and surface the error —
                    # swallowing it here would return a path that doesn't
                    # exist and fail later with a confusing missing-table
                    raise
    return str(final_dir)


if __name__ == "__main__":
    import sys

    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    print(ensure_x10(base, copies=copies))
