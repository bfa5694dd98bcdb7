#!/usr/bin/env python
"""Deterministic scale-up of a testdata directory for scaling-slope
benchmarks: ``factor`` disjoint shards of every table, keys shifted per
shard so join cardinalities grow LINEARLY (replicating keys verbatim
would square join outputs and corrupt the slope measurement), and
document text letter-rotated per shard (two composed 10-letter
rotations = 100 distinct transforms, supporting factors up to 100) so
content-dedup queries don't discover an artificial forest of
cross-shard duplicates.

Usage (also importable: ``ensure_scaled(sf_dir, factor)``):

    python tools/make_scale.py /root/testdata/sf0.1 3 [out_dir]
"""

from __future__ import annotations

import os
import shutil
import sys

#: per-table key columns shifted by shard * _OFFSET — every foreign key
#: moves with its referenced key, so shard i only ever joins shard i.
_KEYS = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey", "n_regionkey"],
    "supplier": ["s_suppkey", "s_nationkey"],
    "customer": ["c_custkey", "c_nationkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

#: larger than any key in sf<=10 testdata, far under int64 range × shards
_OFFSET = 100_000_000

_ROT_SRC = "etaoinsrhl"
#: second rotation alphabet (disjoint from _ROT_SRC) engaged at shard
#: index >= 10: a single 10-letter rotation has only 10 distinct
#: transforms, so at factor > 10 shards i and i+10 would carry IDENTICAL
#: text — an artificial forest of cross-shard near-dup pairs that grows
#: with factor² and corrupts exactly the dedup slopes this tool exists
#: to measure. Composing two independent rotations gives 100 distinct
#: transforms (shards 0-9 keep their historical single-rotation text, so
#: cached x3/x10 copies stay byte-identical).
_ROT_SRC2 = "dcumfpgwyb"


def _rot(i: int) -> str:
    k = i % len(_ROT_SRC)
    return _ROT_SRC[k:] + _ROT_SRC[:k]


def _rot2(i: int) -> str:
    k = (i // len(_ROT_SRC)) % len(_ROT_SRC2)
    return _ROT_SRC2[k:] + _ROT_SRC2[:k]


#: text-transform scheme fingerprint, written into _OK so a cache built
#: by an OLDER transform is detected and rebuilt instead of silently
#: reused with the wrong text distribution
_TRANSFORM_SCHEME = "rot2t6e"


def _ok_stamp(sf_dir: str, factor: int) -> str:
    return f"{sf_dir} x{factor} {_TRANSFORM_SCHEME}"


def part_tag(i: int) -> str:
    """Shard i's p_name suffix. Any two distinct tags are at Levenshtein
    distance >= 3 (each repeated digit pair differs in >= 1 of its 2
    characters, three repetitions) — strictly outside the k=2 fuzzy-join
    radius, so same-name cross-shard copies never pair
    (property-verified over all shard pairs in tests/test_make_scale.py)."""
    return f" {i:02d}" * 3


def shard_transform(s, table: str, i: int):
    """The per-shard content transform for shard i of `table` (identity
    for shard 0 and for tables without one). Factored out of
    ensure_scaled so the three anti-near-dup-forest transforms are unit-
    testable: documents letter-rotation (distinct text per shard),
    embeddings orthogonal shift+sign (within-shard cosines EXACT,
    cross-shard twins scrambled), part name tags (within-shard edit
    distances EXACT, cross-shard same-name distance >= 3 > k)."""
    from pyspark.sql import functions as F

    if i <= 0:
        return s
    if table == "documents":
        s = s.withColumn("text", F.translate("text", _ROT_SRC, _rot(i)))
        if i >= len(_ROT_SRC):
            s = s.withColumn("text", F.translate("text", _ROT_SRC2, _rot2(i)))
    if table == "embeddings":
        # ORTHOGONAL per-shard vector transform: circular shift
        # by i (mod dim) composed, for shards >= 64, with a
        # deterministic ±1 sign pattern. Verbatim per-shard
        # vector copies would plant C(factor,2) cosine-1.0
        # twins per vector — the embedding sibling of the
        # documents/part near-dup forests, and one no bucketing
        # can subdivide (identical vectors collide in every LSH
        # bucket by design). Both component transforms are
        # orthogonal, so every WITHIN-shard cosine (planted
        # clones, natural pairs, cluster structure) is
        # preserved exactly while cross-shard similarities
        # scramble; norms are untouched.
        s = s.withColumn(
            "embedding",
            F.expr(
                f"concat(slice(embedding, ({i} % size(embedding)) + 1, "
                f"size(embedding) - ({i} % size(embedding))), "
                f"slice(embedding, 1, {i} % size(embedding)))"
            ),
        )
        # The flip boundary derives from the RUNTIME dim (shards past
        # one full shift cycle compose the sign flip), not a hardcoded
        # 64: with the boundary pinned at 64 and dim < 64, shards i and
        # i + dim (both < 64) would apply IDENTICAL transforms and
        # silently reintroduce the cross-shard cosine-1.0 twin forest
        # this transform exists to remove. CASE keeps the element type
        # (no cast): flip component d iff bit 16 of d·2654435761 is
        # set, applied iff i >= size(embedding). Distinctness holds up
        # to factor = 2·dim (asserted in ensure_scaled): one shift
        # cycle unflipped, one flipped.
        s = s.withColumn(
            "embedding",
            F.expr(
                f"CASE WHEN {i} >= size(embedding) THEN "
                "transform(embedding, (x, d) -> CASE WHEN "
                "((d * 2654435761) div 65536) % 2 = 1 "
                "THEN -x ELSE x END) ELSE embedding END"
            ),
        )
    if table == "part":
        # suffix a per-shard 6-digit tag: verbatim per-shard name
        # copies would otherwise plant C(factor,2) edit-distance-0
        # pairs per part — an artificial near-dup forest that grows
        # with factor² and corrupts exactly the fuzzy-join slopes
        # this tool measures (the documents-rotation rationale).
        # WITHIN-shard distances are exactly preserved (same suffix
        # cancels — the orthogonal-transform property, string
        # edition), and a suffix keeps every substring/prefix
        # predicate on p_name matching every shard (q9 '%red%',
        # q20 'small%', fn-menu '%steel%'), so the TPC-H row
        # drivers still scale by exactly `factor` — a letter
        # rotation would break them.
        s = s.withColumn("p_name", F.concat(F.col("p_name"), F.lit(part_tag(i))))
    return s


def ensure_scaled(sf_dir: str, factor: int, out_dir: str | None = None) -> str:
    """Build (or reuse) the scaled copy; returns its path. The build is
    atomic (staging dir + rename) so a crashed run never leaves a
    half-written cache that later benchmarks silently time against."""
    base = os.path.basename(os.path.normpath(sf_dir))
    out_dir = out_dir or os.path.join(
        os.environ.get("SPARK_GRAFT_SCALE_CACHE", "/tmp"),
        f"mesin_scale_{base}_x{factor}",
    )
    if factor > len(_ROT_SRC) * len(_ROT_SRC2):
        raise ValueError(
            f"ensure_scaled: factor {factor} exceeds the {len(_ROT_SRC) * len(_ROT_SRC2)} "
            "distinct text transforms — shards would repeat document text and "
            "fake cross-shard near-dup pairs"
        )
    ok_path = os.path.join(out_dir, "_OK")
    if os.path.isdir(out_dir) and os.path.exists(ok_path):
        with open(ok_path) as f:
            stamp = f.read().strip()
        if stamp == _ok_stamp(sf_dir, factor):
            return out_dir
        # stale transform scheme: rebuild (a factor>10 cache built by the
        # single-rotation code reproduces exactly the fake cross-shard
        # near-dup forest the rot2 scheme removes)
        shutil.rmtree(out_dir, ignore_errors=True)
    from pyspark.sql import functions as F

    from mesin_spark.session import get_session
    from mesin_spark.sources import read_parquet

    spark = get_session("mesin_scale")
    staging = out_dir + ".staging"
    shutil.rmtree(staging, ignore_errors=True)
    os.makedirs(staging)
    for table, keys in _KEYS.items():
        src = os.path.join(sf_dir, f"{table}.parquet")
        if not os.path.exists(src):
            continue
        df = read_parquet(spark, src)
        if table == "embeddings":
            # sibling of the text-rotation guard above: shift(i % dim)
            # + the one i >= dim sign flip give exactly 2·dim distinct
            # orthogonal transforms — past that, shards i and i − 2·dim
            # would repeat a transform and plant cross-shard cosine-1.0
            # twins (the forest shard_transform exists to remove)
            head = df.select(F.size("embedding").alias("d")).head()
            dim = head["d"] if head is not None else factor
            if factor > 2 * dim:
                raise ValueError(
                    f"ensure_scaled: factor {factor} exceeds the 2*dim="
                    f"{2 * dim} distinct embedding transforms — shards "
                    "would repeat vectors and fake cross-shard near-dup "
                    "pairs"
                )
        shards = []
        for i in range(factor):
            s = df
            for k in keys:
                s = s.withColumn(k, F.col(k) + F.lit(i * _OFFSET))
            s = shard_transform(s, table, i)
            shards.append(s)
        out = shards[0]
        for s in shards[1:]:
            out = out.unionByName(s)
        out.write.mode("overwrite").parquet(os.path.join(staging, f"{table}.parquet"))
    with open(os.path.join(staging, "_OK"), "w") as f:
        f.write(_ok_stamp(sf_dir, factor))
    shutil.rmtree(out_dir, ignore_errors=True)
    os.rename(staging, out_dir)
    return out_dir


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    out = sys.argv[3] if len(sys.argv) > 3 else None
    print(ensure_scaled(sf_dir, factor, out))
