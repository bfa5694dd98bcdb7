"""Rewrite fixture parquet files with multiple row groups (verdict r12
item 8): the generator wrote every table as ONE row group, so a Spark
scan is one task regardless of split configs — every local
scan-parallelism decision (and the 8-vs-32-core sweep) was measuring a
fixture artifact, not a realistic layout. A 100 TB ingest arrives as
many files/row groups; this makes the local fixture splittable the same
way, with byte-identical content.

Content safety: each table is read with pyarrow, rewritten with a
row_group_size that yields ~GROUPS_TARGET groups (minimum MIN_ROWS rows
per group so tiny dims stay single-group), read back, and asserted
EQUAL (schema + all columns, order preserved) before the original is
replaced. The original is kept as <table>.parquet.bak until the swap
verifies, then removed.

Usage: python tools/regroup_fixtures.py [sf_dir ...]
       (default: /root/testdata/sf0.1)
"""

from __future__ import annotations

import math
import os
import sys

import pyarrow.parquet as pq

GROUPS_TARGET = 32
MIN_ROWS = 512


def regroup(path: str) -> str:
    f = pq.ParquetFile(path)
    n = f.metadata.num_rows
    groups = min(GROUPS_TARGET, max(1, n // MIN_ROWS))
    if groups <= 1:
        return f"skip (rows={n})"
    if f.num_row_groups >= groups:
        return f"already {f.num_row_groups} groups"
    table = pq.read_table(path)
    row_group_size = math.ceil(n / groups)
    tmp = path + ".regroup.tmp"
    pq.write_table(table, tmp, row_group_size=row_group_size,
                   compression="snappy")
    back = pq.read_table(tmp)
    if not back.equals(table):
        os.remove(tmp)
        raise AssertionError(f"{path}: rewritten content differs — aborted")
    bak = path + ".bak"
    os.replace(path, bak)
    os.replace(tmp, path)
    os.remove(bak)
    got = pq.ParquetFile(path)
    return f"{n} rows -> {got.num_row_groups} groups ({row_group_size}/group)"


def main() -> int:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    for d in dirs:
        for name in sorted(os.listdir(d)):
            if not name.endswith(".parquet"):
                continue
            path = os.path.join(d, name)
            print(f"{path}: {regroup(path)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
