"""Unit tests for scripts/shuffle_audit.py's status-API parsing.

The audit's conclusions (SHUFFLE.md) hinge on two parsing decisions that
Spark's REST API makes easy to get silently wrong:

- SQL-node size metrics render either as a bare value ('10.3 MiB') or,
  for multi-task scans, as a two-line 'total (min, med, max (stageId:
  taskId))' header followed by the totals line — the parser must take
  the TOTAL, not choke on (or mis-sum) the distribution.
- Scan volume must come from the SQL scan nodes, not stage inputBytes:
  on Spark 4 + local files the vectorized parquet reader's column reads
  bypass Hadoop FS statistics (a full 11 MB lineitem scan reports ~17 KB
  of footer bytes). That fact is exercised end-to-end by the audit run
  itself; here we pin the pure parsing layer so a metric-format change
  in a Spark upgrade fails loudly.
"""

from __future__ import annotations

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_audit():
    path = os.path.join(REPO, "scripts", "shuffle_audit.py")
    spec = importlib.util.spec_from_file_location("shuffle_audit", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("shuffle_audit", mod)
    spec.loader.exec_module(mod)
    return mod


AUDIT = _load_audit()


def test_parse_size_bare_value():
    assert AUDIT._parse_size("10.3 MiB") == int(10.3 * (1 << 20))
    assert AUDIT._parse_size("842 B") == 842
    assert AUDIT._parse_size("  1.5 KiB ") == 1536


def test_parse_size_distribution_takes_total():
    text = (
        "total (min, med, max (stageId: taskId))\n"
        "13.2 MiB (4.4 MiB, 4.4 MiB, 4.4 MiB (stage 4.0: task 7))"
    )
    assert AUDIT._parse_size(text) == int(13.2 * (1 << 20))


def test_scan_bytes_sums_only_new_scan_nodes():
    execs = [
        {  # already-seen execution: must be excluded
            "id": 1,
            "nodes": [
                {
                    "nodeName": "Scan parquet",
                    "metrics": [{"name": "size of files read", "value": "1.0 GiB"}],
                }
            ],
        },
        {  # new execution: one scan node counted, non-scan node ignored
            "id": 2,
            "nodes": [
                {
                    "nodeName": "Scan parquet ",
                    "metrics": [
                        {"name": "number of files read", "value": "3"},
                        {"name": "size of files read", "value": "2.0 MiB"},
                    ],
                },
                {
                    "nodeName": "HashAggregate",
                    "metrics": [{"name": "size of files read", "value": "9.9 GiB"}],
                },
                {
                    "nodeName": "Scan parquet",
                    "metrics": [{"name": "size of files read", "value": "512 KiB"}],
                },
            ],
        },
    ]
    assert AUDIT._scan_bytes(execs, seen={1}) == 2 * (1 << 20) + 512 * (1 << 10)
