"""The envelope table generator (tools/gen_perf_table.py)."""

import json
import os

from tools.gen_perf_table import BEGIN, END, main, render

POINTS = [
    {"kind": "train", "bucket": 48, "batch": 8, "mode": "fused",
     "frames_per_sec": 9000.0},
    {"kind": "train", "bucket": 48, "batch": 8, "mode": "block",
     "frames_per_sec": 8800.0},
    {"kind": "train", "bucket": 48, "batch": 16, "mode": "fused",
     "error": "OOM"},
    {"kind": "rollout", "batch": 8, "bucket": 187,
     "actions_per_sec": 13144.0},
    {"kind": "rollout", "batch": 8, "bucket": 187, "weights": "w8",
     "actions_per_sec": 15984.0},
]


def test_render_table_cells():
    table = render(POINTS)
    assert "| 48 | 9,000 | 8,800 | OOM | — |" in table
    # weights column defaults to bf16 for pre-w8 sweep files
    assert "| 8 | bf16 | 13,144 |" in table
    assert "| 8 | w8 | 15,984 |" in table


def test_main_inserts_and_replaces_marked_block(tmp_path):
    sweep = tmp_path / "sweep.json"
    sweep.write_text(json.dumps(POINTS))
    perf = tmp_path / "PERF.md"
    perf.write_text("# Perf\n\nprose stays\n")

    main([str(sweep), str(perf)])
    doc1 = perf.read_text()
    assert BEGIN in doc1 and END in doc1 and "prose stays" in doc1

    # Re-running replaces the block in place (idempotent).
    main([str(sweep), str(perf)])
    doc2 = perf.read_text()
    assert doc2.count(BEGIN) == 1 and doc2 == doc1
