"""SCALING.md splice robustness (r12).

Three probe scripts co-own SCALING.md: scaling_probe regenerates the
base and preserves fenced blocks, memory_probe replaces a heading-
delimited section, streaming/graph probes replace marker-fenced
blocks. r12 found the interaction bug: memory_probe cut its section at
the next "## " heading, which sits INSIDE the graph block AFTER its
"<!-- GRAPH:BEGIN -->" fence line — the fence was silently dropped,
the next graph splice saw no BEGIN and appended a duplicate block, and
the duplicate's stray END would then scramble every later first-END
splice. These tests pin the fixed behaviors on synthetic files; no
Spark session involved.
"""

import importlib.util
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name: str):
    path = os.path.join(REPO, "scripts", f"{name}.py")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


GRAPH_BLOCK = (
    "<!-- GRAPH:BEGIN (scripts/graph_scaling.py) -->\n\n"
    "## Graph appendix (disjoint-copy tiers)\n\nold graph table\n\n"
    "<!-- GRAPH:END -->"
)


def test_memory_splice_preserves_following_fence(tmp_path, monkeypatch):
    mp = _load("memory_probe")
    path = tmp_path / "SCALING.md"
    path.write_text(
        "# SCALING\n\n## Memory appendix (constrained-budget)\n\n"
        "old memory table\n\n" + GRAPH_BLOCK + "\n"
    )
    monkeypatch.setattr(mp, "REPO", str(tmp_path))
    mp._splice_scaling_md(["## Memory appendix (constrained-budget)",
                           "", "new memory table"])
    text = path.read_text()
    assert "new memory table" in text
    assert "old memory table" not in text
    # the whole point: the graph block's BEGIN fence must survive
    assert text.count("<!-- GRAPH:BEGIN") == 1
    assert text.index("<!-- GRAPH:BEGIN") < text.index("<!-- GRAPH:END")
    assert "old graph table" in text


def test_memory_splice_still_cuts_at_plain_heading(tmp_path, monkeypatch):
    mp = _load("memory_probe")
    path = tmp_path / "SCALING.md"
    path.write_text(
        "# SCALING\n\n## Memory appendix (x)\n\nold memory\n\n"
        "## Unfenced later section\n\nkeep me\n"
    )
    monkeypatch.setattr(mp, "REPO", str(tmp_path))
    mp._splice_scaling_md(["## Memory appendix (x)", "", "new memory"])
    text = path.read_text()
    assert "new memory" in text and "old memory" not in text
    assert "## Unfenced later section" in text and "keep me" in text


@pytest.mark.parametrize("script,attr", [
    ("graph_scaling", "_splice_scaling_md"),
])
def test_graph_splice_ignores_stray_earlier_end(tmp_path, monkeypatch,
                                                script, attr):
    gs = _load(script)
    path = tmp_path / "SCALING.md"
    # orphaned block (BEGIN eaten) with a stray END before the real one
    path.write_text(
        "# SCALING\n\n## Graph appendix (orphan)\n\nstale table\n\n"
        "<!-- GRAPH:END -->\n\n" + GRAPH_BLOCK + "\n"
    )
    monkeypatch.setattr(gs, "REPO", str(tmp_path))
    results = {"triangle_count": {"sf0.1": 1.0, "gx10": 2.0, "gx100": 20.0}}
    getattr(gs, attr)(results)
    text = path.read_text()
    # replaced the REAL block, left everything before it untouched
    assert "old graph table" not in text
    assert "| triangle_count | 1.0 | 2.0 |" in text
    assert text.count("<!-- GRAPH:BEGIN") == 1
    # the stray earlier END is untouched prefix content, not a cut point
    assert "stale table" in text
    s = text.index("<!-- GRAPH:BEGIN")
    assert "<!-- GRAPH:END -->" in text[s:]


def test_streaming_splice_ignores_stray_earlier_end(tmp_path, monkeypatch):
    sp = _load("streaming_probe")
    path = tmp_path / "SCALING.md"
    block = (
        "<!-- STREAMING:BEGIN (scripts/streaming_probe.py) -->\n\n"
        "old stream table\n\n<!-- STREAMING:END -->"
    )
    path.write_text(
        "# SCALING\n\nstray\n<!-- STREAMING:END -->\n\n" + block + "\n"
    )
    monkeypatch.setattr(sp, "REPO", str(tmp_path))
    results = {
        "q": {
            "sf0.01": {
                "n_batches": 1, "peak_state_rows": 1, "final_state_rows": 1,
                "rows_evicted": 0, "peak_state_mb": 0.1,
                "median_trigger_ms": 5, "wall_s": 1.0,
            }
        }
    }
    sp._splice_scaling_md(results, ["sf0.01"])
    text = path.read_text()
    assert "old stream table" not in text
    assert text.count("<!-- STREAMING:BEGIN") == 1
    assert "stray" in text
