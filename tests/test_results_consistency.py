"""Committed quality claims must match committed artifacts.

VERDICT round 2 (Weak #2) flagged a results/README.md claim that its own
committed summary.json contradicted; later in round 3 a VM restart produced
the inverse failure (README headline committed, backing artifacts lost
uncommitted). This test closes the loop mechanically:

  results/README.md embeds each headline table verbatim between
      <!-- TABLE <dir> -->
      ...
      <!-- /TABLE -->
  markers, collect_artifacts.py writes results/<dir>/TABLE.md rendered by
  eval.report.summary_table_md from summary.json, and this test asserts

      README block == TABLE.md == summary_table_md(summary.json)

so a headline can only be committed together with the artifact it cites.
Directories without markers (historical sections with hand-written tables)
are not checked — only claims that opt into the mechanism.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

import pytest

from minipig_gan_tpu.eval.report import summary_table_md

RESULTS = Path(__file__).resolve().parents[1] / "results"
README = RESULTS / "README.md"

_BLOCK = re.compile(
    r"<!-- TABLE (?P<dir>[\w./-]+) -->\n(?P<body>.*?)<!-- /TABLE -->",
    re.DOTALL,
)


def _blocks():
    if not README.exists():
        return []
    return [(m.group("dir"), m.group("body")) for m in
            _BLOCK.finditer(README.read_text())]


def test_readme_has_at_least_one_guarded_table():
    assert _blocks(), (
        "results/README.md has no <!-- TABLE dir --> guarded headline; the "
        "headline quality claim must embed its generated TABLE.md")


@pytest.mark.parametrize("dirname,body", _blocks() or [("missing", "")])
def test_readme_table_matches_artifact(dirname, body):
    if dirname == "missing":
        pytest.skip("no guarded blocks (covered by the presence test)")
    art_dir = RESULTS / dirname
    table = art_dir / "TABLE.md"
    summary = art_dir / "summary.json"
    assert table.exists(), f"{table} missing for README block '{dirname}'"
    assert summary.exists(), f"{summary} missing for README block '{dirname}'"
    rendered = summary_table_md(json.loads(summary.read_text()))
    assert table.read_text() == rendered, (
        f"{table} is stale: does not match summary_table_md(summary.json)")
    assert body.strip() == rendered.strip(), (
        f"results/README.md block '{dirname}' does not match {table}; "
        "re-paste the generated TABLE.md verbatim")
