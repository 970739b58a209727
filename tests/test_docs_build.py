"""The HTML doc builder renders every page of the markdown book.

Parity: the reference ships built Sphinx HTML docs
(/root/reference/docs/index.html); ours builds from markdown via
docs/build_html.py.
"""
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "docs"))


def test_build_html(tmp_path):
    pytest.importorskip("markdown")
    import build_html

    out = build_html.build(str(tmp_path))
    pages = sorted(f for f in os.listdir(out) if f.endswith(".html"))
    assert len(pages) == len(build_html.PAGES)
    index = open(os.path.join(out, "index.html"), encoding="utf-8").read()
    # nav present on every page, tables render, cross-links are relinked
    assert index.count("<a href=") >= len(build_html.PAGES)
    results = open(os.path.join(out, "results.html"), encoding="utf-8").read()
    assert "<table>" in results
    assert 'href="RESULTS.md"' not in index
