"""Build the static HTML documentation site from the repo's markdown book.

Parity target: the reference ships built Sphinx HTML docs
(/root/reference/docs/index.html, source/{index,results}.rst + code/ +
tutorials/).  This repo's documentation is markdown-first (README, docs/,
PARITY, RESULTS, BASELINE); this script renders the whole set into
``docs/html/`` with a shared nav sidebar so the framework ships browsable
HTML docs like the reference does.

Usage::

    python docs/build_html.py          # writes docs/html/*.html

Stdlib + the ``markdown`` package only (no sphinx in the image).
"""
from __future__ import annotations

import os
import re

import markdown

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (source path relative to repo root, output name, nav title)
PAGES = [
    ("README.md", "index", "Overview"),
    ("docs/architecture.md", "architecture", "Architecture"),
    ("docs/datasets.md", "datasets", "Datasets"),
    ("docs/api.md", "api", "API reference"),
    ("docs/performance.md", "performance", "Performance"),
    ("docs/extending.md", "extending", "Extending"),
    ("PARITY.md", "parity", "Reference parity map"),
    ("RESULTS.md", "results", "Results"),
    ("BASELINE.md", "baseline", "Reference baselines"),
]

CSS = """
body { margin: 0; font: 15px/1.55 -apple-system, 'Segoe UI', Roboto,
       sans-serif; color: #1a1f27; }
.layout { display: flex; min-height: 100vh; }
nav { width: 230px; flex: none; background: #10243a; color: #cfd8e3;
      padding: 1.2rem 0; }
nav h1 { font-size: 0.95rem; padding: 0 1rem 0.6rem; color: #fff;
         border-bottom: 1px solid #23466b; }
nav a { display: block; padding: 0.32rem 1rem; color: #cfd8e3;
        text-decoration: none; font-size: 0.9rem; }
nav a:hover { background: #1b3a5c; color: #fff; }
nav a.current { background: #2166ac; color: #fff; }
main { flex: 1; max-width: 60rem; padding: 1.6rem 2.4rem 4rem; }
main h1, main h2, main h3 { line-height: 1.25; }
main h1 { border-bottom: 2px solid #e3e8ee; padding-bottom: 0.3rem; }
main h2 { border-bottom: 1px solid #e9edf2; padding-bottom: 0.2rem;
          margin-top: 2rem; }
pre { background: #f5f7fa; border: 1px solid #e3e8ee; border-radius: 6px;
      padding: 0.7rem 0.9rem; overflow-x: auto; font-size: 0.85rem; }
code { background: #f5f7fa; padding: 0.08rem 0.3rem; border-radius: 4px;
       font-size: 0.88em; }
pre code { background: none; padding: 0; }
table { border-collapse: collapse; margin: 0.8rem 0; font-size: 0.88rem; }
th, td { border: 1px solid #d7dee6; padding: 0.3rem 0.55rem;
         text-align: left; vertical-align: top; }
th { background: #eef2f6; }
a { color: #2166ac; }
"""

TEMPLATE = """<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>{title} — multimodal-vae-comparison-tpu</title>
<style>{css}</style>
</head>
<body>
<div class="layout">
<nav>
<h1>multimodal-vae-comparison-tpu</h1>
{nav}
</nav>
<main>
{body}
</main>
</div>
</body>
</html>
"""


def _relink(html: str) -> str:
    """Point cross-references at the built pages instead of raw markdown."""
    mapping = {src.split("/")[-1]: out + ".html" for src, out, _ in PAGES}
    for md_name, html_name in mapping.items():
        html = html.replace(f'href="{md_name}"', f'href="{html_name}"')
        html = html.replace(f'href="docs/{md_name}"', f'href="{html_name}"')
    return html


def build(out_dir: str | None = None) -> str:
    out_dir = out_dir or os.path.join(REPO, "docs", "html")
    os.makedirs(out_dir, exist_ok=True)
    md = markdown.Markdown(extensions=["tables", "fenced_code", "toc"])
    for src, out, title in PAGES:
        with open(os.path.join(REPO, src), encoding="utf-8") as f:
            text = f.read()
        md.reset()
        body = _relink(md.convert(text))
        nav = "\n".join(
            f'<a href="{o}.html"{" class=\"current\"" if o == out else ""}>'
            f"{t}</a>"
            for _, o, t in PAGES)
        page = TEMPLATE.format(title=title, css=CSS, nav=nav, body=body)
        with open(os.path.join(out_dir, out + ".html"), "w",
                  encoding="utf-8") as f:
            f.write(page)
    return out_dir


if __name__ == "__main__":
    out = build()
    n = len([f for f in os.listdir(out) if f.endswith(".html")])
    print(f"built {n} pages into {out}")
