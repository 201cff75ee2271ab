"""Build the static HTML documentation site.

The reference ships a Sphinx autosummary build
(``/root/reference/docs/api.rst``, ``conf.py``); this is the repo's
equivalent presentation layer on top of its markdown docs: every
``docs/*.md`` page plus the README and the examples/benchmarks guides
render to a styled static site in ``docs/_build/``, and an **API
reference** page is generated from the live package — every public
symbol (the same ``__all__`` surface ``scripts/api_doc_gate.py``
gates) with its signature and docstring, grouped by module.

No network, no sphinx: python-markdown (+ fenced code / tables) only.

Usage: ``python scripts/build_docs.py`` (or ``make docs``);
open ``docs/_build/index.html``.
"""

import html
import importlib
import inspect
import os
import shutil
import sys

import markdown

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "docs", "_build")
sys.path.insert(0, REPO)

PAGES = [
    ("index.html", "README.md", "Overview"),
    ("docs_index.html", "docs/index.md", "Documentation"),
    ("design.html", "docs/design.md", "Design"),
    ("api_guide.html", "docs/api.md", "API guide"),
    ("performance.html", "docs/performance.md", "Performance"),
    ("migration.html", "docs/migration.md", "Migration"),
    ("slow_gates.html", "docs/slow_gate_log.md", "Slow-gate log"),
    ("examples.html", "examples/README.md", "Examples"),
    ("benchmarks.html", "benchmarks/README.md", "Benchmarks"),
]

CSS = """
body { font-family: -apple-system, 'Segoe UI', Roboto, sans-serif;
  max-width: 960px; margin: 0 auto; padding: 24px; color: #1f2328;
  line-height: 1.55; }
nav { border-bottom: 1px solid #d0d7de; padding-bottom: 8px;
  margin-bottom: 24px; }
nav a { margin-right: 14px; text-decoration: none; color: #0969da;
  font-size: 14px; }
nav a.current { font-weight: 700; color: #1f2328; }
pre { background: #f6f8fa; border-radius: 6px; padding: 12px;
  overflow-x: auto; font-size: 13px; }
code { background: #f6f8fa; border-radius: 4px; padding: 1px 4px;
  font-size: 0.92em; }
pre code { background: none; padding: 0; }
table { border-collapse: collapse; display: block; overflow-x: auto; }
th, td { border: 1px solid #d0d7de; padding: 5px 10px; font-size: 14px; }
th { background: #f6f8fa; }
h1, h2, h3 { border-bottom: 1px solid #eaecef; padding-bottom: 4px; }
.api-mod { margin-top: 28px; }
.api-sym { margin: 14px 0 14px 12px; }
.api-sig { font-family: ui-monospace, Menlo, monospace; font-size: 13px;
  background: #f6f8fa; border-radius: 6px; padding: 6px 10px; }
.api-doc { margin: 6px 0 0 8px; white-space: pre-wrap;
  font-size: 13.5px; color: #3f4750; }
"""


def nav_html(current):
    links = []
    for fname, _, title in PAGES + [("api.html", None, "API reference")]:
        cls = " class='current'" if fname == current else ""
        links.append("<a href='{}'{}>{}</a>".format(fname, cls, title))
    return "<nav>" + "".join(links) + "</nav>"


def render_page(fname, title, body_html):
    return ("<!doctype html><html><head><meta charset='utf-8'>"
            "<title>{} — safe_learning_tpu</title><style>{}</style>"
            "</head><body>{}{}</body></html>".format(
                html.escape(title), CSS, nav_html(fname), body_html))


def build_markdown_pages():
    md = markdown.Markdown(extensions=["fenced_code", "tables",
                                       "toc", "codehilite"],
                           extension_configs={
                               "codehilite": {"guess_lang": False,
                                              "noclasses": True}})
    for fname, src, title in PAGES:
        path = os.path.join(REPO, src)
        if not os.path.exists(path):
            continue
        with open(path) as f:
            text = f.read()
        body = md.reset().convert(text)
        # Cross-link the markdown sources this site also renders.
        for other_fname, other_src, _ in PAGES:
            base = os.path.basename(other_src)
            body = body.replace('href="{}"'.format(other_src),
                                'href="{}"'.format(other_fname))
            body = body.replace('href="{}"'.format(base),
                                'href="{}"'.format(other_fname))
        with open(os.path.join(OUT, fname), "w") as f:
            f.write(render_page(fname, title, body))


def api_entries():
    """(module, [(name, signature, doc)]) for the public surface."""
    import safe_learning_tpu as sl

    modules = ["safe_learning_tpu", "safe_learning_tpu.utils",
               "safe_learning_tpu.analysis", "safe_learning_tpu.plotting",
               "safe_learning_tpu.checkpoints", "safe_learning_tpu.oracle",
               "safe_learning_tpu.errorbounds",
               "safe_learning_tpu.profiling",
               "safe_learning_tpu.ops.extended_verify",
               "safe_learning_tpu.parallel.mesh",
               "safe_learning_tpu.parallel.distributed"]
    out = []
    for mod_name in modules:
        mod = importlib.import_module(mod_name)
        names = sorted(getattr(mod, "__all__", []))
        entries = []
        for name in names:
            obj = getattr(mod, name, None)
            if obj is None:
                continue
            try:
                sig = name + str(inspect.signature(obj))
            except (TypeError, ValueError):
                sig = name
            doc = inspect.getdoc(obj) or ""
            entries.append((name, sig, doc))
        if entries:
            out.append((mod_name, inspect.getdoc(mod) or "", entries))
    return out


def build_api_page():
    parts = ["<h1>API reference</h1>",
             "<p>Generated from the live package (every symbol in the "
             "public <code>__all__</code> surface; the same inventory "
             "<code>scripts/api_doc_gate.py</code> keeps in sync with "
             "the prose docs).</p>"]
    for mod_name, mod_doc, entries in api_entries():
        parts.append("<div class='api-mod'><h2><code>{}</code></h2>"
                     .format(html.escape(mod_name)))
        first_line = mod_doc.strip().splitlines()[0] if mod_doc else ""
        parts.append("<p>{}</p>".format(html.escape(first_line)))
        for name, sig, doc in entries:
            parts.append(
                "<div class='api-sym'><div class='api-sig'>{}</div>"
                "<div class='api-doc'>{}</div></div>".format(
                    html.escape(sig), html.escape(doc)))
        parts.append("</div>")
    with open(os.path.join(OUT, "api.html"), "w") as f:
        f.write(render_page("api.html", "API reference",
                            "".join(parts)))


def main():
    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(OUT, exist_ok=True)
    build_markdown_pages()
    build_api_page()
    n = len(os.listdir(OUT))
    print("built {} pages into {}".format(n, os.path.relpath(OUT, REPO)))


if __name__ == "__main__":
    main()
