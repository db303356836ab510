"""Generate committed markdown API docs by introspection.

The reference ships prebuilt Sphinx autodoc HTML (/root/reference/docs/
build/html/, sources at docs/source/minimagen.rst:1-50). Sphinx is not
installable in this image, so this generator produces the equivalent
autodoc surface — every public module, class (with ctor signature and
public methods), and function, each with its signature and docstring — as
markdown under docs/api/, which IS committed.

Usage:  JAX_PLATFORMS=cpu python docs/gen_api_docs.py [outdir]
Regenerate after changing public APIs; tests/test_docs.py checks the
committed output is fresh enough to trust.
"""
from __future__ import annotations

import importlib
import inspect
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MODULES = [
    # core model / math
    "minimagen_tpu.models.imagen",
    "minimagen_tpu.models.unet",
    "minimagen_tpu.models.layers",
    "minimagen_tpu.models.t5",
    "minimagen_tpu.ops.diffusion",
    "minimagen_tpu.ops.attention",
    "minimagen_tpu.ops.flash_attention",
    "minimagen_tpu.ops.group_norm",
    "minimagen_tpu.ops.stem_conv",
    "minimagen_tpu.ops.helpers",
    "minimagen_tpu.ops.resize",
    "minimagen_tpu.ops.resize_right",
    # data / harness / persistence
    "minimagen_tpu.data.dataset",
    "minimagen_tpu.data.collate",
    "minimagen_tpu.data.cache",
    "minimagen_tpu.data.native",
    "minimagen_tpu.training",
    "minimagen_tpu.generate",
    # parallelism
    "minimagen_tpu.parallel.mesh",
    "minimagen_tpu.parallel.cascade",
    "minimagen_tpu.parallel.pipeline",
    "minimagen_tpu.parallel.multihost",
    # utilities / tools
    "minimagen_tpu.utils.profiling",
    "minimagen_tpu.utils.progress",
    "minimagen_tpu.utils.platform",
    "minimagen_tpu.tools.torch_import",
    # reference import-path shims
    "minimagen_tpu.Imagen",
    "minimagen_tpu.Unet",
    "minimagen_tpu.t5",
    "minimagen_tpu.diffusion_model",
    "minimagen_tpu.helpers",
    "minimagen_tpu.layers",
]


def _signature(obj) -> str:
    try:
        sig = str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"
    # default-value reprs like `<_Sentinel object at 0x7f...>` embed memory
    # addresses, which would churn the committed docs on every regeneration
    return re.sub(r" at 0x[0-9a-fA-F]+", " at 0x...", sig)


def _doc(obj) -> str:
    return inspect.getdoc(obj) or ""


def _is_local(obj, module) -> bool:
    return getattr(obj, "__module__", None) == module.__name__


def _document_class(cls, lines) -> None:
    lines.append(f"### class `{cls.__name__}{_signature(cls)}`\n")
    doc = _doc(cls)
    if doc:
        lines.append(doc + "\n")
    for name, member in sorted(vars(cls).items()):
        if name.startswith("_") and name != "__call__":
            continue
        if isinstance(member, property):
            lines.append(f"- **property `{name}`** — {(_doc(member).splitlines() or [''])[0]}")
        elif inspect.isfunction(member):
            lines.append(f"#### `{cls.__name__}.{name}{_signature(member)}`\n")
            mdoc = _doc(member)
            if mdoc:
                lines.append(mdoc + "\n")
    lines.append("")


def document_module(modname: str) -> str:
    module = importlib.import_module(modname)
    lines = [f"# `{modname}`\n"]
    mdoc = _doc(module)
    if mdoc:
        lines.append(mdoc + "\n")

    classes = [(n, o) for n, o in sorted(vars(module).items())
               if inspect.isclass(o) and _is_local(o, module) and not n.startswith("_")]
    functions = [(n, o) for n, o in sorted(vars(module).items())
                 if inspect.isfunction(o) and _is_local(o, module) and not n.startswith("_")]
    constants = [(n, o) for n, o in sorted(vars(module).items())
                 if n.isupper() and isinstance(o, (int, float, str, dict, tuple, list))]
    reexports = [n for n, o in sorted(vars(module).items())
                 if (inspect.isclass(o) or inspect.isfunction(o))
                 and not _is_local(o, module) and not n.startswith("_")
                 and getattr(o, "__module__", "").startswith("minimagen_tpu")]

    if constants:
        lines.append("## Constants\n")
        for n, o in constants:
            rep = repr(o)
            if len(rep) > 100:
                rep = rep[:97] + "..."
            lines.append(f"- `{n} = {rep}`")
        lines.append("")
    if classes:
        lines.append("## Classes\n")
        for _, cls in classes:
            _document_class(cls, lines)
    if functions:
        lines.append("## Functions\n")
        for name, fn in functions:
            lines.append(f"### `{name}{_signature(fn)}`\n")
            fdoc = _doc(fn)
            if fdoc:
                lines.append(fdoc + "\n")
    if reexports:
        lines.append("## Re-exports\n")
        for n in reexports:
            lines.append(f"- `{n}`")
        lines.append("")
    return "\n".join(lines) + "\n"


_HTML_STYLE = """
body { font-family: -apple-system, 'Segoe UI', Roboto, sans-serif; max-width: 60rem;
       margin: 2rem auto; padding: 0 1rem; color: #1a1a2e; line-height: 1.55; }
code, pre { font-family: 'SF Mono', Consolas, monospace; background: #f4f4f8;
            border-radius: 4px; }
code { padding: .1em .3em; font-size: .92em; }
pre { padding: .8em 1em; overflow-x: auto; }
h1 { border-bottom: 2px solid #e0e0ea; padding-bottom: .3em; }
h3 { margin-top: 1.6em; } h4 { margin-left: 1em; color: #33334d; }
a { color: #2a5db0; text-decoration: none; } a:hover { text-decoration: underline; }
nav { font-size: .9em; margin-bottom: 1.5em; }
""".strip()


def _esc(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _inline_html(s: str) -> str:
    """Escape, then render `code` spans and [text](href) links."""
    import re
    out, i = [], 0
    for m in re.finditer(r"`([^`]+)`|\[([^\]]+)\]\(([^)]+)\)", s):
        out.append(_esc(s[i:m.start()]))
        if m.group(1) is not None:
            out.append(f"<code>{_esc(m.group(1))}</code>")
        else:
            href = m.group(3).replace(".md", ".html")
            out.append(f'<a href="{_esc(href)}">{_inline_html(m.group(2))}</a>')
        i = m.end()
    out.append(_esc(s[i:]))
    return "".join(out)


def md_to_html(md: str, title: str, nav: str = "") -> str:
    """Minimal markdown -> HTML for the autodoc subset this generator emits
    (headings, lists, fenced/indented code, paragraphs). No dependencies —
    sphinx cannot build in this image, but the reference ships built HTML
    (/root/reference/docs/build/html/), so we ship built HTML too."""
    body, para, in_code, in_list = [], [], False, False

    def flush_para():
        if para:
            body.append(f"<p>{_inline_html(' '.join(para))}</p>")
            para.clear()

    def close_list():
        nonlocal in_list
        if in_list:
            body.append("</ul>")
            in_list = False

    for line in md.splitlines():
        if line.startswith("```"):
            flush_para(); close_list()
            body.append("<pre>" if not in_code else "</pre>")
            in_code = not in_code
            continue
        if in_code:
            body.append(_esc(line))
            continue
        if line.startswith("#"):
            flush_para(); close_list()
            level = len(line) - len(line.lstrip("#"))
            body.append(f"<h{level}>{_inline_html(line[level:].strip())}</h{level}>")
        elif line.startswith("- "):
            flush_para()
            if not in_list:
                body.append("<ul>")
                in_list = True
            body.append(f"<li>{_inline_html(line[2:])}</li>")
        elif line.startswith("    ") and not para and not in_list:
            body.append(f"<pre>{_esc(line[4:])}</pre>")
        elif not line.strip():
            flush_para(); close_list()
        else:
            para.append(line.strip())
    flush_para(); close_list()
    return ("<!DOCTYPE html><html><head><meta charset='utf-8'>"
            f"<title>{_esc(title)}</title><style>{_HTML_STYLE}</style></head>"
            f"<body>{nav}" + "\n".join(body) + "</body></html>\n")


def generate(outdir: str, html_dir: str = None) -> list:
    os.makedirs(outdir, exist_ok=True)
    if html_dir:
        os.makedirs(html_dir, exist_ok=True)
    written = []
    index = ["# minimagen_tpu API reference\n",
             "Generated by `docs/gen_api_docs.py` (autodoc-equivalent of the "
             "reference's Sphinx HTML, which cannot build in this image; a "
             "built-HTML mirror is committed under `docs/build/html/`).\n"]
    nav = "<nav><a href='index.html'>&larr; module index</a></nav>"
    for modname in MODULES:
        fname = modname.replace(".", "_") + ".md"
        text = document_module(modname)
        with open(os.path.join(outdir, fname), "w") as f:
            f.write(text)
        if html_dir:
            with open(os.path.join(html_dir, fname[:-3] + ".html"), "w") as f:
                f.write(md_to_html(text, modname, nav))
        first = next((l for l in text.splitlines()[1:] if l.strip()), "")
        index.append(f"- [`{modname}`]({fname}) — {first.strip()[:100]}")
        written.append(fname)
    index_md = "\n".join(index) + "\n"
    with open(os.path.join(outdir, "README.md"), "w") as f:
        f.write(index_md)
    if html_dir:
        with open(os.path.join(html_dir, "index.html"), "w") as f:
            f.write(md_to_html(index_md, "minimagen_tpu API reference"))
    return written


if __name__ == "__main__":
    here = os.path.dirname(os.path.abspath(__file__))
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(here, "api")
    html = sys.argv[2] if len(sys.argv) > 2 else os.path.join(here, "build", "html")
    files = generate(out, html)
    print(f"wrote {len(files)} module docs + README.md to {out} (html: {html})")
