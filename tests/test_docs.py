"""API docs generator coverage: the committed docs/api/ must exist and stay
in sync with the generator's module list (the autodoc-equivalent of the
reference's prebuilt Sphinx HTML, /root/reference/docs/build/html/)."""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "docs"))


def test_generator_produces_all_module_docs(tmp_path):
    import gen_api_docs

    files = gen_api_docs.generate(str(tmp_path))
    assert len(files) == len(gen_api_docs.MODULES)
    for f in files:
        text = (tmp_path / f).read_text()
        assert text.startswith("# `minimagen_tpu")
        assert len(text) > 100, f"{f} is suspiciously empty"
    index = (tmp_path / "README.md").read_text()
    for f in files:
        assert f in index


def test_committed_api_docs_cover_generator_modules():
    import gen_api_docs

    api_dir = os.path.join(REPO, "docs", "api")
    assert os.path.isdir(api_dir), "docs/api is a committed artifact — regenerate it"
    committed = set(os.listdir(api_dir))
    expected = {m.replace(".", "_") + ".md" for m in gen_api_docs.MODULES}
    missing = expected - committed
    assert not missing, f"regenerate docs: missing {missing}"
    assert "README.md" in committed

    # key public symbols are documented
    imagen_doc = open(os.path.join(api_dir, "minimagen_tpu_models_imagen.md")).read()
    for sym in ["Imagen.sample", "Imagen.forward", "Imagen.load_state_dict"]:
        assert sym in imagen_doc
    train_doc = open(os.path.join(api_dir, "minimagen_tpu_training.md")).read()
    for sym in ["MinimagenTrain", "get_minimagen_parser", "load_restart_training_parameters"]:
        assert sym in train_doc


def test_generator_emits_html(tmp_path):
    """The HTML mirror (reference ships docs/build/html/) renders every
    module page plus an index, with escaped content and working nav."""
    import gen_api_docs

    html = tmp_path / "html"
    gen_api_docs.generate(str(tmp_path / "md"), str(html))
    pages = {p for p in os.listdir(html)}
    assert "index.html" in pages
    assert len(pages) == len(gen_api_docs.MODULES) + 1
    idx = (html / "index.html").read_text()
    for m in gen_api_docs.MODULES:
        assert m.replace(".", "_") + ".html" in idx
    page = (html / "minimagen_tpu_models_imagen.html").read_text()
    assert "<h1>" in page and "Imagen" in page
    assert "<script" not in page  # static, no escaping holes for tags


def test_committed_html_docs_exist():
    html_dir = os.path.join(REPO, "docs", "build", "html")
    assert os.path.isdir(html_dir), "docs/build/html is committed — regenerate"
    import gen_api_docs

    committed = set(os.listdir(html_dir))
    expected = {m.replace(".", "_") + ".html" for m in gen_api_docs.MODULES}
    assert not (expected - committed), f"regenerate html docs: {expected - committed}"
    assert "index.html" in committed
