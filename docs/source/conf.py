# Sphinx configuration (autodoc over the minimagen_tpu package — capability
# parity with the reference's docs/ Sphinx site, /root/reference/docs/source/conf.py).
# Build with: sphinx-build -b html docs/source docs/build/html
import os
import sys

sys.path.insert(0, os.path.abspath("../.."))

project = "minimagen_tpu"
author = "minimagen_tpu contributors"
release = "0.1.0"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
]

autodoc_member_order = "bysource"
autodoc_typehints = "description"

html_theme = "alabaster"
exclude_patterns = []
