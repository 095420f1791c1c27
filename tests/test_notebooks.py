"""Execute the example notebooks headlessly (the reference's notebooks are
its regression anchors, SURVEY.md section 4.5 -- ours must at least run)."""

import json
import os

import pytest

nbformat = pytest.importorskip("nbformat")
nbclient = pytest.importorskip("nbclient")

ROOT = os.path.join(os.path.dirname(__file__), "..")


@pytest.mark.slow
@pytest.mark.parametrize("name", ["amed_diffusers_plugin.ipynb",
                                  "quickstart.ipynb",
                                  "sfd_latent_training.ipynb"])
def test_notebook_executes(name):
    path = os.path.join(ROOT, "examples", name)
    nb = nbformat.read(path, as_version=4)
    client = nbclient.NotebookClient(nb, timeout=900, kernel_name="python3")
    client.execute()  # raises CellExecutionError on any failing cell
