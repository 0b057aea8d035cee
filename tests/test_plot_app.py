"""Plot writer and web-app gating tests."""
import os
import subprocess
import sys

import pandas as pd
import pytest

from guidemaker_tpu.plot import GuideMakerPlot, _single_spec


def _df():
    return pd.DataFrame({
        "Accession": ["acc1"] * 4,
        "Guide start": [10, 50, 100, 200],
        "Feature start": [5, 45, 95, 190],
        "Feature end": [40, 90, 150, 260],
        "locus_tag": ["g1", "g1", "g2", "g2"],
        "PAM": ["AGG", "TGG", "CGG", "GGG"],
    })


def test_single_spec_structure():
    spec = _single_spec(_df())
    assert spec["$schema"].endswith("v5.json")
    assert len(spec["vconcat"]) == 3
    assert spec["vconcat"][0]["transform"][0]["density"] == "Feature start"
    assert spec["vconcat"][1]["params"][0]["select"]["type"] == "interval"
    assert spec["vconcat"][2]["encoding"]["color"]["field"] == "PAM"
    assert len(spec["data"]["values"]) == 4


def test_plot_writes_html_per_accession(tmp_path):
    df = pd.concat([_df(), _df().assign(Accession="acc2")])
    GuideMakerPlot(prettydf=df, outdir=str(tmp_path))
    assert (tmp_path / "acc1.html").exists()
    assert (tmp_path / "acc2.html").exists()
    html = (tmp_path / "acc1.html").read_text()
    assert "vega-embed" in html and "Guide Density" in html


def test_app_gates_cleanly_without_streamlit():
    # importing the app module without streamlit must raise a clear
    # SystemExit, not an opaque ImportError mid-render
    code = ("import importlib.util, sys;"
            "spec = importlib.util.find_spec('streamlit');"
            "sys.exit(0 if spec is not None else 42)")
    have = subprocess.run([sys.executable, "-c", code]).returncode == 0
    if have:
        pytest.skip("streamlit installed; gating not applicable")
    proc = subprocess.run(
        [sys.executable, "-c", "import guidemaker_tpu.app"],
        capture_output=True, text=True,
        env={**os.environ, "PYTHONPATH": os.getcwd()})
    assert proc.returncode == 1
    assert "streamlit" in proc.stderr
