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


def test_app_imports_without_streamlit():
    """The app module imports cleanly (streamlit is lazy, main-only)."""
    import guidemaker_tpu.app as app
    assert callable(app.main)
    args = app.build_cli_args(workdir="/tmp/x", logfile="/tmp/x.log",
                              genbank=["g.gbk"], restriction_enzymes=["NGRT"],
                              scoring=True)
    assert "--genbank" in args and "--cfd_score" in args
    assert args[args.index("--restriction_enzyme_list") + 1] == "NGRT"
    f = app.build_cli_args(workdir="/tmp/x", logfile="/tmp/x.log",
                           fasta=["a.fa"], gff=["a.gff"], scoring=False)
    assert "--fasta" in f and "--gff" in f and "--cfd_score" not in f


class _Expander:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


class FakeStreamlit:
    """Headless streamlit stand-in: widgets return their defaults, the
    SUBMIT button fires once, every render call is recorded."""

    def __init__(self):
        self.calls = []
        self.sidebar = self
        self._buttons = {"SUBMIT": True}

    # widgets -----------------------------------------------------------
    def file_uploader(self, label, **kw):
        return []

    def selectbox(self, label, options, **kw):
        return options[0]

    def text_input(self, label, value="", **kw):
        return value

    def number_input(self, label, mn, mx, value=None, **kw):
        return value if value is not None else mn

    def checkbox(self, label, value=False, **kw):
        return value

    def button(self, label, **kw):
        return self._buttons.get(label, False)

    def expander(self, *a, **kw):
        return _Expander()

    # render calls ------------------------------------------------------
    def _record(self, kind):
        def f(*a, **kw):
            self.calls.append((kind, a[0] if a else None))
        return f

    def __getattr__(self, name):
        # markdown, info, error, subheader, dataframe, vega_lite_chart, ...
        return self._record(name)


def test_app_headless_smoke(tmp_path, monkeypatch):
    """Drive main() end-to-end on the bundled Carsonella demo genome:
    the app must run the CLI, render charts + tables + download links,
    and show the parameter dictionary and protocol pages."""
    import guidemaker_tpu.app as app
    monkeypatch.chdir(tmp_path)
    fake = FakeStreamlit()
    fake._buttons["SUBMIT"] = True
    app.main(st=fake)
    kinds = [k for k, _ in fake.calls]
    assert "vega_lite_chart" in kinds, "per-accession chart not rendered"
    assert "dataframe" in kinds, "targets table not rendered"
    assert "error" not in kinds, [c for c in fake.calls if c[0] == "error"]
    blobs = " ".join(str(v) for _, v in fake.calls)
    assert "download=" in blobs and "targets.csv.gz" in blobs
    assert "Parameter" in blobs or "PAM motif" in blobs
