"""Streamlit web app for GuideMaker-TPU.

Equivalent of the reference's bundled app (``guidemaker/data/app.py``):
sidebar widgets for genome upload + design parameters, runs the CLI in a
subprocess, renders the result tables and plots with download links.

Run with:  streamlit run guidemaker_tpu/app.py
(Streamlit is an optional dependency; the core package never imports this
module.)
"""
from __future__ import annotations

import base64
import os
import shutil
import subprocess
import sys
import uuid

try:
    import streamlit as st
except ImportError as e:  # pragma: no cover - optional dependency
    raise SystemExit(
        "The web app requires streamlit (`pip install streamlit`); the core "
        "guidemaker-tpu CLI and library do not.") from e

import pandas as pd


def run_command(args):
    """Run the guidemaker-tpu CLI and stream status (reference app.py:93-104)."""
    st.info(f"Running '{' '.join(args)}'")
    result = subprocess.run(args, capture_output=True, text=True)
    if result.returncode == 0:
        st.info("GuideMaker-TPU run complete")
    else:
        st.error(result.stderr[-4000:])
    return result.returncode


def download_link(path: str, label: str) -> str:
    with open(path, "rb") as f:
        b64 = base64.b64encode(f.read()).decode()
    name = os.path.basename(path)
    return (f'<a href="data:file/csv;base64,{b64}" download="{name}">'
            f'{label}</a>')


def main():
    st.set_page_config(page_title="GuideMaker-TPU", layout="wide")
    st.title("GuideMaker-TPU")
    st.markdown(
        "Globally design guide RNAs for any CRISPR-Cas system in any small "
        "genome — exact genome-wide off-target search on TPU/CPU.")

    sessionid = str(uuid.uuid4())
    workdir = os.path.join(".streamlit_runs", sessionid)
    os.makedirs(workdir, exist_ok=True)

    with st.sidebar:
        st.header("Input genome")
        genome_file = st.file_uploader(
            "GenBank file (.gbk / .gbk.gz)", type=["gbk", "gb", "gz", "gbff"])
        st.header("Parameters")
        pam = st.text_input("PAM sequence (IUPAC)", value="NGG")
        pam_orientation = st.selectbox("PAM orientation",
                                       ["3prime", "5prime"], index=0)
        guidelength = st.slider("Guide length", 10, 27, 20)
        lsr = st.slider("Length of seed region (lsr)", 0, 27, 10)
        dist = st.slider("Minimum edit distance", 0, 5, 2)
        dtype = st.selectbox("Distance type", ["hamming", "leven"], index=0)
        before = st.slider("Keep guides upstream of a feature start (bp)",
                           1, 500, 100)
        into = st.slider("Keep guides into a feature (bp)", 1, 500, 200)
        knum = st.slider("Similar guides to report", 2, 20, 3)
        controls = st.number_input("Number of control guides", 0, 100000, 1000)
        restriction_list = st.text_input(
            "Restriction enzyme sites (space separated)", value="")
        scoring = st.checkbox("Doench efficiency + CFD scores (NGG only)",
                              value=False)
        submitted = st.button("SUBMIT")

    if not submitted:
        st.stop()
    if genome_file is None:
        st.error("Please upload a GenBank file first.")
        st.stop()

    inpath = os.path.join(workdir, "input.gbk")
    with open(inpath, "wb") as f:
        f.write(genome_file.getbuffer())

    args = [sys.executable, "-m", "guidemaker_tpu.cli",
            "--genbank", inpath, "--pamseq", pam,
            "--outdir", workdir, "--pam_orientation", pam_orientation,
            "--guidelength", str(guidelength), "--lsr", str(lsr),
            "--dist", str(dist), "--dtype", dtype,
            "--before", str(before), "--into", str(into),
            "--knum", str(knum), "--controls", str(int(controls)),
            "--log", os.path.join(workdir, "guidemaker.log"), "--plot"]
    if restriction_list.strip():
        args += ["--restriction_enzyme_list"] + restriction_list.split()
    if scoring:
        args += ["--doench_efficiency_score", "--cfd_score"]

    if run_command(args) != 0:
        st.stop()

    targets_path = os.path.join(workdir, "targets.csv.gz")
    if os.path.exists(targets_path):
        targets = pd.read_csv(targets_path)
        st.subheader(f"Guide RNAs ({len(targets)})")
        st.dataframe(targets.head(500))
        st.markdown(download_link(targets_path, "Download targets.csv.gz"),
                    unsafe_allow_html=True)
    controls_path = os.path.join(workdir, "controls.csv.gz")
    if os.path.exists(controls_path):
        ctrl = pd.read_csv(controls_path)
        st.subheader(f"Control RNAs ({len(ctrl)})")
        st.dataframe(ctrl.head(100))
        st.markdown(download_link(controls_path, "Download controls.csv.gz"),
                    unsafe_allow_html=True)
    for fname in os.listdir(workdir):
        if fname.endswith(".html"):
            with open(os.path.join(workdir, fname)) as f:
                st.components.v1.html(f.read(), height=900, scrolling=True)

    if st.button("Clean up session files"):
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
