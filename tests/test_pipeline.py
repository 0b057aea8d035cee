"""End-to-end pipeline + CLI tests (the reference left cli.main untested;
we cover it)."""
import gzip
import os

import numpy as np
import pandas as pd
import pytest

from guidemaker_tpu.cli import main, myparser
from guidemaker_tpu.pipeline import PipelineConfig, run_pipeline


def test_parser_flags_match_reference():
    parser = myparser()
    args = parser.parse_args([
        "--genbank", "x.gbk", "--pamseq", "NGG", "--outdir", "out"])
    # reference defaults (cli.py:29-75)
    assert args.pam_orientation == "3prime"
    assert args.guidelength == 20
    assert args.lsr == 10
    assert args.dtype == "hamming"
    assert args.dist == 2
    assert args.before == 100
    assert args.into == 200
    assert args.knum == 5
    assert args.controls == 1000
    assert args.threads == 2


def test_config_validation():
    cfg = PipelineConfig(genbank=["x"], pamseq="NGG", lsr=25, guidelength=20)
    with pytest.raises(AssertionError):
        cfg.validate()
    cfg = PipelineConfig(genbank=["x"], pamseq="N")  # too short
    with pytest.raises(AssertionError):
        cfg.validate()
    cfg = PipelineConfig()  # no inputs
    with pytest.raises(AssertionError):
        cfg.validate()


def test_raw_output_only(genome_fasta, tmp_path):
    cfg = PipelineConfig(
        fasta=[genome_fasta], pamseq="NGG", pam_orientation="5prime",
        raw_output_only=True, outdir=str(tmp_path), controls=0, knum=2)
    result = run_pipeline(cfg)
    out = tmp_path / "rawguides.csv.gz"
    assert out.exists()
    df = pd.read_csv(out)
    assert list(df.columns) == ["Chromosome", "Start", "Stop", "gRNA", "Strand"]
    assert len(df) == len(result.raw_bed) > 3000


def test_full_pipeline_genbank(genome_gbk, tmp_path):
    cfg = PipelineConfig(
        genbank=[genome_gbk], pamseq="NGG", pam_orientation="3prime",
        knum=3, controls=20, outdir=str(tmp_path),
        doench_efficiency_score=True, cfd_score=True, plot=True)
    result = run_pipeline(cfg)
    df = result.targets
    assert len(df) > 500
    assert (tmp_path / "targets.csv.gz").exists()
    assert (tmp_path / "controls.csv.gz").exists()
    assert (tmp_path / "AP009180.1.html").exists()
    # scores present and sane (boosted regression may slightly leave [0,1])
    assert df["Efficiency"].between(-0.5, 1.5).all()
    assert np.isfinite(df["Efficiency"].astype(float)).all()
    # the reference's end-to-end golden Doench value (test_core.py:271-292,
    # Efficiency[213] ~= 0.3245381) appears for the same guide here
    assert np.isclose(df["Efficiency"].astype(float), 0.3245381,
                      atol=1e-4).any()
    assert df["Max CFD"].between(0, 1).all()
    # Max CFD is over non-identical neighbors (self excluded)
    assert (df["Max CFD"] < 1.0).any()
    # controls respect the configured minimum distance
    assert result.control_min_dist >= 7
    # plot HTML contains a vega-lite spec
    html = (tmp_path / "AP009180.1.html").read_text()
    assert "vega-lite/v5" in html and "Guide Density" in html


def test_cli_end_to_end(genome_gbk, tmp_path):
    outdir = tmp_path / "out"
    main(["--genbank", genome_gbk, "--pamseq", "NGG",
          "--outdir", str(outdir), "--pam_orientation", "5prime",
          "--controls", "0", "--knum", "2",
          "--log", str(tmp_path / "run.log")])
    assert (outdir / "targets.csv.gz").exists()
    assert (tmp_path / "run.log").exists()


def test_cli_rejects_bad_input_combo(genome_gbk, tmp_path, genome_fasta):
    with pytest.raises(SystemExit):
        main(["--genbank", genome_gbk, "--fasta", genome_fasta,
              "--gff", "x.gff", "--pamseq", "NGG",
              "--outdir", str(tmp_path), "--log", str(tmp_path / "l.log")])


def test_pipeline_gff_path(genome_fasta, tmp_path):
    # synthesize a small GFF for the genome
    gff = tmp_path / "anno.gff"
    gff.write_text(
        "##gff-version 3\n"
        "AP009180.1\ttest\tCDS\t100\t1400\t.\t+\t0\tID=gene1;Name=foo\n"
        "AP009180.1\ttest\tCDS\t2000\t3100\t.\t-\t0\tID=gene2;Name=bar\n")
    cfg = PipelineConfig(
        fasta=[genome_fasta], gff=[str(gff)], pamseq="NGG",
        pam_orientation="5prime", knum=2, controls=0,
        attribute_key="ID", outdir=str(tmp_path))
    result = run_pipeline(cfg)
    assert result.targets is not None
    assert set(result.targets["ID"].dropna()) <= {"gene1", "gene2"}


def test_stage_timer_logs(caplog):
    import logging
    from guidemaker_tpu.util import stage_timer
    with caplog.at_level(logging.INFO, logger="guidemaker_tpu.timing"):
        with stage_timer("unit-test-stage"):
            pass
    assert any("unit-test-stage" in r.message for r in caplog.records)


def test_cli_version(capsys):
    import pytest as _pytest
    with _pytest.raises(SystemExit) as e:
        main(["--version"])
    assert e.value.code == 0
    assert "guidemaker-tpu" in capsys.readouterr().out


def test_multi_contig_genome(tmp_path):
    # two contigs: scan, join, and output must keep contigs separate
    from guidemaker_tpu.io import parse_fasta, write_fasta
    from guidemaker_tpu.io.records import SeqRecord
    rec = next(parse_fasta(os.path.join(
        os.path.dirname(__file__), "test_data", "Carsonella_ruddii.fasta.gz")))
    fa = tmp_path / "two.fasta"
    with open(fa, "w") as f:
        write_fasta([SeqRecord("ctgA", rec.seq[:15000]),
                     SeqRecord("ctgB", rec.seq[15000:30000])], f)
    gff = tmp_path / "two.gff"
    gff.write_text(
        "##gff-version 3\n"
        "ctgA\tt\tCDS\t100\t1400\t.\t+\t0\tID=a1\n"
        "ctgB\tt\tCDS\t200\t1800\t.\t-\t0\tID=b1\n")
    cfg = PipelineConfig(fasta=[str(fa)], gff=[str(gff)], pamseq="NGG",
                         pam_orientation="5prime", knum=2, controls=0,
                         attribute_key="ID", outdir=str(tmp_path))
    result = run_pipeline(cfg, write_outputs=False)
    df = result.targets
    accs = set(df["Accession"])
    assert accs == {"ctgA", "ctgB"}
    # guides on ctgB must join only to ctgB features
    assert (df[df["Accession"] == "ctgB"]["ID"].dropna() == "b1").all()
