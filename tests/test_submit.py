"""Deployment-shape test (north rule: `spark-submit --py-files` with
all logic in the shipped package): build the zip artifact, run the real
spark-submit binary in a fresh JVM against it, read the written
triples back."""

import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _spark_submit() -> str | None:
    import shutil

    cand = shutil.which("spark-submit")
    if cand:
        return cand
    import pyspark

    p = Path(pyspark.__file__).parent / "bin" / "spark-submit"
    return str(p) if p.exists() else None


@pytest.mark.slow
def test_spark_submit_pyfiles_pipeline(tmp_path):
    submit = _spark_submit()
    if submit is None:
        pytest.skip("spark-submit binary not available")
    zip_path = tmp_path / "deepref_spark.zip"
    build = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "package_pyfiles.py"), str(zip_path)],
        capture_output=True, text=True, cwd=str(tmp_path),
    )
    assert build.returncode == 0, build.stderr
    out_dir = tmp_path / "triples"
    r = subprocess.run(
        [
            submit, "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", str(zip_path),
            str(REPO / "scripts" / "submit_pipeline.py"),
            "--n-docs", "60", "--out", str(out_dir),
        ],
        capture_output=True, text=True, cwd=str(tmp_path), timeout=360,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "TRIPLES_WRITTEN=" in r.stdout
    n = int(r.stdout.split("TRIPLES_WRITTEN=")[1].split()[0])
    assert n > 0
    import duckdb

    rows = duckdb.sql(
        f"SELECT count(*), count(DISTINCT subj_canon || '|' || pred || '|' || obj_canon) "
        f"FROM read_parquet('{out_dir}/**/*.parquet', hive_partitioning=1)"
    ).fetchone()
    assert rows[0] == n and rows[1] == n  # canonical triple key unique


@pytest.mark.slow
def test_spark_submit_ablation_resume(tmp_path):
    """§3.3 lifecycle parity: ablation grid with resume-by-row-count
    (ablation_studies.py:42-56) — rerun after truncation completes the
    grid with identical rows."""
    submit = _spark_submit()
    if submit is None:
        pytest.skip("spark-submit binary not available")
    zip_path = tmp_path / "deepref_spark.zip"
    subprocess.run(
        [sys.executable, str(REPO / "scripts" / "package_pyfiles.py"), str(zip_path)],
        check=True, capture_output=True, cwd=str(tmp_path),
    )

    def run(csv_path):
        return subprocess.run(
            [
                submit, "--master", "local[4]",
                "--conf", "spark.sql.shuffle.partitions=8",
                "--conf", "spark.ui.enabled=false",
                "--py-files", str(zip_path),
                str(REPO / "scripts" / "run_ablation.py"),
                "--out", str(csv_path), "--n-docs", "40",
                "--encoders", "bert,cnn", "--variants", "original,sw", "--seeds", "1",
            ],
            capture_output=True, text=True, cwd=str(tmp_path), timeout=360,
        )

    full = tmp_path / "abl.csv"
    r = run(full)
    assert r.returncode == 0, r.stderr[-2000:]
    lines = full.read_text().strip().splitlines()
    assert len(lines) == 1 + 4  # header + 2 encoders x 2 variants x 1 seed

    partial = tmp_path / "abl_partial.csv"
    partial.write_text("\n".join(lines[:3]) + "\n")
    r2 = run(partial)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "done=2 todo=2" in r2.stdout
    assert partial.read_text().strip().splitlines() == lines
