"""spark-submit --py-files end-to-end: the north-rule deployment shape.

The cluster contract is `spark-submit --py-files dist/schema_infer_plugin_spark.zip
run_validation.py ...` (tools/package.py docstring). This test executes that
EXACT shape in a fresh JVM: the package is importable ONLY from the zip (the
shim is copied to a temp cwd so the repo checkout is not on sys.path), the
master comes from the spark-submit CLI (session.get_spark leaves it alone when
SPARK_ENV_LOADED is set by the launcher scripts), and the run must produce the
full artifact set (profiles, violations, verdicts, scorecard, ledger).

One fresh JVM (~60-90 s) — the only test that doesn't share the session
fixture, deliberately: packaging bugs (missing submodule in the zip, repo-path
imports leaking into operators, config loading relative to cwd) are invisible
to every in-process test.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_py_files_e2e(tmp_path):
    sys.path.insert(0, REPO)
    from tools.package import build

    zip_path = build(str(tmp_path / "dist"))
    # the zip must carry every package module (a missing __init__ or a
    # forgotten subpackage fails here, not at cluster submit time)
    import zipfile

    names = zipfile.ZipFile(zip_path).namelist()
    for sub in ("checks", "datapipe", "functions", "operators", "plans",
                "sources", "streaming"):
        assert any(n.startswith(f"schema_infer_plugin_spark/{sub}/") for n in names), sub

    shim = tmp_path / "run_validation.py"
    shutil.copy(os.path.join(REPO, "run_validation.py"), shim)
    out = tmp_path / "out"
    env = {
        **os.environ,
        "PYSPARK_PYTHON": sys.executable,
        "PYSPARK_DRIVER_PYTHON": sys.executable,
    }
    # run from the temp dir: the repo checkout must NOT be importable — the
    # engine code has to come from --py-files, like on a real cluster
    env.pop("PYTHONPATH", None)
    r = subprocess.run(
        [
            "spark-submit",
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            str(shim),
            "--input", "synth:200",
            "--out", str(out),
            "--run-id", "e2e",
            "--n-buckets", "8",
        ],
        cwd=tmp_path,
        env=env,
        capture_output=True,
        text=True,
        timeout=480,
    )
    assert r.returncode == 0, f"stderr tail:\n{r.stderr[-4000:]}"
    # full artifact set of a validation run
    for artifact in ("profiles", "violations", "verdicts", "scorecard", "ledger"):
        path = out / artifact
        assert path.exists(), f"missing {artifact}; stderr:\n{r.stderr[-2000:]}"
    # the driver prints the run summary dict as its last act
    assert "scorecard_rows" in r.stdout
