"""Deployment shape: the pipeline runs via spark-submit --py-files with the
package shipped as a zip (north_rule's cluster-submission form), imported
from the archive, NOT from the repo working directory."""

import json
import os
import shutil
import subprocess
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not installed"
)
def test_spark_submit_py_files(tmp_path):
    # package the library
    zpath = str(tmp_path / "punt_spark.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "punt_spark")
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))

    # tiny fixtures
    from punt_spark.fixtures import write_fixtures

    fdir = str(tmp_path / "fixtures")
    write_fixtures(fdir, n=800, seed=11)

    out_dir = str(tmp_path / "out")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the import source
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--py-files", zpath,
            os.path.join(REPO, "scripts", "submit_job.py"),
            "--input", fdir,
            "--out", out_dir,
        ],
        cwd=str(tmp_path),  # NOT the repo: punt_spark resolves via the zip
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    result = json.loads(proc.stdout.strip().splitlines()[-1])
    m = result["metrics"]
    assert m["msgs.received"] == m["msgs.inserted"] + m["msgs.failed"]
    assert m["msgs.received"] + m["parse_errors"] == 800
    assert len(result["chunks_processed"]) > 0
    assert os.path.isdir(os.path.join(out_dir, "sink_logs"))
