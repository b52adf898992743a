"""North-rule deployment smoke: the package runs via spark-submit
--py-files as a self-contained zip (no repo on the python path), the
launch mode the rule names for multi-executor clusters.

Reference deployment surface: pyrosm is a pip package imported by one
process (pyrosm.py:1-60); the Spark-native equivalent is a zip-shipped
package + spark-submit, which this test executes end to end.
"""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = "/opt/spark/bin/spark-submit"


def _build_zip(path: str) -> None:
    pkg = os.path.join(REPO, "pyrosm_spark")
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for fn in files:
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(root, fn)
                zf.write(full, os.path.relpath(full, REPO))


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="spark-submit not installed")
def test_spark_submit_py_files_smoke(tmp_path):
    zip_path = str(tmp_path / "pyrosm_spark.zip")
    _build_zip(zip_path)
    # run from OUTSIDE the repo with a scrubbed PYTHONPATH: the only
    # route to the package is the --py-files zip, as on a real cluster
    script = str(tmp_path / "submit_smoke.py")
    shutil.copy(os.path.join(REPO, "scripts", "submit_smoke.py"), script)
    data_dir = str(tmp_path / "data")

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable

    proc = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[2]",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zip_path, script, data_dir],
        capture_output=True, text=True, cwd=str(tmp_path), env=env,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert lines, proc.stdout[-2000:]
    out = json.loads(lines[-1])
    assert out["ok"] is True
    assert out["master"] == "local[2]"
    # deterministic synth world (grid=16, seed=42): counts are stable
    assert out["tiles"] > 0 and out["pip"] > 0
    assert out["edges"] > 0 and out["decoded"] > 0
