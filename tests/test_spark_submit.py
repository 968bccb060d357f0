"""spark-submit --py-files deployment parity (north rule: "run via
spark-submit --py-files on a multi-executor cluster").

The test proves the zip artifact is self-sufficient: ``main.py`` is
copied ALONE into a scratch directory (so the source tree is NOT on the
script's sys.path) and driven by spark-submit with only the packaged zip
supplying the engine. Exactly-once semantics must survive the deployment
path: a second identical submit skips every epoch.
"""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stellar_ledger_data_indexer_spark.package import make_pyfiles_zip  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def test_pyfiles_zip_reproducible(tmp_path):
    a = make_pyfiles_zip(str(tmp_path / "a.zip"))
    b = make_pyfiles_zip(str(tmp_path / "b.zip"))
    assert open(a, "rb").read() == open(b, "rb").read()
    names = zipfile.ZipFile(a).namelist()
    assert "stellar_ledger_data_indexer_spark/__init__.py" in names
    assert "stellar_ledger_data_indexer_spark/job.py" in names
    assert not any("__pycache__" in n or "/tests/" in n for n in names)


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="spark-submit not on PATH")
def test_spark_submit_pyfiles_end_to_end(tmp_path):
    zip_path = make_pyfiles_zip(str(tmp_path / "sldi_spark.zip"))
    # isolate: only main.py + the zip are visible to the driver
    app = tmp_path / "main.py"
    shutil.copy(os.path.join(REPO, "main.py"), app)
    events = str(tmp_path / "events")
    wh = str(tmp_path / "wh")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}

    def submit():
        cmd = [SPARK_SUBMIT, "--master", "local[4]",
               "--driver-memory", "4g",
               "--py-files", zip_path, str(app), "append",
               "--synthesize", "5000", "--events-path", events,
               "--warehouse", wh, "--start", "2", "--end", "0",
               "--epoch-size", "100"]
        r = subprocess.run(cmd, capture_output=True, text=True,
                           cwd=str(tmp_path), env=env, timeout=420)
        assert r.returncode == 0, r.stderr[-3000:]
        return [json.loads(line) for line in r.stdout.splitlines()
                if line.startswith("{")]

    first = submit()
    assert first[-1]["status"] == "done"
    assert first[-1]["target_rows"] > 0
    assert all(not rep["skipped"] for rep in first[:-1])

    second = submit()  # exactly-once across deployments
    assert second[-1]["status"] == "done"
    assert second[-1]["target_rows"] == first[-1]["target_rows"]
    assert second[-1]["target_snapshot"] == first[-1]["target_snapshot"]
    assert all(rep["skipped"] for rep in second[:-1])
