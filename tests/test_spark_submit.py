"""Entry point B: real ``spark-submit --py-files`` launch.

The north rule requires the driver to run "via spark-submit --py-files
on a multi-executor cluster". This test exercises that exact launch
path with the pyspark-bundled spark-submit: the package is zipped by
tools/make_zip.py, the job script and zip are copied to a scratch dir,
and the subprocess runs from there with the repo stripped from
PYTHONPATH — so the import can only be satisfied by ``--py-files``.
Reference launch parity: computer-dist/.../HugeGraphComputer.java:57-82
(start-computer.sh -d conf -r master|worker).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _spark_submit_bin() -> str:
    import pyspark

    p = Path(pyspark.__file__).parent / "bin" / "spark-submit"
    return str(p) if p.exists() else "spark-submit"


def test_spark_submit_py_files_wcc(spark, tmp_path):
    sys.path.insert(0, str(REPO / "tools"))
    try:
        from make_zip import make_zip
    finally:
        sys.path.pop(0)

    zpath = make_zip(str(tmp_path / "hugegraph_computer_spark.zip"))
    shutil.copy(REPO / "tools" / "submit_job.py", tmp_path / "submit_job.py")

    edges = [(0, 1), (1, 2), (2, 0), (5, 6)]
    epath = str(tmp_path / "edges.parquet")
    spark.createDataFrame(edges, "src long, dst long").write.parquet(epath)
    out = str(tmp_path / "comp")

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must supply the package
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    r = subprocess.run(
        [
            _spark_submit_bin(),
            "--master", "local[2]",
            "--conf", "spark.ui.enabled=false",
            "--py-files", str(zpath),
            str(tmp_path / "submit_job.py"),
            "--algorithm", "wcc", "--edges", epath, "--output", out,
        ],
        capture_output=True, text=True, cwd=str(tmp_path), timeout=300, env=env,
    )
    assert r.returncode == 0, (r.stderr[-3000:], r.stdout[-1000:])
    info = json.loads(
        [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert info["rows"] == 5
    got = {
        row["vid"]: row["component"]
        for row in spark.read.parquet(out).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 5: 5, 6: 5}
