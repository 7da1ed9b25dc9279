"""Package the engine for ``spark-submit --py-files`` (entry point B).

The reference ships workers a distribution tarball
(computer-dist/src/assembly, started by start-computer.sh); the Spark
equivalent is a zip of the pure-Python package on the driver/executor
PYTHONPATH:

    python tools/make_zip.py
    spark-submit --master <cluster> \
        --py-files dist/hugegraph_computer_spark.zip \
        tools/submit_job.py --algorithm page_rank \
        --edges /data/edges.parquet --output /data/ranks

Only ``*.py`` sources are packaged (no __pycache__/tests), with entries
sorted so the archive bytes are deterministic for a given tree.
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def make_zip(dest: str | None = None) -> Path:
    out = Path(dest) if dest else REPO / "dist" / "hugegraph_computer_spark.zip"
    out.parent.mkdir(parents=True, exist_ok=True)
    pkg = REPO / "hugegraph_computer_spark"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for f in sorted(pkg.rglob("*.py")):
            z.write(f, str(f.relative_to(REPO)))
    return out


if __name__ == "__main__":
    print(make_zip(sys.argv[1] if len(sys.argv) > 1 else None))
