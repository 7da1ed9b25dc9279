"""spark-submit driver script — the cluster-launch face of the CLI.

``spark-submit`` runs a script file (it has no ``-m`` module mode), so
this thin shim forwards argv to the same ``main`` as
``python -m hugegraph_computer_spark``; the package itself arrives on
the PYTHONPATH via ``--py-files dist/hugegraph_computer_spark.zip``
(build it with ``python tools/make_zip.py``). Master, deploy mode and
driver/executor sizing come from the submit command — ``get_spark``
detects the submit-launched gateway and does not override them.
"""

from __future__ import annotations

import sys

from hugegraph_computer_spark.__main__ import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
