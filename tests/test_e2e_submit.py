"""End-to-end test of the production invocation (BASELINE.json:14):
``spark-submit --py-files engine.zip run_crawl.py`` as a real subprocess —
the executor Python workers must resolve engine/ imports from the zip
alone (cwd is scrubbed from the subprocess PYTHONPATH and the submit runs
from a neutral working directory), proving the artifact is self-contained
for a cluster with no shared filesystem.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.slow
def test_spark_submit_pyfiles_crawl(tmp_path):
    sys.path.insert(0, str(REPO))
    from tools.package import build

    zip_path = build(tmp_path / "engine.zip")
    # run_crawl.py must travel next to the zip, like a real deploy bundle
    script = tmp_path / "run_crawl.py"
    script.write_text((REPO / "run_crawl.py").read_text())
    root = tmp_path / "catalog"
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "SPARK_LOCAL_DIRS")
    }
    out = subprocess.run(
        [
            "spark-submit",
            "--master",
            "local[4]",
            "--py-files",
            str(zip_path),
            str(script),
            "--root",
            str(root),
            "--graph",
            "tiny",
            "--epochs",
            "2",
        ],
        capture_output=True,
        text=True,
        cwd=tempfile.gettempdir(),
        env=env,
        timeout=420,
        check=False,
    )
    assert out.returncode == 0, out.stderr[-4000:]
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    assert lines, out.stdout[-2000:]
    summary = json.loads(lines[-1])
    assert summary["committed_epoch"] >= 1
    epochs = [json.loads(ln) for ln in lines[:-1]]
    assert epochs and all(m["urls_popped"] > 0 for m in epochs)
    # the committed catalog is readable back
    manifests = sorted((root / "manifests").glob("manifest-*.json"))
    assert manifests, list(root.iterdir())
