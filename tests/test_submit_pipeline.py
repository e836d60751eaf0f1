"""The north rule's execution mode: `spark-submit --py-files` with the
engine shipped as a zip. The test copies run_pipeline.py to a temp dir
(so its repo-relative sys.path insert points at the temp dir, NOT the
repo) and strips PYTHONPATH — the package can then only come from the
--py-files artifact, proving the zip is self-sufficient for a cluster
submission. Second submission must resume to a no-op from the
checkpoint manifest."""

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH"
)
def test_spark_submit_pyfiles_is_self_sufficient(tmp_path):
    sys.path.insert(0, REPO)
    from tools.make_pyfiles_zip import build_zip

    zip_path = build_zip(str(tmp_path / "s2tt_spark.zip"))
    script = tmp_path / "run_pipeline.py"
    shutil.copy(os.path.join(REPO, "tools", "run_pipeline.py"), script)

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    base = tmp_path / "pipe"
    args = [
        "spark-submit", "--master", "local[4]",
        "--conf", "spark.sql.shuffle.partitions=4",
        "--py-files", zip_path, str(script),
        "--docs", "200",
        "--input", str(base / "sequences"),
        "--output", str(base / "tiers"),
        "--fits", str(base / "fits"),
        "--segments", str(base / "segments"),
        "--manifest", str(base / "manifest"),
    ]
    first = subprocess.run(
        args, cwd=tmp_path, env=env, capture_output=True, text=True,
        timeout=600,
    )
    assert first.returncode == 0, first.stderr[-4000:]
    assert "committed" in first.stdout, first.stdout

    second = subprocess.run(
        args, cwd=tmp_path, env=env, capture_output=True, text=True,
        timeout=600,
    )
    assert second.returncode == 0, second.stderr[-4000:]
    assert "sources todo=0" in second.stdout, second.stdout
    assert "nothing to do" in second.stdout, second.stdout
