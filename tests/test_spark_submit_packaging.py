"""True spark-submit --py-files packaging test (north-rule requirement).

The in-process CLI tests (test_cli.py) prove the validation logic; this
one proves the PACKAGING: the engine zipped into ``sdk_spark.zip``,
shipped via ``--py-files`` to a fresh spark-submit driver running from a
scratch directory (so nothing resolves from the repo checkout), with the
violations parquet written by executors that imported the engine from
the zip.
"""

from __future__ import annotations

import json
import shutil
import subprocess
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


def test_spark_submit_py_files_packaging(tmp_path):
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")

    zip_path = tmp_path / "sdk_spark.zip"
    with zipfile.ZipFile(zip_path, "w") as z:
        for p in sorted((REPO / "sdk_spark").rglob("*.py")):
            z.write(p, p.relative_to(REPO))

    # driver script copied OUT of the repo: python prepends the script's
    # own directory to sys.path, so running the in-repo copy would let
    # `import sdk_spark` resolve from the checkout and prove nothing
    driver = tmp_path / "validate_job.py"
    driver.write_text((REPO / "validate_job.py").read_text())

    import pandas as pd
    src = tmp_path / "docs.parquet"
    pd.DataFrame({
        "doc_id": list(range(50)),
        "text": ["a perfectly fine document"] * 45 + [""] * 5,
    }).to_parquet(src)

    schema = {
        "$schema": "https://json-structure.org/meta/extended/v0/#",
        "$id": "https://sdk-spark.local/pkg", "name": "Doc",
        "$uses": ["JSONStructureValidation"],
        "type": "object",
        "properties": {"doc_id": {"type": "int64"},
                       "text": {"type": "string", "minLength": 1}},
        "required": ["doc_id", "text"],
    }
    schema_file = tmp_path / "doc.struct.json"
    schema_file.write_text(json.dumps(schema))

    out = subprocess.run(
        [spark_submit, "--master", "local[2]",
         "--conf", "spark.ui.enabled=false",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--py-files", str(zip_path), str(driver),
         "--schema", str(schema_file),
         "--input", str(src),
         "--violations", str(tmp_path / "viol"),
         "--manifest", str(tmp_path / "manifest"),
         "--format", "json", "--quiet"],
        cwd=tmp_path, capture_output=True, text=True, timeout=420)
    assert out.returncode == 0, f"stdout:{out.stdout}\nstderr:{out.stderr[-3000:]}"

    viol = pd.read_parquet(tmp_path / "viol")
    assert len(viol) == 5
    assert set(viol["constraint_id"]) == {"INSTANCE_STRING_MIN_LENGTH"}
