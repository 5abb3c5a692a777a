"""The spark-submit --py-files artifact: built zip must be importable on a
bare interpreter (the executor-side contract) and deterministic."""

import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent


def _build(out: pathlib.Path) -> None:
    subprocess.run(
        [sys.executable, str(REPO / "tools" / "make_pyfiles.py"), "--out", str(out)],
        check=True,
        capture_output=True,
    )


def test_zip_imports_on_bare_interpreter(tmp_path):
    zp = tmp_path / "locus_spark.zip"
    _build(zp)
    # fresh interpreter, cwd outside the repo: only the zip provides the
    # package — exactly what a remote executor sees after --py-files ships it
    probe = (
        "import sys; sys.path.insert(0, sys.argv[1]); "
        "import locus_spark.queries as q, locus_spark.plans.knn, "
        "locus_spark.streaming.sessionize; "
        "names = list(q.queries()); assert len(names) > 50, names; "
        "print(len(names))"
    )
    proc = subprocess.run(
        [sys.executable, "-c", probe, str(zp)],
        capture_output=True,
        text=True,
        cwd=tmp_path,
    )
    assert proc.returncode == 0, proc.stderr
    assert int(proc.stdout.strip()) > 50


def test_zip_is_deterministic(tmp_path):
    a, b = tmp_path / "a.zip", tmp_path / "b.zip"
    _build(a)
    _build(b)
    assert a.read_bytes() == b.read_bytes()
