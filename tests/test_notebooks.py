"""Execute every notebook code cell in a subprocess — notebooks stay green.

Mirrors the reference's shipped demo notebook (notebooks/shodh_memory_demo.ipynb)
with executable coverage: each .ipynb's code cells are concatenated in order
and run under the CPU platform (same virtual-device setup as conftest).
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parents[1]
NOTEBOOKS = sorted((ROOT / "notebooks").glob("*.ipynb"))


@pytest.mark.parametrize("nb_path", NOTEBOOKS, ids=lambda p: p.name)
def test_notebook_executes(nb_path, tmp_path):
    nb = json.loads(nb_path.read_text())
    cells = [
        "".join(c["source"]) for c in nb["cells"] if c["cell_type"] == "code"
    ]
    assert cells, f"{nb_path.name} has no code cells"
    script = "\n\n".join(cells)
    env = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
        "SHODH_OFFLINE": "1",
        "TMPDIR": str(tmp_path),
    }
    proc = subprocess.run(
        [sys.executable, "-c", script],
        cwd=ROOT,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, (
        f"{nb_path.name} failed:\n--- stdout ---\n{proc.stdout[-3000:]}"
        f"\n--- stderr ---\n{proc.stderr[-3000:]}"
    )


def test_notebooks_regenerate_cleanly(tmp_path):
    # build_notebooks.py is the source of truth — the checked-in .ipynb
    # files must match its output byte for byte.
    import shutil

    build = ROOT / "notebooks" / "build_notebooks.py"
    work = tmp_path / "nb"
    work.mkdir()
    shutil.copy(build, work / "build_notebooks.py")
    subprocess.run([sys.executable, str(work / "build_notebooks.py")], check=True)
    for nb_path in NOTEBOOKS:
        regen = work / nb_path.name
        assert regen.read_text() == nb_path.read_text(), f"{nb_path.name} drifted"
