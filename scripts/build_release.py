"""Build the one-click release artifact: dist/alphadia-tpu.pyz.

Fills the role of the reference's pyinstaller one-click builds
(/root/reference/release/ — win/mac/linux installers). pyinstaller is
not available in this environment, so the artifact is a stdlib-zipapp
single file with a shiv-style self-extracting bootstrap:

- one runnable file, `./alphadia-tpu.pyz --help` / `python
  alphadia-tpu.pyz ...` just works on any box with python >= 3.10 and
  the jax stack installed;
- on first run it unpacks itself to ~/.cache/alphadia_tpu/app-<hash>/
  so package data files (constants/*.tsv, packaged model weights, GUI
  static assets) and the lazily-compiled native peakstore keep working —
  code inside a zip cannot be read via Path(__file__);
- subsequent runs reuse the cache (keyed by content hash, so upgrading
  the pyz never collides with an old extraction).

Python dependencies (jax, flax, optax, numpy, pandas...) are NOT bundled
— like shiv's --site-packages mode, the artifact targets an environment
that already has them (see docs/install.md / Dockerfile).

Run: python scripts/build_release.py  -> dist/alphadia-tpu.pyz
"""

import hashlib
import shutil
import subprocess
import sys
import tempfile
import zipapp
from pathlib import Path

ROOT = Path(__file__).parents[1]
DIST = ROOT / "dist"

_BOOTSTRAP = '''\
"""Self-extracting bootstrap: unpack to a cache dir, then run the CLI."""
import hashlib
import os
import sys
import zipfile
from pathlib import Path


def _extract_root() -> Path:
    archive = Path(__file__).parent  # the .pyz itself
    digest = hashlib.sha256(archive.read_bytes()).hexdigest()[:16]
    cache = Path(
        os.environ.get("ALPHADIA_TPU_CACHE", Path.home() / ".cache" / "alphadia_tpu")
    )
    target = cache / f"app-{digest}"
    done = target / ".complete"
    if not done.exists():
        target.mkdir(parents=True, exist_ok=True)
        with zipfile.ZipFile(archive) as zf:
            zf.extractall(target)
        done.touch()
    return target


def main() -> None:
    root = _extract_root()
    sys.path.insert(0, str(root))
    # drop the zip itself from sys.path so the extracted tree wins
    sys.path = [p for p in sys.path if not p.endswith(".pyz")]
    from alphadia_tpu.cli import run

    run(sys.argv[1:])


if __name__ == "__main__":
    main()
'''


def main() -> None:
    DIST.mkdir(exist_ok=True)
    out = DIST / "alphadia-tpu.pyz"
    with tempfile.TemporaryDirectory() as td:
        stage = Path(td) / "app"
        shutil.copytree(
            ROOT / "alphadia_tpu",
            stage / "alphadia_tpu",
            ignore=shutil.ignore_patterns("__pycache__", "*.so", "*.pyc"),
        )
        (stage / "__main__.py").write_text(_BOOTSTRAP)
        zipapp.create_archive(
            stage, out, interpreter="/usr/bin/env python3", compressed=True
        )
    out.chmod(0o755)
    size_mb = out.stat().st_size / 1e6
    sha = hashlib.sha256(out.read_bytes()).hexdigest()[:16]
    print(f"built {out} ({size_mb:.1f} MB, sha256:{sha})")

    # smoke test from a neutral cwd so repo-relative imports can't hide bugs
    probe = subprocess.run(
        [sys.executable, str(out), "--help"],
        capture_output=True, text=True, cwd="/tmp",
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"},
    )
    assert probe.returncode == 0, probe.stderr[-2000:]
    assert "alphadia" in probe.stdout.lower()
    print("smoke test: `alphadia-tpu.pyz --help` OK")


if __name__ == "__main__":
    main()
