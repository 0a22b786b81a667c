"""Build dist/logagg.zip for ``spark-submit --py-files``."""

from __future__ import annotations

import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def build(out: Path | None = None) -> Path:
    out = out or REPO / "dist" / "logagg.zip"
    out.parent.mkdir(exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for py in sorted((REPO / "logagg").glob("*.py")):
            z.write(py, f"logagg/{py.name}")
    return out


if __name__ == "__main__":
    print(build())
