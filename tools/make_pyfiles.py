"""Build dist/engine.zip for spark-submit --py-files.

Zips the engine package (source only, deterministic order, no
bytecode) so executors can import web_crawler_search_engine_spark.
"""

from __future__ import annotations

import zipfile
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
PKG = "web_crawler_search_engine_spark"


def main() -> Path:
    out_dir = ROOT / "dist"
    out_dir.mkdir(exist_ok=True)
    out = out_dir / "engine.zip"
    files = sorted((ROOT / PKG).rglob("*.py"))
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for f in files:
            if "__pycache__" in f.parts:
                continue
            z.write(f, f.relative_to(ROOT))
    print(f"{out} ({out.stat().st_size} bytes, {len(files)} files)")
    return out


if __name__ == "__main__":
    main()
