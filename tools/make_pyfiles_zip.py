"""Package the engine for `spark-submit --py-files`.

Usage:
  python tools/make_pyfiles_zip.py [out.zip]
  spark-submit --py-files geostatssolvers_jl_spark.zip your_job.py
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def main(out: str = "geostatssolvers_jl_spark.zip") -> None:
    pkg = ROOT / "geostatssolvers_jl_spark"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for p in sorted(pkg.rglob("*.py")):
            z.write(p, p.relative_to(ROOT))
    print(f"wrote {out} ({Path(out).stat().st_size} bytes)")


if __name__ == "__main__":
    main(*sys.argv[1:2])
