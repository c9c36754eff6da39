"""Zip the library for spark-submit --py-files."""

import os
import zipfile


def main(out: str = "neuscraper_spark.zip") -> str:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(root, "neuscraper_spark")
    with zipfile.ZipFile(os.path.join(root, out), "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _, files in os.walk(pkg):
            for name in files:
                if name.endswith(".py"):
                    full = os.path.join(dirpath, name)
                    z.write(full, os.path.relpath(full, root))
    return os.path.join(root, out)


if __name__ == "__main__":
    print(main())
